"""Renderer tests against analytic geometry (sphere/plane touches)."""

import jax.numpy as jnp
import numpy as np
import pytest

from midastouch_tpu.geometry import procedural
from midastouch_tpu.ops import image as image_ops
from midastouch_tpu.ops import se3
from midastouch_tpu.render.digit import DigitRenderer, RenderConfig

CFG = RenderConfig(width=60, height=80, ray_chunk=1200, max_faces=512)
RADIUS = 0.04


def _touch_pose(theta=0.0, phi=0.0):
    """Gel pose touching the sphere at spherical coords, z-axis outward."""
    n = np.array(
        [np.cos(phi) * np.sin(theta), np.sin(phi) * np.sin(theta), np.cos(theta)],
        dtype=np.float32,
    )
    v = (RADIUS * n).astype(np.float32)
    import jax

    T = se3.pose_from_vertex_normal(
        jnp.asarray(v[None]), jnp.asarray(n[None]), 0.0,
        jnp.zeros(1), jax.random.PRNGKey(0),
    )
    return np.asarray(T[0])


def test_sphere_touch_depth_and_mask():
    mesh = procedural.icosphere(radius=RADIUS, subdivisions=4)
    r = DigitRenderer(CFG, mesh)
    press = 0.0015
    rgb, hm, mask, press_eff, cam = r.render(_touch_pose(1.0, 0.7), press)
    hm, mask = np.asarray(hm), np.asarray(mask)
    assert abs(float(press_eff) - press) < 1e-6

    # peak height at the contact center ~ press depth (in px)
    expected_px = press * 1000 / CFG.pixmm
    assert abs(hm.max() - expected_px) < 2.0  # within 2 px (0.06 mm)
    cy, cx = np.unravel_index(hm.argmax(), hm.shape)
    assert abs(cy - CFG.height // 2) < 6 and abs(cx - CFG.width // 2) < 6

    # mask: contact blob around center, empty at borders
    assert mask[cy, cx]
    assert not mask[0, :].any() and not mask[-1, :].any()
    # heightmap outside contact is background (0)
    assert hm[0, 0] < 1e-3

    rgb = np.asarray(rgb)
    assert rgb.shape == (CFG.height, CFG.width, 3)
    assert 0 <= rgb.min() and rgb.max() <= 1


def test_unprojected_cloud_lies_on_sphere():
    mesh = procedural.icosphere(radius=RADIUS, subdivisions=4)
    r = DigitRenderer(CFG, mesh)
    gel_pose = _touch_pose(1.1, -0.4)
    rgb, hm, mask, press_eff, cam = r.render(gel_pose, 0.002)
    pts, valid = r.heightmap2Pointcloud(hm, mask)
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.sum() > 20
    cloud_cam = pts[valid]
    # to world frame
    cam_np = np.asarray(cam)
    cloud_w = cloud_cam @ cam_np[:3, :3].T + cam_np[:3, 3]
    rr = np.linalg.norm(cloud_w, axis=1)
    # points lie on the sphere (facet chord error ~ r*(1-cos) small)
    np.testing.assert_allclose(rr, RADIUS, atol=5e-4)


def test_overpen_compensation_caps_height():
    mesh = procedural.icosphere(radius=RADIUS, subdivisions=4)
    r = DigitRenderer(CFG, mesh)
    # ask for a press beyond pen_max: must be capped
    rgb, hm, mask, press_eff, cam = r.render(_touch_pose(), 0.05)
    assert float(press_eff) <= CFG.pen_max + 1e-9
    max_pen_m = np.asarray(hm).max() * CFG.pixmm / 1000
    assert max_pen_m <= CFG.pen_max + 1e-4


def test_no_contact_render():
    mesh = procedural.icosphere(radius=RADIUS, subdivisions=3)
    r = DigitRenderer(CFG, mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = RADIUS + 0.05  # far above the sphere
    rgb, hm, mask, press_eff, cam = r.render(pose, 0.001)
    assert not np.asarray(mask).any()
    assert np.asarray(hm).max() < 1e-3


def test_render_sensor_poses_batch(rng):
    mesh = procedural.icosphere(radius=RADIUS, subdivisions=3)
    r = DigitRenderer(CFG, mesh, seed=1)
    from midastouch_tpu.geometry.mesh import sample_poses_on_mesh

    poses = sample_poses_on_mesh(mesh, 4, rng, edges=False)
    hms, masks, rgbs, cams, gels = r.render_sensor_poses(poses)
    assert hms.shape == (4, CFG.height, CFG.width)
    assert masks.dtype == bool and rgbs.shape[-1] == 3
    # each touch makes contact
    assert all(m.sum() > 10 for m in masks)
    # gel/cam consistency: cam = gel + cam_dist * z_gel
    for c, g in zip(cams, gels):
        np.testing.assert_allclose(
            c[:3, 3], g[:3, 3] + g[:3, :3] @ [0, 0, CFG.cam_dist], atol=1e-6
        )


def test_render_trajectory_measurement_noise(rng):
    mesh = procedural.icosphere(radius=RADIUS, subdivisions=3)
    r = DigitRenderer(CFG, mesh, seed=2)
    from midastouch_tpu.geometry.mesh import sample_poses_on_mesh

    poses = sample_poses_on_mesh(mesh, 3, rng, edges=False)
    out = r.render_sensor_trajectory(
        poses, m_noise={"sig_r": 0.5, "sig_t": 2e-4}
    )
    hms, masks, rgbs, cams, gels, meas = out
    assert meas.shape == gels.shape
    # measurement poses close to but not equal to gt
    dt = np.linalg.norm(meas[:, :3, 3] - gels[:, :3, 3], axis=1)
    assert 0 < dt.max() < 5e-3


def test_pallas_raycast_matches_xla_interpret():
    """Pallas depth kernel (interpret mode on CPU) == XLA path."""
    import jax
    from jax.experimental import pallas as pl

    mesh = procedural.icosphere(radius=RADIUS, subdivisions=3)
    r_xla = DigitRenderer(CFG, mesh, backend="xla")
    pose = _touch_pose(1.0, 0.7)
    cam = r_xla.gel2cam(jnp.asarray(pose, dtype=jnp.float32))
    d_ref = np.asarray(r_xla.render_depth(cam))

    import midastouch_tpu.render.raycast_pallas as rp
    from midastouch_tpu.render import digit as digit_mod

    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
        rp.raycast_min_t._clear_cache()
        digit_mod.raycast_depth._clear_cache()
        r_pl = DigitRenderer(CFG, mesh, backend="pallas")
        d_pl = np.asarray(r_pl.render_depth(cam))
    finally:
        pl.pallas_call = orig
        rp.raycast_min_t._clear_cache()
        digit_mod.raycast_depth._clear_cache()
    np.testing.assert_allclose(d_pl, d_ref, atol=1e-6)
    # sanity: geometry in view (some rays shorter than the far background)
    cam_press = r_xla.add_press(cam, 0.001)
    d2 = np.asarray(r_xla.render_depth(cam_press))
    assert d2.min() < CFG.cam_dist - 1e-5


@pytest.mark.slow
def test_cull_budget_on_large_and_decimated_meshes():
    """Depth from the 1024-face cull must match a full-face render on a
    dense (>80k faces) mesh AND on a coarse decimated one, where large
    triangles have far centroids (the radius-aware cull's reason to
    exist). Round-1 weakness: cull only ever tested on small spheres."""
    from midastouch_tpu.geometry.mesh import decimate
    from midastouch_tpu.geometry import procedural
    from midastouch_tpu.render.digit import DigitRenderer, RenderConfig

    dense = procedural.potato(subdivisions=6)  # ~80k faces
    assert len(dense.faces) >= 50_000
    coarse = decimate(dense, 900)
    assert len(coarse.faces) <= 1100

    cfg_small = RenderConfig(width=60, height=80, max_faces=1024, ray_chunk=4800)
    for mesh in (dense, coarse):
        r_cull = DigitRenderer(cfg_small, mesh)
        full = RenderConfig(
            width=60, height=80, max_faces=len(mesh.faces), ray_chunk=4800
        )
        r_full = DigitRenderer(full, mesh)
        pose = r_cull.update_pose_given_point(mesh.vertices[0])
        cam = r_cull.add_press(
            r_cull.gel2cam(jnp.asarray(pose, jnp.float32)), 0.001
        )
        d_cull = np.asarray(r_cull.render_depth(cam))
        d_full = np.asarray(r_full.render_depth(cam))
        assert (d_full < cfg_small.cam_dist - 2e-4).any()
        # contact region (meaningful penetration): bit-exact; FOV fringe
        # (grazing faces beyond the 1024 nearest): below one heightmap px
        contact = d_full < cfg_small.cam_dist - 2e-4
        err = np.abs(d_cull - d_full)
        assert err[contact].max() < 1e-6, (
            f"contact-region cull error on {len(mesh.faces)} faces: "
            f"{err[contact].max():.2e}"
        )
        assert err.max() < cfg_small.pixmm / 1000.0, (
            f"cull fringe error exceeds 1 px on {len(mesh.faces)} faces: "
            f"{err.max():.2e}"
        )


def test_randomized_lighting_and_backgrounds_change_rgb_not_geometry():
    """randomize=True must vary the RGB (lights/backgrounds) while leaving
    heightmap + mask deterministic functions of the pose (reference
    digit_renderer.py:45-47,160-161 randomizes only appearance)."""
    from midastouch_tpu.geometry import procedural
    from midastouch_tpu.render.digit import DigitRenderer, RenderConfig

    mesh = procedural.icosphere(radius=0.04, subdivisions=3)
    cfg = RenderConfig(width=60, height=80, max_faces=512, ray_chunk=4800)
    r = DigitRenderer(cfg, mesh, randomize=True, seed=0)
    assert r.backgrounds.shape[0] == 30
    pose = r.update_pose_given_point(mesh.vertices[0])
    hms, masks, rgbs, _, _ = r.render_sensor_poses(
        np.tile(np.asarray(pose)[None], (6, 1, 1))
    )
    # same pose, same press window -> geometry close; appearance varies
    rgb_spread = np.abs(rgbs - rgbs[0]).max(axis=(1, 2, 3))
    assert (rgb_spread[1:] > 0.02).all(), "lighting randomization inert"
    assert masks.std(axis=0).mean() < 0.25


@pytest.mark.slow
def test_megalith_327k_faces_cull_and_tessellation():
    """High-poly robustness (stand-in for YCB nontextured.stl scans,
    reference filter.py:70-81): `megalith` is boulder's exact displacement
    field at icosphere subdivision 7 (327k faces). Checks (a) the
    density-aware cull budget auto-raises, (b) the culled render equals a
    full-face render in the contact region, (c) the surface agrees with
    the subdivision-5 boulder up to tessellation chord error."""
    from midastouch_tpu.geometry import procedural
    from midastouch_tpu.render.digit import DigitRenderer, RenderConfig

    meg = procedural.get_test_mesh("megalith")
    assert len(meg.faces) >= 300_000
    bld = procedural.get_test_mesh("boulder")

    cfg = RenderConfig(width=40, height=52, max_faces=1024, ray_chunk=2080)
    r_meg = DigitRenderer(cfg, meg)
    r_bld = DigitRenderer(cfg, bld)
    # (a) 1024 nearest faces provably miss in-contact geometry at this
    # density; the budget must have been raised
    assert r_meg.max_faces_eff > cfg.max_faces

    pose = r_bld.update_pose_given_point(bld.vertices[100])
    cam = r_bld.add_press(r_bld.gel2cam(jnp.asarray(pose, jnp.float32)), 0.001)

    d_cull = np.asarray(r_meg.render_depth(cam))
    r_full = DigitRenderer(
        RenderConfig(width=40, height=52, max_faces=len(meg.faces),
                     ray_chunk=2080),
        meg,
    )
    d_full = np.asarray(r_full.render_depth(cam))
    contact = d_full < cfg.cam_dist - 2e-4
    assert contact.any()
    # (b) cull-vs-full: exact where it matters
    assert np.abs(d_cull - d_full)[contact].max() < 1e-6

    # (c) same surface as boulder up to sub-5 chord error (~0.25 mm on the
    # smallest bumps)
    d_b = np.asarray(r_bld.render_depth(cam))
    err = np.abs(d_full - d_b)[contact]
    assert np.median(err) < 3e-4, f"median tess err {np.median(err):.2e} m"
