"""Full-pipeline integration: generate data -> build codebook -> filter.

Small procedural-sphere configuration, GT-heightmap sensing path (the TDN
is untrained in CI), asserting the pipeline runs end to end and produces
the reference-format stats."""

import os

import numpy as np
import pytest

from midastouch_tpu.utils import misc
from midastouch_tpu.utils.config import compose

pytestmark = pytest.mark.slow  # sequential integration pipeline (shared workspace)

OVERRIDES = [
    "expt=test",
    "expt.obj_model=sphere",
    "expt.codebook_size=300",
    "expt.params.num_particles=512",
    "expt.use_gt_heightmaps=true",
    "expt.render=false",
    "datagen.num_frames=25",
    "tdn.render.width=60",
    "tdn.render.height=80",
    "tcn.model.grid_size=16",
    "tcn.model.num_points=512",
    "tcn.model.batch_size=64",
    "tcn.model.planes=[8,16,16]",
    "tcn.model.feature_size=32",
    "tcn.model.output_dim=32",
    "tpu.backend=xla",
    "tpu.render_max_faces=512",
    "tpu.cluster_max_points=256",
]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    old = dict(misc.DIRS)
    misc.DIRS.update(
        {
            "data": str(root / "data"),
            "weights": str(root / "data" / "weights"),
            "trees": str(root / "data" / "codebooks"),
            "obj_models": str(root / "data" / "obj_models"),
        }
    )
    yield root
    misc.DIRS.update(old)


@pytest.fixture(scope="module")
def cfg():
    # procedural sphere needs a denser mesh than default for the drift gate
    return compose(OVERRIDES)


def test_generate_data(workspace, cfg):
    from midastouch_tpu.apps.generate_data import touch_simulator

    out = touch_simulator(cfg, seed=0)
    assert os.path.exists(os.path.join(out, "tactile_data.npz"))
    from midastouch_tpu.utils import dataio

    cam, gel, meas = dataio.load_poses(out)
    assert cam.shape == (25, 4, 4)
    imgs = dataio.load_images(out)
    assert imgs.shape == (25, 80, 60, 3)
    hms = dataio.load_heightmaps(out)
    masks = dataio.load_masks(out)
    assert hms.shape == (25, 80, 60) and masks.dtype == bool
    # trajectory is smooth: consecutive gel positions close
    d = np.linalg.norm(np.diff(gel[:, :3, 3], axis=0), axis=1)
    assert d.max() < 0.002
    # most frames make contact
    assert sum(m.any() for m in masks) > 15


def test_build_codebook(workspace, cfg):
    from midastouch_tpu.apps.build_codebook import build_codebook

    cb = build_codebook(cfg, use_gt_heightmaps=True, seed=1)
    assert len(cb) == 300
    assert os.path.exists(
        os.path.join(misc.DIRS["trees"], "sphere", "codebook.npz")
    )
    emb = np.asarray(cb.embeddings)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # embeddings vary across poses (net untrained but geometry differs)
    assert np.std(emb) > 1e-4


def test_run_filter(workspace, cfg):
    from midastouch_tpu.apps.filter import run_filter

    cwd = os.getcwd()
    os.chdir(workspace)
    try:
        stats = run_filter(cfg, viz=None, realtime=False)
    finally:
        os.chdir(cwd)
    assert len(stats["rmse_t"]) == 25
    assert np.all(np.isfinite(stats["rmse_t"]))
    assert stats["tree_size"] == 300
    assert all(n > 0 for n in stats["num_particles"])
    # stats file written in reference format
    out_root = os.path.join(workspace, "output", "sphere", "00", "trial_00")
    assert os.path.exists(os.path.join(out_root, "filter_stats.npy"))


def test_relative_odom_skip_repeat(workspace, cfg):
    """Realtime odometry must compose across the ACTUALLY elapsed interval
    (reference filter.py:154) — identity on frame repeats, composed
    displacement on skips. Round-1 regression: the app indexed a
    precomputed adjacent-frame table, re-applying stale 1-frame odometry
    on repeats and dropping displacement on skips."""
    import jax.numpy as jnp

    from midastouch_tpu.apps.filter import _relative_odom
    from midastouch_tpu.ops import se3
    from midastouch_tpu.utils import dataio

    _, _, meas = dataio.load_poses(dataio.dataset_path("sphere", 0))
    meas_j = jnp.asarray(meas)

    # repeat (idx == prev_idx) -> exactly identity odometry
    q, t = _relative_odom(meas_j, 4, 4)
    np.testing.assert_allclose(np.abs(np.asarray(q)), [1, 0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)

    # skip (2 -> 5) == the full relative transform, which equals the chain
    # of adjacent-frame odometries — NOT the single adjacent entry at 5
    q_s, t_s = _relative_odom(meas_j, 2, 5)
    rel = np.asarray(se3.tf_inverse(meas_j[2]) @ meas_j[5])
    np.testing.assert_allclose(np.asarray(se3.quat_to_matrix(q_s)), rel[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_s), rel[:3, 3], atol=1e-6)
    adj5 = np.asarray(se3.tf_inverse(meas_j[4]) @ meas_j[5])
    assert not np.allclose(np.asarray(t_s), adj5[:3, 3], atol=1e-6)


def test_filter_frame_skip_repeat_parity(workspace, cfg):
    """Replaying with forced skips/repeats must stay consistent with the
    sequential replay: repeats are odometry no-ops and skips keep the
    skipped displacement, so the final RMSE matches the sequential run's
    scale instead of drifting (round-1 realtime odometry bug)."""
    from midastouch_tpu.apps.filter import run_filter

    cwd = os.getcwd()
    os.chdir(workspace)
    try:
        seq = run_filter(cfg, viz=None, realtime=False,
                         frame_schedule=list(range(25)))
        # heavy repeats early (old bug: same displacement re-applied each
        # repeat => systematic drift), then skips of 2-4 frames
        schedule = [0, 1, 1, 1, 1, 1, 1, 1, 1, 3, 5, 7, 9, 12, 15, 18, 21, 24]
        skewed = run_filter(cfg, viz=None, realtime=False,
                            frame_schedule=schedule)
    finally:
        os.chdir(cwd)
    assert np.all(np.isfinite(seq["rmse_t"])) and np.all(np.isfinite(skewed["rmse_t"]))
    # parity: same trajectory covered, so the final error must be on the
    # same scale (the old bug inflated it via repeated odometry injection)
    final_seq, final_skew = seq["rmse_t"][-1], skewed["rmse_t"][-1]
    assert final_skew < max(3.0 * final_seq, seq["rmse_t"][0])


def test_live_demo_synthetic(workspace, cfg):
    """Live-demo loop with the synthetic frame source (needs the codebook
    built by test_build_codebook)."""
    from midastouch_tpu.apps.live_demo import live_demo

    peaks = live_demo(cfg, source="synthetic", max_frames=3)
    assert len(peaks) == 3
    assert all(np.isfinite(p) for p in peaks)


def test_sweep_filter(workspace, cfg):
    from midastouch_tpu.apps.sweep import run_sweep

    cwd = os.getcwd()
    os.chdir(workspace)
    try:
        out = run_sweep("filter", ["sphere"], [0], OVERRIDES)
    finally:
        os.chdir(cwd)
    assert ("sphere", 0) in out
    assert np.isfinite(out[("sphere", 0)]["mean_rmse_t_mm"])


def test_build_codebook_patch_pca(workspace, cfg):
    """PatchPCA codebook: fits its projection on its own renders during the
    build, persists it, and a reloaded TCN reproduces the embeddings."""
    import jax.numpy as jnp

    from midastouch_tpu.apps.build_codebook import build_codebook
    from midastouch_tpu.models.tcn import TCN

    cfg2 = compose(OVERRIDES + [
        "tcn.model.model=PatchPCA",
        "tcn.model.canonical_size=24",
        "tcn.model.canonical_crop_px=48",
        "tcn.model.tcn_weights=patch_pca_sphere.npz",
        "expt.codebook_size=120",
    ])
    cb = build_codebook(cfg2, use_gt_heightmaps=True, seed=2, save=True)
    emb = np.asarray(cb.embeddings)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    wpath = os.path.join(misc.DIRS["weights"], "patch_pca_sphere.npz")
    assert os.path.exists(wpath)

    # reload and re-embed one batch: identical codes through the saved fit
    tcn = TCN(cfg2.tcn, cfg2.tdn.render)
    assert tcn.is_fitted

    # re-embedding from the cached canonical inputs reproduces the codebook
    # (float16 cache: embeddings match to cache precision)
    from midastouch_tpu.apps.build_codebook import reembed_codebook

    cb2 = reembed_codebook(cfg2, save=False)
    np.testing.assert_allclose(
        np.asarray(cb2.embeddings), emb, atol=2e-2
    )
    assert np.mean(np.sum(np.asarray(cb2.embeddings) * emb, axis=1)) > 0.999


def test_sense_batch_and_fused_update_match_per_frame(workspace, cfg):
    """The offline batched pre-sense (FilterStep.sense_batch) and the
    realtime fused single-dispatch frame (FilterStep.sense_update) must be
    numerically equivalent to the split per-frame path they replace.

    Compute dtype is pinned to float32 here: under bf16 the FCRN's batch-1
    and batch-N convolutions legitimately differ at the ULP (~0.5 px on a
    ~100 px heightmap = 15 um, noise against the 0.7 mm canonical band),
    and the untrained test-TDN amplifies that chaotically through the
    canonical-frame estimate; fp32 pins the paths to ~3e-5 px."""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.apps import common
    from midastouch_tpu.codebook import Codebook
    from midastouch_tpu.filter.pf import ParticleFilter
    from midastouch_tpu.filter.step import FilterStep
    from midastouch_tpu.utils import dataio
    from midastouch_tpu.utils.config import compose

    cfg32 = compose(OVERRIDES + ["tpu.compute_dtype=float32"])
    data_path = dataio.dataset_path("sphere", 0)
    images = dataio.load_images(data_path)[:6]
    cam, gel, meas = dataio.load_poses(data_path)
    mesh = common.resolve_mesh("sphere")
    renderer = common.make_renderer(cfg32, mesh)
    tdn, tcn = common.make_nets(cfg32, bg=renderer.get_background("gel"))
    pf = ParticleFilter.from_config(cfg32, mesh)
    cb = Codebook.load(common.codebook_path("sphere"))
    step = FilterStep(pf, cb, tdn=tdn, tcn=tcn, floor=64,
                      **common.ann_kwargs(cfg32, cb))

    key = jax.random.PRNGKey(7)
    # (a) batched == per-frame sensing: codes must agree to fp32 tolerance
    codes_b = np.asarray(step.sense_batch(images, key, batch=4))
    codes_s = np.stack([
        np.asarray(step.sense(images[i], jax.random.fold_in(key, i))[0])
        for i in range(len(images))
    ])
    cos = np.sum(codes_b * codes_s, axis=1)
    assert cos.min() > 1 - 1e-4, f"batched/per-frame code cosine {cos.min()}"

    # (b) fused sense+odom+update == split dispatches (same keys)
    meas_j = jnp.asarray(meas[:6])
    gt = jnp.asarray(gel[1], jnp.float32)
    state0 = step.initialize(jax.random.PRNGKey(0), jnp.asarray(gel[0], jnp.float32), 256)
    kf = jax.random.PRNGKey(3)
    s_fused, st_fused, code_f, _, _ = step.sense_update(
        state0, kf, images[1], meas_j, 0, 1, gt)
    k_sense, k_update = jax.random.split(kf)
    code, _, _, _ = step.sense(images[1], k_sense)
    from midastouch_tpu.apps.filter import _relative_odom
    oq, ot = _relative_odom(meas_j, 0, 1)
    s_split, st_split = step.update(state0, k_update, code, oq, ot, gt)
    np.testing.assert_allclose(np.asarray(code_f), np.asarray(code), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(s_fused.t), np.asarray(s_split.t), atol=1e-5)
    np.testing.assert_allclose(
        float(st_fused.rmse_t), float(st_split.rmse_t), atol=1e-6)


def test_fused_build_inputs_match_unfused_chain(workspace, cfg):
    """The fused codebook-build program (render -> TDN -> mask -> canonical
    inputs, one jit, build_codebook._fused_sensing_inputs) must equal the
    unfused chain (render_sensor_poses -> images2heightmaps ->
    heightmaps2masks -> model_inputs) on identical randomization draws —
    it exists purely to avoid host round-trips, not to change math."""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.apps import common
    from midastouch_tpu.apps.build_codebook import _fused_sensing_inputs
    from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
    from midastouch_tpu.render.digit import (
        DEFAULT_LIGHT_ANGLES, DEFAULT_LIGHT_RGB)

    cfg2 = compose(OVERRIDES + [
        "tcn.model.model=PatchPCA",
        "tcn.model.canonical_size=24",
        "tcn.model.canonical_crop_px=48",
    ])
    mesh = common.resolve_mesh("sphere")
    renderer = common.make_renderer(cfg2, mesh, randomize=True, seed=7)
    tdn, tcn = common.make_nets(cfg2, bg=renderer.get_background("gel"))

    n = 8
    rng = np.random.default_rng(0)
    poses = sample_poses_on_mesh(mesh, n, rng, edges=False)
    press, lights, angles, colors, bg_ids = renderer.sample_render_aux(n)
    if angles is None:
        angles = np.tile(DEFAULT_LIGHT_ANGLES, (n, 1))
        colors = np.tile(DEFAULT_LIGHT_RGB, (n, 1, 1))
        bg_ids = np.zeros(n, np.int32)

    for use_gt in (True, False):
        fused = _fused_sensing_inputs(renderer, tdn, tcn, use_gt)
        inp_f, cam_f = fused(
            tdn.variables, jnp.asarray(poses), jnp.asarray(press),
            jnp.asarray(lights), jnp.asarray(angles), jnp.asarray(colors),
            jnp.asarray(bg_ids),
        )
        rgbs, hms, masks, _press_eff, cams = renderer._render_chunked(
            np.asarray(poses, np.float32), press, lights,
            angles=angles, colors=colors, bg_ids=bg_ids,
        )
        if not use_gt:
            hms = np.asarray(tdn.images2heightmaps(rgbs * 255.0))
            masks = np.asarray(tdn.heightmaps2masks(hms))
        inp_u = tcn.model_inputs(
            jax.random.PRNGKey(0), jnp.asarray(hms, jnp.float32),
            jnp.asarray(masks) > 0,
        )
        np.testing.assert_allclose(np.asarray(cam_f), cams, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(inp_f), np.asarray(inp_u), atol=2e-2,
            err_msg=f"use_gt={use_gt}",
        )
        assert float(np.abs(np.asarray(inp_f) - np.asarray(inp_u)).mean()) < 2e-3
