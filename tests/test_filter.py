"""Particle filter core tests: unit behavior + synthetic end-to-end localization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter import FilterParams, ParticleFilter, ParticleState
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.ops import se3

BACKEND = "xla"


def _make_pf(mesh, **kw):
    defaults = dict(
        sig_r_deg=0.5,
        sig_t=2e-4,
        init_trans_noise=mesh.scale / 3.0,
        init_rot_noise_deg=60.0,
        pen_max=0.002,
        cluster_subsample=256,
        backend=BACKEND,
    )
    defaults.update(kw)
    return ParticleFilter(
        params=FilterParams(**defaults),
        mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)),
        mesh_scale=mesh.scale,
    )


def test_init_filter_statistics():
    mesh = procedural.icosphere(radius=0.04, subdivisions=2)
    pf = _make_pf(mesh)
    gt = jnp.eye(4)
    state = pf.init_filter(jax.random.PRNGKey(0), gt, 20000)
    t = np.asarray(state.t_rows)
    np.testing.assert_allclose(t.std(axis=0), mesh.scale / 3.0, rtol=0.05)
    assert int(state.n_active) == 20000
    # quaternions unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.q_rows), axis=1), 1.0, atol=1e-5
    )


def test_motion_model_statistics():
    mesh = procedural.icosphere(radius=0.04, subdivisions=2)
    pf = _make_pf(mesh, sig_r_deg=1.0, sig_t=1e-3)
    n = 20000
    state = ParticleState.create(
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)), jnp.zeros((n, 3))
    )
    odom_t = jnp.array([0.01, 0.0, 0.0])
    odom_q = jnp.array([1.0, 0, 0, 0])
    out = pf.motion_model(jax.random.PRNGKey(1), state, odom_q, odom_t)
    t = np.asarray(out.t_rows)
    np.testing.assert_allclose(t.mean(axis=0), [0.01, 0, 0], atol=1e-4)
    np.testing.assert_allclose(t.std(axis=0), 1e-3, rtol=0.1)
    # rotation noise ~1 deg
    ang = np.asarray(se3.rotation_angle_deg(se3.quat_to_matrix(out.q_rows)))
    assert 0.5 < np.median(ang) < 3.0


def test_motion_model_deterministic_compose():
    mesh = procedural.icosphere(radius=0.04, subdivisions=1)
    pf = _make_pf(mesh, sig_r_deg=0.0, sig_t=0.0)
    q0 = se3.quat_from_axis_angle(jnp.array([[0.0, 0, 1]]), jnp.array([0.3]))
    state = ParticleState.create(q0, jnp.array([[0.01, 0.02, 0.0]]))
    T0 = np.asarray(state.poses_matrix()[0])
    odom = np.asarray(
        se3.make_tf(
            np.asarray(se3.so3_exp(jnp.array([0.1, -0.2, 0.05]))),
            np.array([0.003, -0.001, 0.002], dtype=np.float32),
        )
    )
    out = pf.motion_model(
        jax.random.PRNGKey(0),
        state,
        se3.matrix_to_quat(jnp.asarray(odom[:3, :3])),
        jnp.asarray(odom[:3, 3]),
    )
    np.testing.assert_allclose(
        np.asarray(out.poses_matrix()[0]), T0 @ odom, atol=1e-5
    )


def test_remove_invalid_particles():
    mesh = procedural.icosphere(radius=0.04, subdivisions=3)
    pf = _make_pf(mesh)
    # half on surface, half far away
    on = mesh.vertices[:50]
    off = on + 0.05
    t = jnp.asarray(np.concatenate([on, off]))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (100, 1))
    state = ParticleState.create(q, t)
    out, drifted = pf.remove_invalid_particles(state)
    w = np.asarray(out.weights)
    assert np.all(w[:50] == 1) and np.all(w[50:] == 0)
    assert not bool(drifted)
    # all far -> drifted
    state2 = ParticleState.create(q, jnp.asarray(np.tile(off, (2, 1))))
    _, drifted2 = pf.remove_invalid_particles(state2)
    assert bool(drifted2)


def test_similarity_softmax():
    mesh = procedural.icosphere(radius=0.04, subdivisions=1)
    pf = _make_pf(mesh)
    code = jnp.array([1.0, 0.0, 0.0, 0.0])
    nn_codes = jnp.array(
        [[1.0, 0, 0, 0], [0.0, 1, 0, 0], [0.7, 0.7, 0, 0], [-1.0, 0, 0, 0]]
    )
    alive = jnp.array([True, True, True, False])
    w = np.asarray(pf.get_similarity(code, nn_codes, alive))
    assert w[3] == 0.0  # dead particle gets no mass
    assert w[0] > w[2] > w[1]
    np.testing.assert_allclose(w[:3].sum(), 1.0, atol=1e-5)
    # degenerate (all equal) -> raw weights, no softmax
    same = jnp.tile(code, (4, 1))
    w2 = np.asarray(pf.get_similarity(code, same, jnp.ones(4, bool)))
    np.testing.assert_allclose(w2, 1.0, atol=1e-5)


def test_cluster_and_centers():
    mesh = procedural.icosphere(radius=0.04, subdivisions=1)
    pf = _make_pf(mesh, cluster_subsample=256, max_clusters=4)
    n = 512
    rng = np.random.default_rng(0)
    a = rng.normal(size=(n // 2, 3)) * 0.001
    b = rng.normal(size=(n // 2, 3)) * 0.001 + np.array([0.1, 0, 0])
    t = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    state = ParticleState.create(q, t)
    state = pf.cluster_particles(state)
    labels = np.asarray(state.labels)
    assert len(np.unique(labels)) == 2
    poses, stds, valid = pf.get_cluster_centers(state)
    poses, stds, valid = map(np.asarray, (poses, stds, valid))
    assert valid.sum() == 2
    centers = poses[valid][:, :3, 3]
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0], [0, 0, 0], atol=2e-4)
    np.testing.assert_allclose(centers[1], [0.1, 0, 0], atol=2e-4)
    assert np.all(stds[valid] < 0.002)


def test_annealing_shrink_grow():
    mesh = procedural.icosphere(radius=0.04, subdivisions=1)
    pf = _make_pf(mesh)
    n = 1000
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    state = ParticleState.create(q, jnp.zeros((n, 3)))
    # first call: records var, no change
    state = pf.annealing(state, jnp.asarray(1.0), floor=100)
    assert int(state.n_active) == n
    # shrinking variance: population decreases
    state2 = pf.annealing(state, jnp.asarray(0.5), floor=100)
    assert int(state2.n_active) < n
    removed = n - int(state2.n_active)
    assert removed <= n // 3
    # zeroed exactly `removed` weights
    assert int((np.asarray(state2.weights)[: n] == 0).sum()) == removed
    # growing variance: population increases but never beyond init_count
    state3 = pf.annealing(state2, jnp.asarray(2.0), floor=100)
    assert int(state2.n_active) <= int(state3.n_active) <= n
    # converged var==0: no change
    state4 = pf.annealing(state3, jnp.asarray(0.0), floor=100)
    assert int(state4.n_active) == int(state3.n_active)


def test_resampler_concentrates_on_high_weight():
    mesh = procedural.icosphere(radius=0.04, subdivisions=1)
    pf = _make_pf(mesh)
    n = 1000
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    t = jnp.asarray(np.arange(n * 3, dtype=np.float32).reshape(n, 3))
    state = ParticleState.create(q, t)
    w = jnp.zeros(n).at[7].set(1.0)
    state = state._replace(weights=w)
    out = pf.resampler(jax.random.PRNGKey(0), state)
    np.testing.assert_allclose(
        np.asarray(out.t_rows), np.tile(np.asarray(t[7]), (n, 1)), atol=0
    )
    # degenerate weights -> unchanged
    state0 = state._replace(weights=jnp.zeros(n))
    out0 = pf.resampler(jax.random.PRNGKey(0), state0)
    np.testing.assert_array_equal(np.asarray(out0.t_rows), np.asarray(t))


def _smooth_embedding(keys: np.ndarray, dim: int = 32, seed: int = 3):
    """Deterministic smooth pose->embedding map (random Fourier features):
    nearby poses get similar codes — a stand-in for the trained TCN."""
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(keys.shape[1], dim)) * 150.0
    feats = np.concatenate([np.sin(keys @ W), np.cos(keys @ W)], axis=1)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    return feats.astype(np.float32)


@pytest.mark.slow
def test_end_to_end_localization_synthetic():
    """The 'minimum slice' integration test (SURVEY.md section 7.3): full
    sense-update loop on a sphere with a synthetic codebook, no networks.
    The filter must localize: final RMSE far below the mesh scale."""
    rng = np.random.default_rng(0)
    # subdivisions=4: vertex spacing ~1.4 mm so the 2 mm drift gate measured
    # against vertices doesn't cull true on-surface particles
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)
    pf = _make_pf(mesh, cluster_subsample=256, max_clusters=8)

    # codebook: poses on the surface + smooth embeddings
    M = 3000
    cb_poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
    cam = cb_poses.copy()
    cam[:, :3, 3] += cam[:, :3, 2] * 0.022
    keys6 = np.asarray(
        se3.se3_key_from_tf(jnp.asarray(cb_poses.astype(np.float32)))
    )
    emb = _smooth_embedding(keys6)
    cb = Codebook.from_poses(cb_poses, cam, emb)

    # ground-truth trajectory: smooth great-circle slide over the sphere
    # (~1.2 mm/step, like a real sensor slide), z-axis outward + slow spin
    T = 80
    radius = 0.04
    u = np.array([1.0, 0, 0])
    v = np.array([0.0, np.cos(0.4), np.sin(0.4)])
    s = 0.02 * np.arange(T)  # rad along the great circle (~0.8 mm/step)
    pts = radius * (np.cos(s)[:, None] * u + np.sin(s)[:, None] * v)
    normals = pts / radius
    delta = 0.03 * np.arange(T)
    traj = np.asarray(
        se3.pose_from_vertex_normal(
            jnp.asarray(pts.astype(np.float32)),
            jnp.asarray(normals.astype(np.float32)),
            0.0,
            jnp.asarray(delta.astype(np.float32)),
            jax.random.PRNGKey(9),
        )
    )

    # measurement codes: embedding of the closest codebook key (plus noise)
    traj_keys = np.asarray(
        se3.se3_key_from_tf(jnp.asarray(traj.astype(np.float32)))
    )
    codes = _smooth_embedding(traj_keys)

    n_particles = 4096
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = pf.init_filter(k0, jnp.asarray(traj[0], dtype=jnp.float32), n_particles)
    # project to codebook like the reference (filter.py:159-160)
    qn, tn_, _, _, _, _ = cb.se3_nn(state.q_rows, state.t_rows, backend=BACKEND)
    state = state._replace(q=qn.T, t=tn_.T)

    init_rmse = float(pf.rmse(state, jnp.asarray(traj[0], dtype=jnp.float32))[0])

    for i in range(1, T):
        key, km, kr = jax.random.split(key, 3)
        odom = np.linalg.inv(traj[i - 1]) @ traj[i]
        state = pf.motion_model(
            km,
            state,
            se3.matrix_to_quat(jnp.asarray(odom[:3, :3], dtype=jnp.float32)),
            jnp.asarray(odom[:3, 3], dtype=jnp.float32),
        )
        _, _, _, _, nn_codes, _ = cb.se3_nn(
            state.q_rows, state.t_rows, backend=BACKEND
        )
        w = pf.get_similarity(jnp.asarray(codes[i]), nn_codes, state.alive)
        state = state._replace(weights=w)
        state, drifted = pf.remove_invalid_particles(state)
        if bool(drifted):  # re-project like the reference (filter.py:176-179)
            qn, tn_, _, _, _, _ = cb.se3_nn(
                state.q_rows, state.t_rows, backend=BACKEND
            )
            state = state._replace(q=qn.T, t=tn_.T)
        if i % 10 == 1:
            state = pf.cluster_particles(state)
        poses_c, stds, valid = pf.get_cluster_centers(state)
        state = pf.annealing(state, pf.mean_cluster_std(stds, valid), floor=256)
        state = pf.resampler(kr, state)

    final_rmse = float(pf.rmse(state, jnp.asarray(traj[-1], dtype=jnp.float32))[0])
    # started with particles spread over the whole object; must converge
    assert final_rmse < 0.01, f"no convergence: {init_rmse} -> {final_rmse}"
    assert final_rmse < init_rmse * 0.5


@pytest.mark.parametrize("kind", ["bucketed", "windowed"])
@pytest.mark.slow
def test_end_to_end_localization_with_ann(kind):
    """Same synthetic localization but through an approximate codebook NN
    (bucketed gathers / gather-free windowed) — must converge equivalently
    (RMSE-parity gate for the ANN paths)."""
    from midastouch_tpu.filter.step import FilterStep

    rng = np.random.default_rng(0)
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)
    pf = _make_pf(mesh, cluster_subsample=256, max_clusters=8)

    M = 3000
    cb_poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
    cam = cb_poses.copy()
    cam[:, :3, 3] += cam[:, :3, 2] * 0.022
    keys6 = np.asarray(
        se3.se3_key_from_tf(jnp.asarray(cb_poses.astype(np.float32)))
    )
    emb = _smooth_embedding(keys6)
    cb = Codebook.from_poses(cb_poses, cam, emb)
    index = cb.build_ann_index(kind=kind, num_cells=64)
    step = FilterStep(pf, cb, floor=256, ann_index=index)

    T = 60
    radius = 0.04
    u = np.array([1.0, 0, 0])
    v = np.array([0.0, np.cos(0.4), np.sin(0.4)])
    s = 0.02 * np.arange(T)
    pts = radius * (np.cos(s)[:, None] * u + np.sin(s)[:, None] * v)
    normals = pts / radius
    delta = 0.03 * np.arange(T)
    traj = np.asarray(
        se3.pose_from_vertex_normal(
            jnp.asarray(pts.astype(np.float32)),
            jnp.asarray(normals.astype(np.float32)),
            0.0,
            jnp.asarray(delta.astype(np.float32)),
            jax.random.PRNGKey(9),
        )
    )
    codes = _smooth_embedding(
        np.asarray(se3.se3_key_from_tf(jnp.asarray(traj.astype(np.float32))))
    )

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = step.initialize(k0, jnp.asarray(traj[0], dtype=jnp.float32), 4096)
    for i in range(1, T):
        key, kk = jax.random.split(key)
        odom = np.linalg.inv(traj[i - 1]) @ traj[i]
        state, stats = step.update(
            state, kk, jnp.asarray(codes[i]),
            se3.matrix_to_quat(jnp.asarray(odom[:3, :3], dtype=jnp.float32)),
            jnp.asarray(odom[:3, 3], dtype=jnp.float32),
            jnp.asarray(traj[i], dtype=jnp.float32),
            do_cluster=(i % 10 == 1),
        )
    final = float(stats.rmse_t)
    assert final < 0.012, f"ANN path did not converge: {final}"


@pytest.mark.slow
def test_fast_path_parity_on_learned_codebook():
    """VERDICT r2 item 9: the production fast path (windowed ANN + bf16
    embedding table + codebook-NN drift gate) must agree with exact/fp32
    on a REAL learned codebook — learned codes have different similarity
    statistics than the synthetic random-Fourier codes the other e2e gates
    use. Skips until a pipeline run has produced the boulder artifact."""
    import os

    path = os.path.join("data", "codebooks", "boulder", "codebook.npz")
    if not os.path.exists(path):
        pytest.skip("no learned boulder codebook yet (run the pipeline)")

    cb32 = Codebook.load(path)
    cb16 = cb32.astype_embeddings(jnp.bfloat16)
    index = cb16.build_ann_index(kind="windowed")
    rng = np.random.default_rng(0)

    # realistic query states: codebook poses + motion-scale noise
    n = 4096
    sel = rng.choice(len(cb32), n, replace=True)
    q = jnp.asarray(np.asarray(cb32.q)[sel])
    t = jnp.asarray(
        np.asarray(cb32.t)[sel] + rng.normal(0, 2e-3, (n, 3)).astype(np.float32)
    )

    idx_exact = np.asarray(cb32.se3_nn_idx(q, t, backend=BACKEND))
    idx_ann = np.asarray(
        cb16.se3_nn_idx(q, t, backend=BACKEND, ann_index=index,
                        ann_window=2048, ann_probes=2)
    )

    # (a) ANN recall on the learned manifold
    recall = float(np.mean(idx_exact == idx_ann))
    # distance-level agreement for the misses (ties / near-ties are fine)
    keys_q = np.asarray(se3.se3_key(q, t))
    keys_cb = np.asarray(cb32.keys)
    d_exact = np.linalg.norm(keys_q - keys_cb[idx_exact], axis=1)
    d_ann = np.linalg.norm(keys_q - keys_cb[idx_ann], axis=1)
    assert recall > 0.9, f"windowed ANN recall {recall:.3f} on learned codebook"
    assert np.quantile(d_ann - d_exact, 0.99) < 1e-3

    # (b) weight parity: bf16 sims gathered at ANN NN vs fp32 at exact NN
    code = jnp.asarray(np.asarray(cb32.embeddings)[rng.integers(len(cb32))])
    sims32 = np.asarray(cb32.similarity(code)).astype(np.float64)
    sims16 = np.asarray(cb16.similarity(code)).astype(np.float64)
    w32 = jax.nn.softmax(jnp.asarray(sims32[idx_exact]))
    w16 = jax.nn.softmax(jnp.asarray(sims16[idx_ann]))
    cos = float(
        jnp.vdot(w32, w16)
        / jnp.maximum(jnp.linalg.norm(w32) * jnp.linalg.norm(w16), 1e-12)
    )
    assert cos > 0.99, f"softmax weight cosine {cos:.4f}"

    # (c) the drift gate must not prune on-surface particles: threshold from
    # FilterStep's spacing estimate vs actual NN distances of on-surface
    # states (queries ARE codebook poses + 2 mm noise)
    from midastouch_tpu.filter.step import FilterStep

    mesh = procedural.get_test_mesh("boulder")
    pf = _make_pf(mesh)
    step = FilterStep(pf, cb16, ann_index=index)
    nn_t = np.asarray(cb16.t)[idx_ann]
    dist = np.linalg.norm(np.asarray(t) - nn_t, axis=1)
    pruned = float(np.mean(dist > step._drift_thresh))
    assert pruned < 0.02, (
        f"drift gate would prune {100*pruned:.1f}% of on-surface particles "
        f"(thresh {step._drift_thresh*1000:.2f} mm)"
    )


def test_canonical_angle_rotation_equivariance():
    """canonical_angle must shift by exactly the image-plane rotation of
    the content (the invariant the yaw scoring relies on): rotating an
    asymmetric penetration pattern by d moves the angle by d."""
    from midastouch_tpu.ops import image as image_ops

    h, w = 96, 128
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)

    def pattern(rot):
        # asymmetric two-blob pattern rotated by `rot` about the center
        c, s = np.cos(rot), np.sin(rot)
        dx, dy = xs - w / 2, ys - h / 2
        u = c * dx + s * dy
        v = -s * dx + c * dy
        z = 3.0 * np.exp(-((u - 18) ** 2 + v**2) / 60.0)
        z += 1.5 * np.exp(-((u + 12) ** 2 + (v - 6) ** 2) / 120.0)
        return z

    a0 = float(image_ops.canonical_angle(
        jnp.asarray(pattern(0.0)), jnp.ones((h, w), bool)
    ))
    for d in (0.3, -0.6, 1.1):
        ad = float(image_ops.canonical_angle(
            jnp.asarray(pattern(d)), jnp.ones((h, w), bool)
        ))
        err = (ad - a0 - d + np.pi) % (2 * np.pi) - np.pi
        assert abs(err) < 0.05, (d, a0, ad)


@pytest.mark.slow
def test_canonical_angle_yaw_relation_rendered():
    """yaw_sign calibration against the real render chain: rotating the
    GEL pose by yaw d about its z axis (T' = T @ Rz(d)) produces a patch
    whose canonical angle shifts by +d (tpu.yaw_sign = +1; derivation:
    cam' = cam @ Rz(d) since Rz commutes with the gel->cam z-offset, and
    the pixel map u=+x / row=-y makes a camera-frame rotation by -d an
    image-plane rotation by +d)."""
    from midastouch_tpu.apps import common
    from midastouch_tpu.ops import image as image_ops
    from midastouch_tpu.utils.config import compose

    cfg = compose(["expt.obj_model=boulder", "tpu.render_max_faces=512"])
    mesh = procedural.get_test_mesh("boulder")
    renderer = common.make_renderer(cfg, mesh, randomize=False, seed=0)
    rng = np.random.default_rng(4)
    poses = sample_poses_on_mesh(mesh, 6, rng, edges=False, shear_mag_deg=0.0)

    def angle_of(hm, mask):
        hm32, m = image_ops.rectify_tilt(
            jnp.asarray(hm, jnp.float32), jnp.asarray(mask)
        )
        zb, mb = image_ops.depth_band(hm32, m, band_px=0.7 / 0.03)
        return float(image_ops.canonical_angle(zb, mb))

    errs = []
    for T0 in poses[:4]:
        for d in (0.4, -0.7):
            Rz = np.eye(4, dtype=np.float32)
            c, s = np.cos(d), np.sin(d)
            Rz[:2, :2] = [[c, -s], [s, c]]
            _, hma, ma, _, _ = renderer.render(
                jnp.asarray(T0), press_depth=0.0015
            )
            _, hmb, mb_, _, _ = renderer.render(
                jnp.asarray((T0 @ Rz).astype(np.float32)), press_depth=0.0015
            )
            da = angle_of(hmb, mb_) - angle_of(hma, ma)
            errs.append((da - d + np.pi) % (2 * np.pi) - np.pi)
    # most sites must agree with yaw_sign=+1 (a few may flip their skew
    # disambiguation when the patch is near-symmetric)
    errs = np.abs(np.asarray(errs))
    assert np.median(errs) < 0.15, errs


@pytest.mark.slow
def test_yaw_scoring_recovers_rotation():
    """Canonical-yaw measurement scoring (FilterStep yaw_kappa) must make
    the rotation DOF observable: with a codebook whose canon_angle encodes
    each entry's site-frame yaw (the invariant the renderer satisfies,
    test_canonical_angle_yaw_relation_rendered), the filter's rotation
    RMSE must converge far below the yaw-off run."""
    from midastouch_tpu.filter.step import FilterStep

    rng = np.random.default_rng(0)
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)
    pf = _make_pf(mesh, cluster_subsample=256, max_clusters=8)

    M = 3000
    cb_poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
    cam = cb_poses.copy()
    cam[:, :3, 3] += cam[:, :3, 2] * 0.022
    # YAW-BLIND embedding (position-only features): the canonical-patch
    # descriptor quotients out yaw, so similarity carries no rotation
    # information — zeroing the rotation part of the key reproduces that
    keys6 = np.array(
        se3.se3_key_from_tf(jnp.asarray(cb_poses.astype(np.float32)))
    )
    keys6[:, 3:] = 0.0
    emb = _smooth_embedding(keys6)

    def site_yaw(poses):
        """Yaw of each pose about its own surface normal, measured against
        a deterministic site frame: F = pose_from_vertex_normal(site,
        normal, shear=0, delta=0). On a sphere normal = t/r."""
        t = poses[:, :3, 3].astype(np.float32)
        n = t / np.linalg.norm(t, axis=1, keepdims=True)
        F = np.asarray(se3.pose_from_vertex_normal(
            jnp.asarray(t), jnp.asarray(n), 0.0,
            jnp.zeros(len(t), jnp.float32), jax.random.PRNGKey(0),
        ))
        rel = np.linalg.inv(F) @ poses
        q = np.asarray(se3.matrix_to_quat(jnp.asarray(
            rel[:, :3, :3].astype(np.float32))))
        return 2.0 * np.arctan2(q[:, 3], q[:, 0])

    # canon_angle consistent with yaw_sign=+1: angle = site_yaw (any
    # per-site constant offset cancels in live - entry)
    cb_angles = site_yaw(cb_poses).astype(np.float32)
    cb = Codebook.from_poses(cb_poses, cam, emb, canon_angle=cb_angles)

    # great-circle slide trajectory with spinning yaw
    T = 60
    radius = 0.04
    u = np.array([1.0, 0, 0])
    v = np.array([0.0, np.cos(0.4), np.sin(0.4)])
    s = 0.02 * np.arange(T)
    pts = radius * (np.cos(s)[:, None] * u + np.sin(s)[:, None] * v)
    normals = pts / radius
    delta = 0.05 * np.arange(T)
    traj = np.asarray(se3.pose_from_vertex_normal(
        jnp.asarray(pts.astype(np.float32)),
        jnp.asarray(normals.astype(np.float32)),
        0.0, jnp.asarray(delta.astype(np.float32)), jax.random.PRNGKey(9),
    ))
    traj_keys = np.array(
        se3.se3_key_from_tf(jnp.asarray(traj.astype(np.float32)))
    )
    traj_keys[:, 3:] = 0.0
    codes = _smooth_embedding(traj_keys)
    live_angles = site_yaw(traj).astype(np.float32)

    odom = np.linalg.inv(traj[:-1]) @ traj[1:]
    oq = jnp.asarray(np.asarray(se3.matrix_to_quat(
        jnp.asarray(odom[:, :3, :3].astype(np.float32)))))
    ot = jnp.asarray(odom[:, :3, 3].astype(np.float32))
    gts = jnp.asarray(traj[1:].astype(np.float32))

    finals = {}
    for kappa in (0.0, 3.0):
        step = FilterStep(pf, cb, floor=256, yaw_kappa=kappa, yaw_sign=1.0)
        key = jax.random.PRNGKey(1)
        key, k0, kr = jax.random.split(key, 3)
        state = step.initialize(k0, jnp.asarray(traj[0], jnp.float32), 4096)
        final, seq = step.replay(
            state, kr, oq, ot, gts, codes=jnp.asarray(codes[1:]),
            angles=jnp.asarray(live_angles[1:]) if kappa > 0 else None,
            cluster_every=10,
        )
        rmse_r = np.asarray(seq[1])
        finals[kappa] = float(rmse_r[-5:].mean())

    # yaw-on must observe the rotation DOF the embedding quotients out
    assert finals[3.0] < 35.0, finals
    assert finals[3.0] < 0.6 * finals[0.0], finals
