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
    t = np.asarray(state.t)
    np.testing.assert_allclose(t.std(axis=0), mesh.scale / 3.0, rtol=0.05)
    assert int(state.n_active) == 20000
    # quaternions unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.q), axis=1), 1.0, atol=1e-5
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
    t = np.asarray(out.t)
    np.testing.assert_allclose(t.mean(axis=0), [0.01, 0, 0], atol=1e-4)
    np.testing.assert_allclose(t.std(axis=0), 1e-3, rtol=0.1)
    # rotation noise ~1 deg
    ang = np.asarray(se3.rotation_angle_deg(se3.quat_to_matrix(out.q)))
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
        np.asarray(out.t), np.tile(np.asarray(t[7]), (n, 1)), atol=0
    )
    # degenerate weights -> unchanged
    state0 = state._replace(weights=jnp.zeros(n))
    out0 = pf.resampler(jax.random.PRNGKey(0), state0)
    np.testing.assert_array_equal(np.asarray(out0.t), np.asarray(t))


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
    qn, tn_, _, _, _, _ = cb.se3_nn(state.q, state.t, backend=BACKEND)
    state = state._replace(q=qn, t=tn_)

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
        _, _, _, _, nn_codes, _ = cb.se3_nn(state.q, state.t, backend=BACKEND)
        w = pf.get_similarity(jnp.asarray(codes[i]), nn_codes, state.alive)
        state = state._replace(weights=w)
        state, drifted = pf.remove_invalid_particles(state)
        if bool(drifted):  # re-project like the reference (filter.py:176-179)
            qn, tn_, _, _, _, _ = cb.se3_nn(state.q, state.t, backend=BACKEND)
            state = state._replace(q=qn, t=tn_)
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
