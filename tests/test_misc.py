"""Config composition, data IO, decimation, and fused-step tests."""

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.utils.config import compose


def test_config_defaults():
    cfg = compose([])
    assert cfg.expt.obj_model == "004_sugar_box"
    assert cfg.expt.params.num_particles == 50000
    assert cfg.tdn.render.pixmm == 0.03
    assert cfg.tcn.model.num_points == 4096


def test_config_group_swap_and_overrides():
    cfg = compose(["expt=mcmaster", "expt.params.num_particles=123",
                   "tpu.backend=xla"])
    assert cfg.expt.obj_model == "cotter-pin"
    assert cfg.expt.params.num_particles == 123
    assert cfg.tpu.backend == "xla"
    # nested leaf parse types
    cfg2 = compose(["expt.params.noise_t.sim=3e-4", "expt.render=false"])
    assert abs(cfg2.expt.params.noise_t.sim - 3e-4) < 1e-12
    assert cfg2.expt.render is False


def test_config_yaml_roundtrip():
    cfg = compose([])
    import yaml

    d = yaml.safe_load(cfg.to_yaml())
    assert d["expt"]["obj_model"] == "004_sugar_box"


def test_dataio_roundtrip(tmp_path, rng):
    from midastouch_tpu.utils import dataio

    n, h, w = 4, 16, 12
    images = (rng.random((n, h, w, 3)) * 255).astype(np.uint8)
    hms = rng.random((n, h, w)).astype(np.float32) * 60
    masks = rng.random((n, h, w)) > 0.5
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    path = str(tmp_path / "ds")
    dataio.save_dataset(path, images, hms, masks, poses, poses, poses,
                        m_noise={"sig_r": 0.5, "sig_t": 2e-4})
    np.testing.assert_array_equal(dataio.load_images(path), images)
    np.testing.assert_allclose(dataio.load_heightmaps(path), hms, atol=0.06)
    np.testing.assert_array_equal(dataio.load_masks(path), masks)
    cam, gel, meas = dataio.load_poses(path)
    np.testing.assert_array_equal(cam, poses)


def test_decimate():
    from midastouch_tpu.geometry import procedural
    from midastouch_tpu.geometry.mesh import decimate

    m = procedural.icosphere(radius=0.04, subdivisions=4)  # 5120 faces
    d = decimate(m, 500)
    assert len(d.faces) <= 700
    # still roughly a sphere
    r = np.linalg.norm(d.vertices, axis=1)
    assert 0.035 < r.mean() < 0.045


def test_fused_step_runs_and_improves():
    """FilterStep.update on CPU: state stays finite, weights respond to a
    matching code."""
    import __graft_entry__ as g

    step, state, (code, odom_q, odom_t, gt_pose), key = g._tiny_setup(
        capacity=512, codebook_size=256
    )
    for i in range(3):
        key, k = jax.random.split(key)
        state, stats = step.update(
            state, k, code, odom_q, odom_t, gt_pose,
            do_cluster=(i == 0), do_measurement=True,
        )
    assert np.isfinite(float(stats.rmse_t))
    assert int(stats.n_active) > 0
    assert np.all(np.isfinite(np.asarray(state.t)))
    # cluster outputs populated
    assert np.asarray(stats.cluster_valid).sum() >= 1


def test_fused_step_measurement_gating():
    import __graft_entry__ as g

    step, state, (code, odom_q, odom_t, gt_pose), key = g._tiny_setup(
        capacity=256, codebook_size=128
    )
    # with do_measurement=False weights must be uniform over alive
    state2, _ = step.update(
        state, key, code, odom_q, odom_t, gt_pose, do_measurement=False
    )
    # after resampling from uniform weights, gathered weights stay uniform
    w = np.asarray(state2.weights)[np.asarray(state2.alive)]
    assert np.allclose(w, w[0])


def test_replay_scan_matches_loop():
    """One-dispatch scan replay == per-frame update loop (same keys)."""
    import __graft_entry__ as g

    step, state0, (code, odom_q, odom_t, gt_pose), key = g._tiny_setup(
        capacity=256, codebook_size=128
    )
    T = 6
    codes = jnp.tile(code[None], (T, 1))
    oq = jnp.tile(odom_q[None], (T, 1))
    ot = jnp.tile(odom_t[None], (T, 1))
    gts = jnp.tile(gt_pose[None], (T, 1, 1))

    # loop path with the same key schedule as replay's scan body
    state = state0
    k = key
    rmses = []
    for i in range(T):
        k, ks, ku = jax.random.split(k, 3)
        state, stats = step.update(
            state, ku, code, odom_q, odom_t, gt_pose,
            do_cluster=(i % 50 == 0), do_measurement=True,
        )
        rmses.append(float(stats.rmse_t))

    final, seq = step.replay(
        state0, key, oq, ot, gts, codes=codes, cluster_every=50
    )
    np.testing.assert_allclose(np.asarray(seq[0]), np.asarray(rmses), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(final.t), np.asarray(state.t), atol=1e-6)


# ----------------------------- runtime ------------------------------------


def test_runtime_setup_force_cpu(monkeypatch, tmp_path):
    """MIDASTOUCH_FORCE_CPU=1 must pin the platform to cpu and setup()
    must install the persistent compilation cache dir (these sit on the
    measurement path every benchmark depends on)."""
    import jax

    from midastouch_tpu.utils import runtime

    monkeypatch.setenv("MIDASTOUCH_FORCE_CPU", "1")
    monkeypatch.setenv("MIDASTOUCH_TPU_JAX_CACHE", str(tmp_path / "cache"))
    runtime.setup()
    assert jax.config.jax_platforms == "cpu"
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
    assert jax.devices()[0].platform == "cpu"


def test_runtime_setup_default_cache_dir(monkeypatch):
    import jax

    from midastouch_tpu.utils import runtime

    monkeypatch.delenv("MIDASTOUCH_TPU_JAX_CACHE", raising=False)
    runtime.setup()
    assert jax.config.jax_compilation_cache_dir.endswith(".jax_cache")


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from midastouch_tpu.utils import runtime

    with runtime.profile_trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # a trace directory with at least one event file appears
    import glob

    assert glob.glob(str(tmp_path / "**" / "*"), recursive=True)
