"""Production-scale localization benchmark with a synthetic smooth codebook.

Separates the inference engine from learned-embedding quality: embeddings
are a deterministic smooth function of pose (random Fourier features), so
codes are informative by construction; the filter must then localize a
50k-entry codebook / 50k-particle problem on device. Reports RMSE
trajectory + steps/s from the one-program scan replay.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from midastouch_tpu.utils import runtime
runtime.setup()
import jax, jax.numpy as jnp
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter.pf import FilterParams, ParticleFilter
from midastouch_tpu.filter.step import FilterStep
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.ops import se3

def smooth_embedding(keys, dim=128, seed=3):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(keys.shape[1], dim)) * 150.0
    f = np.concatenate([np.sin(keys @ W), np.cos(keys @ W)], axis=1)
    return (f / np.linalg.norm(f, axis=1, keepdims=True)).astype(np.float32)

def main():
    rng = np.random.default_rng(0)
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)
    M = int(os.environ.get("BENCH_M", 50000))
    N = int(os.environ.get("BENCH_N", 50000))
    T = int(os.environ.get("BENCH_T", 200))
    with jax.default_device(jax.devices("cpu")[0]):
        poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
        cam = poses.copy(); cam[:, :3, 3] += cam[:, :3, 2] * 0.022
        keys6 = np.asarray(se3.se3_key_from_tf(jnp.asarray(poses.astype(np.float32))))
        cb = Codebook.from_poses(poses, cam, smooth_embedding(keys6))
    cb = jax.device_put(cb, jax.devices()[0])

    pf = ParticleFilter(
        params=FilterParams(init_trans_noise=mesh.scale / 3.0, cluster_subsample=1024),
        mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)), mesh_scale=mesh.scale)
    # production-default fast path: windowed ANN + bf16 embeddings +
    # codebook-NN drift gate (this run IS the accuracy gate for them)
    ann_index = cb.build_ann_index(kind="windowed")
    cb_fast = cb.astype_embeddings(jnp.bfloat16)
    step = FilterStep(pf, cb_fast, floor=1000, ann_index=ann_index,
                      ann_window=2048, ann_probes=2, drift_from_codebook=True)

    # smooth great-circle slide, ~0.8 mm/frame
    u = np.array([1.0, 0, 0]); v = np.array([0.0, np.cos(0.4), np.sin(0.4)])
    s = 0.02 * np.arange(T)
    pts = 0.04 * (np.cos(s)[:, None] * u + np.sin(s)[:, None] * v)
    with jax.default_device(jax.devices("cpu")[0]):
        traj = np.asarray(se3.pose_from_vertex_normal(
            jnp.asarray(pts.astype(np.float32)), jnp.asarray((pts / 0.04).astype(np.float32)),
            0.0, jnp.asarray((0.03 * np.arange(T)).astype(np.float32)), jax.random.PRNGKey(9)))
        traj_keys = np.asarray(se3.se3_key_from_tf(jnp.asarray(traj.astype(np.float32))))
        codes = jnp.asarray(smooth_embedding(traj_keys))
        odom = np.linalg.inv(traj[:-1]) @ traj[1:]
        oq = jnp.asarray(np.concatenate([[[1, 0, 0, 0]], np.asarray(
            se3.matrix_to_quat(jnp.asarray(odom[:, :3, :3])))])[1:], dtype=jnp.float32)
        ot = jnp.asarray(odom[:, :3, 3], dtype=jnp.float32)
    gts = jnp.asarray(traj[1:], dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    key, k0, kr = jax.random.split(key, 3)
    state = step.initialize(k0, jnp.asarray(traj[0], dtype=jnp.float32), N)
    t0 = time.perf_counter()
    final, seq = step.replay(state, kr, oq, ot, gts, codes=codes[1:], cluster_every=50)
    jax.block_until_ready(final.t)
    wall = time.perf_counter() - t0
    rmse_t = np.asarray(seq[0]) * 1000
    print(f"frames {T-1}, wall {wall:.2f}s ({(T-1)/wall:.1f} steps/s incl. compile)")
    for i in (0, 24, 49, 99, 149, T - 2):
        print(f"  step {i:3d}: rmse_t {rmse_t[i]:7.2f} mm")
    print(f"converged: init {rmse_t[0]:.1f} mm -> final {rmse_t[-1]:.2f} mm")
    return rmse_t

if __name__ == "__main__":
    main()
