"""Per-stage timing of the fused filter update at production scale.

Each stage is timed as a 50-iteration lax.scan window (same discipline as
bench.py: the tunnel's per-dispatch latency would swamp per-op timers), so
numbers are directly comparable to the full-update window.
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
from midastouch_tpu.ops import knn, resample, se3

N = int(os.environ.get("PROF_N", 50_000))
M = int(os.environ.get("PROF_M", 50_000))
E, ITERS = 256, int(os.environ.get("PROF_ITERS", 50))


STAGES: dict = {}


def window(name, body, *args):
    """Time ITERS iterations of body as one scan program (median of 3)."""
    def f(carry, _):
        return body(carry), None

    jf = jax.jit(lambda c: jax.lax.scan(f, c, None, length=ITERS)[0])
    c = jf(args if len(args) > 1 else args[0])  # compile + warm
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = jf(args if len(args) > 1 else args[0])
        jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / ITERS * 1e3
    print(f"{name:36s} {ms:8.3f} ms/iter", flush=True)
    STAGES[name] = round(ms, 4)
    return ms


def main():
    rng = np.random.default_rng(0)
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)
    with jax.default_device(jax.devices("cpu")[0]):
        poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
        cam = poses.copy(); cam[:, :3, 3] += cam[:, :3, 2] * 0.022
        emb = rng.normal(size=(M, E)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        cb = Codebook.from_poses(poses, cam, emb)
    cb = jax.device_put(cb, jax.devices()[0])
    pf = ParticleFilter(
        params=FilterParams(init_trans_noise=mesh.scale / 3.0),
        mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)),
        mesh_scale=mesh.scale)
    step = FilterStep(pf, cb, floor=1000)
    key = jax.random.PRNGKey(0)
    state = step.initialize(key, jnp.asarray(poses[0], np.float32), N)
    code = jnp.asarray(emb[0])
    oq = jnp.array([1.0, 0, 0, 0]); ot = jnp.array([5e-4, 0.0, 0.0])
    gt = jnp.asarray(poses[0], np.float32)

    verts = pf.mesh_vertices
    keys6 = se3.se3_key_cm(state.q, state.t).T

    # stages: each body maps its carry to a same-shaped carry that DEPENDS
    # on the stage output (so scan cannot hoist the work out of the loop)
    def nn_body(k):
        idx = knn.nn_search(k, cb.keys)[1]
        return k + 0.0 * idx.astype(jnp.float32)[:, None]

    def key_body(q):
        return q + 0.0 * se3.se3_key_cm(q, state.t)[:4]

    def sim_body(c):
        sims = cb.similarity(c)
        return c + 0.0 * sims[:E]

    def simgather_body(k):
        idx = knn.nn_search(k, cb.keys)[1]
        w = cb.similarity(code)[idx]
        return k + 0.0 * w[:, None]

    ann = cb.build_ann_index(kind="windowed")
    step_ann = FilterStep(pf, cb.astype_embeddings(jnp.bfloat16), floor=1000,
                          ann_index=ann, ann_window=2048, ann_probes=2)

    def ann_body(k):
        idx = cb.se3_nn_idx_cm(
            state.q, state.t, ann_index=ann,
        )
        return k + 0.0 * idx.astype(jnp.float32)[:, None]

    window("exact NN (50k q x 50k keys)", nn_body, keys6)
    window("windowed ANN", ann_body, keys6)
    window("se3_key (quat log)", key_body, state.q)
    window("similarity matvec", sim_body, code)
    window("NN + matvec + scalar gather", simgather_body, keys6)
    window("min_distance drift prune",
           lambda t: t + 0.0 * knn.min_distance(t, verts)[:, None],
           state.t_rows)
    window("motion model",
           lambda s: pf.motion_model(jax.random.PRNGKey(1), s, oq, ot), state)
    window("annealing (argsort)",
           lambda s: pf.annealing(s, jnp.float32(1.0)), state)
    window("systematic resample + gathers",
           lambda s: pf.resampler(jax.random.PRNGKey(2), s), state)
    window("cluster centers (one-hot matmuls)",
           lambda s: s._replace(weights=s.weights + 0.0 * pf.get_cluster_centers(s)[1][0, 0]),
           state)
    window("rmse", lambda s: s._replace(weights=s.weights + 0.0 * pf.rmse(s, gt)[0]),
           state)

    def full(s):
        s, _ = step._update_impl(cb, s, jax.random.PRNGKey(3), code, oq, ot,
                                 gt, jnp.bool_(False), jnp.bool_(True))
        return s
    window("FULL update (no cluster)", full, state)

    cb16 = step_ann.codebook

    def full_ann(s):
        s, _ = step_ann._update_impl(
            cb16, s, jax.random.PRNGKey(3), code, oq, ot,
            gt, jnp.bool_(False), jnp.bool_(True))
        return s
    window("FULL update (windowed ANN, bf16)", full_ann, state)

    def full_ann_cluster(s):
        s, _ = step_ann._update_impl(
            cb16, s, jax.random.PRNGKey(3), code, oq, ot,
            gt, jnp.bool_(True), jnp.bool_(True))
        return s
    window("FULL update (ANN + cluster every)", full_ann_cluster, state)

    out = os.environ.get("PROF_OUT", f"PROFILE_{N//1000}k.json")
    with open(out, "w") as fh:
        import json

        json.dump({"particles": N, "codebook": M, "iters": ITERS,
                   "stages_ms_per_iter": STAGES}, fh, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
