"""ANN recall gate: measure windowed-ANN recall + e2e RMSE parity per
(window, probes) knob setting.

Round-4 measured throughput headroom in the ANN knobs (2048x2 = 239.7
steps/s default vs 1024x1 = 281, RESULTS.md §1a) but never ran the recall
gate that would justify flipping the default. This is that gate:

  1. RECALL — filter-realistic queries (codebook poses + press-scale
     translation noise, the same distribution FilterStep's drift
     calibration uses) through the windowed ANN vs exact NN: fraction of
     queries whose ANN pick IS the exact NN, plus the xyz-distance
     inflation of the misses (rank-agnostic quality: a "miss" that lands
     0.1 mm farther is harmless to a 2 mm-noise filter).
  2. E2E — the synthetic-smooth-code localization harness
     (scripts/bench_localization.py world, 50k x 50k, 200 frames) run at
     each knob + exact: final RMSE parity within the run-to-run noise,
     plus steps/s.

Writes ANN_RECALL.json. Run: python scripts/ann_recall_gate.py [obj=boulder]
(uses the object's learned codebook for recall when present, else the
synthetic codebook for both halves).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from midastouch_tpu.utils import runtime

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from midastouch_tpu.apps import common  # noqa: E402
from midastouch_tpu.codebook import Codebook  # noqa: E402
from midastouch_tpu.filter.pf import FilterParams, ParticleFilter  # noqa: E402
from midastouch_tpu.filter.step import FilterStep  # noqa: E402
from midastouch_tpu.geometry import procedural  # noqa: E402
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh  # noqa: E402
from midastouch_tpu.ops import se3  # noqa: E402

# (kind, window-or-block, probes). windowed = sorted contiguous bands
# (round-4 default); blocked = whole-slab gathers (round-5 candidate).
KNOBS = (
    ("windowed", 2048, 2), ("windowed", 1024, 2), ("windowed", 1024, 1),
    ("blocked", 2048, 2), ("blocked", 2048, 3),
    ("blocked", 1024, 4), ("blocked", 1024, 6),
)


def _build_index(cb: Codebook, kind: str, size: int):
    if kind == "blocked":
        return cb.build_ann_index(kind="blocked", block=size, probes=6)
    return cb.build_ann_index(kind="windowed")


def measure_recall(cb: Codebook, n_queries: int = 50000, seed: int = 0):
    rng = np.random.default_rng(seed)
    sel = rng.integers(0, len(cb), n_queries)
    q = cb.q[sel]
    t = cb.t[sel] + jnp.asarray(
        rng.normal(0, 2e-3, (n_queries, 3)).astype(np.float32)
    )
    keys = se3.se3_key(q, t)
    exact = np.asarray(jax.jit(cb.nn_from_keys)(keys))
    t_np, out = np.asarray(cb.t), []
    d_exact = np.linalg.norm(np.asarray(t) - t_np[exact], axis=1)
    indexes = {
        (kind, size): _build_index(cb, kind, size)
        for kind, size, _ in KNOBS
    }
    for kind, window, probes in KNOBS:
        idxr = indexes[(kind, window)]
        approx = np.asarray(jax.jit(
            lambda k, i=idxr, w=window, p=probes: cb.nn_from_keys(
                k, ann_index=i, ann_window=w, ann_probes=p
            )
        )(keys))
        hit = exact == approx
        infl = np.linalg.norm(np.asarray(t) - t_np[approx], axis=1) - d_exact
        r = {
            "kind": kind, "window": window, "probes": probes,
            "recall_exact_id": round(float(hit.mean()), 4),
            "miss_xyz_inflation_mm_p50": round(
                float(np.median(infl[~hit]) * 1000), 3) if (~hit).any() else 0.0,
            "miss_xyz_inflation_mm_p99": round(
                float(np.quantile(infl[~hit], 0.99) * 1000), 3) if (~hit).any() else 0.0,
            "xyz_inflation_mm_mean": round(float(infl.mean() * 1000), 4),
        }
        out.append(r)
        print(f"recall {kind} w={window} p={probes}: {r}", flush=True)
    return out


def smooth_embedding(keys, dim=128, seed=3):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(keys.shape[1], dim)) * 150.0
    f = np.concatenate([np.sin(keys @ W), np.cos(keys @ W)], axis=1)
    return (f / np.linalg.norm(f, axis=1, keepdims=True)).astype(np.float32)


def e2e_world(M=50000, N=50000, T=200):
    rng = np.random.default_rng(0)
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)
    with jax.default_device(jax.devices("cpu")[0]):
        poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
        cam = poses.copy(); cam[:, :3, 3] += cam[:, :3, 2] * 0.022
        keys6 = np.asarray(se3.se3_key_from_tf(jnp.asarray(poses.astype(np.float32))))
        cb = Codebook.from_poses(poses, cam, smooth_embedding(keys6))
        u = np.array([1.0, 0, 0]); v = np.array([0.0, np.cos(0.4), np.sin(0.4)])
        s = 0.02 * np.arange(T)
        pts = 0.04 * (np.cos(s)[:, None] * u + np.sin(s)[:, None] * v)
        traj = np.asarray(se3.pose_from_vertex_normal(
            jnp.asarray(pts.astype(np.float32)),
            jnp.asarray((pts / 0.04).astype(np.float32)),
            0.0, jnp.asarray((0.03 * np.arange(T)).astype(np.float32)),
            jax.random.PRNGKey(9)))
        traj_keys = np.asarray(se3.se3_key_from_tf(jnp.asarray(traj.astype(np.float32))))
        codes = jnp.asarray(smooth_embedding(traj_keys))
        odom = np.linalg.inv(traj[:-1]) @ traj[1:]
        oq = jnp.asarray(np.asarray(se3.matrix_to_quat(
            jnp.asarray(odom[:, :3, :3]))), dtype=jnp.float32)
        ot = jnp.asarray(odom[:, :3, 3], dtype=jnp.float32)
    cb = jax.device_put(cb, jax.devices()[0])
    pf = ParticleFilter(
        params=FilterParams(init_trans_noise=mesh.scale / 3.0,
                            cluster_subsample=1024),
        mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)),
        mesh_scale=mesh.scale)
    gts = jnp.asarray(traj[1:], dtype=jnp.float32)
    return mesh, cb, pf, traj, codes, oq, ot, gts, N, T


def run_e2e(world, kind, window, probes, exact=False):
    mesh, cb, pf, traj, codes, oq, ot, gts, N, T = world
    ann = None if exact else _build_index(cb, kind, window)
    step = FilterStep(pf, cb.astype_embeddings(jnp.bfloat16), floor=1000,
                      ann_index=ann, ann_window=window, ann_probes=probes,
                      drift_from_codebook=True)
    key = jax.random.PRNGKey(0)
    key, k0, kr = jax.random.split(key, 3)
    state = step.initialize(k0, jnp.asarray(traj[0], dtype=jnp.float32), N)
    # warm (compile) + timed
    final, seq = step.replay(state, kr, oq, ot, gts, codes=codes[1:],
                             cluster_every=50)
    jax.block_until_ready(final.t)
    t0 = time.perf_counter()
    final, seq = step.replay(state, kr, oq, ot, gts, codes=codes[1:],
                             cluster_every=50)
    jax.block_until_ready(final.t)
    wall = time.perf_counter() - t0
    rmse_t = np.asarray(seq[0]) * 1000
    return {
        "kind": kind, "window": window, "probes": probes, "exact": exact,
        "steps_per_s_warm": round((T - 1) / wall, 1),
        "rmse_mm_final": round(float(rmse_t[-1]), 3),
        "rmse_mm_last25_mean": round(float(rmse_t[-25:].mean()), 3),
        "rmse_mm_step49": round(float(rmse_t[49]), 3),
    }


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    out_path = kv.get("out", "ANN_RECALL.json")

    results = {}
    path = common.codebook_path(obj)
    if os.path.exists(path):
        cb = Codebook.load(path)
        results["recall_codebook"] = f"{obj} learned ({len(cb)} entries)"
        results["recall"] = measure_recall(cb)
    else:
        print(f"no learned codebook at {path}; recall on synthetic keys")

    world = e2e_world()
    if "recall" not in results:
        results["recall_codebook"] = "synthetic sphere (50000 entries)"
        results["recall"] = measure_recall(world[1])

    results["e2e"] = []
    for kind, window, probes in KNOBS:
        r = run_e2e(world, kind, window, probes)
        results["e2e"].append(r)
        print(f"e2e {kind} w={window} p={probes}: {r}", flush=True)
    r = run_e2e(world, "exact", 0, 0, exact=True)
    results["e2e"].append(r)
    print(f"e2e exact: {r}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
