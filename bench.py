"""Benchmark: fused filter update steps/sec at reference scale.

Scenario mirrors the reference's baseline config (BASELINE.md): 50k
particles, 50k-entry x 256-d codebook, drift-pruning vertex table, one
cluster refresh per 50 steps amortized in. The reference's loop runs at
~1-10 Hz on a CUDA GPU because every step round-trips nanoflann/sklearn/
DBSCAN/WeightedRandomSampler through the CPU (SURVEY.md section 3.1);
baseline is pinned at 10 steps/s (its best case).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 10.0

N_PARTICLES = int(os.environ.get("BENCH_PARTICLES", 50_000))
CODEBOOK_SIZE = int(os.environ.get("BENCH_CODEBOOK", 50_000))
EMB_DIM = 256
WARMUP = 5
# 400-step windows: the TPU tunnel adds a PER-CALL dispatch latency that
# fluctuates between ~0.05 ms and ~20+ ms (measured round 5); at 50-step
# windows a congested call inflated the per-step time by up to 0.4 ms.
# Long windows amortize it, and real replays are whole-log scans anyway.
ITERS = int(os.environ.get("BENCH_ITERS", 400))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.utils import runtime

    runtime.setup()  # persistent compile cache across bench runs

    from midastouch_tpu.codebook import Codebook
    from midastouch_tpu.filter.pf import FilterParams, ParticleFilter
    from midastouch_tpu.filter.step import FilterStep
    from midastouch_tpu.geometry import procedural
    from midastouch_tpu.geometry.mesh import sample_poses_on_mesh

    rng = np.random.default_rng(0)
    mesh = procedural.icosphere(radius=0.04, subdivisions=4)

    # setup-only math on the host CPU backend: keeps slow one-off TPU
    # compiles out of the benchmark path
    with jax.default_device(jax.devices("cpu")[0]):
        poses = sample_poses_on_mesh(mesh, CODEBOOK_SIZE, rng, edges=False)
        cam = poses.copy()
        cam[:, :3, 3] += cam[:, :3, 2] * 0.022
        emb = rng.normal(size=(CODEBOOK_SIZE, EMB_DIM)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        codebook = Codebook.from_poses(poses, cam, emb)
    codebook = jax.device_put(codebook, jax.devices()[0])

    pf = ParticleFilter(
        params=FilterParams(init_trans_noise=mesh.scale / 3.0),
        mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)),
        mesh_scale=mesh.scale,
    )
    # production-default fast path (config/tpu/default.yaml): windowed ANN
    # codebook search, bf16 embedding table, codebook-NN drift gate —
    # accuracy-gated by tests/test_filter.py e2e + scripts/bench_localization
    ann_index = codebook.build_ann_index(kind="windowed")
    codebook = codebook.astype_embeddings(jnp.bfloat16)
    step = FilterStep(
        pf, codebook, floor=1000,
        ann_index=ann_index, ann_window=1024, ann_probes=1,
        drift_from_codebook=True,
    )

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = step.initialize(k0, jnp.asarray(poses[0], dtype=jnp.float32), N_PARTICLES)
    gt_pose = jnp.asarray(poses[0], dtype=jnp.float32)
    code = jnp.asarray(emb[0])
    odom_q = jnp.array([1.0, 0.0, 0.0, 0.0])
    odom_t = jnp.array([5e-4, 0.0, 0.0])

    # whole-window replay: ITERS update steps as ONE lax.scan device
    # program (includes one cluster refresh per 50 steps, like the app)
    codes = jnp.tile(code[None], (ITERS, 1))
    oq = jnp.tile(odom_q[None], (ITERS, 1))
    ot = jnp.tile(odom_t[None], (ITERS, 1))
    gts = jnp.tile(gt_pose[None], (ITERS, 1, 1))

    key, kw, kr = jax.random.split(key, 3)
    t_w = time.perf_counter()
    state, _ = step.replay(state, kw, oq, ot, gts, codes=codes,
                           cluster_every=50)  # warmup/compile, same shapes
    jax.block_until_ready(state.t)
    if os.environ.get("BENCH_VERBOSE"):
        print(f"[bench] warmup (compile+run): {time.perf_counter()-t_w:.2f}s",
              flush=True)

    # median of 3 timed windows: the TPU tunnel's throughput fluctuates
    # run-to-run; the median reflects sustained device capability
    times = []
    for _ in range(3):
        key, kt = jax.random.split(key)
        t0 = time.perf_counter()
        state, seq = step.replay(state, kt, oq, ot, gts, codes=codes,
                                 cluster_every=50)
        jax.block_until_ready(state.t)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    if os.environ.get("BENCH_VERBOSE"):
        print(f"[bench] window times: {[round(t,2) for t in times]}s", flush=True)

    steps_per_sec = ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"filter update steps/sec @ {N_PARTICLES//1000}k particles, {CODEBOOK_SIZE//1000}k codebook",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
