"""Renderer throughput breakdown: where do the ~hundreds of ms/pose go?

Times (as compiled scan windows, median of 3 — same discipline as
bench.py): raycast alone, full render_batch, and its stages, for a
procedural mesh at several cull budgets.

Run on the TPU when idle:  python scripts/profile_render.py
Env: REND_OBJ=boulder REND_BATCH=64 REND_FACES=512,2048
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from midastouch_tpu.utils import runtime
runtime.setup()
import jax, jax.numpy as jnp
from midastouch_tpu.apps import common
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.render.digit import (
    DigitRenderer, RenderConfig, raycast_depth, _pixel_dirs,
)
from midastouch_tpu.utils.config import compose

OBJ = os.environ.get("REND_OBJ", "boulder")
B = int(os.environ.get("REND_BATCH", "64"))
FACES = [int(x) for x in os.environ.get("REND_FACES", "512,2048").split(",")]

cfg = compose([f"expt.obj_model={OBJ}"])
mesh = common.resolve_mesh(OBJ)
print(f"{OBJ}: {len(mesh.faces)} faces")
rng = np.random.default_rng(0)
poses = sample_poses_on_mesh(mesh, B, rng, edges=False).astype(np.float32)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:44s} {ms:9.2f} ms  ({ms/B:7.2f} ms/pose)", flush=True)
    return ms


for mf in FACES:
    rc = RenderConfig.from_cfg(cfg.tdn.render, max_faces=mf)
    ren = DigitRenderer(rc, mesh)
    print(f"-- max_faces={mf} (effective {ren.max_faces_eff}) --")

    tri = jnp.asarray(ren.tri)
    cent = jnp.asarray(ren.centroids)
    radii = ren.radii
    pix = ren.pix_dirs
    cams = jnp.asarray(ren.gel2cam(jnp.asarray(poses)))

    def cast_all(cams):
        def one(cam):
            return raycast_depth(
                tri, cent, cam, pix, rc.cam_dist, rc.width, rc.height,
                rc.ray_chunk, ren.max_faces_eff, radii=radii,
            )
        return jax.lax.map(one, cams)

    jcast = jax.jit(cast_all)
    timeit("raycast only (lax.map over batch)", jcast, cams)

    press = jnp.full((B,), 0.0012, jnp.float32)
    timeit("render_batch (two-pass + RGB + mask)",
           lambda c, p: ren.render_batch(c, p), jnp.asarray(poses), press)
