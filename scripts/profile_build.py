"""Codebook-build stage profile (VERDICT round-4 weak item 7: the build
runs ~7 poses/s end-to-end and nobody measured where the time goes —
render vs TDN vs mask/canonicalization vs host transfers).

Times, on one warm 64-pose chunk of the EXACT fused build program
(apps/build_codebook._fused_sensing_inputs):

  render        two-pass raycast + shading only
  render+tdn    + FCRN forward
  full          + mask + canonical inputs + angles (the shipped program)
  full+host     full, plus the device->host fetch of the chunk outputs
  aux/host prep pose sampling + host-side chunk staging per chunk

Writes PROFILE_BUILD.json. Run: python scripts/profile_build.py [obj=boulder]
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
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh  # noqa: E402
from midastouch_tpu.ops import image as image_ops  # noqa: E402
from midastouch_tpu.utils.config import compose  # noqa: E402

CHUNK = 64
REPS = 5


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    cfg = compose([f"expt.obj_model={obj}", "tpu.render_max_faces=512"])

    mesh = common.resolve_mesh(obj)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=5)
    tdn, tcn = common.make_nets(cfg, bg=renderer.get_background("gel"))

    rng = np.random.default_rng(5)
    t_aux0 = time.perf_counter()
    poses = sample_poses_on_mesh(
        mesh, CHUNK, rng, edges=False,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )
    press, lights, angles, colors, bg_ids = renderer.sample_render_aux(CHUNK)
    aux_wall = time.perf_counter() - t_aux0
    args = tuple(
        jnp.asarray(a) for a in (poses, press, lights, angles, colors, bg_ids)
    )

    def render_only(poses, press, lights, ang, col, bgs):
        return jax.lax.map(
            lambda a: renderer._render_impl(*a)[1],
            (poses, press, lights, ang, col, bgs),
        )

    # weights enter as a traced ARGUMENT: closing over them would bake
    # 292 MB of constants into the compile payload, which the tunnel's
    # remote-compile endpoint rejects (HTTP 413)
    def render_tdn(tdn_vars, poses, press, lights, ang, col, bgs):
        rgb, hm, mask, _p, cam = jax.lax.map(
            lambda a: renderer._render_impl(*a),
            (poses, press, lights, ang, col, bgs),
        )
        imgs = jax.vmap(
            lambda im: image_ops.normalize_image(im, tdn.input_norm)
        )(rgb * 255.0)
        return tdn.model.apply(tdn_vars, imgs, train=False)

    from midastouch_tpu.apps.build_codebook import _fused_sensing_inputs

    fused = _fused_sensing_inputs(renderer, tdn, tcn, use_gt_heightmaps=False)

    results = {"obj": obj, "chunk": CHUNK, "faces_culled":
               int(renderer.max_faces_eff), "stages_ms": {}}
    r_ms = timeit(jax.jit(render_only), *args) * 1000
    rt_ms = timeit(jax.jit(render_tdn), tdn.variables, *args) * 1000
    f_ms = timeit(lambda *a: fused(tdn.variables, *a), *args) * 1000

    def full_host(*a):
        inp, ang, cam = fused(tdn.variables, *a)
        return np.asarray(inp), np.asarray(ang), np.asarray(cam)

    fh_ms = timeit(full_host, *args) * 1000

    results["stages_ms"] = {
        "render_only": round(r_ms, 1),
        "render+tdn": round(rt_ms, 1),
        "full_fused": round(f_ms, 1),
        "full+host_fetch": round(fh_ms, 1),
        "tdn_delta": round(rt_ms - r_ms, 1),
        "canon_mask_delta": round(f_ms - rt_ms, 1),
        "host_fetch_delta": round(fh_ms - f_ms, 1),
        "host_aux_prep_per_chunk": round(aux_wall * 1000, 1),
    }
    results["poses_per_s_device"] = round(CHUNK / (f_ms / 1000), 1)
    results["poses_per_s_with_host"] = round(CHUNK / (fh_ms / 1000), 1)
    print(json.dumps(results, indent=2))
    with open(kv.get("out", "PROFILE_BUILD.json"), "w") as fh:
        json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
