"""Paired-lighting TDN training bank.

PROBE_TDN_boulder.json: lighting jitter alone (LED angles +-10 deg, color
gains, background swap) collapses same-site estimated-relief retrieval to
~0.32 even after per-channel input normalization — moving shadows are a
spatial nuisance no input affine removes, and 4k randomized single images
did not teach invariance implicitly. This renders each pose TWICE with
independent lighting draws but identical geometry/press, giving training
explicit pairs for an output-consistency loss
(train_tdn.make_paired_epoch_step).

Saves one npz: images_a, images_b (uint8), heightmaps (f16 gel px).

Run:  python scripts/gen_paired_lighting.py [obj=boulder] [n=3000]
"""

from __future__ import annotations

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
from midastouch_tpu.utils.config import compose  # noqa: E402
from midastouch_tpu.utils.runtime import retry_transient  # noqa: E402


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    n = int(kv.get("n", 3000))
    out = kv.get("out", os.path.join("data", "sim", obj, f"paired_{n}.npz"))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    cfg = compose([f"expt.obj_model={obj}", "tpu.render_max_faces=512"])
    mesh = common.resolve_mesh(obj)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=21)
    rng = np.random.default_rng(21)
    poses = sample_poses_on_mesh(
        mesh, n, rng, edges=False,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )

    def fused(pose, pr_a, pr_b, la, ca, ba, lb, cb, bb, ga, gb):
        def one(args):
            p, p_a, p_b, l_a, c_a, b_a, l_b, c_b, b_b, g_a, g_b = args
            rgb_a, hm_a, _m, _pe, _cam = renderer._render_impl(
                p, p_a, g_a, l_a, c_a, b_a
            )
            rgb_b, hm_b, _m2, _pe2, _cam2 = renderer._render_impl(
                p, p_b, g_b, l_b, c_b, b_b
            )
            return (
                (rgb_a * 255.0).astype(jnp.uint8),
                (rgb_b * 255.0).astype(jnp.uint8),
                hm_a.astype(jnp.float16),
                hm_b.astype(jnp.float16),
            )

        return jax.lax.map(
            one, (pose, pr_a, pr_b, la, ca, ba, lb, cb, bb, ga, gb)
        )

    fused_j = jax.jit(fused)
    press_a = rng.uniform(
        renderer.cfg.pen_min, renderer.cfg.pen_max, n
    ).astype(np.float32)
    # half the pairs also differ in press depth: their predicted FINE
    # relief should agree (press shifts the smooth component only), giving
    # the trainer a press-invariance signal the lighting pairs lack
    same_press = rng.random(n) < 0.5
    press_b = np.where(
        same_press, press_a,
        rng.uniform(renderer.cfg.pen_min, renderer.cfg.pen_max, n),
    ).astype(np.float32)

    def light_draws(seed):
        r = np.random.default_rng(seed)
        from midastouch_tpu.render.digit import (
            DEFAULT_LIGHT_ANGLES, DEFAULT_LIGHT_RGB,
        )

        gains = (0.8 + 0.4 * r.random(n)).astype(np.float32)
        angles = (DEFAULT_LIGHT_ANGLES + r.normal(0, 10, (n, 3))
                  ).astype(np.float32)
        colors = (DEFAULT_LIGHT_RGB[None] * (
            0.85 + 0.3 * r.random((n, 3, 1)))).astype(np.float32)
        bgs = r.integers(0, renderer.backgrounds.shape[0], n).astype(np.int32)
        return angles, colors, bgs, gains

    la, ca, ba, ga = light_draws(100)
    lb, cb, bb, gb = light_draws(200)

    chunk = 64
    arrs = [poses, press_a, press_b, la, ca, ba, lb, cb, bb, ga, gb]
    pad = (-n) % chunk
    if pad:
        arrs = [np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrs]
    outs = [[] for _ in range(4)]
    t0 = time.perf_counter()
    for i in range(0, n + pad, chunk):
        res = retry_transient(
            fused_j, *(jnp.asarray(a[i : i + chunk]) for a in arrs)
        )
        for k in range(4):
            outs[k].append(np.asarray(res[k]))
        done = min(i + chunk, n)
        print(f"\r{done}/{n} ({done/(time.perf_counter()-t0):.1f} pairs/s)",
              end="", flush=True)
    print()
    np.savez(
        out,
        images_a=np.concatenate(outs[0])[:n],
        images_b=np.concatenate(outs[1])[:n],
        heightmaps=np.concatenate(outs[2])[:n],
        heightmaps_b=np.concatenate(outs[3])[:n],
        same_press=same_press,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
