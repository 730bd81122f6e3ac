"""Which nuisance destabilizes the TDN's fine relief?

FIX_SWEEP_boulder.json: no downstream fix (whitening, pooling, GT
database, ridge denoising) recovers est-heightmap retrieval — the
TDN-estimated patch carries ~no site information, meaning its fine relief
varies BETWEEN RENDERS of the same site. This probe renders each of
`sites` surface points TWICE with ONE nuisance toggled at a time and
measures, through the full est pipeline (TDN -> mask -> rectify -> band
-> canonical patch -> pool8 -> PCA):

  * same-site est-patch cosine (A vs B)  — render stability
  * same-site GT-patch cosine            — pipeline-only reference
  * top-1 exact-site retrieval accuracy (B retrieved against all A)

Nuisance columns: none (identical renders apart from TDN determinism),
light (LED angles/colors/background), press (random press depth),
shear (pose tilt), all.

Run:  python scripts/probe_tdn_nuisance.py [obj=boulder] [sites=256]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from midastouch_tpu.utils import runtime

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from midastouch_tpu.apps import common  # noqa: E402
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh  # noqa: E402
from midastouch_tpu.ops import image as image_ops  # noqa: E402
from midastouch_tpu.render.digit import (  # noqa: E402
    DEFAULT_LIGHT_ANGLES,
    DEFAULT_LIGHT_RGB,
)
from midastouch_tpu.utils.config import compose  # noqa: E402

import eval_patch_codebook as epc  # noqa: E402

PIXMM = 0.03


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    sites = int(kv.get("sites", 256))

    cfg = compose([f"expt.obj_model={obj}", "tpu.render_max_faces=512"])
    mesh = common.resolve_mesh(obj)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=7)
    tdn, _ = common.make_nets(cfg, bg=renderer.get_background("gel"))
    # identical surface sites + yaws (same generator seed), differing only
    # in the shear tilt: shear=0 for the base, config shear for the toggle
    poses0 = sample_poses_on_mesh(
        mesh, sites, np.random.default_rng(7), edges=False, shear_mag_deg=0.0
    )
    poses_shear = sample_poses_on_mesh(
        mesh, sites, np.random.default_rng(7), edges=False,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )

    def draw_aux(randomize_light: bool, randomize_press: bool, seed: int):
        r = np.random.default_rng(seed)
        press = (
            r.uniform(renderer.cfg.pen_min, renderer.cfg.pen_max, sites)
            if randomize_press
            else np.full(sites, 1.5e-3)
        ).astype(np.float32)
        if randomize_light:
            lights = (0.8 + 0.4 * r.random(sites)).astype(np.float32)
            angles = (DEFAULT_LIGHT_ANGLES + r.normal(0, 10, (sites, 3))
                      ).astype(np.float32)
            colors = (DEFAULT_LIGHT_RGB[None] * (
                0.85 + 0.3 * r.random((sites, 3, 1)))).astype(np.float32)
            bgs = r.integers(0, renderer.backgrounds.shape[0], sites
                             ).astype(np.int32)
        else:
            lights = np.ones(sites, np.float32)
            angles = np.tile(DEFAULT_LIGHT_ANGLES, (sites, 1)).astype(np.float32)
            colors = np.tile(DEFAULT_LIGHT_RGB, (sites, 1, 1)).astype(np.float32)
            bgs = np.zeros(sites, np.int32)
        return press, lights, angles, colors, bgs

    def fused(tdn_vars, pose, press, light, angle, color, bg_id):
        rgb, hm, mask, _p, cam = jax.lax.map(
            lambda a: renderer._render_impl(*a),
            (pose, press, light, angle, color, bg_id),
        )
        imgs = jax.vmap(
            lambda im: image_ops.normalize_image(im, tdn.input_norm)
        )(rgb * 255.0)
        est_hm = tdn.model.apply(tdn_vars, imgs, train=False)
        est_mask = jax.vmap(
            lambda h: image_ops.heightmap_to_mask(
                h, tdn.bg, tdn.b, tdn.r, tdn.clip, False
            )
        )(est_hm)
        return (hm.astype(jnp.float16), mask,
                est_hm.astype(jnp.float16), est_mask)

    fused_j = jax.jit(fused)

    def render_stack(poses, aux):
        outs = [[] for _ in range(4)]
        B = 64
        for i in range(0, sites, B):
            res = fused_j(
                tdn.variables, jnp.asarray(poses[i:i + B]),
                *(jnp.asarray(a[i:i + B]) for a in aux),
            )
            for k in range(4):
                outs[k].append(np.asarray(res[k]))
        return [np.concatenate(o) for o in outs]

    def patches(hm, mask, pool=8):
        p = epc.canonical_patches(hm.astype(np.float32), mask,
                                  rectify=True, band_mm=0.7)
        n_, h_, w_, c_ = p.shape
        return p.reshape(n_, h_ // pool, pool, w_ // pool, pool, c_
                         ).mean((2, 4)).reshape(n_, -1)

    def cos_rows(a, b):
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        return (a * b).sum(1) / np.maximum(na * nb, 1e-12)

    def top1(a, b):
        """Retrieve each row of b against all rows of a (centered cosine)."""
        am, bm = a - a.mean(0), b - a.mean(0)
        am = am / np.maximum(np.linalg.norm(am, axis=1, keepdims=True), 1e-12)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        return float((np.argmax(bm @ am.T, axis=1) == np.arange(len(b))).mean())

    def rsa(a, b):
        """Correlation of between-site distance structure: does the est
        patch space mirror the gt patch space across sites at all?"""
        da = np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
        db = np.linalg.norm(b[:, None, :] - b[None, :, :], axis=-1)
        iu = np.triu_indices(len(a), 1)
        return float(np.corrcoef(da[iu], db[iu])[0, 1])

    scenarios = {
        "none": (poses0, False, False),
        "light": (poses0, True, False),
        "press": (poses0, False, True),
        "shear": (poses_shear, False, False),
        "all": (poses_shear, True, True),
    }
    out = {}
    for name, (poses_b, rl, rp) in scenarios.items():
        gt_a, gm_a, est_a, em_a = render_stack(
            poses0, draw_aux(False, False, seed=100)
        )
        gt_b, gm_b, est_b, em_b = render_stack(
            poses_b, draw_aux(rl, rp, seed=200)
        )
        p_gta, p_gtb = patches(gt_a, gm_a), patches(gt_b, gm_b)
        p_esta, p_estb = patches(est_a, em_a), patches(est_b, em_b)
        row = {
            "gt_cos_q50": round(float(np.median(cos_rows(p_gta, p_gtb))), 3),
            "est_cos_q50": round(float(np.median(cos_rows(p_esta, p_estb))), 3),
            "gt_top1": round(top1(p_gta, p_gtb), 3),
            "est_top1": round(top1(p_esta, p_estb), 3),
            # distance-structure agreement across sites (A-side only):
            # ~1 = est expresses the same between-site relief geometry as gt
            "rsa_est_gt_A": round(rsa(p_esta, p_gta), 3),
        }
        out[name] = row
        print(f"{name:6s} gt_cos={row['gt_cos_q50']:.3f} "
              f"est_cos={row['est_cos_q50']:.3f} "
              f"gt_top1={row['gt_top1']:.2f} est_top1={row['est_top1']:.2f} "
              f"rsa={row['rsa_est_gt_A']:.2f}",
              flush=True)

    with open(f"PROBE_TDN_{obj}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote PROBE_TDN_{obj}.json")


if __name__ == "__main__":
    main()
