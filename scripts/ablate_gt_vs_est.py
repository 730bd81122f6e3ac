"""Isolate the GT->estimated sensing gap with a one-variable ablation.

Round 3 measured: the shipped canonical-patch PatchPCA recipe scores
0.789 single-touch on GT heightmaps but 0.964 (~chance) on the
TDN-estimated stack the real codebook uses (the reference stores
*estimated* heightmaps, tactile_tree/build_codebook.py:94-98) — despite
TDN heightmap RMSE 0.071 mm and mask IoU 0.897. The canonical pipeline
has three mask/outlier-sensitive stages (rectify plane fit, band anchor,
canonical frame moments); which one breaks under estimation noise is a
4-cell substitution experiment:

    (GT hm, GT mask)  (est hm, GT mask)
    (GT hm, est mask) (est hm, est mask)

This script renders ONE 10k bank (fused chunk program: raycast render ->
FCRN heightmap -> mask, both stacks saved), then scores each cell with
the shipped recipe (rectify, band 0.7 mm, pool 8, PatchPCA). Whichever
substitution collapses 0.789 -> ~0.96 names the culprit stage.

Run:  python scripts/ablate_gt_vs_est.py [obj=boulder] [n=10000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from midastouch_tpu.utils import runtime

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from midastouch_tpu.apps import common  # noqa: E402
from midastouch_tpu.codebook import Codebook  # noqa: E402
from midastouch_tpu.eval.single_touch import top_n_error  # noqa: E402
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh  # noqa: E402
from midastouch_tpu.ops import image as image_ops  # noqa: E402
from midastouch_tpu.utils.config import compose  # noqa: E402
from midastouch_tpu.utils.runtime import retry_transient  # noqa: E402

import eval_patch_codebook as epc  # noqa: E402  (canonical_patches, pca_embed)


def render_full_bank(cfg, obj: str, n: int, path: str, seed: int = 3):
    """Render n randomized touches; save BOTH the GT render stack and the
    TDN-estimated stack (same fused device program per chunk)."""
    mesh = common.resolve_mesh(obj)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=seed)
    tdn, _ = common.make_nets(cfg, bg=renderer.get_background("gel"))
    rng = np.random.default_rng(seed)
    poses = sample_poses_on_mesh(
        mesh, n, rng, edges=False,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )

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
                est_hm.astype(jnp.float16), est_mask, cam)

    fused = jax.jit(fused)
    chunk = 64
    press, lights, angles, colors, bg_ids = renderer.sample_render_aux(n)
    arrs = [np.asarray(a) for a in
            (poses, press, lights, angles, colors, bg_ids)]
    pad = (-n) % chunk
    if pad:
        arrs = [np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrs]
    outs = {k: [] for k in ("gt_hm", "gt_mask", "est_hm", "est_mask", "cam")}
    t0 = time.perf_counter()
    for i in range(0, n + pad, chunk):
        res = retry_transient(
            fused, tdn.variables,
            *(jnp.asarray(a[i : i + chunk]) for a in arrs),
        )
        for k, v in zip(outs, res):
            outs[k].append(np.asarray(v))
        done = min(i + chunk, n)
        print(f"\r{done}/{n} ({done/(time.perf_counter()-t0):.1f} poses/s)",
              end="", flush=True)
    print()
    cat = {k: np.concatenate(v)[:n] for k, v in outs.items()}
    cams = cat.pop("cam")
    gels = np.asarray(renderer.cam2gel(jnp.asarray(cams)))
    np.savez(path, gelposes=gels, camposes=cams, **cat)


def score_cell(hms, masks, gelposes, camposes, pool: int = 8):
    """Shipped recipe: rectify + band 0.7 + canonical 48 -> pool -> PCA."""
    patches = epc.canonical_patches(
        hms.astype(np.float32), masks, rectify=True, band_mm=0.7
    )
    if pool > 1:
        n_, h_, w_, c_ = patches.shape
        patches = patches.reshape(
            n_, h_ // pool, pool, w_ // pool, pool, c_
        ).mean((2, 4))
    emb = epc.pca_embed(patches)
    cb = Codebook.from_poses(gelposes, camposes, emb.astype(np.float32))
    st = top_n_error(cb, n=25)
    sims = emb @ emb.T
    np.fill_diagonal(sims, -np.inf)
    t1 = sims.argmax(1)
    pos = gelposes[:, :3, 3]
    e1 = np.linalg.norm(pos[t1] - pos, axis=1) * 1000
    return {
        "st_median": round(st["median_normalized_error"], 4),
        "st_mean": round(st["mean_normalized_error"], 4),
        "top1_median_mm": round(float(np.median(e1)), 2),
        "top1_frac_5mm": round(float(np.mean(e1 < 5.0)), 3),
    }


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    n = int(kv.get("n", 10000))
    tag = kv.get("tag", "")  # distinguishes banks built with different TDNs
    out_path = kv.get("out", f"ABLATION_{obj}{'_' + tag if tag else ''}.json")

    cfg = compose([f"expt.obj_model={obj}", "tpu.render_max_faces=512"])
    bank_path = os.path.join(
        "data", "codebooks", obj,
        f"ablation_bank_{n}{'_' + tag if tag else ''}.npz",
    )
    os.makedirs(os.path.dirname(bank_path), exist_ok=True)
    if not os.path.exists(bank_path):
        print(f"rendering full bank -> {bank_path}")
        render_full_bank(cfg, obj, n, bank_path)
    z = np.load(bank_path)
    gel, cam = z["gelposes"], z["camposes"]

    cells = {
        "gt_hm__gt_mask": ("gt_hm", "gt_mask"),
        "est_hm__gt_mask": ("est_hm", "gt_mask"),
        "gt_hm__est_mask": ("gt_hm", "est_mask"),
        "est_hm__est_mask": ("est_hm", "est_mask"),
    }
    results = {"obj": obj, "n": n, "cells": {}}
    for name, (hk, mk) in cells.items():
        t0 = time.perf_counter()
        r = score_cell(z[hk], z[mk], gel, cam)
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        results["cells"][name] = r
        print(f"{name:18s} st_median={r['st_median']:.3f} "
              f"top1_med={r['top1_median_mm']:.1f}mm "
              f"top1<5mm={r['top1_frac_5mm']*100:.0f}%", flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
