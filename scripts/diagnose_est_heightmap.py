"""Why does the TDN-estimated heightmap kill the canonical descriptor?

ABLATION_boulder.json isolated the collapse to the heightmap estimate
(est hm + GT mask: 0.963 vs 0.764 GT/GT; est mask alone: 0.790). This
script quantifies the per-render transfer GT -> est through each stage of
the canonical pipeline on the cached ablation bank:

  * band-anchor shift (mean of top-64 deepest px, ops/image.depth_band)
  * banded-relief amplitude ratio (does the TDN attenuate the 0.7 mm
    relief signal?)
  * canonical-frame agreement (centroid / principal-axis angle between
    GT and est patches — frame errors misalign the fingerprint)
  * patch cosine GT vs est at 48x48 and pooled 6x6

Runs on CPU (small n, no TPU contention).

Run:  JAX_PLATFORMS=cpu python scripts/diagnose_est_heightmap.py [n=1024]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from midastouch_tpu.ops import image as image_ops  # noqa: E402

PIXMM = 0.03
BAND_PX = 0.7 / PIXMM
CANON, CROP = 48, 192.0


def stage_stats(hm, mask):
    """Per-render canonical-pipeline intermediates for one heightmap."""
    h = jnp.asarray(hm, jnp.float32)
    m = jnp.asarray(mask)
    h, m = image_ops.rectify_tilt(h, m)
    z = jnp.maximum(h, 0.0) * m.astype(h.dtype)
    anchor = jnp.mean(jax.lax.top_k(z.ravel(), 64)[0])
    zb, mb = image_ops.depth_band(h, m, band_px=BAND_PX)
    # canonical frame (same moments as canonicalize_patch)
    zz = jnp.maximum(zb, 0.0) * mb.astype(zb.dtype)
    total = jnp.maximum(jnp.sum(zz), 1e-6)
    ys, xs = jnp.mgrid[0 : zz.shape[0], 0 : zz.shape[1]].astype(zz.dtype)
    cy = jnp.sum(zz * ys) / total
    cx = jnp.sum(zz * xs) / total
    dy, dx = ys - cy, xs - cx
    mu20 = jnp.sum(zz * dx * dx) / total
    mu02 = jnp.sum(zz * dy * dy) / total
    mu11 = jnp.sum(zz * dx * dy) / total
    theta = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)
    patch = image_ops.canonicalize_patch(zb, mb, CANON, CANON, CROP)
    band_std = jnp.sqrt(
        jnp.sum(zz**2) / jnp.maximum(jnp.sum(mb), 1) - (jnp.sum(zz) / jnp.maximum(jnp.sum(mb), 1)) ** 2
    )
    return anchor, cx, cy, theta, jnp.sum(mb), band_std, patch


stage_stats_j = jax.jit(jax.vmap(stage_stats))


def pool8(p):
    n, h, w = p.shape
    return p.reshape(n, h // 8, 8, w // 8, 8).mean((2, 4))


def cos_rows(a, b):
    a = a.reshape(len(a), -1)
    b = b.reshape(len(b), -1)
    na = np.linalg.norm(a, axis=1)
    nb = np.linalg.norm(b, axis=1)
    return (a * b).sum(1) / np.maximum(na * nb, 1e-12)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    n = int(kv.get("n", 1024))
    z = np.load(os.path.join("data", "codebooks", obj, "ablation_bank_10000.npz"))
    gt_hm = z["gt_hm"][:n].astype(np.float32)
    est_hm = z["est_hm"][:n].astype(np.float32)
    gt_mask = z["gt_mask"][:n]

    out = {}
    B = 128
    acc = {k: [] for k in ("anchor", "cx", "cy", "theta", "sup", "bstd", "patch")}
    for src, hm in (("gt", gt_hm), ("est", est_hm)):
        res = []
        for i in range(0, n, B):
            r = stage_stats_j(hm[i : i + B], gt_mask[i : i + B])
            res.append([np.asarray(x) for x in r])
        cat = [np.concatenate([r[k] for r in res]) for k in range(7)]
        for k, name in enumerate(acc):
            acc[name].append(cat[k])

    anchor_gt, anchor_est = acc["anchor"]
    d_anchor_mm = (anchor_est - anchor_gt) * PIXMM
    out["anchor_shift_mm"] = {
        "q05": float(np.quantile(d_anchor_mm, 0.05)),
        "q50": float(np.quantile(d_anchor_mm, 0.50)),
        "q95": float(np.quantile(d_anchor_mm, 0.95)),
    }
    dc = np.hypot(
        acc["cx"][1] - acc["cx"][0], acc["cy"][1] - acc["cy"][0]
    ) * PIXMM
    out["centroid_shift_mm"] = {
        "q50": float(np.quantile(dc, 0.5)), "q95": float(np.quantile(dc, 0.95))
    }
    dth = np.degrees(np.abs(np.arctan2(
        np.sin(2 * (acc["theta"][1] - acc["theta"][0])),
        np.cos(2 * (acc["theta"][1] - acc["theta"][0])),
    )) / 2)
    out["axis_angle_deg"] = {
        "q50": float(np.quantile(dth, 0.5)), "q95": float(np.quantile(dth, 0.95))
    }
    out["band_support_ratio_est_over_gt"] = float(
        np.median(acc["sup"][1] / np.maximum(acc["sup"][0], 1))
    )
    out["band_relief_std_ratio_est_over_gt"] = float(
        np.median(acc["bstd"][1] / np.maximum(acc["bstd"][0], 1e-9))
    )
    p_gt, p_est = acc["patch"]
    out["patch_cos_48"] = {
        "q25": float(np.quantile(cos_rows(p_est, p_gt), 0.25)),
        "q50": float(np.quantile(cos_rows(p_est, p_gt), 0.50)),
        "q75": float(np.quantile(cos_rows(p_est, p_gt), 0.75)),
    }
    c6 = cos_rows(pool8(p_est), pool8(p_gt))
    out["patch_cos_pooled6"] = {
        "q25": float(np.quantile(c6, 0.25)),
        "q50": float(np.quantile(c6, 0.50)),
        "q75": float(np.quantile(c6, 0.75)),
    }
    # raw heightmap agreement inside the GT mask, after removing the mean
    # (the TDN can be globally offset without harming the band)
    errs, stds = [], []
    for i in range(n):
        m = gt_mask[i]
        if m.sum() < 10:
            continue
        g = gt_hm[i][m]
        e = est_hm[i][m]
        errs.append(np.std((e - e.mean()) - (g - g.mean())) * PIXMM)
        stds.append(np.std(g - g.mean()) * PIXMM)
    out["in_mask_centered_rmse_mm_q50"] = float(np.median(errs))
    out["in_mask_gt_relief_std_mm_q50"] = float(np.median(stds))

    print(json.dumps(out, indent=2))
    with open(f"DIAGNOSIS_est_{obj}.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
