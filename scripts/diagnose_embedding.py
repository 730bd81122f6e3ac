"""Nuisance-isolation diagnosis for appearance-space tactile retrieval.

Why retrieval was at chance (round-2 flagship runs scored ~0.99 where
1.0 = random): this script renders N surface sites TWICE each with
independently sampled nuisance variables (yaw always random — the
canonical patch removes it; press depth and shear tilt toggled per row),
takes GROUND-TRUTH heightmaps (no TDN, no learning anywhere), computes
the banded canonical patch, and retrieves copy B against copy A by
cosine in raw patch space. Top-1 exact-site accuracy isolates which
nuisance destroys the position signal.

Round-3 finding (recorded in RESULTS.md §2b): the ±5° shear tilt of
pose_from_vertex_normal (reference modules/pose.py:375-455) is the
killer — a 5° ramp across the ~7 mm patch is ±0.6 mm, the size of the
entire 0.7 mm relief band. `rectify=1` applies ops/image.rectify_tilt
(best-fit in-support plane removal) before banding and must restore
accuracy.

Run: python scripts/diagnose_embedding.py [obj=boulder] [sites=300] [out=DIAGNOSIS.json]
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
from midastouch_tpu.ops import image as image_ops  # noqa: E402
from midastouch_tpu.ops import se3  # noqa: E402
from midastouch_tpu.utils.config import compose  # noqa: E402

PIXMM = 0.03
BAND_MM = 0.7
CANON = 48
CROP_PX = 192.0


def _poses(pts, nrm, shear_deg, seed):
    rng = np.random.default_rng(seed)
    delta = rng.uniform(0, 2 * np.pi, size=len(pts)).astype(np.float32)
    key = jax.random.PRNGKey(seed)
    T = se3.pose_from_vertex_normal(
        jnp.asarray(pts), jnp.asarray(nrm), float(np.radians(shear_deg)),
        jnp.asarray(delta), key,
    )
    return np.asarray(T)


def _press(n, random_press, seed, lo=0.0005, hi=0.002):
    if random_press:
        return np.random.default_rng(seed).uniform(lo, hi, n).astype(np.float32)
    return np.full(n, 0.0015, np.float32)


def _patches(hms, masks, rectify: bool, band_mm: float = BAND_MM):
    """(N, cs, cs, 2) banded canonical patches."""
    band_px = band_mm / PIXMM

    @jax.jit
    def one(hm, mask):
        hm = hm.astype(jnp.float32)
        if rectify:
            hm, mask = image_ops.rectify_tilt(hm, mask)
        zb, mb = image_ops.depth_band(hm, mask, band_px=band_px)
        p = image_ops.canonicalize_patch(zb, mb, out_h=CANON, out_w=CANON,
                                         crop_px=CROP_PX)
        pen = p / band_px
        m = (p > 1e-3).astype(jnp.float32)
        return jnp.stack([pen, m], axis=-1)

    out = []
    for i in range(0, len(hms), 64):
        out.append(np.asarray(jax.vmap(one)(
            jnp.asarray(hms[i:i + 64]), jnp.asarray(masks[i:i + 64])
        )))
    return np.concatenate(out)


def _flat_norm(x):
    x = x.reshape(len(x), -1)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _bilinear(img, sy, sx):
    """Host bilinear sampling of (H, W) at float coords, zero outside."""
    h, w = img.shape
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    fy, fx = sy - y0, sx - x0

    def at(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return np.where(ok, img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], 0.0)

    return ((1 - fy) * (1 - fx) * at(y0, x0) + (1 - fy) * fx * at(y0, x0 + 1)
            + fy * (1 - fx) * at(y0 + 1, x0) + fy * fx * at(y0 + 1, x0 + 1))


def _rotmax_retrieve(xa_p, xb_p, k_rot: int):
    """Max-over-rotations cosine retrieval of B's patches against A's
    (host numpy — the arrays are tiny; jit compile on the tunnel would
    cost minutes)."""
    xa = _flat_norm(xa_p)
    n, h, w, c = xb_p.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    sims = None
    for a in np.linspace(0, 2 * np.pi, k_rot, endpoint=False):
        ca, sa = np.cos(a), np.sin(a)
        sy = cy + (ys - cy) * ca - (xs - cx) * sa
        sx = cx + (ys - cy) * sa + (xs - cx) * ca
        rot = np.stack([
            np.stack([_bilinear(xb_p[i, ..., ch], sy, sx) for ch in range(c)],
                     axis=-1)
            for i in range(n)
        ])
        s = _flat_norm(rot) @ xa.T
        sims = s if sims is None else np.maximum(sims, s)
    return sims


def _polar_fft(patches, n_r=16, n_a=32):
    """Rotation-invariant descriptor: resample each patch (pre-aligned only
    by centroid) on a polar grid and keep |FFT| along the angle axis."""
    n, h, w, c = patches.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rr = np.linspace(1.0, min(cy, cx), n_r)
    aa = np.linspace(0, 2 * np.pi, n_a, endpoint=False)
    sy = (cy + rr[:, None] * np.sin(aa)[None, :]).astype(np.float32)
    sx = (cx + rr[:, None] * np.cos(aa)[None, :]).astype(np.float32)
    pol = np.stack([
        np.stack([_bilinear(patches[i, ..., ch], sy, sx) for ch in range(c)],
                 axis=-1)
        for i in range(n)
    ])  # (N, R, A, C)
    spec = np.abs(np.fft.rfft(pol, axis=2))  # rotation -> phase only
    return _flat_norm(spec)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    n_sites = int(kv.get("sites", 300))
    out_path = kv.get("out", "DIAGNOSIS.json")

    cfg = compose([f"expt.obj_model={obj}", "tpu.render_max_faces=512"])
    mesh = common.resolve_mesh(obj)
    renderer = common.make_renderer(cfg, mesh, randomize=False, seed=0)

    rng = np.random.default_rng(0)
    pts, nrm = mesh.sample_surface(n_sites, rng)
    site_xyz = np.asarray(pts)

    rows = [
        {"name": "none", "shear": 0.0, "random_press": False},
        {"name": "press", "shear": 0.0, "random_press": True},
        {"name": "shear", "shear": 5.0, "random_press": False},
        {"name": "both (shipped pipeline)", "shear": 5.0, "random_press": True},
    ]

    results = {"obj": obj, "sites": n_sites, "rows": []}
    for r in rows:
        t0 = time.time()
        copies = []
        for c in range(2):
            seed = 1000 * c + hash(r["name"]) % 997
            poses = _poses(pts, nrm, r["shear"], seed)
            press = _press(n_sites, r["random_press"], seed)
            _, hms, masks, _, _ = renderer._render_chunked(
                poses, press, np.ones(n_sites, np.float32)
            )
            copies.append((hms, masks))
        row_out = dict(r)

        # random-retrieval normalizer for the single-touch-style metric
        rng_n = np.random.default_rng(7)
        n_top = 10
        rand_idx = rng_n.integers(0, n_sites, size=(n_sites, n_top))
        rand_err = np.linalg.norm(
            site_xyz[rand_idx] - site_xyz[:, None, :], axis=-1
        ).mean()

        def score(sims, tag):
            top1 = sims.argmax(axis=1)
            acc = float(np.mean(top1 == np.arange(n_sites)))
            topn = np.argpartition(-sims, n_top, axis=1)[:, :n_top]
            errn = np.linalg.norm(
                site_xyz[topn] - site_xyz[:, None, :], axis=-1
            ).mean(axis=1)
            row_out[f"top1_acc_{tag}"] = acc
            # the north-star metric shape: normalized top-N pose error
            row_out[f"st_{tag}"] = float(np.median(errn / rand_err))

        variants = [
            ("raw", False, BAND_MM),
            ("rect", True, BAND_MM),
            ("rect_b04", True, 0.4),
            ("raw_b04", False, 0.4),
        ]
        for tag, rectify, band in variants:
            pa = _patches(*copies[0], rectify, band)
            pb = _patches(*copies[1], rectify, band)
            score(_flat_norm(pb) @ _flat_norm(pa).T, tag)
        row_out["wall_s"] = time.time() - t0
        results["rows"].append(row_out)
        print(
            f"{r['name']:26s} "
            + "  ".join(
                f"{tag}: {row_out[f'top1_acc_{tag}']*100:4.1f}%/"
                f"{row_out[f'st_{tag}']:.3f}"
                for tag, _, _ in variants
            )
            + f"  [{row_out['wall_s']:.0f}s]",
            flush=True,
        )

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
