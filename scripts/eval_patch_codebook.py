"""Dense-codebook variant sweep for the canonical-patch embedding.

The sparse-site diagnosis (scripts/diagnose_embedding.py) showed patch
cosine behaves like a FINGERPRINT — exact-site retrieval works, but
similarity does not decay smoothly with pose distance, so sparse-site
top-N metrics look pessimistic. The metric that matters (reference
eval/single_touch_test.py) runs on a DENSE codebook (mm spacing), where
fingerprint matching retrieves true near-neighbors. This script:

  1. renders a dense GT-heightmap codebook ONCE (randomized press/shear/
     yaw exactly like apps/build_codebook.py) and caches the raw
     heightmaps + masks + poses to disk,
  2. for each (rectify, band_mm) canonical variant: computes canonical
     patches, fits PatchPCA, embeds, and scores the reference
     single-touch top-25 normalized pose error.

Run: python scripts/eval_patch_codebook.py [obj=boulder] [n=5000]
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
from midastouch_tpu.eval.single_touch import top_n_error  # noqa: E402
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh  # noqa: E402
from midastouch_tpu.ops import image as image_ops  # noqa: E402
from midastouch_tpu.utils.config import compose  # noqa: E402

PIXMM = 0.03
CANON = 48
CROP_PX = 192.0


def render_raw_bank(cfg, obj: str, n: int, path: str, seed: int = 3):
    """Render n randomized touches (GT heightmaps); cache to disk."""
    mesh = common.resolve_mesh(obj)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=seed)
    rng = np.random.default_rng(seed)
    poses = sample_poses_on_mesh(
        mesh, n, rng, edges=False,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )
    hms_l, masks_l, gel_l, cam_l = [], [], [], []
    t0 = time.perf_counter()
    for i in range(0, n, 256):
        hms, masks, _, cams, gels = renderer.render_sensor_poses(
            poses[i:i + 256]
        )
        hms_l.append(hms.astype(np.float16))
        masks_l.append(np.asarray(masks, bool))
        gel_l.append(gels)
        cam_l.append(cams)
        print(f"\r{min(i+256, n)}/{n} "
              f"({min(i+256, n)/(time.perf_counter()-t0):.1f} poses/s)",
              end="", flush=True)
    print()
    np.savez(
        path,
        heightmaps=np.concatenate(hms_l),
        masks=np.concatenate(masks_l),
        gelposes=np.concatenate(gel_l),
        camposes=np.concatenate(cam_l),
    )


def canonical_patches(hms, masks, rectify: bool, band_mm: float):
    band_px = band_mm / PIXMM

    @jax.jit
    def batch(hm, mask):
        def one(h, m):
            h = h.astype(jnp.float32)
            if rectify:
                h, m = image_ops.rectify_tilt(h, m)
            zb, mb = image_ops.depth_band(h, m, band_px=band_px)
            p = image_ops.canonicalize_patch(
                zb, mb, out_h=CANON, out_w=CANON, crop_px=CROP_PX
            )
            pen = p / band_px
            return jnp.stack([pen, (p > 1e-3).astype(jnp.float32)], axis=-1)

        return jax.vmap(one)(hm, mask)

    out = []
    for i in range(0, len(hms), 256):
        h = hms[i:i + 256]
        m = masks[i:i + 256]
        pad = 256 - len(h)
        if pad:
            h = np.concatenate([h, np.zeros((pad,) + h.shape[1:], h.dtype)])
            m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
        r = np.asarray(batch(jnp.asarray(h, jnp.float32), jnp.asarray(m)))
        out.append(r[: 256 - pad if pad else 256])
    return np.concatenate(out)


def pca_embed(inputs: np.ndarray, out_dim: int = 256,
              whiten_floor: float = 0.2, max_rows: int = 3072, seed: int = 0):
    """Soft-whitened PCA projection (models/tcn.py fit_patch_pca logic)."""
    x = inputs.reshape(len(inputs), -1).astype(np.float32)
    fit = x
    if len(fit) > max_rows:
        sel = np.random.default_rng(seed).choice(len(fit), max_rows, False)
        fit = fit[sel]
    mean = fit.mean(0)
    _, s, vt = np.linalg.svd(fit - mean, full_matrices=False)
    e = min(out_dim, len(s))
    scale = 1.0 / np.maximum(s[:e], whiten_floor * max(s[0], 1e-12))
    comps = (vt[:e] * scale[:, None]).T
    emb = (x - mean) @ comps
    return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    n = int(kv.get("n", 5000))
    out_path = kv.get("out", f"PATCH_CODEBOOK_{obj}.json")

    cfg = compose([f"expt.obj_model={obj}", "tpu.render_max_faces=512"])
    bank_path = os.path.join("data", "codebooks", obj, f"raw_bank_{n}.npz")
    os.makedirs(os.path.dirname(bank_path), exist_ok=True)
    if not os.path.exists(bank_path):
        print(f"rendering raw bank -> {bank_path}")
        render_raw_bank(cfg, obj, n, bank_path)
    z = np.load(bank_path)
    hms, masks = z["heightmaps"], z["masks"]
    gelposes, camposes = z["gelposes"], z["camposes"]

    def pool(x, k):
        """k x k average pool of (N, H, W, C)."""
        n_, h_, w_, c_ = x.shape
        return x.reshape(n_, h_ // k, k, w_ // k, k, c_).mean((2, 4))

    variants = [
        {"tag": "rect_b07", "rectify": True, "band": 0.7},
        {"tag": "rect_b07_p2", "rectify": True, "band": 0.7, "pool": 2},
        {"tag": "rect_b07_p4", "rectify": True, "band": 0.7, "pool": 4},
        {"tag": "rect_b07_p8", "rectify": True, "band": 0.7, "pool": 8},
        {"tag": "rect_b07_ms", "rectify": True, "band": 0.7, "multiscale": True},
        {"tag": "raw_b07_p4", "rectify": False, "band": 0.7, "pool": 4},
    ]
    results = {"obj": obj, "n": n, "variants": []}
    pos = gelposes[:, :3, 3]
    for v in variants:
        t0 = time.perf_counter()
        patches = canonical_patches(hms, masks, v["rectify"], v["band"])
        if v.get("pool"):
            patches = pool(patches, v["pool"])
        if v.get("multiscale"):
            fine = patches.reshape(len(patches), -1)
            coarse = pool(patches, 8).reshape(len(patches), -1)
            # equal-energy concat of fine + coarse structure
            fine = fine / np.maximum(np.linalg.norm(fine, axis=1, keepdims=True), 1e-12)
            coarse = coarse / np.maximum(np.linalg.norm(coarse, axis=1, keepdims=True), 1e-12)
            patches = np.concatenate([fine, coarse], axis=1)
        emb = pca_embed(patches)
        cb = Codebook.from_poses(gelposes, camposes, emb.astype(np.float32))
        st = top_n_error(cb, n=25)
        # top-1 sharpness: is the single best match geometrically right?
        sims = emb @ emb.T
        np.fill_diagonal(sims, -np.inf)
        t1 = sims.argmax(1)
        e1 = np.linalg.norm(pos[t1] - pos, axis=1) * 1000  # mm
        v_out = dict(v)
        v_out.update(st)
        v_out["top1_median_mm"] = float(np.median(e1))
        v_out["top1_frac_5mm"] = float(np.mean(e1 < 5.0))
        v_out["wall_s"] = time.perf_counter() - t0
        results["variants"].append(v_out)
        print(
            f"{v['tag']:12s} st_median={st['median_normalized_error']:.3f} "
            f"top1_med={v_out['top1_median_mm']:.1f}mm "
            f"top1<5mm={v_out['top1_frac_5mm']*100:.0f}% "
            f"[{v_out['wall_s']:.0f}s]",
            flush=True,
        )

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
