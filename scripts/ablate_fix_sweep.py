"""Measured countermeasures for the est-heightmap retrieval collapse.

DIAGNOSIS_est_boulder.json: per-render patch transfer GT->est is good
(cos 0.94-0.97) but the TDN's in-mask centered RMSE (0.168 mm) is half
the GT relief std (0.355 mm) — in PCA-whitened space the common patch
structure is removed and weak directions amplified, so estimation noise
dominates the discriminative signal. Candidates, all scored on the cached
ablation bank (self-retrieval single-touch, protocol of
eval_patch_codebook.py):

  * whiten-floor sweep on est/est (less whitening = less noise gain)
  * pool sweep (noise is higher-frequency than the 6x6 relief layout)
  * GT-built codebook + est queries: the codebook build HAS GT renders;
    only the live query must use the TDN estimate. If TDN error is random
    (not systematic), a clean database halves the noise.
  * ridge readout: closed-form W = argmin ||X_est W - E_gt||^2 + l*||W||^2
    fitted on the paired (est, GT) bank — a denoising linear projection
    the codebook build can fit for free. Scored both self-fit (protocol
    parity with PatchPCA) and split-half (fit 5k / score the other 5k).

Run:  python scripts/ablate_fix_sweep.py [obj=boulder]
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

import numpy as np  # noqa: E402

from midastouch_tpu.codebook import Codebook  # noqa: E402
from midastouch_tpu.eval.single_touch import top_n_error  # noqa: E402

import eval_patch_codebook as epc  # noqa: E402


def pool(x, k):
    n_, h_, w_, c_ = x.shape
    return x.reshape(n_, h_ // k, k, w_ // k, k, c_).mean((2, 4))


def embed_pca(x, floor):
    return epc.pca_embed(x, whiten_floor=floor)


def normalize(e):
    return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)


def score(emb_query, gelposes, camposes, emb_db=None):
    """Single-touch top-25 with optionally distinct query/db embeddings
    (db defaults to query = the standard self-retrieval protocol)."""
    if emb_db is None:
        cb = Codebook.from_poses(gelposes, camposes, emb_query.astype(np.float32))
        return top_n_error(cb, n=25)
    # cross protocol: query i against db rows j != i
    cb = Codebook.from_poses(gelposes, camposes, emb_db.astype(np.float32))
    return top_n_error(cb, n=25, query_embeddings=emb_query.astype(np.float32))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    out_path = kv.get("out", f"FIX_SWEEP_{obj}.json")
    bank = np.load(os.path.join("data", "codebooks", obj, "ablation_bank_10000.npz"))
    gel, cam = bank["gelposes"], bank["camposes"]
    n = len(gel)

    patches_path = os.path.join(
        "data", "codebooks", obj, "ablation_patches.npz"
    )
    if os.path.exists(patches_path):
        pz = np.load(patches_path)
        p_gt, p_est = pz["p_gt"].astype(np.float32), pz["p_est"].astype(np.float32)
    else:
        print("computing canonical 48x48 patches (gt/gt and est/est)...")
        p_gt = epc.canonical_patches(
            bank["gt_hm"].astype(np.float32), bank["gt_mask"],
            rectify=True, band_mm=0.7,
        )
        p_est = epc.canonical_patches(
            bank["est_hm"].astype(np.float32), bank["est_mask"],
            rectify=True, band_mm=0.7,
        )
        np.savez(patches_path, p_gt=p_gt.astype(np.float16),
                 p_est=p_est.astype(np.float16))

    results = {"obj": obj, "n": n, "variants": []}

    def run(tag, fn):
        t0 = time.perf_counter()
        st = fn()
        row = {"tag": tag,
               "st_median": round(st["median_normalized_error"], 4),
               "st_mean": round(st["mean_normalized_error"], 4),
               "wall_s": round(time.perf_counter() - t0, 1)}
        results["variants"].append(row)
        print(f"{tag:34s} st_median={row['st_median']:.3f}", flush=True)

    x_gt8 = pool(p_gt, 8)
    x_est8 = pool(p_est, 8)

    # baselines on this bank
    run("gt_p8_floor0.2", lambda: score(embed_pca(x_gt8, 0.2), gel, cam))
    run("est_p8_floor0.2", lambda: score(embed_pca(x_est8, 0.2), gel, cam))

    # 1) whiten-floor sweep on est/est
    for floor in (0.5, 1.0):
        run(f"est_p8_floor{floor}",
            lambda floor=floor: score(embed_pca(x_est8, floor), gel, cam))

    # 2) pool sweep on est/est
    for k in (4, 12, 16):
        run(f"est_p{k}_floor0.2",
            lambda k=k: score(embed_pca(pool(p_est, k), 0.2), gel, cam))

    # 3) GT-built codebook, est queries (PCA fitted on GT patches)
    def cross_gt_db(floor=0.2, k=8):
        xg = pool(p_gt, k).reshape(n, -1).astype(np.float32)
        xe = pool(p_est, k).reshape(n, -1).astype(np.float32)
        fit = xg
        mean = fit.mean(0)
        _, s, vt = np.linalg.svd(fit - mean, full_matrices=False)
        e = min(256, len(s))
        scale = 1.0 / np.maximum(s[:e], floor * max(s[0], 1e-12))
        comps = (vt[:e] * scale[:, None]).T
        eg = normalize((xg - mean) @ comps)
        ee = normalize((xe - mean) @ comps)
        return score(ee, gel, cam, emb_db=eg)

    run("cross_gtdb_estq_p8", cross_gt_db)

    # 4) ridge readout est -> GT embedding
    def ridge(lam, split=False, k=8, floor=0.2):
        xg = pool(p_gt, k).reshape(n, -1).astype(np.float64)
        xe = pool(p_est, k).reshape(n, -1).astype(np.float64)
        mean_g = xg.mean(0)
        _, s, vt = np.linalg.svd(xg - mean_g, full_matrices=False)
        e = min(256, len(s))
        scale = 1.0 / np.maximum(s[:e], floor * max(s[0], 1e-12))
        comps = (vt[:e] * scale[:, None]).T
        eg = normalize((xg - mean_g) @ comps)  # targets
        me = xe.mean(0)
        xc = xe - me
        fit_idx = np.arange(n // 2) if split else np.arange(n)
        sc_idx = np.arange(n // 2, n) if split else np.arange(n)
        A = xc[fit_idx]
        W = np.linalg.solve(
            A.T @ A + lam * np.trace(A.T @ A) / A.shape[1] * np.eye(A.shape[1]),
            A.T @ eg[fit_idx],
        )
        ee = normalize(xc[sc_idx] @ W)
        return score(ee.astype(np.float32), gel[sc_idx], cam[sc_idx])

    for lam in (1e-3, 1e-2, 1e-1):
        run(f"ridge_l{lam}_selffit", lambda lam=lam: ridge(lam))
    run("ridge_l1e-2_split", lambda: ridge(1e-2, split=True))

    # 5) ridge queries against the GT db (the deployable combination:
    #    db = GT-patch PCA codes, live query = ridge readout of est patch)
    def ridge_cross(lam=1e-2, k=8, floor=0.2):
        xg = pool(p_gt, k).reshape(n, -1).astype(np.float64)
        xe = pool(p_est, k).reshape(n, -1).astype(np.float64)
        mean_g = xg.mean(0)
        _, s, vt = np.linalg.svd(xg - mean_g, full_matrices=False)
        e = min(256, len(s))
        scale = 1.0 / np.maximum(s[:e], floor * max(s[0], 1e-12))
        comps = (vt[:e] * scale[:, None]).T
        eg = normalize((xg - mean_g) @ comps)
        me = xe.mean(0)
        xc = xe - me
        A = xc
        W = np.linalg.solve(
            A.T @ A + lam * np.trace(A.T @ A) / A.shape[1] * np.eye(A.shape[1]),
            A.T @ eg,
        )
        ee = normalize(xc @ W)
        return score(ee.astype(np.float32), gel, cam,
                     emb_db=eg.astype(np.float32))

    run("ridge_cross_gtdb", ridge_cross)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
