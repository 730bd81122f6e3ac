"""Measure the likelihood the filter actually consumes (VERDICT r3 #3).

From a cached ablation bank this computes, for the production recipe
(PatchPCA over rectified banded pooled canonical patches on the chosen
stack):

  1. similarity-vs-pose-distance profile — quantiles of pairwise cosine
     per distance bin (the 'smooth kernel vs fingerprint' question, and
     where the softmax temperature should sit),
  2. the 180-degree canonical ambiguity — same-touch cosine between a
     patch and its rotated embedding, and single-touch scored with
     flip-max querying vs plain (ops/image.canonicalize_patch documents
     the ambiguity; this measures whether resolving it pays),
  3. effective-sample-size of softmax weights at several temperatures for
     on-surface particles (how informative one measurement update is).

Writes LIKELIHOOD_<obj>.json + a quantile plot PNG.

Run:  python scripts/likelihood_profile.py [obj=boulder] [tag=v2]
          [stack=est] [n=10000]
"""

from __future__ import annotations

import json
import os
import sys

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


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    tag = kv.get("tag", "v2")
    stack = kv.get("stack", "est")
    n = int(kv.get("n", 10000))
    bank_path = os.path.join(
        "data", "codebooks", obj,
        f"ablation_bank_{n}{'_' + tag if tag else ''}.npz",
    )
    z = np.load(bank_path)
    gel, cam = z["gelposes"], z["camposes"]
    hms = z[f"{stack}_hm"].astype(np.float32)
    masks = z[f"{stack}_mask"]

    patches = epc.canonical_patches(hms, masks, rectify=True, band_mm=0.7)
    x8 = pool(patches, 8)
    # 180-degree flips must share the PCA basis (rotate the patch, not the
    # projection): fit on the originals, apply to both
    x8f = x8[:, ::-1, ::-1, :]
    xf = x8.reshape(len(x8), -1).astype(np.float32)
    xff = x8f.reshape(len(x8f), -1).astype(np.float32)
    fit = xf
    mean = fit.mean(0)
    _, s, vt = np.linalg.svd(fit - mean, full_matrices=False)
    e = min(256, len(s))
    scale = 1.0 / np.maximum(s[:e], 0.2 * max(s[0], 1e-12))
    comps = (vt[:e] * scale[:, None]).T

    def project(a):
        p = (a - mean) @ comps
        return p / np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-12)

    emb = project(xf)
    emb_flip = project(xff)

    out = {"obj": obj, "tag": tag, "stack": stack, "n": n}

    # --- 1. similarity vs pose distance ------------------------------------
    rng = np.random.default_rng(0)
    m = len(emb)
    i = rng.integers(0, m, 200_000)
    j = rng.integers(0, m, 200_000)
    keep = i != j
    i, j = i[keep], j[keep]
    pos = gel[:, :3, 3]
    d_mm = np.linalg.norm(pos[i] - pos[j], axis=1) * 1000
    sim = np.sum(emb[i] * emb[j], axis=1)
    bins = np.array([0, 1, 2, 3, 5, 8, 12, 20, 35, 60, 1000.0])
    prof = []
    for lo, hi in zip(bins[:-1], bins[1:]):
        sel = (d_mm >= lo) & (d_mm < hi)
        if sel.sum() < 30:
            continue
        q = np.quantile(sim[sel], [0.1, 0.5, 0.9])
        prof.append({
            "d_lo_mm": float(lo), "d_hi_mm": float(hi),
            "n": int(sel.sum()),
            "sim_q10": round(float(q[0]), 4),
            "sim_q50": round(float(q[1]), 4),
            "sim_q90": round(float(q[2]), 4),
        })
    out["sim_vs_dist"] = prof

    # --- 2. flip ambiguity ---------------------------------------------------
    self_flip_cos = np.sum(emb * emb_flip, axis=1)
    out["self_flip_cos"] = {
        "q10": round(float(np.quantile(self_flip_cos, 0.1)), 3),
        "q50": round(float(np.quantile(self_flip_cos, 0.5)), 3),
        "q90": round(float(np.quantile(self_flip_cos, 0.9)), 3),
    }
    cb = Codebook.from_poses(gel, cam, emb.astype(np.float32))
    st_plain = top_n_error(cb, n=25)
    out["st_plain"] = round(st_plain["median_normalized_error"], 4)
    # flip-max query: for each query use max(sim(emb_i), sim(flip_i)) per
    # db entry. Equivalent top-25 via scoring both and merging.
    chunk = 512
    errors = []
    for a in range(0, m, chunk):
        s1 = emb[a:a + chunk] @ emb.T
        s2 = emb_flip[a:a + chunk] @ emb.T
        sims = np.maximum(s1, s2)
        rows = np.arange(sims.shape[0])
        sims[rows, rows + a] = -np.inf
        top = np.argpartition(-sims, 25, axis=1)[:, :25]
        err = np.linalg.norm(
            pos[top] - pos[a:a + chunk, None, :], axis=-1
        )
        errors.append(err.mean(axis=1))
    errors = np.concatenate(errors)
    rand_idx = rng.integers(0, m, size=(m, 25))
    rand_err = np.linalg.norm(
        pos[rand_idx] - pos[:, None, :], axis=-1
    ).mean(axis=1)
    out["st_flipmax"] = round(
        float(np.median(errors / np.maximum(rand_err, 1e-12))), 4
    )

    # --- 3. softmax informativeness ------------------------------------------
    # simulate the filter's weighting: a query touch at entry q, particles
    # = the 1024 nearest entries by position (a converged cloud), weights
    # = softmax(sims / T); ESS = 1/sum(w^2) / n. Uninformative -> ESS ~ 1.
    ess_rows = {}
    qidx = rng.integers(0, m, 64)
    d_all = np.linalg.norm(pos[None, :, :] - pos[qidx][:, None, :], axis=-1)
    near = np.argsort(d_all, axis=1)[:, :1024]
    for T in (0.05, 0.1, 0.2, 0.5, 1.0):
        ess = []
        for k, q in enumerate(qidx):
            sims = emb[near[k]] @ emb[q]
            w = np.exp((sims - sims.max()) / T)
            w /= w.sum()
            ess.append(1.0 / np.sum(w**2) / len(w))
        ess_rows[str(T)] = round(float(np.median(ess)), 4)
    out["softmax_ess_by_T"] = ess_rows

    with open(f"LIKELIHOOD_{obj}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        xs = [0.5 * (p["d_lo_mm"] + min(p["d_hi_mm"], 80)) for p in prof]
        ax.fill_between(
            xs, [p["sim_q10"] for p in prof], [p["sim_q90"] for p in prof],
            alpha=0.3, label="q10-q90",
        )
        ax.plot(xs, [p["sim_q50"] for p in prof], marker="o", label="median")
        ax.set_xlabel("pose distance (mm)")
        ax.set_ylabel("embedding cosine")
        ax.set_title(f"{obj} {stack}-stack PatchPCA similarity vs distance")
        ax.legend()
        fig.tight_layout()
        fig.savefig(f"LIKELIHOOD_{obj}.png", dpi=120)
        print(f"wrote LIKELIHOOD_{obj}.png")
    except Exception as exc:  # matplotlib optional
        print(f"plot skipped: {exc}")


if __name__ == "__main__":
    main()
