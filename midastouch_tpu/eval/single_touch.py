"""Single-touch embedding benchmark (reference eval/single_touch_test.py).

For every codebook entry, retrieve the top-N most-similar embeddings
(excluding self) and score the mean translation error of the retrieved
poses, normalized by the expected error of random retrieval
(single_touch_test.py:35-89). < 1.0 means the embedding space is
metrically informative; random embeddings score ~1.0.

Run:
    python -m midastouch_tpu.eval.single_touch expt.obj_model=sphere
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from midastouch_tpu.codebook import Codebook
from midastouch_tpu.utils.config import compose


def top_n_error(
    codebook: Codebook,
    n: int = 25,
    chunk: int = 512,
    seed: int = 0,
    return_errors: bool = False,
    query_embeddings: np.ndarray | None = None,
) -> dict:
    """`query_embeddings`: optional (M, E) queries distinct from the
    codebook's stored embeddings, row-aligned with it (row i queries from
    the same touch as db entry i, which is excluded as in the reference
    self-retrieval protocol). Used to score asymmetric deployments — e.g.
    a GT-render-built codebook queried by TDN-estimated live codes."""
    emb = codebook.embeddings  # (M, E) already L2-normalized
    pos = np.asarray(codebook.t)
    m = emb.shape[0]
    if query_embeddings is None:
        q_emb = emb
    else:
        q = jnp.asarray(query_embeddings, dtype=jnp.float32)
        if q.shape[0] != m:
            # the protocol is row-aligned self-retrieval (row i queries the
            # touch stored at db entry i and excludes it); a mismatched row
            # count would silently clamp slices and mis-exclude neighbours
            raise ValueError(
                f"query_embeddings rows ({q.shape[0]}) must equal codebook "
                f"rows ({m}): top_n_error is a row-aligned protocol"
            )
        q_emb = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)

    errors = []
    for i in range(0, m, chunk):
        sims = np.array(q_emb[i : i + chunk] @ emb.T)  # (c, M), writable copy
        rows = np.arange(sims.shape[0])
        sims[rows, rows + i] = -np.inf  # exclude self
        top = np.argpartition(-sims, n, axis=1)[:, :n]
        err = np.linalg.norm(pos[top] - pos[i : i + chunk, None, :], axis=-1)
        errors.append(err.mean(axis=1))
    errors = np.concatenate(errors)

    # random-retrieval normalizer (single_touch_test.py:76-89)
    rng = np.random.default_rng(seed)
    rand_idx = rng.integers(0, m, size=(m, n))
    rand_err = np.linalg.norm(pos[rand_idx] - pos[:, None, :], axis=-1).mean(axis=1)

    normalized = errors / np.maximum(rand_err, 1e-12)

    # embedding-spread diagnostics: collapsed code spaces (random-pair
    # cosine -> 1) make retrieval trivially random regardless of the net
    emb_np = np.asarray(emb)
    i = rng.integers(0, m, 4000)
    j = rng.integers(0, m, 4000)
    pair_cos = np.sum(emb_np[i] * emb_np[j], axis=1)

    out = {
        "median_normalized_error": float(np.median(normalized)),
        "mean_normalized_error": float(np.mean(normalized)),
        "mean_error_m": float(np.mean(errors)),
        "random_error_m": float(np.mean(rand_err)),
        "random_pair_cosine_mean": float(pair_cos.mean()),
        "random_pair_cosine_std": float(pair_cos.std()),
        "n": n,
        "codebook_size": m,
    }
    if return_errors:
        out["normalized_errors"] = normalized
    return out


def benchmark_embeddings(
    objects: list[str],
    n: int = 25,
    out_png: str | None = None,
    out_json: str | None = None,
) -> dict:
    """Per-object single-touch benchmark with violin plots (reference
    eval/single_touch_test.py:92-278): loads each object's codebook,
    scores the normalized top-`n` error distribution, and renders one
    violin per object."""
    import json

    from midastouch_tpu.apps import common

    results, dists = {}, {}
    for obj in objects:
        path = common.codebook_path(obj)
        try:
            cb = Codebook.load(path)
        except FileNotFoundError:
            print(f"[single_touch] no codebook for {obj} ({path}); skipped")
            continue
        r = top_n_error(cb, n=n, return_errors=True)
        dists[obj] = r.pop("normalized_errors")
        results[obj] = r
        print(
            f"{obj:16s} median={r['median_normalized_error']:.3f} "
            f"mean={r['mean_normalized_error']:.3f} (M={r['codebook_size']})"
        )

    if dists and out_png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(2 + 1.2 * len(dists), 4))
        ax.violinplot(
            [dists[o] for o in dists], showmedians=True, showextrema=False
        )
        ax.axhline(1.0, color="gray", linestyle="--", linewidth=0.8,
                   label="random retrieval")
        ax.set_xticks(range(1, len(dists) + 1), list(dists), rotation=30)
        ax.set_ylabel(f"top-{n} normalized pose error")
        ax.set_title("single-touch localization by object")
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(out_png, dpi=120)
        plt.close(fig)
        print(f"violin plot -> {out_png}")
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=2)
    return results


def main(argv=None):
    """Single object: `... expt.obj_model=potato`. Multi-object driver with
    violins (reference single_touch_test.py:207-278):
    `... objects=potato,rock [out=single_touch.png]`."""
    from midastouch_tpu.apps import common

    argv = argv if argv is not None else sys.argv[1:]
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    if "objects" in kv:
        benchmark_embeddings(
            kv["objects"].split(","),
            out_png=kv.get("out", "single_touch_violins.png"),
            out_json=kv.get("out_json"),
        )
        return
    cfg = compose(argv)
    cb = Codebook.load(common.codebook_path(str(cfg.expt.obj_model)))
    out = top_n_error(cb)
    print(out)


if __name__ == "__main__":
    main()
