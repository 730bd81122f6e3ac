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
    codebook: Codebook, n: int = 25, chunk: int = 512, seed: int = 0
) -> dict:
    emb = codebook.embeddings  # (M, E) already L2-normalized
    pos = np.asarray(codebook.t)
    m = emb.shape[0]

    errors = []
    for i in range(0, m, chunk):
        sims = np.array(emb[i : i + chunk] @ emb.T)  # (c, M), writable copy
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

    return {
        "median_normalized_error": float(np.median(normalized)),
        "mean_normalized_error": float(np.mean(normalized)),
        "mean_error_m": float(np.mean(errors)),
        "random_error_m": float(np.mean(rand_err)),
        "random_pair_cosine_mean": float(pair_cos.mean()),
        "random_pair_cosine_std": float(pair_cos.std()),
        "n": n,
        "codebook_size": m,
    }


def main(argv=None):
    from midastouch_tpu.apps import common

    cfg = compose(argv if argv is not None else sys.argv[1:])
    cb = Codebook.load(common.codebook_path(str(cfg.expt.obj_model)))
    out = top_n_error(cb)
    print(out)


if __name__ == "__main__":
    main()
