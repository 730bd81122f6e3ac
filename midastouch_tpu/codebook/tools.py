"""Codebook maintenance tools (reference tactile_tree/process_codebook.py
and test_codebook.py).

  * rewrite_codebooks: bulk-load + re-save codebooks (e.g. after a format
    change or to re-normalize embeddings) (process_codebook.py:17-46)
  * sanity_check: k random SE3 queries must return themselves as nearest
    neighbour (test_codebook.py:22-46, numeric instead of visual)
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from midastouch_tpu.codebook.codebook import Codebook
from midastouch_tpu.utils.misc import DIRS


def rewrite_codebooks(obj_models: list[str], renormalize: bool = True) -> None:
    for obj in obj_models:
        path = os.path.join(DIRS["trees"], obj, "codebook.npz")
        if not os.path.exists(path):
            print(f"skip {obj}: no codebook")
            continue
        cb = Codebook.load(path)
        emb = cb.embeddings
        if renormalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
        Codebook(
            q=cb.q, t=cb.t, cam_q=cb.cam_q, cam_t=cb.cam_t,
            embeddings=emb, keys=cb.keys,
        ).save(path)
        print(f"rewrote {path} ({len(cb)} entries)")


def sanity_check(codebook: Codebook, n_queries: int = 5, seed: int = 0) -> bool:
    """Self-query: the nearest codebook entry to a stored pose must be that
    entry. Returns True when all queries pass."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(codebook), size=n_queries)
    got = np.asarray(
        codebook.se3_nn_idx(codebook.q[idx], codebook.t[idx], backend="xla")
    )
    ok = got == idx
    if not ok.all():
        print(f"sanity check FAILED: queried {idx}, got {got}")
    return bool(ok.all())


if __name__ == "__main__":
    import sys

    rewrite_codebooks(sys.argv[1:])
