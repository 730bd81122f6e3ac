"""Codebook TSNE visualization (reference eval/viz_codebook.py:17-58 and
viz/helpers.py:187-253): color codebook positions by a 3-D TSNE of their
embeddings — smooth color fields mean a metrically smooth code space."""

from __future__ import annotations

import os
import sys

import numpy as np

from midastouch_tpu.codebook import Codebook
from midastouch_tpu.utils.config import compose


def tsne_colors(embeddings: np.ndarray, seed: int = 0) -> np.ndarray:
    from sklearn.manifold import TSNE

    z = TSNE(n_components=3, random_state=seed, init="pca").fit_transform(
        np.asarray(embeddings)
    )
    z -= z.min(0)
    z /= np.maximum(z.max(0), 1e-12)
    return z  # (M, 3) rgb in [0,1]


def viz_codebook(cfg, out_path: str | None = None, max_points: int = 5000):
    from midastouch_tpu.apps import common

    obj = str(cfg.expt.obj_model)
    cb = Codebook.load(common.codebook_path(obj))
    emb = np.asarray(cb.embeddings)
    pos = np.asarray(cb.t)
    if len(emb) > max_points:
        idx = np.random.default_rng(0).choice(len(emb), max_points, replace=False)
        emb, pos = emb[idx], pos[idx]
    colors = tsne_colors(emb)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(*pos.T, c=colors, s=3)
    ax.set_title(f"{obj} codebook TSNE")
    ax.set_axis_off()
    out_path = out_path or f"codebook_tsne_{obj}.png"
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    print(f"saved {out_path}")
    return out_path


def main(argv=None):
    cfg = compose(argv if argv is not None else sys.argv[1:])
    viz_codebook(cfg)


if __name__ == "__main__":
    main()
