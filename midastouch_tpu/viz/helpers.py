"""Static plotting helpers (reference viz/helpers.py:18-253).

matplotlib equivalents of the pyvista helpers: poses + point clouds on the
mesh, RGB pose quivers, TSNE-colored embeddings on the surface."""

from __future__ import annotations

import numpy as np


def _axes3d(figsize=(7, 7)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=figsize)
    return fig, fig.add_subplot(projection="3d"), plt


def _draw_mesh(ax, mesh, color="lightgray", max_pts=3000):
    v = mesh.vertices
    sub = max(len(v) // max_pts, 1)
    ax.scatter(*v[::sub].T, s=1, c=color, alpha=0.35)


def draw_poses(ax, poses: np.ndarray, scale: float = 0.01):
    """RGB triad quivers for (N, 4, 4) poses (reference draw_poses
    :109-133)."""
    p = poses[:, :3, 3]
    for axis, color in zip(range(3), ("r", "g", "b")):
        d = poses[:, :3, axis] * scale
        ax.quiver(*p.T, *d.T, color=color, linewidth=0.6, arrow_length_ratio=0.2)


def viz_poses_pointclouds_on_mesh(
    mesh, poses: np.ndarray, pointclouds: list[np.ndarray] | None = None,
    save_path: str | None = None,
):
    """(reference viz_poses_pointclouds_on_mesh :18-74)"""
    fig, ax, plt = _axes3d()
    _draw_mesh(ax, mesh)
    draw_poses(ax, np.asarray(poses))
    if pointclouds:
        for pc in pointclouds:
            if len(pc):
                ax.scatter(*np.asarray(pc).T, s=0.5, alpha=0.5)
    ax.set_axis_off()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def viz_embedding_tsne(
    mesh, positions: np.ndarray, embeddings: np.ndarray,
    save_path: str | None = None, seed: int = 0,
):
    """Embeddings TSNE -> RGB colors on surface points (reference
    viz_embedding_TSNE :187-253)."""
    from midastouch_tpu.eval.viz_codebook import tsne_colors

    colors = tsne_colors(np.asarray(embeddings), seed=seed)
    fig, ax, plt = _axes3d()
    _draw_mesh(ax, mesh)
    ax.scatter(*np.asarray(positions).T, c=colors, s=4)
    ax.set_axis_off()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig
