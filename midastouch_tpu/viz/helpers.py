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
    save_path: str | None = None, seed: int = 0, orbit_frames: int = 0,
):
    """Embeddings TSNE -> RGB colors on surface points (reference
    viz_embedding_TSNE :187-253). With `orbit_frames` > 0 also writes an
    orbital video <save_path>.mp4 (reference's generate_orbital_path +
    orbit_on_path, helpers.py:230-253)."""
    from midastouch_tpu.eval.viz_codebook import tsne_colors

    colors = tsne_colors(np.asarray(embeddings), seed=seed)
    fig, ax, plt = _axes3d()
    _draw_mesh(ax, mesh)
    ax.scatter(*np.asarray(positions).T, c=colors, s=4)
    ax.set_axis_off()
    if save_path:
        fig.savefig(save_path, dpi=120)
        if orbit_frames > 0:
            import os
            import tempfile

            from midastouch_tpu.utils.misc import images_to_video

            with tempfile.TemporaryDirectory() as td:
                for i in range(orbit_frames):
                    ax.view_init(elev=25.0, azim=360.0 * i / orbit_frames)
                    fig.savefig(os.path.join(td, f"{i}.png"), dpi=90)
                out = images_to_video(td, out_name="orbit.mp4", fps=12)
                if out:
                    dst = save_path + os.path.splitext(out)[1]
                    os.replace(out, dst)
        plt.close(fig)
        return save_path
    return fig


def draw_graph(
    x, y, save_path: str, flag: str = "t", animate: bool = False,
    smooth: int = 50,
):
    """RMSE-vs-timestep chart (reference draw_graph :136-168): rolling-mean
    smoothing, saved as <save_path>.png (+ animated reveal .mp4 when
    `animate`, the reference's FuncAnimation/ffmpeg equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if flag == "t":
        y, ylabel = y * 1000.0, "Avg. translation RMSE (mm)"
    else:
        ylabel = "Avg. rotation RMSE (deg)"
    if smooth > 1 and len(y) > smooth:
        kern = np.ones(smooth) / smooth
        ys = np.convolve(y, kern, mode="full")[: len(y)]
        ys[: smooth - 1] = y[: smooth - 1]  # reference keeps the head as-is
        y = ys

    fig, ax = plt.subplots()
    ax.set_xlabel("Timestep", fontsize=12)
    ax.set_ylabel(ylabel, fontsize=12)
    (line,) = ax.plot(x, y, color="k")
    ax.set_xlim(0, max(len(x), 1))
    ax.set_ylim(0, max(float(y.max()), 1e-9))
    fig.savefig(save_path + ".png", dpi=120, bbox_inches="tight")

    if animate:
        import os
        import tempfile

        from midastouch_tpu.utils.misc import images_to_video

        steps = np.linspace(1, len(x), num=min(60, len(x))).astype(int)
        with tempfile.TemporaryDirectory() as td:
            for i, n in enumerate(steps):
                line.set_data(x[:n], y[:n])
                fig.savefig(os.path.join(td, f"{i}.png"), dpi=90)
            out = images_to_video(td, out_name="graph.mp4", fps=12)
            if out:
                os.replace(out, save_path + os.path.splitext(out)[1])
    plt.close(fig)
    return save_path + ".png"
