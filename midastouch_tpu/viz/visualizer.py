"""Filter visualizer (reference: viz/visualizer.py — pyvistaqt 3-pane GUI).

pyvista/Qt are not part of this environment, so the host-boundary viz is a
matplotlib figure with the same three panes: particle distribution over
the object, tactile image + estimated heightmap/mask, and the codebook
similarity heatmap. `off_screen=True` renders straight to the per-frame
PNG (later stitched to video), mirroring the reference's screenshot path
(visualizer.py:516-521)."""

from __future__ import annotations

import numpy as np


class Viz:
    def __init__(self, off_screen: bool = True, max_particles_drawn: int = 3000):
        import matplotlib

        if off_screen:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.plt = plt
        self.off_screen = off_screen
        self.max_drawn = max_particles_drawn
        self.pause = False
        self.fig = None
        self.mesh = None
        self.obj_model = None

    def init_variables(self, obj_model: str, mesh, **_):
        self.obj_model = obj_model
        self.mesh = mesh
        self.fig = self.plt.figure(figsize=(12, 5))

    def update(
        self,
        state,
        cluster_poses,
        cluster_stds,
        gt_pose,
        heatmap_weights,
        image,
        heightmap,
        mask,
        frame,
        image_savepath=None,
        codebook_positions=None,
    ):
        fig = self.fig
        fig.clf()

        # pane 1: particles + gt sensor on the object
        ax = fig.add_subplot(1, 3, 1, projection="3d")
        v = self.mesh.vertices
        sub = max(len(v) // 2000, 1)
        ax.scatter(*v[::sub].T, s=1, c="lightgray", alpha=0.4)
        t = np.asarray(state.t)
        alive = np.asarray(state.alive)
        pts = t[alive][: self.max_drawn]
        ax.scatter(*pts.T, s=2, c="tab:blue", alpha=0.6, label="particles")
        ax.scatter(*gt_pose[:3, 3], s=60, c="tab:red", marker="*", label="gt")
        ax.set_title(f"{self.obj_model} frame {frame}")
        ax.set_axis_off()
        ax.legend(loc="upper right", fontsize=7)

        # pane 2: tactile image + heightmap/mask
        ax2 = fig.add_subplot(2, 3, 2)
        ax2.imshow(np.asarray(image))
        ax2.set_title("tactile image")
        ax2.axis("off")
        ax5 = fig.add_subplot(2, 3, 5)
        hm = np.asarray(heightmap).astype(float)
        hm[~np.asarray(mask)] = np.nan
        ax5.imshow(hm, cmap="viridis")
        ax5.set_title("heightmap (contact)")
        ax5.axis("off")

        # pane 3: codebook similarity heatmap (top weights on the surface)
        ax3 = fig.add_subplot(1, 3, 3, projection="3d")
        if codebook_positions is not None:
            w = np.asarray(heatmap_weights)
            thresh = np.quantile(w, 0.6)  # top-40%ile (visualizer.py:424-449)
            keep = w >= thresh
            p = np.asarray(codebook_positions)[keep]
            ax3.scatter(*p.T, s=2, c=w[keep], cmap="inferno")
        ax3.set_title("codebook heatmap")
        ax3.set_axis_off()

        if image_savepath:
            fig.savefig(image_savepath, dpi=70)
        if not self.off_screen:
            self.plt.pause(0.001)

    def close(self):
        if self.fig is not None:
            self.plt.close(self.fig)
