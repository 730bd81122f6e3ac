"""Live-demo visualizer (reference viz/demo_visualizer.py:26-342):
two panes — tactile image + heightmap, and the codebook similarity
heatmap on the object (90th-percentile threshold, :238)."""

from __future__ import annotations

import numpy as np


class DemoViz:
    def __init__(self, mesh, obj_model: str = "", off_screen: bool = True,
                 save_dir: str | None = None):
        import matplotlib

        if off_screen:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.plt = plt
        self.mesh = mesh
        self.obj_model = obj_model
        self.off_screen = off_screen
        self.save_dir = save_dir
        self.fig = plt.figure(figsize=(10, 5))
        self.frame = 0

    def update_demo(self, image, heightmap, mask, sims, codebook_positions):
        fig = self.fig
        fig.clf()

        ax1 = fig.add_subplot(2, 2, 1)
        ax1.imshow(np.asarray(image))
        ax1.set_title("tactile image")
        ax1.axis("off")

        ax2 = fig.add_subplot(2, 2, 3)
        hm = np.asarray(heightmap).astype(float)
        hm[~np.asarray(mask)] = np.nan
        ax2.imshow(hm, cmap="viridis")
        ax2.set_title("heightmap (contact)")
        ax2.axis("off")

        ax3 = fig.add_subplot(1, 2, 2, projection="3d")
        v = self.mesh.vertices
        sub = max(len(v) // 2000, 1)
        ax3.scatter(*v[::sub].T, s=1, c="lightgray", alpha=0.4)
        w = np.asarray(sims)
        keep = w >= np.quantile(w, 0.9)  # 90th percentile (reference :238)
        p = np.asarray(codebook_positions)[keep]
        if len(p):
            sc = ax3.scatter(*p.T, s=4, c=w[keep], cmap="inferno")
            fig.colorbar(sc, ax=ax3, shrink=0.5)
        ax3.set_title(f"{self.obj_model} similarity")
        ax3.set_axis_off()

        if self.save_dir:
            fig.savefig(f"{self.save_dir}/{self.frame}.png", dpi=80)
        if not self.off_screen:
            self.plt.pause(0.001)
        self.frame += 1

    def close(self):
        self.plt.close(self.fig)
