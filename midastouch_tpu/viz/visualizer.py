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
        # viz-resolution vertex/face subsample for the interpolated heatmap
        v = np.asarray(mesh.vertices)
        f = np.asarray(getattr(mesh, "faces", None))
        self._viz_faces = None
        if f is not None and len(f):
            keep = max(len(f) // 1500, 1)
            self._viz_faces = f[::keep]
        self._viz_vertices = v

    @staticmethod
    def _ellipsoid_wire(center, R, radii, n=10):
        """Wireframe ellipsoid (reference visualizer.py:393-402 draws
        pyvista ParametricEllipsoids per cluster; same geometry here)."""
        u = np.linspace(0, 2 * np.pi, n)
        v = np.linspace(0, np.pi, n)
        xyz = np.stack(
            [
                np.outer(np.cos(u), np.sin(v)) * radii[0],
                np.outer(np.sin(u), np.sin(v)) * radii[1],
                np.outer(np.ones_like(u), np.cos(v)) * radii[2],
            ],
            axis=-1,
        )
        return xyz @ R.T + center

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
        t = np.asarray(state.t_rows)
        alive = np.asarray(state.alive)
        pts = t[alive][: self.max_drawn]
        ax.scatter(*pts.T, s=2, c="tab:blue", alpha=0.6, label="particles")
        ax.scatter(*gt_pose[:3, 3], s=60, c="tab:red", marker="*", label="gt")

        # cluster ellipsoids at 2 sigma (reference visualizer.py:393-402)
        if cluster_poses is not None and cluster_stds is not None:
            cp = np.asarray(cluster_poses)
            cs = np.asarray(cluster_stds)
            for k in range(len(cp)):
                radii = 2.0 * cs[k]
                if not np.all(np.isfinite(radii)) or radii.max() <= 0:
                    continue
                wire = self._ellipsoid_wire(cp[k, :3, 3], cp[k, :3, :3], radii)
                ax.plot_wireframe(
                    wire[..., 0], wire[..., 1], wire[..., 2],
                    color="tab:orange", linewidth=0.4, alpha=0.5,
                )
            # sensor ghost at the best cluster: gel footprint + normal
            # (reference draws the DIGIT CAD, visualizer.py:111-113; no CAD
            # asset here, so a wireframe gel plate marks pose + heading)
            best = cp[0]
            hx, hy = 0.012, 0.016
            corners = np.array(
                [[-hx, -hy, 0], [hx, -hy, 0], [hx, hy, 0], [-hx, hy, 0],
                 [-hx, -hy, 0]]
            )
            plate = corners @ best[:3, :3].T + best[:3, 3]
            ax.plot(*plate.T, c="tab:green", linewidth=1.0, alpha=0.9)
            tip = best[:3, 3] + best[:3, 2] * 0.01
            ax.plot(*np.stack([best[:3, 3], tip]).T, c="tab:green",
                    linewidth=1.0, alpha=0.9)

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

        # pane 3: codebook similarity heatmap interpolated onto the mesh
        # (reference visualizer.py:424-449: top-40%ile weights -> mesh)
        ax3 = fig.add_subplot(1, 3, 3, projection="3d")
        if codebook_positions is not None:
            w = np.asarray(heatmap_weights).astype(np.float64)
            thresh = np.quantile(w, 0.6)
            wf = np.where(w >= thresh, w, thresh)  # floor below 60%ile
            p = np.asarray(codebook_positions)
            if self._viz_faces is not None:
                from sklearn.neighbors import NearestNeighbors

                if not hasattr(self, "_vert_nn"):
                    # vertex -> nearest codebook entry, built once
                    nn = NearestNeighbors(n_neighbors=1).fit(p)
                    self._vert_nn = nn.kneighbors(
                        self._viz_vertices, return_distance=False
                    )[:, 0]
                vw = wf[self._vert_nn]
                fw = vw[self._viz_faces].mean(axis=1)
                fw = (fw - fw.min()) / max(fw.max() - fw.min(), 1e-12)
                cmap = self.plt.get_cmap("inferno")
                tri = ax3.plot_trisurf(
                    *self._viz_vertices.T, triangles=self._viz_faces,
                    linewidth=0, antialiased=False, shade=False,
                )
                tri.set_facecolor(cmap(fw))
            else:
                keep = w >= thresh
                ax3.scatter(*p[keep].T, s=2, c=w[keep], cmap="inferno")
        ax3.set_title("codebook heatmap")
        ax3.set_axis_off()

        if image_savepath:
            fig.savefig(image_savepath, dpi=70)
        if not self.off_screen:
            self.plt.pause(0.001)

    def close(self):
        if self.fig is not None:
            self.plt.close(self.fig)
