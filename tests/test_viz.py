"""Viz helpers: static plots, RMSE graph, TSNE orbit video (reference
viz/helpers.py:18-253 — pyvista there, matplotlib at the host boundary
here)."""

import os

import numpy as np
import pytest

from midastouch_tpu.geometry import procedural
from midastouch_tpu.viz import helpers

pytestmark = pytest.mark.slow  # matplotlib 3-D rendering is seconds-slow


def _poses(n=5, seed=0):
    rng = np.random.default_rng(seed)
    p = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    p[:, :3, 3] = rng.normal(scale=0.02, size=(n, 3))
    return p


def test_viz_poses_pointclouds_on_mesh(tmp_path):
    mesh = procedural.icosphere(subdivisions=2)
    out = helpers.viz_poses_pointclouds_on_mesh(
        mesh, _poses(), [np.random.default_rng(1).normal(size=(50, 3)) * 0.01],
        save_path=str(tmp_path / "poses.png"),
    )
    assert os.path.exists(out)


def test_draw_graph_png_and_video(tmp_path):
    t = np.arange(200)
    rmse = 0.05 * np.exp(-t / 60.0) + 0.002
    out = helpers.draw_graph(
        t, rmse, str(tmp_path / "rmse_t"), flag="t", animate=True, smooth=50
    )
    assert os.path.exists(out)
    base = str(tmp_path / "rmse_t")
    assert os.path.exists(base + ".mp4") or os.path.exists(base + ".gif")


def test_tsne_orbit_video(tmp_path):
    mesh = procedural.icosphere(subdivisions=2)
    rng = np.random.default_rng(0)
    pos = mesh.vertices[rng.choice(len(mesh.vertices), 60, replace=False)]
    emb = rng.normal(size=(60, 16)).astype(np.float32)
    out = helpers.viz_embedding_tsne(
        mesh, pos, emb, save_path=str(tmp_path / "tsne.png"), orbit_frames=6
    )
    assert os.path.exists(out)
    base = str(tmp_path / "tsne.png")
    assert os.path.exists(base + ".mp4") or os.path.exists(base + ".gif")
