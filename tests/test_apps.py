"""Full-pipeline integration: generate data -> build codebook -> filter.

Small procedural-sphere configuration, GT-heightmap sensing path (the TDN
is untrained in CI), asserting the pipeline runs end to end and produces
the reference-format stats."""

import os

import numpy as np
import pytest

from midastouch_tpu.utils import misc
from midastouch_tpu.utils.config import compose

OVERRIDES = [
    "expt=test",
    "expt.obj_model=sphere",
    "expt.codebook_size=300",
    "expt.params.num_particles=512",
    "expt.use_gt_heightmaps=true",
    "expt.render=false",
    "datagen.num_frames=25",
    "tdn.render.width=60",
    "tdn.render.height=80",
    "tcn.model.grid_size=16",
    "tcn.model.num_points=512",
    "tcn.model.batch_size=64",
    "tcn.model.planes=[8,16,16]",
    "tcn.model.feature_size=32",
    "tcn.model.output_dim=32",
    "tpu.backend=xla",
    "tpu.render_max_faces=512",
    "tpu.cluster_max_points=256",
]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    old = dict(misc.DIRS)
    misc.DIRS.update(
        {
            "data": str(root / "data"),
            "weights": str(root / "data" / "weights"),
            "trees": str(root / "data" / "codebooks"),
            "obj_models": str(root / "data" / "obj_models"),
        }
    )
    yield root
    misc.DIRS.update(old)


@pytest.fixture(scope="module")
def cfg():
    # procedural sphere needs a denser mesh than default for the drift gate
    return compose(OVERRIDES)


def test_generate_data(workspace, cfg):
    from midastouch_tpu.apps.generate_data import touch_simulator

    out = touch_simulator(cfg, seed=0)
    assert os.path.exists(os.path.join(out, "tactile_data.npz"))
    from midastouch_tpu.utils import dataio

    cam, gel, meas = dataio.load_poses(out)
    assert cam.shape == (25, 4, 4)
    imgs = dataio.load_images(out)
    assert imgs.shape == (25, 80, 60, 3)
    hms = dataio.load_heightmaps(out)
    masks = dataio.load_masks(out)
    assert hms.shape == (25, 80, 60) and masks.dtype == bool
    # trajectory is smooth: consecutive gel positions close
    d = np.linalg.norm(np.diff(gel[:, :3, 3], axis=0), axis=1)
    assert d.max() < 0.002
    # most frames make contact
    assert sum(m.any() for m in masks) > 15


def test_build_codebook(workspace, cfg):
    from midastouch_tpu.apps.build_codebook import build_codebook

    cb = build_codebook(cfg, use_gt_heightmaps=True, seed=1)
    assert len(cb) == 300
    assert os.path.exists(
        os.path.join(misc.DIRS["trees"], "sphere", "codebook.npz")
    )
    emb = np.asarray(cb.embeddings)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # embeddings vary across poses (net untrained but geometry differs)
    assert np.std(emb) > 1e-4


def test_run_filter(workspace, cfg):
    from midastouch_tpu.apps.filter import run_filter

    cwd = os.getcwd()
    os.chdir(workspace)
    try:
        stats = run_filter(cfg, viz=None, realtime=False)
    finally:
        os.chdir(cwd)
    assert len(stats["rmse_t"]) == 25
    assert np.all(np.isfinite(stats["rmse_t"]))
    assert stats["tree_size"] == 300
    assert all(n > 0 for n in stats["num_particles"])
    # stats file written in reference format
    out_root = os.path.join(workspace, "output", "sphere", "00", "trial_00")
    assert os.path.exists(os.path.join(out_root, "filter_stats.npy"))


def test_live_demo_synthetic(workspace, cfg):
    """Live-demo loop with the synthetic frame source (needs the codebook
    built by test_build_codebook)."""
    from midastouch_tpu.apps.live_demo import live_demo

    peaks = live_demo(cfg, source="synthetic", max_frames=3)
    assert len(peaks) == 3
    assert all(np.isfinite(p) for p in peaks)


def test_sweep_filter(workspace, cfg):
    from midastouch_tpu.apps.sweep import run_sweep

    cwd = os.getcwd()
    os.chdir(workspace)
    try:
        out = run_sweep("filter", ["sphere"], [0], OVERRIDES)
    finally:
        os.chdir(cwd)
    assert ("sphere", 0) in out
    assert np.isfinite(out[("sphere", 0)]["mean_rmse_t_mm"])
