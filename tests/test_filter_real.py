"""filter_real path: OptiTrack cleanup, pose extraction, full app run on a
synthetic 'real' dataset (procedural mesh + rendered frames)."""

import os

import numpy as np
import pytest

from midastouch_tpu.apps.filter_real import clean_up_optitrack, extract_poses_real


def test_clean_up_optitrack_drops_jumps():
    n = 30
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 0.001  # smooth 1 mm steps
    poses[15, 0, 3] += 0.5  # huge jump
    out = clean_up_optitrack(poses)
    assert len(out) == n - 1
    d = np.abs(np.diff(out[:, 0, 3]))
    assert d.max() < 0.01


def test_extract_poses_real(tmp_path):
    n = 12
    obj = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    obj[:, :3, 3] = [0.5, 0.2, 0.1]  # static object in world frame
    cam = obj.copy()
    cam[:, 2, 3] += 0.022 + np.linspace(0, 0.005, n)  # sensor above object

    pose_file = tmp_path / "synced_data.npy"
    np.save(pose_file, {"poses": {"DIGIT": cam, "myobj": obj}},
            allow_pickle=True)
    align_file = tmp_path / "alignment.npy"
    np.save(align_file, np.eye(4, dtype=np.float32))

    gt_cam, gt_gel = extract_poses_real(
        str(pose_file), str(align_file), "myobj", subsample=2, cam_dist=0.022
    )
    assert gt_cam.shape[0] == gt_gel.shape[0]
    # object-relative: camera sits on the +z axis of the object frame
    np.testing.assert_allclose(gt_cam[0, :3, 3][:2], 0, atol=1e-6)
    # gel = cam shifted cam_dist along -z
    np.testing.assert_allclose(
        gt_gel[0, :3, 3], gt_cam[0, :3, 3] - [0, 0, 0.022], atol=1e-6
    )


@pytest.mark.slow
def test_run_filter_real_smoke(tmp_path, monkeypatch):
    """End-to-end filter_real on synthetic OptiTrack-style data."""
    import jax.numpy as jnp

    from midastouch_tpu.apps import common
    from midastouch_tpu.geometry.trajectories import random_surface_walk
    from midastouch_tpu.utils import misc
    from midastouch_tpu.utils.config import compose

    old = dict(misc.DIRS)
    misc.DIRS.update({
        "data": str(tmp_path / "data"),
        "weights": str(tmp_path / "data" / "weights"),
        "trees": str(tmp_path / "data" / "codebooks"),
        "obj_models": str(tmp_path / "data" / "obj_models"),
    })
    try:
        cfg = compose([
            "expt=test", "expt.obj_model=sphere",
            "expt.params.num_particles=256", "expt.codebook_size=64",
            "tdn.render.width=60", "tdn.render.height=80",
            "tcn.model.grid_size=16", "tcn.model.num_points=256",
            "tcn.model.planes=[8,16,16]", "tcn.model.feature_size=32",
            "tcn.model.output_dim=32", "tcn.model.batch_size=16",
            "tpu.backend=xla", "tpu.render_max_faces=256",
            "tpu.cluster_max_points=128",
        ])
        rng = np.random.default_rng(0)
        mesh = common.resolve_mesh("sphere")
        renderer = common.make_renderer(cfg, mesh)

        # tiny codebook
        from midastouch_tpu.apps.build_codebook import build_codebook

        build_codebook(cfg, use_gt_heightmaps=True, seed=0)

        # synthetic "real" log: walk + rendered frames + identity alignment
        n = 8
        gel = random_surface_walk(mesh, n, rng)
        cam = gel.copy()
        cam[:, :3, 3] += cam[:, :3, 2] * 0.022
        log_dir = tmp_path / "data" / "real" / "sphere" / "dataset_0"
        frames_dir = log_dir / "frames"
        os.makedirs(frames_dir)
        for i in range(n):
            rgb, *_ = renderer.render(gel[i], 0.0015)
            misc.save_image(
                str(frames_dir / f"{i}.png"),
                (np.asarray(rgb) * 255).astype(np.uint8),
            )
        np.save(log_dir / "synced_data.npy",
                {"poses": {"DIGIT": cam, "sphere": np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))}},
                allow_pickle=True)
        np.save(tmp_path / "data" / "real" / "sphere" / "alignment.npy",
                np.eye(4, dtype=np.float32))

        from midastouch_tpu.apps.filter_real import run_filter_real

        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            stats = run_filter_real(cfg, viz=None, realtime=False)
        finally:
            os.chdir(cwd)
        assert stats["traj_size"] >= 3
        assert all(np.isfinite(stats["rmse_t"]))
    finally:
        misc.DIRS.update(old)
