"""Real-sensor-log filtering app (reference: filter/filter_real.py:48-295).

Deltas from the sim app (SURVEY.md section 3.3):
  * OptiTrack pose extraction: object-relative transform, jump filtering,
    per-frame alignment, cam->gel offset, subsample=2
  * TDN real branch (border 10, ratio 0.9, blend_sz 10)
  * measurement update only every `update_freq` frames, WITHOUT softmax
  * annealing floor 10000

Run:
    python -m midastouch_tpu.apps.filter_real expt.obj_model=...
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.apps import common
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter.pf import ParticleFilter
from midastouch_tpu.filter.step import FilterStep
from midastouch_tpu.ops import se3
from midastouch_tpu.utils import misc
from midastouch_tpu.utils.config import compose
from midastouch_tpu.utils.misc import StageTimer, remove_and_mkdir

UPDATE_FREQ = 1
SUBSAMPLE = 2


def clean_up_optitrack(poses: np.ndarray) -> np.ndarray:
    """Drop frames whose step length exceeds 10x the running mean
    (reference pose.py:458-482)."""
    kept = [poses[0]]
    mags: list[float] = []
    adjusted = 0
    for i in range(1, len(poses)):
        diff = np.linalg.inv(poses[i - 1]) @ poses[i]
        mag = float(np.linalg.norm(diff[:3, 3]))
        mags.append(mag)
        avg = sum(mags) / len(mags)
        if i > 1 and mag > 10 * avg:
            adjusted += 1
        else:
            kept.append(poses[i])
    print(f"Adjusted {adjusted} / {len(poses)} object-sensor poses")
    return np.stack(kept)


def extract_poses_real(
    pose_file: str,
    alignment_file: str,
    obj_model: str,
    subsample: int = 1,
    cam_dist: float = 0.022,
):
    """Real dataset pose extraction (reference pose.py:303-354). Expects
    an npz/npy dict {poses: {DIGIT: (N,4,4), <obj>: (N,4,4)}} in matrices
    or xyz+xyzw quaternion rows."""
    data = np.load(pose_file, allow_pickle=True)
    if hasattr(data, "item"):
        data = data.item()
    cam = np.asarray(data["poses"]["DIGIT"], dtype=np.float32)
    obj = np.asarray(data["poses"][obj_model], dtype=np.float32)
    if cam.ndim == 2 and cam.shape[1] == 7:  # xyz + quat xyzw
        cam = np.asarray(se3.xyzquat_to_tf(jnp.asarray(se3.xyzw_to_wxyz(jnp.asarray(cam)))))
        obj = np.asarray(se3.xyzquat_to_tf(jnp.asarray(se3.xyzw_to_wxyz(jnp.asarray(obj)))))

    cam = np.linalg.inv(obj) @ cam  # object-relative
    cam = clean_up_optitrack(cam)

    alignment = np.load(alignment_file).astype(np.float32)
    gel = np.zeros_like(cam)
    off = np.eye(4, dtype=np.float32)
    off[2, 3] = -cam_dist
    for i in range(len(cam)):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = cam[i, :3, 3]
        cam[i, :3, 3] = (pose @ alignment)[:3, 3]
        gel[i] = cam[i] @ off
    return cam[::subsample], gel[::subsample]


def run_filter_real(cfg, viz=None, seed: int = 0, realtime: bool = True) -> dict:
    expt = cfg.expt
    obj_model = str(expt.obj_model)
    log_id = f"dataset_{expt.log_id}"
    init_particles = int(expt.params.num_particles)
    frame_rate = float(expt.frame_rate)

    results_root = os.path.join(os.getcwd(), "output", obj_model, log_id)
    trial = 0
    while os.path.exists(os.path.join(results_root, f"trial_{trial:02d}")):
        trial += 1
    results_path = os.path.join(results_root, f"trial_{trial:02d}")
    remove_and_mkdir(results_path)

    data_path = os.path.join(misc.DIRS["data"], "real", obj_model, log_id)
    gt_p_cam, gt_p = extract_poses_real(
        os.path.join(data_path, "synced_data.npy"),
        os.path.join(data_path, "..", "alignment.npy"),
        obj_model,
        subsample=SUBSAMPLE,
        cam_dist=float(cfg.tdn.render.cam_dist),
    )
    images = misc.load_images(os.path.join(data_path, "frames"), N=expt.max_length)
    images = images[::SUBSAMPLE]
    traj_size = min(len(images), len(gt_p))
    gt_p_j = jnp.asarray(gt_p)
    meas_p = gt_p  # no extra measurement noise (filter_real.py:133-150)

    mesh = common.resolve_mesh(obj_model)
    renderer = common.make_renderer(cfg, mesh)
    tdn, tcn = common.make_nets(cfg, bg=renderer.get_background("gel"), real=True)
    pf = ParticleFilter.from_config(cfg, mesh, real=True)
    codebook = common.prepare_codebook(
        cfg, Codebook.load(common.codebook_path(obj_model))
    )
    step = FilterStep(pf, codebook, tdn=tdn, tcn=tcn, floor=10000, softmax=False,
                      **common.ann_kwargs(cfg, codebook))

    key = jax.random.PRNGKey(seed)
    timer = StageTimer()
    stats = {
        "rmse_t": [], "rmse_r": [], "time": [], "traj_size": traj_size,
        "num_particles": [], "obj_name": obj_model, "log_id": log_id,
        "tree_size": len(codebook), "total_time": 0.0, "trial_id": trial,
        "cluster_poses": [], "cluster_stds": [],
    }

    state, prev_idx, count = None, 0, 0
    while True:
        idx = int(frame_rate * stats["total_time"]) if realtime else count
        if idx >= traj_size:
            break
        key, k_sense, k_step = jax.random.split(key, 3)

        timer.start("tactile")
        code, angle, heightmap, mask = step.sense(images[idx], k_sense)
        timer.stop(code)

        timer.start("motion")
        if state is None:
            state = step.initialize(k_step, gt_p_j[idx], init_particles)
            timer.stop(state.t)
            prev_idx, count = idx, count + 1
            stats["time"].append(timer.iteration_time())
            stats["total_time"] = sum(stats["time"])
            continue
        odom = se3.tf_inverse(jnp.asarray(meas_p[prev_idx])) @ jnp.asarray(meas_p[idx])
        odom_q = se3.matrix_to_quat(odom[:3, :3])
        odom_t = odom[:3, 3]
        timer.stop(odom_t)

        timer.start("meas")
        # real path: gated measurement without softmax (filter_real.py:205-212)
        do_meas = count % UPDATE_FREQ == 0
        state, sstats = step.update(
            state, k_step, code, odom_q, odom_t, gt_p_j[idx],
            do_cluster=(count % 50 == 0), do_measurement=do_meas,
            live_angle=angle if step.yaw_on else None,
        )
        timer.stop(state.t)

        stats["rmse_t"].append(float(sstats.rmse_t))
        stats["rmse_r"].append(float(sstats.rmse_r))
        stats["num_particles"].append(int(sstats.n_active))
        stats["time"].append(timer.iteration_time())
        stats["total_time"] = sum(stats["time"])
        prev_idx = idx
        count += 1

    np.save(os.path.join(results_path, "filter_stats.npy"), stats, allow_pickle=True)
    return stats


def main(argv=None):
    from midastouch_tpu.utils import runtime

    runtime.setup()
    cfg = compose(argv if argv is not None else sys.argv[1:])
    run_filter_real(cfg)


if __name__ == "__main__":
    main()
