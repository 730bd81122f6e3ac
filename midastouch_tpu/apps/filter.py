"""Sim-log filtering app (reference: filter/filter.py:42-281).

Loads a generated dataset, runs the fused sense-update loop, tracks the
reference's stats (per-stage timers, RMSE, cluster sigma, Hz), and writes
`filter_stats.npy` plus an optional results video.

Run:
    python -m midastouch_tpu.apps.filter expt=test expt.obj_model=sphere
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
from midastouch_tpu.utils import dataio
from midastouch_tpu.utils.config import compose
from midastouch_tpu.utils.misc import StageTimer, images_to_video, remove_and_mkdir


def run_filter(cfg, viz=None, seed: int = 0, realtime: bool = True) -> dict:
    expt = cfg.expt
    obj_model = str(expt.obj_model)
    log_id = str(expt.log_id).zfill(2)
    init_particles = int(expt.params.num_particles)
    frame_rate = float(expt.frame_rate)
    small = common.small_parts(obj_model)

    # results dir with trial numbering (filter.py:61-68)
    results_root = os.path.join(os.getcwd(), "output", obj_model, log_id)
    trial = 0
    while os.path.exists(os.path.join(results_root, f"trial_{trial:02d}")):
        trial += 1
    results_path = os.path.join(results_root, f"trial_{trial:02d}")
    remove_and_mkdir(results_path)

    # data
    data_path = dataio.dataset_path(obj_model, expt.log_id)
    camposes, gelposes, meas_p = dataio.load_poses(data_path)
    images = dataio.load_images(data_path, expt.max_length)
    traj_size = min(len(images), len(gelposes))
    gt_p = jnp.asarray(gelposes)

    # optional GT-sensing ablation: bypass the TDN, feed ground-truth
    # heightmaps/masks straight to the TCN (validates the inference core
    # independent of depth-net quality)
    use_gt = bool(expt.get("use_gt_heightmaps", False))
    gt_heightmaps = gt_masks = None
    if use_gt:
        gt_heightmaps = dataio.load_heightmaps(data_path, expt.max_length)
        gt_masks = dataio.load_masks(data_path, expt.max_length)

    # stacks
    mesh = common.resolve_mesh(obj_model)
    renderer = common.make_renderer(cfg, mesh)
    tdn, tcn = common.make_nets(cfg, bg=renderer.get_background("gel"))
    pf = ParticleFilter.from_config(cfg, mesh)
    codebook = Codebook.load(common.codebook_path(obj_model))
    ann_index = (
        codebook.build_ann_index() if bool(cfg.tpu.get("codebook_ann")) else None
    )
    step = FilterStep(
        pf, codebook, tdn=tdn, tcn=tcn, floor=1000, small_parts=small,
        ann_index=ann_index,
    )

    key = jax.random.PRNGKey(seed)
    timer = StageTimer()
    stats = {
        "rmse_t": [], "rmse_r": [], "time": [], "traj_size": traj_size,
        "avg_time": None, "total_time": 0.0, "cluster_poses": [],
        "cluster_stds": [], "obj_name": obj_model, "tree_size": len(codebook),
        "noise_ratio": float(expt.params.noise_ratio),
        "init_particles": init_particles, "num_particles": [],
        "log_id": log_id, "trial_id": trial,
    }

    state = None
    prev_idx, count = 0, 0
    while True:
        # real-time replay indexing (filter.py:134-140)
        idx = int(frame_rate * stats["total_time"]) if realtime else count
        if idx >= traj_size:
            break

        key, k_sense, k_step = jax.random.split(key, 3)

        timer.start("tactile")
        if use_gt:
            heightmap = jnp.asarray(gt_heightmaps[idx])
            mask = jnp.asarray(gt_masks[idx])
            code = tcn.cloud_to_tactile_code(heightmap, mask, key=k_sense)
        else:
            code, heightmap, mask = step.sense(images[idx], k_sense)
        timer.stop(code)

        timer.start("motion")
        if state is None:
            state = step.initialize(k_step, gt_p[idx], init_particles)
            odom_q = jnp.array([1.0, 0, 0, 0])
            odom_t = jnp.zeros(3)
            timer.stop(state.t)
            # stats for t=0 (no update yet)
            rmse_t, rmse_r = pf.rmse(state, gt_p[idx])
            stats["rmse_t"].append(float(rmse_t))
            stats["rmse_r"].append(float(rmse_r))
            stats["num_particles"].append(int(state.n_active))
            stats["time"].append(timer.iteration_time())
            stats["total_time"] = sum(stats["time"])
            prev_idx, count = idx, count + 1
            continue
        odom = se3.tf_inverse(jnp.asarray(meas_p[prev_idx])) @ jnp.asarray(
            meas_p[idx]
        )
        odom_q = se3.matrix_to_quat(odom[:3, :3])
        odom_t = odom[:3, 3]
        timer.stop(odom_t)

        timer.start("meas")
        state, sstats = step.update(
            state, k_step, code, odom_q, odom_t, gt_p[idx],
            do_cluster=(count % 50 == 0), do_measurement=True,
        )
        timer.stop(state.t)

        stats["rmse_t"].append(float(sstats.rmse_t))
        stats["rmse_r"].append(float(sstats.rmse_r))
        stats["cluster_poses"].append(np.asarray(sstats.cluster_poses))
        stats["cluster_stds"].append(np.asarray(sstats.cluster_stds))
        stats["num_particles"].append(int(sstats.n_active))
        stats["time"].append(timer.iteration_time())
        stats["total_time"] = sum(stats["time"])

        if viz is not None:
            viz.update(
                state=state,
                cluster_poses=np.asarray(sstats.cluster_poses),
                cluster_stds=np.asarray(sstats.cluster_stds),
                gt_pose=np.asarray(camposes[idx]),
                heatmap_weights=np.asarray(step.heatmap_weights(code)),
                image=images[idx],
                heightmap=np.asarray(heightmap),
                mask=np.asarray(mask),
                frame=idx,
                image_savepath=os.path.join(results_path, f"{idx}.png"),
                codebook_positions=np.asarray(codebook.t),
            )

        print(
            f"[{idx}/{traj_size}] RMSE: {1000*stats['rmse_t'][-1]:.1f} mm, "
            f"{stats['rmse_r'][-1]:.0f} deg, P: {int(sstats.n_active)}, "
            f"rate: {1.0/max(stats['time'][-1], 1e-9):.2f} Hz",
            flush=True,
        )
        prev_idx = idx
        count += 1

    stats["avg_time"] = (
        sum(stats["time"]) / max(len(stats["time"]), 1)
    )
    avg = timer.averages()
    print(
        f"Total time: {stats['total_time']:.3f}, per-iteration: {stats['avg_time']:.3f}\n"
        f"Avg time: tactile: {avg.get('tactile', 0):.3f}, motion: "
        f"{avg.get('motion', 0):.3f}, meas: {avg.get('meas', 0):.3f}"
    )
    np.save(os.path.join(results_path, "filter_stats.npy"), stats, allow_pickle=True)
    if viz is not None:
        images_to_video(results_path)
    return stats


def main(argv=None):
    cfg = compose(argv if argv is not None else sys.argv[1:])
    viz = None
    if bool(cfg.expt.render):
        from midastouch_tpu.viz.visualizer import Viz

        viz = Viz(off_screen=bool(cfg.expt.off_screen))
        viz.init_variables(
            obj_model=str(cfg.expt.obj_model),
            mesh=common.resolve_mesh(str(cfg.expt.obj_model)),
        )
    run_filter(cfg, viz=viz)


if __name__ == "__main__":
    main()
