"""Sim-log filtering app (reference: filter/filter.py:42-281).

Loads a generated dataset, runs the fused sense-update loop, tracks the
reference's stats (RMSE, cluster sigma, particle count, Hz), and writes
`filter_stats.npy` plus an optional results video.

The loop is latency-aware: odometry for the whole trajectory is
precomputed on device, per-frame statistics stay on device and are
fetched in one transfer at the end — a frame costs exactly two dispatches
(sense, update). `profile_stages=True` restores the reference's blocking
per-stage timers (filter.py:96-97,142-193) at the cost of syncs.

Run:
    python -m midastouch_tpu.apps.filter expt=test expt.obj_model=potato
"""

from __future__ import annotations

import os
import sys
import time

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


@jax.jit
def _relative_odom(meas: jax.Array, prev_idx, idx):
    """Odometry across the ACTUALLY elapsed interval (reference
    filter.py:154: odom = inv(meas_p[prev_idx]) @ meas_p[idx]). Under
    realtime replay, frames are skipped when iterations are slow and
    repeated when they are fast; composing prev->current (rather than
    indexing a precomputed adjacent-frame table) keeps skipped
    displacement and yields identity on repeats."""
    rel = se3.tf_inverse(meas[prev_idx]) @ meas[idx]
    return se3.matrix_to_quat(rel[:3, :3]), rel[:3, 3]


def run_filter(
    cfg,
    viz=None,
    seed: int = 0,
    realtime: bool = True,
    profile_stages: bool = False,
    frame_schedule=None,
) -> dict:
    """`frame_schedule`: optional explicit sequence of frame indices to
    process (overrides the realtime clock) — lets tests force the frame
    skips/repeats that realtime replay produces under load."""
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

    # whole-trajectory adjacent-frame odometry, one op — valid ONLY for the
    # sequential replay fast path (every frame processed exactly once); the
    # realtime loop composes prev_idx->idx per iteration via _relative_odom
    meas_j = jnp.asarray(meas_p[:traj_size])
    odom_all = se3.tf_inverse(meas_j[:-1]) @ meas_j[1:]
    odom_q_all = jnp.concatenate(
        [jnp.array([[1.0, 0, 0, 0]]), se3.matrix_to_quat(odom_all[:, :3, :3])]
    )
    odom_t_all = jnp.concatenate([jnp.zeros((1, 3)), odom_all[:, :3, 3]])

    # optional GT-sensing ablation: bypass the TDN, feed ground-truth
    # heightmaps/masks straight to the TCN
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
    codebook = common.prepare_codebook(
        cfg, Codebook.load(common.codebook_path(obj_model))
    )
    step = FilterStep(
        pf, codebook, tdn=tdn, tcn=tcn, floor=1000, small_parts=small,
        **common.ann_kwargs(cfg, codebook),
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
    device_stats: list = []  # StepStats pytrees, fetched once at the end

    # ---- offline fast path: whole log as ONE device program ----------------
    if not realtime and viz is None and frame_schedule is None:
        key, k0, k_sense, k_replay = jax.random.split(key, 4)
        state = step.initialize(k0, gt_p[0], init_particles)
        rmse0 = pf.rmse(state, gt_p[0])
        wall_start = time.perf_counter()

        def sense_all():
            if use_gt:
                codes = tcn.cloud_to_tactile_code(
                    jnp.asarray(gt_heightmaps[:traj_size]),
                    jnp.asarray(gt_masks[:traj_size]),
                    key=k_sense,
                )
                angles = (
                    tcn.canonical_angles(
                        jnp.asarray(gt_heightmaps[:traj_size], jnp.float32),
                        jnp.asarray(gt_masks[:traj_size]) > 0,
                    )
                    if step.yaw_on else None
                )
                return codes, angles
            # batched pre-sense: FCRN/mask/TCN at codebook-build batch size
            # instead of batch-1 inside the scan (same math, sim blend_sz=0)
            if step.yaw_on:
                return step.sense_batch(
                    images[:traj_size], k_sense, return_angles=True
                )
            return step.sense_batch(images[:traj_size], k_sense), None

        codes_all, angles_all = sense_all()
        jax.block_until_ready(codes_all)
        sense_wall = time.perf_counter() - wall_start
        t_rep = time.perf_counter()
        final, seq = step.replay(
            state, k_replay, odom_q_all[1:], odom_t_all[1:],
            gt_p[1:traj_size], codes=codes_all[1:],
            angles=None if angles_all is None else angles_all[1:],
        )
        jax.block_until_ready(final.t)
        replay_wall = time.perf_counter() - t_rep
        total_wall = time.perf_counter() - wall_start
        # steady-state (warm) walls: the first pass pays minutes of tunnel
        # compile whenever a shape/constant changed; rerunning the two
        # now-compiled programs measures the throughput a deployment sees
        t_w = time.perf_counter()
        jax.block_until_ready(sense_all())
        sense_warm = time.perf_counter() - t_w
        t_w = time.perf_counter()
        f2, _ = step.replay(
            state, k_replay, odom_q_all[1:], odom_t_all[1:],
            gt_p[1:traj_size], codes=codes_all[1:],
            angles=None if angles_all is None else angles_all[1:],
        )
        jax.block_until_ready(f2.t)
        replay_warm = time.perf_counter() - t_w
        rmse_t_seq, rmse_r_seq, n_active_seq = jax.device_get(seq)
        stats["rmse_t"] = [float(rmse0[0])] + [float(x) for x in rmse_t_seq]
        stats["rmse_r"] = [float(rmse0[1])] + [float(x) for x in rmse_r_seq]
        stats["num_particles"] = [init_particles] + [int(x) for x in n_active_seq]
        stats["time"] = [total_wall / traj_size] * traj_size
        stats["total_time"] = total_wall
        stats["avg_time"] = total_wall / traj_size
        stats["sense_time"] = sense_wall
        stats["replay_time"] = replay_wall
        stats["warm_time"] = sense_warm + replay_warm
        stats["avg_time_warm"] = (sense_warm + replay_warm) / traj_size
        print(
            f"[replay] {traj_size} frames in {total_wall:.2f}s "
            f"({traj_size/total_wall:.1f} Hz incl. compile; warm: "
            f"sense {sense_warm:.2f}s + replay {replay_warm:.2f}s = "
            f"{traj_size/(sense_warm+replay_warm):.1f} Hz)"
        )
        np.save(
            os.path.join(results_path, "filter_stats.npy"), stats,
            allow_pickle=True,
        )
        return stats

    state = None
    prev_idx, count = 0, 0
    wall_start = time.perf_counter()
    frame_wall: list[float] = []
    while True:
        # real-time replay indexing (filter.py:134-140)
        if frame_schedule is not None:
            if count >= len(frame_schedule):
                break
            idx = int(frame_schedule[count])
        else:
            idx = int(frame_rate * stats["total_time"]) if realtime else count
        if idx >= traj_size:
            break
        t_frame = time.perf_counter()
        key, k_sense, k_step = jax.random.split(key, 3)

        # fused single-dispatch frame (sense + odom + update); falls back to
        # split dispatches when per-stage timing or GT sensing is requested
        fused = not use_gt and not profile_stages and state is not None
        if not fused:
            if profile_stages:
                timer.start("tactile")
            if use_gt:
                heightmap = jnp.asarray(gt_heightmaps[idx])
                mask = jnp.asarray(gt_masks[idx])
                code = tcn.cloud_to_tactile_code(heightmap, mask, key=k_sense)
                angle = (
                    tcn.canonical_angles(
                        heightmap[None].astype(jnp.float32), mask[None] > 0
                    )[0]
                    if step.yaw_on else None
                )
            else:
                code, angle, heightmap, mask = step.sense(images[idx], k_sense)
            if profile_stages:
                timer.stop(code)

        if state is None:
            state = step.initialize(k_step, gt_p[idx], init_particles)
            rmse_t, rmse_r = pf.rmse(state, gt_p[idx])
            stats["rmse_t"].append(float(rmse_t))
            stats["rmse_r"].append(float(rmse_r))
            stats["num_particles"].append(int(state.n_active))
            dt = time.perf_counter() - t_frame
            frame_wall.append(dt)
            stats["time"].append(dt)
            stats["total_time"] = sum(stats["time"])
            prev_idx, count = idx, count + 1
            continue

        if fused:
            state, sstats, code, heightmap, mask = step.sense_update(
                state, k_step, images[idx], meas_j, prev_idx, idx, gt_p[idx],
                do_cluster=(count % 50 == 0), do_measurement=True,
            )
        else:
            if profile_stages:
                timer.start("meas")
            odom_q, odom_t = _relative_odom(meas_j, prev_idx, idx)
            state, sstats = step.update(
                state, k_step, code, odom_q, odom_t, gt_p[idx],
                do_cluster=(count % 50 == 0), do_measurement=True,
                live_angle=angle,
            )
            if profile_stages:
                timer.stop(state.t)
        device_stats.append(sstats)

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
                f"[{idx}/{traj_size}] RMSE: {1000*float(sstats.rmse_t):.1f} mm,"
                f" P: {int(sstats.n_active)}",
                flush=True,
            )

        # live status line (reference filter.py:201-205: rate / rmse /
        # sigma / particle count). Throttled to every 10th frame so the
        # async dispatch loop only syncs a handful of scalars.
        if viz is None and count % 10 == 0:
            dt10 = (
                np.mean(frame_wall[-10:]) if frame_wall else float("nan")
            )
            print(
                f"rate: {1.0/max(dt10,1e-9):.2f} Hz | "
                f"rmse: {1000*float(sstats.rmse_t):.2f} mm, "
                f"{float(sstats.rmse_r):.2f} deg | "
                f"avg sigma: {1000*float(sstats.mean_std):.2f} mm | "
                f"particles: {int(sstats.n_active)} | frame {idx}/{traj_size}",
                flush=True,
            )

        # one sync per frame keeps the replay clock honest without pulling
        # every statistic (realtime indexing needs a wall-clock estimate)
        if realtime:
            jax.block_until_ready(state.weights)
        dt = time.perf_counter() - t_frame
        frame_wall.append(dt)
        stats["time"].append(dt)
        stats["total_time"] = sum(stats["time"])
        prev_idx = idx
        count += 1

    # drain device-side stats in one transfer
    if device_stats:
        jax.block_until_ready(device_stats[-1].rmse_t)
        fetched = jax.device_get(device_stats)
        for s in fetched:
            stats["rmse_t"].append(float(s.rmse_t))
            stats["rmse_r"].append(float(s.rmse_r))
            stats["cluster_poses"].append(np.asarray(s.cluster_poses))
            stats["cluster_stds"].append(np.asarray(s.cluster_stds))
            stats["num_particles"].append(int(s.n_active))

    total_wall = time.perf_counter() - wall_start
    if not realtime:
        # async loop: per-frame walls are dispatch times; report throughput
        stats["time"] = [total_wall / max(count, 1)] * count
        stats["total_time"] = total_wall
    stats["avg_time"] = sum(stats["time"]) / max(len(stats["time"]), 1)

    print(
        f"Total time: {stats['total_time']:.3f}s for {count} frames "
        f"({count/max(stats['total_time'],1e-9):.2f} Hz)"
    )
    if profile_stages:
        avg = timer.averages()
        print(
            f"Avg time: tactile: {avg.get('tactile', 0):.3f}, "
            f"meas: {avg.get('meas', 0):.3f}"
        )
    np.save(os.path.join(results_path, "filter_stats.npy"), stats, allow_pickle=True)
    if viz is not None:
        images_to_video(results_path)
    return stats


def main(argv=None):
    from midastouch_tpu.utils import runtime

    runtime.setup()
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
