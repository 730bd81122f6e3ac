"""Generate a REAL-format log from the renderer and run the real-sensor
filter app end-to-end (VERDICT round-4 weak item 8: filter_real had only
synthetic-fixture unit tests; no committed artifact ran the real-path
code — subsample=2, update gating, no-softmax weighting, floor-10000
annealing, blend_sz=10 — through `run_filter_real` with numbers).

The log mimics the YCB-Slide real capture layout the reference consumes
(filter_real.py:48-295 + pose.py:303-354):

    data/real/<obj>/dataset_<id>/frames/*.jpg     tactile images
    data/real/<obj>/dataset_<id>/synced_data.npy  {poses: {DIGIT, <obj>}}
    data/real/<obj>/alignment.npy                 (4,4) alignment matrix

plus OptiTrack realism: absolute world poses for both bodies (the object
frame is non-identity), mocap translation jitter, and a few injected
teleport frames that `clean_up_optitrack` must drop.

Writes RESULTS_real_sim.json.  Run: python scripts/gen_real_log.py
Env: REAL_OBJ=boulder REAL_FRAMES=240 REAL_PARTICLES=20000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from midastouch_tpu.utils import runtime

runtime.setup()

import jax.numpy as jnp  # noqa: E402

from midastouch_tpu.apps import common  # noqa: E402
from midastouch_tpu.utils import misc  # noqa: E402
from midastouch_tpu.utils.config import compose  # noqa: E402

OBJ = os.environ.get("REAL_OBJ", "boulder")
FRAMES = int(os.environ.get("REAL_FRAMES", 240))
PARTICLES = int(os.environ.get("REAL_PARTICLES", 20000))
LOG_ID = os.environ.get("REAL_LOG", "0")
OUT = os.environ.get("REAL_OUT", "RESULTS_real_sim.json")


def main():
    t0 = time.time()
    cfg = compose([
        f"expt.obj_model={OBJ}", "expt.log_id=" + LOG_ID,
        f"expt.params.num_particles={PARTICLES}",
        "tpu.render_max_faces=512",
    ])
    rng = np.random.default_rng(17)

    # ---- trajectory on the surface (geodesic walk like the sim gen) ----
    from midastouch_tpu.geometry.trajectories import random_geodesic_poses

    mesh = common.resolve_mesh(OBJ)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=17)
    gel_poses = random_geodesic_poses(mesh, FRAMES, rng)
    if gel_poses is None:
        raise RuntimeError("geodesic sampler failed")

    # ---- render tactile frames (fixed lighting draw: a real sensor's
    # LEDs don't change within one session; bg id fixed too) -------------
    from midastouch_tpu.render.digit import (
        DEFAULT_LIGHT_ANGLES, DEFAULT_LIGHT_RGB)

    n = len(gel_poses)
    press = rng.uniform(0.0008, 0.0018, n).astype(np.float32)
    angles = np.tile(DEFAULT_LIGHT_ANGLES + rng.normal(0, 6, 3), (n, 1)
                     ).astype(np.float32)
    colors = np.tile(DEFAULT_LIGHT_RGB * (0.9 + 0.2 * rng.random((3, 1))),
                     (n, 1, 1)).astype(np.float32)
    lights = np.full(n, 0.95, np.float32)
    bg_ids = np.full(n, 3, np.int32)
    rgbs, hms, masks, press_eff, cams = renderer._render_chunked(
        gel_poses.astype(np.float32), press, lights,
        angles=angles, colors=colors, bg_ids=bg_ids,
    )
    print(f"rendered {n} frames")

    # ---- OptiTrack-style pose stream -----------------------------------
    # both bodies in an arbitrary world frame; gel->cam offset is what
    # extract_poses_real must re-derive via alignment + cam2gel
    T_world_obj = np.eye(4, dtype=np.float32)
    T_world_obj[:3, 3] = [0.3, -0.2, 0.8]
    cam_world = (T_world_obj @ cams).astype(np.float32)
    # mocap translation jitter ~0.3 mm
    cam_world[:, :3, 3] += rng.normal(0, 3e-4, (n, 3)).astype(np.float32)
    # inject teleport frames the jump filter must drop
    bad = rng.choice(np.arange(10, n - 10), 4, replace=False)
    cam_meas = cam_world.copy()
    cam_meas[bad, :3, 3] += rng.normal(0, 0.2, (len(bad), 3))
    obj_stream = np.tile(T_world_obj, (n, 1, 1)).astype(np.float32)

    data_path = os.path.join(misc.DIRS["data"], "real", OBJ,
                             f"dataset_{LOG_ID}")
    frames_dir = os.path.join(data_path, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    np.save(os.path.join(data_path, "synced_data.npy"),
            {"poses": {"DIGIT": cam_meas, OBJ: obj_stream}},
            allow_pickle=True)
    np.save(os.path.join(data_path, "..", "alignment.npy"),
            np.eye(4, dtype=np.float32))
    for i, frame in enumerate((rgbs * 255).astype(np.uint8)):
        misc.save_image(os.path.join(frames_dir, f"{i}.jpg"), frame)
    print(f"wrote real-format log -> {data_path}")

    # ---- run the real filter app ---------------------------------------
    from midastouch_tpu.apps.filter_real import run_filter_real

    stats = run_filter_real(cfg, viz=None, realtime=False)
    rt = np.asarray(stats["rmse_t"]) * 1000
    rr = np.asarray(stats["rmse_r"])
    results = {
        "config": {"obj": OBJ, "frames_rendered": n,
                   "particles": PARTICLES, "injected_jumps": int(len(bad)),
                   "subsample": 2},
        "filter_real": {
            "frames": int(len(rt)),
            "init_rmse_t_mm": float(rt[0]),
            "final_rmse_t_mm": float(rt[-1]),
            "last10_rmse_t_mm": float(rt[-10:].mean()),
            "final_rmse_r_deg": float(rr[-1]),
            "avg_hz": float(1.0 / max(np.mean(stats["time"]), 1e-9)),
        },
        "total_wall_s": time.time() - t0,
    }
    json.dump(results, open(OUT, "w"), indent=2)
    print(json.dumps(results["filter_real"], indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
