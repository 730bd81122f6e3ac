"""Data generation app (reference: data_gen/touch_simulator.py + generate_data.py).

Samples poses on the object surface (smooth trajectory walk or unordered
random touches), renders tactile images + GT heightmaps + contact masks,
and writes the dataset layout consumed by the filter and the trainers.

Run:
    python -m midastouch_tpu.apps.generate_data expt.obj_model=sphere \
        datagen=traj datagen.num_frames=200 expt.log_id=0
"""

from __future__ import annotations

import sys

import numpy as np

from midastouch_tpu.apps import common
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.geometry.trajectories import (
    manual_waypoint_path,
    random_surface_walk,
)
from midastouch_tpu.utils import dataio
from midastouch_tpu.utils.config import compose


def touch_simulator(cfg, obj_model: str | None = None, seed: int = 0) -> str:
    """Generate one log for one object; returns the dataset path
    (reference touch_simulator.py:33-195)."""
    obj_model = obj_model or str(cfg.expt.obj_model)
    dg = cfg.datagen
    rng = np.random.default_rng(seed)

    mesh = common.resolve_mesh(obj_model)
    # randomize appearance (lights/backgrounds) like the codebook build:
    # the TDN trains on these images and must be robust to the sensor-unit
    # variation the reference's 30-background library models
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=seed)

    n = int(dg.num_frames)
    method = str(dg.method)
    if method == "traj":
        poses = random_surface_walk(
            mesh,
            n,
            rng,
            step_size=None if dg.step_size in (None, "None") else float(dg.step_size),
            turn_sigma_deg=float(dg.turn_sigma_deg),
        )
    elif method in ("random", "random+edges"):
        poses = sample_poses_on_mesh(
            mesh, n, rng, edges=(method == "random+edges"),
            shear_mag_deg=float(cfg.tdn.render.shear_mag),
        )
    elif method == "manual":
        # reference touch_simulator.py:74-101 'manual': slide along chords
        # between waypoints; headless waypoint input replaces the open3d
        # click GUI (data_gen/utils.py:175-192)
        wps = dg.get("waypoints")
        if wps in (None, "None"):
            vi = rng.choice(len(mesh.vertices), int(dg.num_waypoints),
                            replace=False)
            wps = np.asarray(mesh.vertices)[vi]
        poses = manual_waypoint_path(mesh, np.asarray(wps, np.float32), n, rng)
    else:
        raise ValueError(f"unknown datagen method {method}")

    m_noise = {"sig_r": float(dg.noise.sig_r), "sig_t": float(dg.noise.sig_t)}
    hms, masks, rgbs, camposes, gelposes, meas = renderer.render_sensor_trajectory(
        poses, m_noise=m_noise, pen_ratio=float(dg.pen_ratio)
    )

    out = dataio.dataset_path(obj_model, cfg.expt.log_id)
    dataio.save_dataset(
        out, rgbs, hms, masks, camposes, gelposes, meas, m_noise=m_noise
    )
    print(f"wrote {len(rgbs)} frames to {out}")
    return out


def main(argv=None):
    cfg = compose(argv if argv is not None else sys.argv[1:])
    touch_simulator(cfg)


if __name__ == "__main__":
    main()
