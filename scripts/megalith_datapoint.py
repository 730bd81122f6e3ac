"""High-poly pipeline datapoint (VERDICT r2 item 8): the 327k-face
`megalith` mesh (boulder's surface at icosphere subdivision 7 — the
stand-in for YCB nontextured.stl scans, reference filter.py:70-81) runs
the estimated-heightmap codebook + filter pipeline end to end.

Reuses the TDN trained by the boulder pipeline run (same surface, same
appearance statistics), so this measures the *geometry-scaling* path:
density-aware cull on 327k faces, codebook build, PatchPCA fit, filter.

Run AFTER scripts/train_sphere_pipeline.py (PIPELINE_OBJ=boulder):
    python scripts/megalith_datapoint.py
Env: MEGA_CODEBOOK=6000 MEGA_PARTICLES=20000 MEGA_FRAMES=100
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

from midastouch_tpu.utils.config import compose  # noqa: E402

OBJ = "megalith"
CODEBOOK = int(os.environ.get("MEGA_CODEBOOK", "6000"))
PARTICLES = int(os.environ.get("MEGA_PARTICLES", "20000"))
FRAMES = int(os.environ.get("MEGA_FRAMES", "100"))
OUT = os.environ.get("MEGA_OUT", "RESULTS_megalith.json")

BASE = [
    f"expt.obj_model={OBJ}",
    f"expt.codebook_size={CODEBOOK}",
    f"expt.params.num_particles={PARTICLES}",
    "expt.render=false",
    "tpu.render_max_faces=512",  # floor; density-aware cull auto-raises
]


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    t0 = time.time()
    results = {"config": {"obj": OBJ, "codebook": CODEBOOK,
                          "particles": PARTICLES, "frames": FRAMES}}

    from midastouch_tpu.apps import common
    from midastouch_tpu.apps.build_codebook import build_codebook
    from midastouch_tpu.apps.filter import run_filter
    from midastouch_tpu.apps.generate_data import touch_simulator
    from midastouch_tpu.eval.single_touch import top_n_error
    from midastouch_tpu.utils import dataio
    from midastouch_tpu.utils.misc import DIRS

    tdn_w = os.path.join(DIRS["weights"], "tdn_weights.npz")
    assert os.path.exists(tdn_w), "run the boulder pipeline first (shared TDN)"

    mesh = common.resolve_mesh(OBJ)
    results["faces"] = int(len(mesh.faces))
    log(f"mesh: {results['faces']} faces")

    # held-out eval trajectory
    root = dataio.dataset_path(OBJ, 0)
    if not os.path.exists(os.path.join(root, "tactile_data.npz")):
        cfg = compose(BASE + ["datagen=traj", f"datagen.num_frames={FRAMES}",
                              "expt.log_id=0"])
        touch_simulator(cfg, seed=11)
    log("dataset done", f"{time.time()-t0:.0f}s")

    # estimated-heightmap codebook with the boulder-trained TDN
    cfg = compose(BASE + ["expt.log_id=0"])
    t_cb = time.time()
    cb = build_codebook(cfg, use_gt_heightmaps=False, seed=12)
    results["codebook_build_s"] = time.time() - t_cb
    results["codebook_poses_per_s"] = CODEBOOK / results["codebook_build_s"]
    results["single_touch"] = top_n_error(cb, n=25)
    log("single touch:", results["single_touch"])

    stats = run_filter(cfg, viz=None, realtime=False)
    rt = np.asarray(stats["rmse_t"]) * 1000
    results["filter"] = {
        "frames": int(len(rt)),
        "init_rmse_t_mm": float(rt[0]),
        "final_rmse_t_mm": float(rt[-1]),
        "last10_rmse_t_mm": float(rt[-10:].mean()),
        "min_rmse_t_mm": float(rt.min()),
        "avg_hz": float(1.0 / max(stats["avg_time"], 1e-9)),
    }
    log("filter:", results["filter"])

    results["total_wall_s"] = time.time() - t0
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=2)
    log(f"wrote {OUT}; total {(time.time()-t0)/60:.1f} min")


if __name__ == "__main__":
    main()
