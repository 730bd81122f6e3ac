"""Round-5 flagship pipeline for one object: paired-lighting TDN training
-> estimated-path codebook (PatchPCA fit on EST inputs) -> TDN eval ->
single-touch -> filter runs with and without canonical-yaw scoring.

Produces RESULTS_<obj>.json — the one artifact that shows the whole
learned stack end-to-end (the reference's `filter.py expt=ycb` moment).

Run:  python scripts/flagship_pipeline.py
Env:  FLAG_OBJ=boulder FLAG_CODEBOOK=10000 FLAG_PARTICLES=20000
      FLAG_EVAL=150 FLAG_TDN_EPOCHS=15 FLAG_PAIRS=data/sim/boulder/paired_8000.npz
      FLAG_SKIP_TDN=1 (reuse existing weights)
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

OBJ = os.environ.get("FLAG_OBJ", "boulder")
CODEBOOK = int(os.environ.get("FLAG_CODEBOOK", 10000))
PARTICLES = int(os.environ.get("FLAG_PARTICLES", 20000))
N_EVAL = int(os.environ.get("FLAG_EVAL", 150))
TDN_EPOCHS = int(os.environ.get("FLAG_TDN_EPOCHS", 15))
MAX_PAIRS = int(os.environ.get("FLAG_MAX_PAIRS", 6000))
PAIRS = os.environ.get(
    "FLAG_PAIRS", os.path.join("data", "sim", OBJ, "paired_8000.npz")
)
OUT = os.environ.get("FLAG_OUT", f"RESULTS_{OBJ}.json")

BASE = [
    f"expt.obj_model={OBJ}",
    f"expt.codebook_size={CODEBOOK}",
    f"expt.params.num_particles={PARTICLES}",
    "expt.render=false",
    "tpu.render_max_faces=512",
] + [x for x in os.environ.get("FLAG_EXTRA", "").split(";") if x]


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    t_start = time.time()
    results = {"config": {
        "obj": OBJ, "codebook": CODEBOOK, "particles": PARTICLES,
        "tdn_epochs": TDN_EPOCHS, "paired_bank": PAIRS,
    }}

    def flush():
        json.dump(results, open(OUT, "w"), indent=2)

    cfg = compose(BASE)

    # ---- 1. TDN: paired-lighting-consistency training -------------------
    if os.environ.get("FLAG_SKIP_TDN") == "1":
        results["tdn_train"] = {"skipped": "FLAG_SKIP_TDN"}
    else:
        from midastouch_tpu.train.train_tdn import train_paired

        out = train_paired(
            cfg, PAIRS, epochs=TDN_EPOCHS, batch_size=8,
            max_pairs=MAX_PAIRS,
        )
        results["tdn_train"] = {
            "best_score": out["best_score"],
            "epochs": TDN_EPOCHS,
            "input_norm": str(cfg.tdn.fcrn.sim.input_norm),
            "last": out["history"][-1],
        }
    log("tdn:", results.get("tdn_train")); flush()

    # ---- 2. eval dataset ------------------------------------------------
    from midastouch_tpu.apps.generate_data import touch_simulator
    from midastouch_tpu.utils import dataio

    root = dataio.dataset_path(OBJ, 2)
    if not os.path.exists(os.path.join(root, "tactile_data.npz")):
        cfg_d = compose(BASE + [
            "datagen=traj", f"datagen.num_frames={N_EVAL}", "expt.log_id=2",
        ])
        touch_simulator(cfg_d, seed=11)
    log("eval dataset ready")

    # ---- 3. estimated-path codebook (PatchPCA refit on EST inputs) ------
    from midastouch_tpu.apps.build_codebook import build_codebook
    from midastouch_tpu.eval.single_touch import top_n_error

    cb = build_codebook(cfg, use_gt_heightmaps=False, seed=5)
    results["single_touch"] = top_n_error(cb, n=25)
    log("single touch:", results["single_touch"]); flush()

    # ---- 4. TDN eval ----------------------------------------------------
    from midastouch_tpu.eval.tdn_eval import evaluate_tdn

    results["tdn_eval"] = evaluate_tdn(cfg, root, max_frames=60)
    log("tdn eval:", results["tdn_eval"]); flush()

    # ---- 5. filter: yaw scoring on (default) and off --------------------
    from midastouch_tpu.apps.filter import run_filter

    for tag, extra in (
        ("filter", []),
        ("filter_noyaw", ["tpu.yaw_kappa=0.0"]),
    ):
        cfg_f = compose(BASE + ["expt.log_id=2"] + extra)
        stats = run_filter(cfg_f, viz=None, realtime=False)
        rt = np.asarray(stats["rmse_t"]) * 1000
        rr = np.asarray(stats["rmse_r"])
        results[tag] = {
            "frames": int(len(rt)),
            "init_rmse_t_mm": float(rt[0]),
            "final_rmse_t_mm": float(rt[-1]),
            "last10_rmse_t_mm": float(rt[-10:].mean()),
            "init_rmse_r_deg": float(rr[0]),
            "final_rmse_r_deg": float(rr[-1]),
            "last10_rmse_r_deg": float(rr[-10:].mean()),
            "avg_hz": float(1.0 / max(stats["avg_time"], 1e-9)),
            "avg_hz_warm": float(
                1.0 / max(stats.get("avg_time_warm", np.inf), 1e-9)
            ),
        }
        log(f"{tag}:", results[tag]); flush()

    results["total_wall_s"] = time.time() - t_start
    flush()
    log(f"done -> {OUT} ({(time.time()-t_start)/60:.1f} min)")


if __name__ == "__main__":
    main()
