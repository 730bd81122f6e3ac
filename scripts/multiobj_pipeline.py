"""Multi-object learned pipeline: ONE shared TDN + ONE shared TCN trained
across several procedural objects (the reference trains across 40 YCB
objects, config/tcn/default.yaml:52-53), then per-object codebook,
single-touch, and filter evaluation — the `bash/run_filter.sh` analogue.

Run:  python scripts/multiobj_pipeline.py
Env:  MOBJ_OBJECTS=boulder,crag,mound  MOBJ_OUT=RESULTS_multiobj.json
      MOBJ_CODEBOOK=6000  MOBJ_PARTICLES=20000  MOBJ_QUICK=1
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

OBJECTS = os.environ.get("MOBJ_OBJECTS", "boulder,crag,mound").split(",")
OUT_JSON = os.environ.get("MOBJ_OUT", "RESULTS_multiobj.json")
QUICK = os.environ.get("MOBJ_QUICK") == "1"


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


N_TRAIN_TRAJ = _env_int("MOBJ_TRAIN_TRAJ", 60 if QUICK else 250)
N_TRAIN_RAND = _env_int("MOBJ_TRAIN_RAND", 60 if QUICK else 250)
N_EVAL = _env_int("MOBJ_EVAL", 40 if QUICK else 150)
TDN_EPOCHS = _env_int("MOBJ_TDN_EPOCHS", 3 if QUICK else 12)
TCN_EPOCHS = _env_int("MOBJ_TCN_EPOCHS", 3 if QUICK else 15)
TCN_SAMPLES = _env_int("MOBJ_TCN_SAMPLES", 200 if QUICK else 1200)  # per object
CODEBOOK = _env_int("MOBJ_CODEBOOK", 2000 if QUICK else 6000)
PARTICLES = _env_int("MOBJ_PARTICLES", 5000 if QUICK else 20000)

# default recipe = the config default (measured-best PatchPCA, RESULTS.md
# §2c); only the weight files are renamed so multi-object runs don't
# clobber single-object ones. Override MOBJ_EXTRA to sweep learned
# backbones (e.g. tcn.model.model=HeightmapFPN;tcn.train.kernel_loss_weight=1.0).
EXTRA = [x for x in os.environ.get("MOBJ_EXTRA", ";".join([
    "tcn.model.tcn_weights=tcn_pca_weights_multi.npz",
    "tdn.tdn_weights=tdn_weights_multi.npz",
])).split(";") if x]

BASE = [
    f"expt.codebook_size={CODEBOOK}",
    f"expt.params.num_particles={PARTICLES}",
    "expt.render=false",
    "tpu.render_max_faces=512",
] + EXTRA


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    t_start = time.time()
    results = {"config": {
        "objects": OBJECTS, "codebook": CODEBOOK, "particles": PARTICLES,
        "quick": QUICK,
    }}

    def flush():
        json.dump(results, open(OUT_JSON, "w"), indent=2)

    # ---- 1. datasets (per object: traj train, random train, traj eval) ----
    from midastouch_tpu.apps.generate_data import touch_simulator
    from midastouch_tpu.utils import dataio

    train_paths = []
    for k, obj in enumerate(OBJECTS):
        for log_id, method, n, seed in (
            (0, "traj", N_TRAIN_TRAJ, 3 * k),
            (1, "random", N_TRAIN_RAND, 3 * k + 1),
            (2, "traj", N_EVAL, 3 * k + 2),
        ):
            root = dataio.dataset_path(obj, log_id)
            if os.path.exists(os.path.join(root, "tactile_data.npz")):
                log(f"dataset exists: {obj}/{log_id}")
            else:
                cfg = compose(BASE + [
                    f"expt.obj_model={obj}", f"datagen={method}",
                    f"datagen.num_frames={n}", f"expt.log_id={log_id}",
                ])
                touch_simulator(cfg, seed=seed)
            if log_id < 2:
                train_paths.append(dataio.dataset_path(obj, log_id))
    log("datasets done", f"{time.time()-t_start:.0f}s")

    # ---- 2. shared TDN --------------------------------------------------
    from midastouch_tpu.train.train_tdn import train as train_tdn

    cfg = compose(BASE + [f"expt.obj_model={OBJECTS[0]}"])
    tdn_out = train_tdn(cfg, train_paths, epochs=TDN_EPOCHS, batch_size=8)
    results["tdn_train"] = {
        "best_val_rmse_mm": tdn_out["best_val_rmse_mm"],
        "epochs": TDN_EPOCHS, "objects": OBJECTS,
    }
    log("tdn:", results["tdn_train"]); flush()

    # ---- 3. shared TCN ---------------------------------------------------
    shared_pca = str(cfg.tcn.model.model) == "PatchPCA"
    if shared_pca:
        # training-free: ONE projection fitted on canonical inputs pooled
        # across all objects (the shared-TCN analogue of the reference's
        # 40-object training set), after the codebook builds cache them
        results["tcn_train"] = {"skipped": "PatchPCA: pooled fit after builds"}
    else:
        from midastouch_tpu.train.train_tcn import train as train_tcn

        tcn_out = train_tcn(cfg, OBJECTS, n_samples=TCN_SAMPLES,
                            epochs=TCN_EPOCHS, log_every=2)
        results["tcn_train"] = {
            "final_loss": tcn_out["history"][-1]["loss"], "epochs": TCN_EPOCHS,
        }
    log("tcn:", results["tcn_train"]); flush()

    # ---- 4. per-object: TDN eval, codebook, single-touch, filter ---------
    from midastouch_tpu.apps.build_codebook import (
        _inputs_cache_path, build_codebook, reembed_codebook)
    from midastouch_tpu.apps.filter import run_filter
    from midastouch_tpu.eval.single_touch import top_n_error
    from midastouch_tpu.eval.tdn_eval import evaluate_tdn

    codebooks = {}
    for obj in OBJECTS:
        cfg_o = compose(BASE + [f"expt.obj_model={obj}", "expt.log_id=2"])
        codebooks[obj] = build_codebook(
            cfg_o, use_gt_heightmaps=False, seed=5, refit_pca=not shared_pca)
    if shared_pca:
        from midastouch_tpu.models.tcn import TCN

        pooled = np.concatenate([
            np.load(_inputs_cache_path(o))["inputs"].astype(np.float32)
            for o in OBJECTS
        ])
        cfg0 = compose(BASE + [f"expt.obj_model={OBJECTS[0]}"])
        tcn = TCN(cfg0.tcn, cfg0.tdn.render)
        tcn.fit_patch_pca(pooled, seed=5)
        log(f"pooled PatchPCA fit on {len(pooled)} inputs -> {tcn._weights_path}")
        for obj in OBJECTS:
            cfg_o = compose(BASE + [f"expt.obj_model={obj}"])
            codebooks[obj] = reembed_codebook(cfg_o, obj)

    per_obj = {}
    for obj in OBJECTS:
        entry = {}
        cfg_o = compose(BASE + [f"expt.obj_model={obj}", "expt.log_id=2"])
        entry["tdn_eval"] = evaluate_tdn(
            cfg_o, dataio.dataset_path(obj, 2), max_frames=60)
        entry["single_touch"] = top_n_error(codebooks[obj], n=25)
        stats = run_filter(cfg_o, viz=None, realtime=False)
        rt = np.asarray(stats["rmse_t"]) * 1000
        entry["filter"] = {
            "frames": int(len(rt)),
            "init_rmse_t_mm": float(rt[0]),
            "final_rmse_t_mm": float(rt[-1]),
            "last10_rmse_t_mm": float(rt[-10:].mean()),
            "min_rmse_t_mm": float(rt.min()),
            "avg_hz": float(1.0 / max(stats["avg_time"], 1e-9)),
        }
        per_obj[obj] = entry
        results["objects"] = per_obj
        log(f"{obj}:", json.dumps(entry)); flush()

    # violin plot across objects
    try:
        from midastouch_tpu.eval.single_touch import benchmark_embeddings

        results["violin_png"] = "single_touch_violins.png"
        benchmark_embeddings(OBJECTS, out_png="single_touch_violins.png")
    except Exception as e:  # plotting is best-effort
        log("violin plot failed:", e)

    results["total_wall_s"] = time.time() - t_start
    flush()
    log(f"done; wrote {OUT_JSON}; total {(time.time()-t_start)/60:.1f} min")


if __name__ == "__main__":
    main()
