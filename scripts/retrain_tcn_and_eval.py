"""Rerun pipeline phases affected by the sensor-frame scaling fix:
TCN retrain -> codebook rebuild -> single-touch -> filter (reuses the
existing potato datasets + trained TDN)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from midastouch_tpu.utils import runtime
runtime.setup()
from midastouch_tpu.utils.config import compose

OBJ = os.environ.get("RETRAIN_OBJ", "potato")
EPOCHS = int(os.environ.get("RETRAIN_EPOCHS", "25"))
N_SAMPLES = int(os.environ.get("RETRAIN_SAMPLES", "2500"))
CB_SIZE = int(os.environ.get("RETRAIN_CODEBOOK", "10000"))
import sys as _sys
ARCH = "HeightmapFPN" if "heightmap" in _sys.argv[1:] else "VoxelFPN"
BASE = [
    f"expt.obj_model={OBJ}", f"expt.codebook_size={CB_SIZE}",
    "expt.params.num_particles=20000", "expt.render=false",
    "tpu.render_max_faces=512", f"tcn.model.model={ARCH}",
]
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

results = json.load(open("RESULTS.json")) if os.path.exists("RESULTS.json") else {}
def flush_results():
    json.dump(results, open("RESULTS.json", "w"), indent=2)
cfg = compose(BASE)

from midastouch_tpu.train.train_tcn import train as train_tcn
tcn_out = train_tcn(cfg, [OBJ], n_samples=N_SAMPLES, epochs=EPOCHS, log_every=2)
results["tcn_train"] = {"final_loss": tcn_out["history"][-1]["loss"], "epochs": EPOCHS, "arch": ARCH}
log("tcn:", results["tcn_train"]); flush_results()

from midastouch_tpu.apps.build_codebook import build_codebook
from midastouch_tpu.eval.single_touch import top_n_error
cb = build_codebook(cfg, use_gt_heightmaps=False, seed=3)
results["single_touch"] = top_n_error(cb, n=25)
log("single touch:", results["single_touch"]); flush_results()

from midastouch_tpu.apps.filter import run_filter
cfg_f = compose(BASE + ["expt.log_id=2"])
stats = run_filter(cfg_f, viz=None, realtime=False)
rt = np.asarray(stats["rmse_t"]) * 1000
rr = np.asarray(stats["rmse_r"])
results["filter"] = {
    "frames": int(len(rt)),
    "final_rmse_t_mm": float(rt[-1]),
    "last10_rmse_t_mm": float(rt[-10:].mean()),
    "init_rmse_t_mm": float(rt[0]),
    "final_rmse_r_deg": float(rr[-1]),
    "avg_iteration_s": float(stats["avg_time"]),
    "avg_hz": float(1.0 / max(stats["avg_time"], 1e-9)),
}
log("filter:", results["filter"])
json.dump(results, open("RESULTS.json", "w"), indent=2)
log("done")
