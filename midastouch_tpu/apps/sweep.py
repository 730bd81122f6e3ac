"""Sweep runner (reference bash/run_filter.sh + bash/generate_codebooks.sh):
run codebook builds and/or filter evaluations across objects x logs.

Run:
    python -m midastouch_tpu.apps.sweep mode=filter objects=sphere,box logs=0,1
    python -m midastouch_tpu.apps.sweep mode=codebooks objects=sphere,box
"""

from __future__ import annotations

import sys

import numpy as np

from midastouch_tpu.utils.config import compose


def run_sweep(mode: str, objects: list[str], logs: list[int], overrides: list[str]):
    results = {}
    for obj in objects:
        if mode in ("codebooks", "all"):
            from midastouch_tpu.apps.build_codebook import build_codebook

            cfg = compose(overrides + [f"expt.obj_model={obj}"])
            build_codebook(cfg)
        if mode in ("filter", "all"):
            from midastouch_tpu.apps.filter import run_filter

            for log in logs:
                cfg = compose(
                    overrides + [f"expt.obj_model={obj}", f"expt.log_id={log}"]
                )
                stats = run_filter(cfg, viz=None)
                rt = np.asarray(stats["rmse_t"])
                results[(obj, log)] = {
                    "final_rmse_t_mm": float(rt[-1] * 1000),
                    "mean_rmse_t_mm": float(rt.mean() * 1000),
                    "avg_hz": 1.0 / max(stats["avg_time"] or 1e9, 1e-9),
                }
                print(f"== {obj} log {log}: {results[(obj, log)]}")
    return results


def main(argv=None):
    from midastouch_tpu.utils import runtime

    runtime.setup()
    argv = argv if argv is not None else sys.argv[1:]
    mode, objects, logs, overrides = "all", ["sphere"], [0], []
    for a in argv:
        if a.startswith("mode="):
            mode = a.split("=", 1)[1]
        elif a.startswith("objects="):
            objects = a.split("=", 1)[1].split(",")
        elif a.startswith("logs="):
            logs = [int(x) for x in a.split("=", 1)[1].split(",")]
        else:
            overrides.append(a)
    run_sweep(mode, objects, logs, overrides)


if __name__ == "__main__":
    main()
