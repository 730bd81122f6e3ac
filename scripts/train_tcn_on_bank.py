"""Train the TCN against the measurement it must win.

Wires train_tcn.train()'s eval hook to the reference single-touch metric
computed on a dense pre-rendered GT raw bank (scripts/eval_patch_codebook
renders + caches it), so EVERY recipe change produces a measured
single-touch number during training — the round-2 failure mode was
training recipes landing unmeasured.

Run:
  python scripts/train_tcn_on_bank.py [obj=boulder] [n=10000] [groups=1200]
      [epochs=24] [loss=InfoNCE] [kernel_weight=0] [out=TCN_BANK_boulder.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from midastouch_tpu.utils import runtime

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from midastouch_tpu.codebook import Codebook  # noqa: E402
from midastouch_tpu.eval.single_touch import top_n_error  # noqa: E402
from midastouch_tpu.models.tcn import TCN  # noqa: E402
from midastouch_tpu.utils.config import compose  # noqa: E402


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    obj = kv.get("obj", "boulder")
    n = int(kv.get("n", 10000))
    groups = int(kv.get("groups", 1200))
    epochs = int(kv.get("epochs", 24))
    out_path = kv.get("out", f"TCN_BANK_{obj}.json")

    overrides = [
        f"expt.obj_model={obj}",
        "tpu.render_max_faces=512",
        "tcn.model.model=HeightmapFPN",
        # own weight file: the default tcn_weights points at the shipped
        # PatchPCA projection, which a bank run must never clobber
        "tcn.model.tcn_weights=tcn_bank_weights.npz",
        "tcn.model.canonicalize=true",
        "tcn.model.canonical_rectify=true",
        f"tcn.train.loss={kv.get('loss', 'InfoNCE')}",
        f"tcn.train.kernel_loss_weight={kv.get('kernel_weight', '0.0')}",
        "tcn.train.tdn_noise_aug=false",  # GT-input isolation run
        f"tcn.train.batch_size={kv.get('batch_size', '64')}",
    ] + [x for x in kv.get("extra", "").split(";") if x]
    cfg = compose(overrides)

    bank_path = os.path.join("data", "codebooks", obj, f"raw_bank_{n}.npz")
    if not os.path.exists(bank_path):
        # round-4 banks (scripts/ablate_gt_vs_est.py) carry both the GT and
        # the TDN-estimated stacks; eval on the stack the codebook will use
        bank_path = os.path.join(
            "data", "codebooks", obj, f"ablation_bank_{n}.npz"
        )
    z = np.load(bank_path)
    stack = kv.get("stack", "gt")  # gt | est
    if "heightmaps" in z:
        hms, masks = z["heightmaps"], z["masks"]
    else:
        hms, masks = z[f"{stack}_hm"], z[f"{stack}_mask"]
    gelposes, camposes = z["gelposes"], z["camposes"]

    # canonical eval inputs, computed once with the configured canon params
    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path="/nonexistent")
    print("computing canonical eval inputs...", flush=True)
    inp_l = []
    B = 256
    for i in range(0, len(hms), B):
        h = hms[i:i + B].astype(np.float32)
        m = masks[i:i + B]
        pad = B - len(h)
        if pad:
            h = np.concatenate([h, np.zeros((pad,) + h.shape[1:], h.dtype)])
            m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
        r = np.asarray(tcn.heightmaps_to_images(jnp.asarray(h), jnp.asarray(m)))
        inp_l.append(r[: B - pad if pad else B].astype(np.float16))
    eval_inputs = np.concatenate(inp_l)
    del hms, masks

    eval_log = []

    def eval_fn(variables):
        t0 = time.perf_counter()
        embs = []
        for i in range(0, len(eval_inputs), 512):
            x = eval_inputs[i:i + 512].astype(np.float32)
            pad = 512 - len(x)
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            e = np.asarray(tcn._embed(variables, jnp.asarray(x)))
            embs.append(e[: 512 - pad if pad else 512])
        emb = np.concatenate(embs)
        cb = Codebook.from_poses(gelposes, camposes, emb.astype(np.float32))
        st = top_n_error(cb, n=25)
        out = {
            "st_median": round(st["median_normalized_error"], 4),
            "st_mean": round(st["mean_normalized_error"], 4),
            "pair_cos": round(st["random_pair_cosine_mean"], 3),
            "eval_s": round(time.perf_counter() - t0, 1),
        }
        eval_log.append(out)
        return out

    from midastouch_tpu.train.train_tcn import train

    res = train(
        cfg, [obj], n_samples=3 * groups, epochs=epochs,
        eval_fn=eval_fn, eval_every=int(kv.get("eval_every", 4)),
        log_every=1,
    )
    payload = {
        "obj": obj, "bank": bank_path, "groups": groups,
        "overrides": overrides, "history": res["history"],
        "best_st_median": min(
            (h.get("st_median", 9.9) for h in res["history"]), default=None
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(f"wrote {out_path}; best st_median = {payload['best_st_median']}")


if __name__ == "__main__":
    main()
