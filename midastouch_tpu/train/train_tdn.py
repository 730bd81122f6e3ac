"""TDN (FCRN) training: heightmap regression (reference contrib/tdn_fcrn/train.py).

Same recipe, optax/Flax: Adam(1e-4), pixelwise MSE on gel-frame
heightmaps, LR x0.6 every 10 epochs (train.py:97,161-175,223-233),
val-gated checkpointing to flat npz. Data comes from this framework's own
`generate_data` output (tactile_images + gt_heightmaps).

Run:
    python -m midastouch_tpu.train.train_tdn expt.obj_model=sphere \
        train.epochs=5 train.batch_size=8
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from midastouch_tpu.models.fcrn import FCRN
from midastouch_tpu.utils import runtime
from midastouch_tpu.models.params_io import save_variables
from midastouch_tpu.ops import image as image_ops
from midastouch_tpu.utils import dataio
from midastouch_tpu.utils.config import compose
from midastouch_tpu.utils.misc import DIRS


def make_train_step(model: FCRN, tx):
    """Pure train step: (params, batch_stats, opt_state, batch, rng) ->
    (params, batch_stats, opt_state, loss). dp-shardable over the batch."""

    def loss_fn(params, batch_stats, images, targets, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = jnp.mean((out - targets) ** 2)
        return loss, mutated["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, images, targets, rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, targets, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def _normalize_images(images: np.ndarray) -> np.ndarray:
    out = np.empty(images.shape, np.float32)
    for i, im in enumerate(images):
        im = im.astype(np.float32)
        rng = im.max() - im.min()
        out[i] = (im - im.min()) * (255.0 / max(rng, 1e-6))
    return out


def load_training_data(data_paths: list[str]):
    images, heightmaps = [], []
    for p in data_paths:
        images.append(_normalize_images(dataio.load_images(p)))
        heightmaps.append(dataio.load_heightmaps(p))
    return np.concatenate(images), np.concatenate(heightmaps)


def train(
    cfg,
    data_paths: list[str],
    epochs: int = 20,
    batch_size: int = 8,
    lr: float = 1e-4,
    val_frac: float = 0.1,
    out_path: str | None = None,
    seed: int = 0,
    log_every: int = 10,
    resume_path: str | None = None,
):
    images, targets = load_training_data(data_paths)
    n = len(images)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(int(n * val_frac), 1)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    h, w = int(cfg.tdn.render.height), int(cfg.tdn.render.width)
    model = FCRN(out_size=(h, w))
    key = jax.random.PRNGKey(seed)
    if resume_path and os.path.exists(resume_path):
        from midastouch_tpu.models.params_io import load_variables

        variables = load_variables(resume_path)  # (reference train.py:113-125)
        print(f"resumed weights from {resume_path}")
    else:
        variables = model.init(key, jnp.zeros((1, h, w, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # LR x0.6 every 10 epochs (reference train.py:223-233)
    steps_per_epoch = max(len(train_idx) // batch_size, 1)
    sched = optax.exponential_decay(
        lr, transition_steps=10 * steps_per_epoch, decay_rate=0.6, staircase=True
    )
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    eval_fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )

    if out_path is None:
        out_path = os.path.join(DIRS["weights"], str(cfg.tdn.tdn_weights))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    best_val = np.inf
    history = []
    for epoch in range(epochs):
        rng.shuffle(train_idx)
        losses = []
        for i in range(0, len(train_idx) - batch_size + 1, batch_size):
            bidx = train_idx[i : i + batch_size]
            key, kd = jax.random.split(key)
            params, batch_stats, opt_state, loss = runtime.retry_transient(
                step,
                params, batch_stats, opt_state,
                jnp.asarray(images[bidx]), jnp.asarray(targets[bidx]), kd,
            )
            losses.append(loss)  # device scalar; fetched once per epoch
        losses = [float(x) for x in jax.device_get(losses)]

        # val RMSE in mm (x pixmm, reference test RMSE convention train.py:288)
        vb = images[val_idx]
        vout = np.asarray(
            eval_fwd({"params": params, "batch_stats": batch_stats}, jnp.asarray(vb))
        )
        val_rmse_px = float(np.sqrt(np.mean((vout - targets[val_idx]) ** 2)))
        val_rmse_mm = val_rmse_px * float(cfg.tdn.render.pixmm)
        history.append({"epoch": epoch, "train_loss": float(np.mean(losses)),
                        "val_rmse_mm": val_rmse_mm})
        if epoch % log_every == 0 or epoch == epochs - 1:
            print(
                f"epoch {epoch}: loss {np.mean(losses):.3f}, "
                f"val RMSE {val_rmse_mm:.4f} mm"
            )
        if val_rmse_mm < best_val:
            best_val = val_rmse_mm
            save_variables(
                out_path, {"params": params, "batch_stats": batch_stats}
            )
    print(f"best val RMSE {best_val:.4f} mm -> {out_path}")
    import json

    with open(out_path + ".history.json", "w") as fh:
        json.dump(history, fh)  # TensorBoard-scalar equivalent (train.py:110,186)
    return {"best_val_rmse_mm": best_val, "history": history, "out_path": out_path}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose([a for a in argv if not a.startswith("train.")])
    kw = {}
    for a in argv:
        if a.startswith("train."):
            k, v = a.split("=", 1)
            kw[k.split(".", 1)[1]] = yaml.safe_load(v)  # CLI numbers/bools
    data_root = dataio.dataset_path(str(cfg.expt.obj_model), cfg.expt.log_id)
    train(cfg, [data_root], **kw)


if __name__ == "__main__":
    main()
