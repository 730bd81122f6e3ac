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


def make_loss_fn(model: FCRN, relief_weight: float = 0.0,
                 relief_kernel: int = 9):
    """Pixelwise MSE plus an optional fine-relief term: the canonical
    descriptor downstream consumes the HIGHPASS of the heightmap (sub-mm
    relief inside the contact), which plain MSE underweights — the smooth
    press/curvature component dominates the residual while the TDN's fine
    relief stays render-unstable (PROBE_TDN_boulder.json)."""

    def loss_fn(params, batch_stats, images, targets, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        t32 = targets.astype(out.dtype)
        loss = jnp.mean((out - t32) ** 2)
        if relief_weight > 0.0:
            hp = jax.vmap(lambda x: image_ops.highpass(x, relief_kernel))
            loss = loss + relief_weight * jnp.mean((hp(out) - hp(t32)) ** 2)
        return loss, mutated["batch_stats"]

    return loss_fn


def make_train_step(model: FCRN, tx, relief_weight: float = 0.0,
                    relief_kernel: int = 9):
    """Pure train step: (params, batch_stats, opt_state, batch, rng) ->
    (params, batch_stats, opt_state, loss). dp-shardable over the batch."""
    loss_fn = make_loss_fn(model, relief_weight, relief_kernel)

    @jax.jit
    def step(params, batch_stats, opt_state, images, targets, rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, targets, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def make_epoch_step(model: FCRN, tx, input_norm: str,
                    relief_weight: float = 0.0, relief_kernel: int = 9):
    """One WHOLE epoch as a single device program: the dataset lives in
    HBM (uint8 images / f16 targets), a lax.scan walks permuted batch
    indices, and normalization happens on device. Through the TPU tunnel
    the per-batch host dispatch + 7 MB image upload dominated training
    (~0.9 s/step at batch 8); this path costs one dispatch per epoch.

    Datasets arrive FLATTENED to (n, H*W*C) rows and are reshaped after
    the per-batch gather: gathering rows of a 4-D (n, H, W, 3) array made
    XLA materialize full tiled-layout copies of every dataset argument
    inside the program (an extra ~6.7 GB at 8k pairs — the OOM in
    /tmp/tdnpair3.log), while 2-D row gathers use the argument in place."""
    loss_fn = make_loss_fn(model, relief_weight, relief_kernel)
    h, w = model.out_size

    @jax.jit
    def epoch(params, batch_stats, opt_state, key, images_u8, targets_f16,
              perm):
        def body(carry, bidx):
            params, batch_stats, opt_state, key = carry
            key, kd = jax.random.split(key)
            b = bidx.shape[0]
            imgs = jax.vmap(
                lambda im: image_ops.normalize_image(
                    im.astype(jnp.float32), input_norm
                )
            )(images_u8[bidx].reshape(b, h, w, 3))
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, imgs,
              targets_f16[bidx].reshape(b, h, w), kd)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state, key), loss

        (params, batch_stats, opt_state, _), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state, key), perm
        )
        return params, batch_stats, opt_state, losses

    return epoch


def make_paired_epoch_step(model: FCRN, tx, input_norm: str,
                           relief_weight: float = 0.0,
                           relief_kernel: int = 9,
                           pair_weight: float = 10.0):
    """Epoch scan over LIGHTING PAIRS: each sample is the same touch
    rendered under two independent lighting draws (scripts/
    gen_paired_lighting.py). Loss = supervised MSE+relief on both views
    plus `pair_weight` * MSE between the two predicted fine reliefs —
    the explicit invariance objective single randomized images failed to
    teach (PROBE_TDN_boulder.json: lighting alone collapses same-site
    estimated-relief retrieval to ~0.32 even with per-channel input
    normalization; moving LED shadows are a spatial nuisance)."""

    def norm(ims_u8):
        return jax.vmap(
            lambda im: image_ops.normalize_image(
                im.astype(jnp.float32), input_norm
            )
        )(ims_u8)

    hp = jax.vmap(lambda x: image_ops.highpass(x, relief_kernel))

    def loss_fn(params, batch_stats, img_a, img_b, t_a, t_b, same_press,
                rng):
        b = img_a.shape[0]
        # one batch of 2B keeps batch-norm statistics shared across views
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.concatenate([img_a, img_b], axis=0),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        out_a, out_b = out[:b], out[b:]
        ta32, tb32 = t_a.astype(out.dtype), t_b.astype(out.dtype)
        sup = 0.5 * (jnp.mean((out_a - ta32) ** 2)
                     + jnp.mean((out_b - tb32) ** 2))
        # FULL-map pair consistency (not just the highpass): the band
        # anchor downstream keys off absolute depths, so a lighting-
        # dependent smooth bias shifts the whole relief band even when
        # the fine relief is stable. Only valid for same-press pairs —
        # press pairs legitimately differ in the smooth component, so
        # they get the highpass (fine-relief) consistency term instead.
        sp = same_press.astype(out.dtype)[:, None, None]
        hpa, hpb = hp(out_a), hp(out_b)
        pair = (
            jnp.mean(sp * (out_a - out_b) ** 2)
            + jnp.mean((1.0 - sp) * (hpa - hpb) ** 2)
        )
        loss = sup + pair_weight * pair
        if relief_weight > 0.0:
            hpta, hptb = hp(ta32), hp(tb32)
            loss = loss + relief_weight * 0.5 * (
                jnp.mean((hpa - hpta) ** 2) + jnp.mean((hpb - hptb) ** 2)
            )
        return loss, mutated["batch_stats"]

    h, w = model.out_size

    @jax.jit
    def epoch(params, batch_stats, opt_state, key, img_a_u8, img_b_u8,
              targets_a_f16, targets_b_f16, same_press, perm):
        # datasets are (n, H*W*C) rows — see make_epoch_step on why 4-D
        # dataset gathers OOM (XLA re-tiles full copies in-program)
        def body(carry, bidx):
            params, batch_stats, opt_state, key = carry
            key, kd = jax.random.split(key)
            b = bidx.shape[0]
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats,
              norm(img_a_u8[bidx].reshape(b, h, w, 3)),
              norm(img_b_u8[bidx].reshape(b, h, w, 3)),
              targets_a_f16[bidx].reshape(b, h, w),
              targets_b_f16[bidx].reshape(b, h, w), same_press[bidx], kd)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state, key), loss

        (params, batch_stats, opt_state, _), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state, key), perm
        )
        return params, batch_stats, opt_state, losses

    return epoch


def train_paired(
    cfg,
    paired_npz: str,
    epochs: int = 15,
    batch_size: int = 8,
    lr: float = 1e-4,
    val_frac: float = 0.1,
    out_path: str | None = None,
    seed: int = 0,
    log_every: int = 1,
    resume_path: str | None = None,
    max_pairs: int | None = None,
):
    """Train the TDN on a paired-lighting bank (gen_paired_lighting.py).
    Val metric stays plain heightmap RMSE (view A) for comparability, and
    a pair-consistency RMSE of the fine relief is reported alongside.
    `max_pairs` bounds the HBM-resident dataset — the v5e runtime faults
    above ~6k pairs (6 GB data + FCRN training state)."""
    z = np.load(paired_npz)
    img_a, img_b = z["images_a"], z["images_b"]
    targets = z["heightmaps"]
    # mixed banks carry per-view targets + a same-press flag; early
    # lighting-only banks had one target and equal press throughout
    targets_b = z["heightmaps_b"] if "heightmaps_b" in z else targets
    same_press = (
        z["same_press"] if "same_press" in z
        else np.ones(len(img_a), bool)
    )
    if max_pairs is not None and len(img_a) > max_pairs:
        sel = np.random.default_rng(seed).choice(
            len(img_a), max_pairs, replace=False
        )
        img_a, img_b = img_a[sel], img_b[sel]
        targets, targets_b = targets[sel], targets_b[sel]
        same_press = same_press[sel]
    n = len(img_a)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    # cap the device-resident val copies: the whole dataset already lives
    # in HBM and an 8k-pair bank runs within ~50 MB of the v5e's 16 GB
    n_val = min(max(int(n * val_frac), 1), 256)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    h, w = int(cfg.tdn.render.height), int(cfg.tdn.render.width)
    input_norm = str(cfg.tdn.fcrn.sim.get("input_norm", "minmax"))
    tcfg = cfg.tdn.get("train", {})
    relief_weight = float(tcfg.get("relief_weight", 0.0))
    relief_kernel = int(tcfg.get("relief_kernel", 9))
    pair_weight = float(tcfg.get("pair_weight", 10.0))
    model = FCRN(out_size=(h, w))
    in_c = image_ops.norm_channels(input_norm)
    key = jax.random.PRNGKey(seed)
    if resume_path and os.path.exists(resume_path):
        from midastouch_tpu.models.params_io import load_variables

        variables = load_variables(resume_path)
        print(f"resumed weights from {resume_path}")
    else:
        variables = model.init(key, jnp.zeros((1, h, w, in_c)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    steps_per_epoch = max(len(train_idx) // batch_size, 1)
    sched = optax.exponential_decay(
        lr, transition_steps=10 * steps_per_epoch, decay_rate=0.6,
        staircase=True,
    )
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    epoch_step = make_paired_epoch_step(
        model, tx, input_norm, relief_weight, relief_kernel, pair_weight
    )

    # FLAT rows on device (see make_epoch_step: 4-D dataset gathers OOM)
    a_dev = jnp.asarray(img_a.reshape(n, -1))
    b_dev = jnp.asarray(img_b.reshape(n, -1))
    t_dev = jnp.asarray(targets.reshape(n, -1))
    tb_dev = jnp.asarray(targets_b.reshape(n, -1))
    sp_dev = jnp.asarray(same_press)

    def norm(x):
        return jax.vmap(lambda im: image_ops.normalize_image(
            im.astype(jnp.float32), input_norm))(x)

    eval_fwd = jax.jit(
        lambda p, bs, x: model.apply(
            {"params": p, "batch_stats": bs},
            norm(x.reshape(x.shape[0], h, w, 3)), train=False
        )
    )
    hp_j = jax.jit(jax.vmap(lambda x: image_ops.highpass(x, relief_kernel)))

    if out_path is None:
        out_path = os.path.join(DIRS["weights"], str(cfg.tdn.tdn_weights))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    best_val = np.inf
    history = []
    va, vb = a_dev[jnp.asarray(val_idx)], b_dev[jnp.asarray(val_idx)]
    vt = targets[val_idx].astype(np.float32)
    for epoch in range(epochs):
        rng.shuffle(train_idx)
        steps = len(train_idx) // batch_size
        perm_e = jnp.asarray(
            train_idx[: steps * batch_size].reshape(steps, batch_size)
            .astype(np.int32)
        )
        key, ke = jax.random.split(key)
        params, batch_stats, opt_state, losses = runtime.retry_transient(
            epoch_step, params, batch_stats, opt_state, ke,
            a_dev, b_dev, t_dev, tb_dev, sp_dev, perm_e,
        )
        losses = np.asarray(jax.device_get(losses))

        oa = eval_fwd(params, batch_stats, va)
        ob = eval_fwd(params, batch_stats, vb)
        val_rmse_mm = float(
            np.sqrt(np.mean((np.asarray(oa) - vt) ** 2))
        ) * float(cfg.tdn.render.pixmm)
        pair_rmse_mm = float(np.sqrt(np.mean(
            (np.asarray(hp_j(oa)) - np.asarray(hp_j(ob))) ** 2
        ))) * float(cfg.tdn.render.pixmm)
        history.append({
            "epoch": epoch, "train_loss": float(np.mean(losses)),
            "val_rmse_mm": val_rmse_mm, "pair_relief_rmse_mm": pair_rmse_mm,
        })
        if epoch % log_every == 0 or epoch == epochs - 1:
            print(
                f"epoch {epoch}: loss {np.mean(losses):.3f}, "
                f"val RMSE {val_rmse_mm:.4f} mm, "
                f"pair relief RMSE {pair_rmse_mm:.4f} mm"
            )
        # selection gate = the INVARIANCE the pipeline needs, tie-broken
        # by supervised accuracy
        score = pair_rmse_mm + 0.1 * val_rmse_mm
        if score < best_val:
            best_val = score
            save_variables(
                out_path, {"params": params, "batch_stats": batch_stats},
                meta={"input_norm": input_norm},
            )
    print(f"best score {best_val:.4f} -> {out_path}")
    import json

    with open(out_path + ".history.json", "w") as fh:
        json.dump(history, fh)
    return {"best_score": best_val, "history": history, "out_path": out_path}


def load_training_data(data_paths: list[str]):
    """Raw uint8 images + f16 heightmap targets (normalization happens on
    device with the configured input_norm; see make_epoch_step)."""
    images, heightmaps = [], []
    for p in data_paths:
        images.append(dataio.load_images(p))
        heightmaps.append(dataio.load_heightmaps(p).astype(np.float16))
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
    input_norm = str(cfg.tdn.fcrn.sim.get("input_norm", "minmax"))
    tcfg = cfg.tdn.get("train", {})
    relief_weight = float(tcfg.get("relief_weight", 0.0))
    relief_kernel = int(tcfg.get("relief_kernel", 9))
    model = FCRN(out_size=(h, w))
    in_c = image_ops.norm_channels(input_norm)
    key = jax.random.PRNGKey(seed)
    if resume_path and os.path.exists(resume_path):
        from midastouch_tpu.models.params_io import load_variables

        variables = load_variables(resume_path)  # (reference train.py:113-125)
        print(f"resumed weights from {resume_path}")
    else:
        variables = model.init(key, jnp.zeros((1, h, w, in_c)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # LR x0.6 every 10 epochs (reference train.py:223-233)
    steps_per_epoch = max(len(train_idx) // batch_size, 1)
    sched = optax.exponential_decay(
        lr, transition_steps=10 * steps_per_epoch, decay_rate=0.6, staircase=True
    )
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    epoch_step = make_epoch_step(
        model, tx, input_norm, relief_weight, relief_kernel
    )

    # dataset resident in HBM as FLAT rows: uint8 images + f16 targets;
    # every epoch is ONE device dispatch (make_epoch_step docstring)
    images_dev = jnp.asarray(images.reshape(n, -1))
    targets_dev = jnp.asarray(targets.reshape(n, -1))

    eval_fwd = jax.jit(
        lambda p, bs, x: model.apply(
            {"params": p, "batch_stats": bs},
            jax.vmap(lambda im: image_ops.normalize_image(
                im.astype(jnp.float32), input_norm
            ))(x.reshape(x.shape[0], h, w, 3)),
            train=False,
        )
    )

    if out_path is None:
        out_path = os.path.join(DIRS["weights"], str(cfg.tdn.tdn_weights))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    best_val = np.inf
    history = []
    val_dev = images_dev[jnp.asarray(val_idx)]
    val_tgt = targets[val_idx].astype(np.float32)
    for epoch in range(epochs):
        rng.shuffle(train_idx)
        steps = len(train_idx) // batch_size
        perm_e = jnp.asarray(
            train_idx[: steps * batch_size].reshape(steps, batch_size)
            .astype(np.int32)
        )
        key, ke = jax.random.split(key)
        params, batch_stats, opt_state, losses = runtime.retry_transient(
            epoch_step, params, batch_stats, opt_state, ke,
            images_dev, targets_dev, perm_e,
        )
        losses = np.asarray(jax.device_get(losses))

        # val RMSE in mm (x pixmm, reference test RMSE convention train.py:288)
        vout = np.asarray(eval_fwd(params, batch_stats, val_dev))
        val_rmse_px = float(np.sqrt(np.mean((vout - val_tgt) ** 2)))
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
                out_path, {"params": params, "batch_stats": batch_stats},
                meta={"input_norm": input_norm},
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
