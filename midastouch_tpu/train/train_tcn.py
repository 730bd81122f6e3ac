"""TCN training: batch-hard triplet metric learning.

Reference recipe (config/tcn/default.yaml:21-56): BatchHardTripletMargin
loss, margin 0.2, normalized embeddings, Adam + MultiStepLR. Positive /
negative pairs are defined by gel-pose proximity (poses closer than
`pos_dist` are positives, farther than `neg_dist` negatives) — the
supervision the MinkLoc pipeline derives from its pickled position sets.

Backbone-agnostic: trains whichever model `tcn.model.model` selects
(VoxelFPN over clouds or HeightmapFPN over penetration images). Training
data is rendered on the fly from GT heightmaps — the TCN learns
geometry->code independent of TDN quality.

Run:
    python -m midastouch_tpu.train.train_tcn expt.obj_model=potato
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from midastouch_tpu.models.params_io import save_variables
from midastouch_tpu.models.tcn import TCN
from midastouch_tpu.models.voxfpn import voxelize
from midastouch_tpu.utils.config import compose
from midastouch_tpu.utils.misc import DIRS


def batch_hard_triplet_loss(
    emb: jax.Array, pos_mask: jax.Array, neg_mask: jax.Array, margin: float
) -> jax.Array:
    """Hardest-positive / hardest-negative triplet margin loss over a batch
    of L2-normalized embeddings (MinkLoc's BatchHardTripletMarginLoss)."""
    # smoothed distance: sqrt has unbounded gradient at 0 and anchor/
    # positive pairs sit near 0 — the 1e-6 floor bounds the grad at 500
    d = jnp.sqrt(
        jnp.sum((emb[:, None, :] - emb[None, :, :]) ** 2, axis=-1) + 1e-6
    )
    hardest_pos = jnp.max(jnp.where(pos_mask, d, 0.0), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    valid = pos_mask.any(axis=1) & neg_mask.any(axis=1)
    loss = jnp.maximum(hardest_pos - jnp.where(valid, hardest_neg, 0.0) + margin, 0.0)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def make_train_step(tcn: TCN, tx, margin: float):
    """(params, batch_stats, opt_state, inputs, pos_mask, neg_mask) -> ...
    dp-shardable over the batch dim. `inputs` are backbone inputs
    (clouds for VoxelFPN, images for HeightmapFPN)."""
    model, arch, grid = tcn.model, tcn.arch, tcn.grid_size

    def loss_fn(params, batch_stats, inputs, pos_mask, neg_mask):
        x = inputs if arch == "HeightmapFPN" else voxelize(inputs, grid)
        emb, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        new_stats = mutated.get("batch_stats", batch_stats)
        return batch_hard_triplet_loss(emb, pos_mask, neg_mask, margin), new_stats

    @jax.jit
    def step(params, batch_stats, opt_state, inputs, pos_mask, neg_mask):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, inputs, pos_mask, neg_mask
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def pose_masks(positions: np.ndarray, pos_dist: float, neg_dist: float):
    """Positive/negative pair masks from gel positions (B, 3)."""
    d = np.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
    eye = np.eye(len(positions), dtype=bool)
    return (d < pos_dist) & ~eye, d > neg_dist


def build_touch_bank(
    cfg, obj_model: str, n_samples: int, seed: int = 0,
    positive_jitter_t: float = 7e-4, positive_jitter_r_deg: float = 3.0,
):
    """Render anchor/positive touch PAIRS -> (heightmaps f16, masks,
    positions). Entries 2i and 2i+1 are a positive pair (poses within the
    jitter radius).

    Random pose batches on a whole object essentially never contain
    positive pairs at mm scale, which starves the triplet loss — the
    reference curates explicit positive sets offline (train_sets pickles,
    config/tcn/default.yaml:52-53); jittered pair rendering is the online
    equivalent."""
    import jax as _jax

    from midastouch_tpu.apps import common
    from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
    from midastouch_tpu.ops import se3

    rng = np.random.default_rng(seed)
    mesh = common.resolve_mesh(obj_model)
    renderer = common.make_renderer(cfg, mesh, randomize=False, seed=seed)
    n_anchor = n_samples // 2
    anchors = sample_poses_on_mesh(
        mesh, n_anchor, rng, edges=True,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )
    # positives: anchor pose with small SE(3) jitter (contact adapts via
    # the renderer's over-pen compensation)
    tn = rng.normal(0, positive_jitter_t, (n_anchor, 3)).astype(np.float32)
    rn = np.radians(rng.normal(0, positive_jitter_r_deg, (n_anchor, 3))).astype(
        np.float32
    )
    Rn = np.asarray(se3.euler_to_matrix(_jax.numpy.asarray(rn), "ZYX"))
    Tn = np.zeros((n_anchor, 4, 4), np.float32)
    Tn[:, :3, :3] = Rn
    Tn[:, :3, 3] = tn
    Tn[:, 3, 3] = 1.0
    positives = anchors @ Tn

    poses = np.empty((2 * n_anchor, 4, 4), np.float32)
    poses[0::2] = anchors
    poses[1::2] = positives

    hms_l, masks_l, pos_l = [], [], []
    bs = 64
    for i in range(0, len(poses), bs):
        hms, masks, _, _, gels = renderer.render_sensor_poses(poses[i : i + bs])
        hms_l.append(hms.astype(np.float16))
        masks_l.append(masks)
        pos_l.append(gels[:, :3, 3])
    return (
        np.concatenate(hms_l),
        np.concatenate(masks_l),
        np.concatenate(pos_l),
    )


def train(
    cfg,
    obj_models: list[str] | None = None,
    n_samples: int = 2000,
    epochs: int = 20,
    seed: int = 0,
    out_path: str | None = None,
    log_every: int = 5,
):
    tr = cfg.tcn.train
    m = cfg.tcn.model
    batch_size = int(tr.batch_size)
    margin = float(tr.margin)
    pos_dist, neg_dist = float(tr.pos_dist), float(tr.neg_dist)

    obj_models = obj_models or [str(cfg.expt.obj_model)]
    banks = [
        build_touch_bank(cfg, o, n_samples // len(obj_models), seed)
        for o in obj_models
    ]
    heightmaps = np.concatenate([b[0] for b in banks])
    masks = np.concatenate([b[1] for b in banks])
    positions = np.concatenate([b[2] for b in banks])

    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path="/nonexistent", seed=seed)
    params = tcn.variables["params"]
    batch_stats = tcn.variables.get("batch_stats", {})

    milestones = [int(x) for x in tr.scheduler_milestones]
    steps_per_epoch = max(len(heightmaps) // batch_size, 1)
    sched = optax.piecewise_constant_schedule(
        float(tr.lr), {ms * steps_per_epoch: 0.1 for ms in milestones}
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=float(tr.weight_decay)),
    )
    opt_state = tx.init(params)
    step = make_train_step(tcn, tx, margin)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    if out_path is None:
        out_path = os.path.join(DIRS["weights"], str(m.tcn_weights))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    n_pairs = len(heightmaps) // 2
    history = []
    for epoch in range(epochs):
        # shuffle PAIRS so every batch keeps its anchor/positive structure
        pair_perm = rng.permutation(n_pairs)
        losses = []
        for i in range(0, n_pairs - batch_size // 2 + 1, batch_size // 2):
            pairs = pair_perm[i : i + batch_size // 2]
            b = np.stack([2 * pairs, 2 * pairs + 1], axis=1).reshape(-1)
            pos_mask, neg_mask = pose_masks(positions[b], pos_dist, neg_dist)
            key, kb = jax.random.split(key)
            inputs = tcn.model_inputs(
                kb,
                jnp.asarray(heightmaps[b], dtype=jnp.float32),
                jnp.asarray(masks[b]),
            )
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                inputs, jnp.asarray(pos_mask), jnp.asarray(neg_mask),
            )
            losses.append(loss)  # device scalar; fetched once per epoch
        losses = [float(x) for x in jax.device_get(losses)]
        history.append({"epoch": epoch, "loss": float(np.mean(losses))})
        if epoch % log_every == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: triplet loss {np.mean(losses):.4f}", flush=True)
        save_variables(out_path, {"params": params, "batch_stats": batch_stats})
    print(f"saved TCN weights -> {out_path}")
    import json

    with open(out_path + ".history.json", "w") as fh:
        json.dump(history, fh)
    return {"history": history, "out_path": out_path}


def main(argv=None):
    from midastouch_tpu.utils import runtime

    runtime.setup()
    cfg = compose(argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
