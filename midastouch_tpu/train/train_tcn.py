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

import functools
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


def supcon_loss(
    emb: jax.Array, pos_mask: jax.Array, neg_mask: jax.Array,
    temperature: float = 0.07,
) -> jax.Array:
    """Supervised InfoNCE over L2-normalized embeddings: per anchor,
    -log( sum_pos exp(s/T) / sum_{pos+neg} exp(s/T) ).

    Softmax-form contrastive alternative to batch-hard triplet (the form
    retrieval training largely moved to, e.g. MinkLoc3Dv2). NOTE: at a
    near-collapsed embedding both losses keep finite gradients (the
    1e-6-smoothed distance bounds the triplet grad; measured |grad|
    triplet 3.3e-2 vs supcon 3.8e-4 at collapse) — the choice between
    them is settled by measured single-touch numbers, not by a
    gradient-at-collapse argument."""
    s = emb @ emb.T / temperature
    cand = pos_mask | neg_mask
    s = jnp.where(cand, s, -jnp.inf)
    lse_all = jax.scipy.special.logsumexp(s, axis=1)
    s_pos = jnp.where(pos_mask, s, -jnp.inf)
    lse_pos = jax.scipy.special.logsumexp(s_pos, axis=1)
    valid = pos_mask.any(axis=1) & neg_mask.any(axis=1)
    per = jnp.where(valid, lse_all - lse_pos, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1.0)


def kernel_alignment_loss(
    emb: jax.Array, positions: jax.Array, sigma: float
) -> jax.Array:
    """MSE between the batch cosine-similarity matrix and a Gaussian kernel
    of pose distance: cos(e_i, e_j) -> exp(-d_ij^2 / (2 sigma^2)).

    The particle filter consumes softmaxed cosine similarity as likelihood
    (particle_filter.py:449-469) — this loss shapes the ENTIRE
    similarity-vs-distance profile the filter needs (monotone decay at the
    sigma scale), where the triplet loss only orders one (pos, neg) pair
    per anchor."""
    sims = emb @ emb.T
    d2 = jnp.sum(
        (positions[:, None, :] - positions[None, :, :]) ** 2, axis=-1
    )
    target = jnp.exp(-d2 / (2.0 * sigma**2))
    off = 1.0 - jnp.eye(emb.shape[0], dtype=emb.dtype)
    return jnp.sum(((sims - target) * off) ** 2) / jnp.maximum(
        jnp.sum(off), 1.0
    )


def make_train_step(
    tcn: TCN, tx, margin: float,
    kernel_weight: float = 0.0, kernel_sigma: float = 5e-3,
    loss_name: str = "BatchHardTripletMarginLoss",
    temperature: float = 0.07,
):
    """(params, batch_stats, opt_state, inputs, pos_mask, neg_mask,
    positions) -> ... dp-shardable over the batch dim. `inputs` are
    backbone inputs (clouds for VoxelFPN, images for HeightmapFPN)."""
    model, arch, grid = tcn.model, tcn.arch, tcn.grid_size

    def loss_fn(params, batch_stats, inputs, pos_mask, neg_mask, positions):
        x = inputs if arch == "HeightmapFPN" else voxelize(inputs, grid)
        emb, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        new_stats = mutated.get("batch_stats", batch_stats)
        if loss_name == "InfoNCE":
            loss = supcon_loss(emb, pos_mask, neg_mask, temperature)
        else:
            loss = batch_hard_triplet_loss(emb, pos_mask, neg_mask, margin)
        if kernel_weight > 0.0:
            loss = loss + kernel_weight * kernel_alignment_loss(
                emb, positions, kernel_sigma
            )
        return loss, new_stats

    @jax.jit
    def step(params, batch_stats, opt_state, inputs, pos_mask, neg_mask,
             positions):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, inputs, pos_mask, neg_mask, positions
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


@functools.partial(
    jax.jit, static_argnames=("max_shift_px", "max_rot_deg")
)
def augment_canonical(
    key: jax.Array,
    inputs: jax.Array,  # (B, cs, cs, 2) canonical [pen, mask] patches
    max_shift_px: float = 2.0,
    max_rot_deg: float = 6.0,
):
    """Canonical-frame augmentation for canonicalized TCN inputs.

    The canonical frame (ops/image.canonicalize_patch) is estimated from
    image moments, so it carries two residual nuisances the geometry can't
    remove: (a) a 180-degree ambiguity when the patch is skew-free, and
    (b) small frame jitter when the TDN estimate perturbs the moments.
    Training-time random 180-degree flips + small rotation/shift jitter
    teach the embedding invariance to both."""
    b, h, w, c = inputs.shape
    k1, k2, k3 = jax.random.split(key, 3)
    flip = jax.random.bernoulli(k1, 0.5, (b,))
    ang = jax.random.uniform(
        k2, (b,), minval=-np.radians(max_rot_deg), maxval=np.radians(max_rot_deg)
    ) + flip * np.pi
    shift = jax.random.uniform(
        k3, (b, 2), minval=-max_shift_px, maxval=max_shift_px
    )

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)

    def one(x, a, s):
        ca, sa = jnp.cos(a), jnp.sin(a)
        sy = cy + (ys - cy) * ca - (xs - cx) * sa + s[0]
        sx = cx + (ys - cy) * sa + (xs - cx) * ca + s[1]
        return jnp.stack(
            [
                jax.scipy.ndimage.map_coordinates(
                    x[..., ch], [sy, sx], order=1, mode="constant", cval=0.0
                )
                for ch in range(c)
            ],
            axis=-1,
        )

    return jax.vmap(one)(inputs, ang, shift)


def pose_masks(positions: np.ndarray, pos_dist: float, neg_dist: float):
    """Positive/negative pair masks from gel positions (B, 3)."""
    d = np.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
    eye = np.eye(len(positions), dtype=bool)
    return (d < pos_dist) & ~eye, d > neg_dist


@jax.jit
def augment_heightmaps(
    key: jax.Array,
    hms: jax.Array,  # (B, H, W) gel-frame heightmaps, px units
    masks: jax.Array,  # (B, H, W) bool
    lowfreq_px: float = 1.5,
    white_px: float = 0.5,
):
    """TDN-noise augmentation: perturb GT heightmaps the way the depth
    network's ESTIMATES are wrong, so codebook codes built from estimated
    heightmaps (the reference's choice, build_codebook.py:94-98) stay in
    distribution. Measured round 1: GT-heightmap codebook single-touch
    0.786 vs estimated 0.865 — this closes that domain gap at the source.

    FCRN error is dominated by smooth low-frequency miscalibration plus
    pixel noise (~0.05 mm RMSE = ~1.7 px at pixmm=0.03); mask errors are
    boundary over/under-segmentation. Modeled as: bilinear-upsampled 4x3
    random field + white noise on the heightmap, random one-pixel
    erosion/dilation of the mask."""
    b, h, w = hms.shape
    k1, k2, k3 = jax.random.split(key, 3)
    coarse = jax.random.normal(k1, (b, 4, 3)) * lowfreq_px
    field = jax.image.resize(coarse, (b, h, w), method="bilinear")
    white = jax.random.normal(k2, (b, h, w)) * white_px
    hms = hms + field + white

    # mask morphology: per-sample choice of erode / keep / dilate
    m = masks.astype(jnp.float32)[:, None]  # NCHW for reduce_window
    eroded = -jax.lax.reduce_window(
        -m, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME"
    )
    dilated = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME"
    )
    choice = jax.random.randint(k3, (b, 1, 1, 1), 0, 3)
    m = jnp.where(choice == 0, eroded, jnp.where(choice == 2, dilated, m))
    return hms, m[:, 0] > 0.5


def mine_hard_negatives(
    emb_bank: np.ndarray,  # (M, E) L2-normalized embeddings of the bank
    positions: np.ndarray,  # (M, 3)
    anchor_ids: np.ndarray,  # (G,) bank indices to mine for
    neg_dist: float,
    k: int = 1,
) -> np.ndarray:
    """Globally hardest negatives: for each anchor, the bank entries with
    the highest embedding similarity among those farther than `neg_dist`
    in pose — the confusable aliases batch-local sampling never surfaces.
    Returns (G, k) bank indices."""
    sims = emb_bank[anchor_ids] @ emb_bank.T  # (G, M)
    d = np.linalg.norm(
        positions[anchor_ids][:, None] - positions[None, :], axis=-1
    )
    sims[d <= neg_dist] = -np.inf  # only true negatives are candidates
    return np.argsort(-sims, axis=1)[:, :k]


def build_touch_bank(
    cfg, obj_model: str, n_samples: int, seed: int = 0,
    positive_jitter_t: float = 7e-4, positive_jitter_r_deg: float = 3.0,
    near_negative_dist: tuple[float, float] | None = None,
    independent_positives: bool = True,
):
    """Render touch GROUPS -> (heightmaps f16, masks, positions). Entries
    come in groups of 3: (anchor, positive, near-negative):

      * positive  — with `independent_positives` (default): a FRESH touch
        pose synthesized at the same surface site — new yaw, new shear
        tilt, new press depth. The filter's retrieval problem is exactly
        "same site, independent nuisances" (the codebook and the query
        never share nuisance draws); jitter-positives (the round-2 recipe,
        kept as `independent_positives=False`) share the anchor's yaw/tilt
        and therefore never teach the invariance that
        scripts/diagnose_embedding.py shows is the failure mode,
      * near-negative — a touch re-projected onto the surface at a tangent
        offset just beyond `neg_dist` (default 1.2-3x), i.e. at the 10-30 mm
        aliasing scale retrieval actually has to resolve.

    Random pose batches on a whole object essentially never contain
    positive pairs at mm scale, which starves the triplet loss — the
    reference curates explicit positive sets offline (train_sets pickles,
    config/tcn/default.yaml:52-53). And random batch NEGATIVES are distant
    touches that are trivially separable, so training never shapes the
    medium-distance scale (measured round 1: triplet loss 0.02 with
    single-touch WORSE than chance-adjacent) — the rendered near-negatives
    put that scale inside every batch."""
    import jax as _jax

    from midastouch_tpu.apps import common
    from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
    from midastouch_tpu.ops import se3

    rng = np.random.default_rng(seed)
    mesh = common.resolve_mesh(obj_model)
    renderer = common.make_renderer(cfg, mesh, randomize=False, seed=seed)
    neg_dist = float(cfg.tcn.train.neg_dist)
    lo, hi = near_negative_dist or (1.2 * neg_dist, 3.0 * neg_dist)

    n_anchor = max(n_samples // 3, 1)
    shear = float(cfg.tdn.render.shear_mag)
    if independent_positives:
        # sample SITES (30% from feature edges, like sample_poses_on_mesh)
        # and synthesize anchor + positive poses independently at each
        n_edge = int(0.3 * n_anchor)
        ep, en, n_edge = mesh.sample_edges(n_edge, rng)
        sp, sn = mesh.sample_surface(n_anchor - n_edge, rng)
        pts = np.concatenate([sp, ep], axis=0)
        nrm = np.concatenate([sn, en], axis=0)

        def fresh_poses(s):
            delta = rng.uniform(0, 2 * np.pi, n_anchor).astype(np.float32)
            return np.asarray(se3.pose_from_vertex_normal(
                _jax.numpy.asarray(pts), _jax.numpy.asarray(nrm),
                float(np.radians(shear)), _jax.numpy.asarray(delta),
                _jax.random.PRNGKey(seed + s),
            ))

        anchors = fresh_poses(10_000)
        positives = fresh_poses(20_000)
    else:
        anchors = sample_poses_on_mesh(
            mesh, n_anchor, rng, edges=True, shear_mag_deg=shear,
        )
        # positives: anchor pose with small SE(3) jitter (round-2 recipe)
        tn = rng.normal(0, positive_jitter_t, (n_anchor, 3)).astype(np.float32)
        rn = np.radians(
            rng.normal(0, positive_jitter_r_deg, (n_anchor, 3))
        ).astype(np.float32)
        Rn = np.asarray(se3.euler_to_matrix(_jax.numpy.asarray(rn), "ZYX"))
        Tn = np.zeros((n_anchor, 4, 4), np.float32)
        Tn[:, :3, :3] = Rn
        Tn[:, :3, 3] = tn
        Tn[:, 3, 3] = 1.0
        positives = anchors @ Tn

    # near-negatives: walk a random tangent direction from the anchor's
    # contact by U(lo, hi), re-project to the nearest surface vertex and
    # synthesize a fresh touch pose from its normal
    verts = np.asarray(mesh.vertices, np.float32)
    vnorm = np.asarray(mesh.vertex_normals, np.float32)
    c = anchors[:, :3, 3]
    z = anchors[:, :3, 2]
    rd = rng.normal(size=(n_anchor, 3)).astype(np.float32)
    tang = rd - np.sum(rd * z, axis=1, keepdims=True) * z
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    step_len = rng.uniform(lo, hi, (n_anchor, 1)).astype(np.float32)
    target = c + tang * step_len
    d2 = (
        np.sum(target**2, 1)[:, None]
        - 2 * target @ verts.T
        + np.sum(verts**2, 1)[None, :]
    )
    vi = np.argmin(d2, axis=1)
    near_negs = np.asarray(
        se3.pose_from_vertex_normal(
            _jax.numpy.asarray(verts[vi]),
            _jax.numpy.asarray(vnorm[vi]),
            float(cfg.tdn.render.shear_mag),
            _jax.numpy.asarray(
                rng.uniform(0, 2 * np.pi, n_anchor).astype(np.float32)
            ),
            _jax.random.PRNGKey(seed + 1),
        )
    )

    poses = np.empty((3 * n_anchor, 4, 4), np.float32)
    poses[0::3] = anchors
    poses[1::3] = positives
    poses[2::3] = near_negs

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
    eval_fn=None,
    eval_every: int = 5,
    banks: list | None = None,
):
    """`eval_fn(variables) -> dict` is called every `eval_every` epochs
    (and at the end) with the current weights — the measurement-first hook:
    wire a single-touch scorer here so every recipe change lands with a
    number. `banks` overrides the rendered touch banks (reuse across
    runs)."""
    tr = cfg.tcn.train
    m = cfg.tcn.model
    batch_size = int(tr.batch_size)
    margin = float(tr.margin)
    pos_dist, neg_dist = float(tr.pos_dist), float(tr.neg_dist)

    obj_models = obj_models or [str(cfg.expt.obj_model)]
    if banks is None:
        banks = [
            build_touch_bank(
                cfg, o, n_samples // len(obj_models), seed,
                independent_positives=bool(tr.get("site_positives", True)),
            )
            for o in obj_models
        ]
    heightmaps = np.concatenate([b[0] for b in banks])
    masks = np.concatenate([b[1] for b in banks])
    positions = np.concatenate([b[2] for b in banks])

    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path="/nonexistent", seed=seed)
    params = tcn.variables["params"]
    batch_stats = tcn.variables.get("batch_stats", {})

    milestones = [int(x) for x in tr.scheduler_milestones]
    # one optimizer step consumes g_per_batch 3-entry groups (+ mined
    # negatives); derive steps/epoch from that loop, not len/batch_size,
    # so the LR milestones land on the configured epochs
    _n_groups = len(heightmaps) // 3
    _g_per_batch = max(batch_size // 4, 1)
    steps_per_epoch = max((_n_groups - _g_per_batch) // _g_per_batch + 1, 1)
    sched = optax.piecewise_constant_schedule(
        float(tr.lr), {ms * steps_per_epoch: 0.1 for ms in milestones}
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=float(tr.weight_decay)),
    )
    opt_state = tx.init(params)
    step = make_train_step(
        tcn, tx, margin,
        kernel_weight=float(tr.get("kernel_loss_weight", 0.0)),
        kernel_sigma=float(tr.get("kernel_sigma", 5e-3)),
        loss_name=str(tr.get("loss", "BatchHardTripletMarginLoss")),
        temperature=float(tr.get("temperature", 0.07)),
    )

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    if out_path is None:
        out_path = os.path.join(DIRS["weights"], str(m.tcn_weights))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def embed_bank(params, batch_stats, bs=128):
        """Eval-mode embeddings of the whole bank (for global mining)."""
        variables = {"params": params, "batch_stats": batch_stats}
        out, kk = [], jax.random.PRNGKey(0)
        for i in range(0, len(heightmaps), bs):
            kk, kb = jax.random.split(kk)
            hm = heightmaps[i : i + bs].astype(np.float32)
            mk = masks[i : i + bs]
            pad = bs - len(hm)  # pad the tail batch: one compiled shape
            if pad:
                hm = np.concatenate([hm, np.zeros((pad,) + hm.shape[1:], hm.dtype)])
                mk = np.concatenate([mk, np.zeros((pad,) + mk.shape[1:], mk.dtype)])
            inputs = tcn.model_inputs(kb, jnp.asarray(hm), jnp.asarray(mk))
            e = tcn._embed_impl(variables, inputs)
            out.append(np.asarray(e)[: bs - pad if pad else bs])
        e = np.concatenate(out)
        return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)

    # batches: G rendered groups (anchor, positive, near-negative) + G
    # globally mined hard negatives per batch
    n_groups, g_per_batch = _n_groups, _g_per_batch
    history = []
    mined = None  # (n_groups, 1) bank ids, refreshed each epoch after warmup
    for epoch in range(epochs):
        if epoch >= 2:
            emb_bank = embed_bank(params, batch_stats)
            mined = mine_hard_negatives(
                emb_bank, positions, 3 * np.arange(n_groups), neg_dist, k=1
            )
        group_perm = rng.permutation(n_groups)
        losses = []
        for i in range(0, n_groups - g_per_batch + 1, g_per_batch):
            g = group_perm[i : i + g_per_batch]
            b = np.stack([3 * g, 3 * g + 1, 3 * g + 2], axis=1).reshape(-1)
            extra = (
                mined[g, 0]
                if mined is not None
                else rng.integers(0, len(heightmaps), len(g))
            )
            b = np.concatenate([b, extra])
            pos_mask, neg_mask = pose_masks(positions[b], pos_dist, neg_dist)
            key, ka, kb = jax.random.split(key, 3)
            if bool(tr.get("tdn_noise_aug", True)):
                hm_b, mask_b = augment_heightmaps(
                    ka,
                    jnp.asarray(heightmaps[b], dtype=jnp.float32),
                    jnp.asarray(masks[b]),
                )
            else:
                hm_b = jnp.asarray(heightmaps[b], dtype=jnp.float32)
                mask_b = jnp.asarray(masks[b])
            inputs = tcn.model_inputs(kb, hm_b, mask_b)
            if tcn.canonicalize and bool(tr.get("canonical_aug", True)):
                key, kc = jax.random.split(key)
                inputs = augment_canonical(kc, inputs)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                inputs, jnp.asarray(pos_mask), jnp.asarray(neg_mask),
                jnp.asarray(positions[b], dtype=jnp.float32),
            )
            losses.append(loss)  # device scalar; fetched once per epoch
        losses = [float(x) for x in jax.device_get(losses)]
        history.append({"epoch": epoch, "loss": float(np.mean(losses))})
        if epoch % log_every == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f}", flush=True)
        if eval_fn is not None and (
            epoch % eval_every == eval_every - 1 or epoch == epochs - 1
        ):
            metrics = eval_fn({"params": params, "batch_stats": batch_stats})
            history[-1].update(metrics)
            print(f"  eval @ epoch {epoch}: {metrics}", flush=True)
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
