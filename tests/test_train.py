"""Trainer tests: TDN MSE step learns, TCN triplet loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from midastouch_tpu.models.fcrn import FCRN
from midastouch_tpu.train.train_tcn import batch_hard_triplet_loss, pose_masks
from midastouch_tpu.train.train_tdn import make_train_step


@pytest.mark.slow
def test_tdn_train_step_reduces_loss():
    model = FCRN(layers=(1, 1, 1, 1), out_size=(64, 48))
    tx = optax.adam(1e-3)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 48, 3))
    y = jnp.ones((4, 64, 48)) * 20.0
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    losses = []
    for i in range(8):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, x, y, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_tdn_epoch_step_matches_per_batch_semantics():
    """The one-dispatch epoch scan must train: loss decreases over epochs
    and the relief term contributes a finite gradient."""
    from midastouch_tpu.train.train_tdn import make_epoch_step

    model = FCRN(layers=(1, 1, 1, 1), out_size=(64, 48))
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    images = (rng.random((12, 64, 48, 3)) * 255).astype(np.uint8)
    targets = (rng.random((12, 64, 48)) * 5).astype(np.float16)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 48, 3)), train=False
    )
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    epoch = make_epoch_step(model, tx, "per_channel",
                            relief_weight=5.0, relief_kernel=5)
    perm = jnp.asarray(
        rng.permutation(12).reshape(3, 4).astype(np.int32)
    )
    first = None
    for e in range(4):
        params, stats, opt_state, losses = epoch(
            params, stats, opt_state, jax.random.PRNGKey(e),
            jnp.asarray(images.reshape(12, -1)),
            jnp.asarray(targets.reshape(12, -1)), perm,
        )
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        if first is None:
            first = losses.mean()
    assert losses.mean() < first


@pytest.mark.slow
def test_tdn_paired_epoch_step_trains_and_aligns_views():
    from midastouch_tpu.train.train_tdn import make_paired_epoch_step

    model = FCRN(layers=(1, 1, 1, 1), out_size=(64, 48))
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    base = (rng.random((8, 64, 48, 3)) * 200).astype(np.float32)
    # view B = view A under a different "lighting" (gain + offset)
    img_a = base.astype(np.uint8)
    img_b = np.clip(base * 1.2 + 10, 0, 255).astype(np.uint8)
    targets = (rng.random((8, 64, 48)) * 5).astype(np.float16)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 48, 3)), train=False
    )
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    epoch = make_paired_epoch_step(model, tx, "per_channel",
                                   relief_weight=1.0, relief_kernel=5,
                                   pair_weight=5.0)
    perm = jnp.asarray(rng.permutation(8).reshape(2, 4).astype(np.int32))
    same_press = jnp.asarray(np.array([1, 1, 1, 1, 0, 0, 0, 0], bool))
    first = None
    for e in range(4):
        params, stats, opt_state, losses = epoch(
            params, stats, opt_state, jax.random.PRNGKey(e),
            jnp.asarray(img_a.reshape(8, -1)),
            jnp.asarray(img_b.reshape(8, -1)),
            jnp.asarray(targets.reshape(8, -1)),
            jnp.asarray(targets.reshape(8, -1)), same_press, perm,
        )
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        if first is None:
            first = losses.mean()
    assert losses.mean() < first


def test_normalize_image_modes():
    from midastouch_tpu.ops import image as image_ops

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((16, 12, 3)).astype(np.float32) * 100)
    mm = np.asarray(image_ops.normalize_image(img, "minmax"))
    assert mm.min() == pytest.approx(0.0, abs=1e-4)
    assert mm.max() == pytest.approx(255.0, rel=1e-4)
    pc = np.asarray(image_ops.normalize_image(img, "per_channel"))
    assert np.abs(pc.mean(axis=(0, 1))).max() < 1e-4
    assert np.abs(pc.std(axis=(0, 1)) - 1.0).max() < 1e-4
    # per-channel affine lighting (gain+offset per channel) is removed
    gains = jnp.asarray([1.3, 0.8, 1.1])
    lit = img * gains[None, None, :] + jnp.asarray([5.0, -3.0, 0.0])
    pc2 = np.asarray(image_ops.normalize_image(lit, "per_channel"))
    assert np.abs(pc2 - pc).max() < 1e-3
    with pytest.raises(ValueError):
        image_ops.normalize_image(img, "nope")


def test_highpass_removes_smooth_keeps_fine():
    from midastouch_tpu.ops import image as image_ops

    ys, xs = np.mgrid[0:64, 0:48].astype(np.float32)
    smooth = 0.05 * xs + 0.03 * ys  # ramp: should vanish
    fine = np.sin(xs * 2.0) * np.sin(ys * 2.0)  # ~3 px period: should stay
    hp_s = np.asarray(image_ops.highpass(jnp.asarray(smooth), k=9))
    hp_f = np.asarray(image_ops.highpass(jnp.asarray(fine), k=9))
    inner = (slice(8, -8), slice(8, -8))
    assert np.abs(hp_s[inner]).max() < 0.05
    assert np.std(hp_f[inner]) > 0.5 * np.std(fine[inner])


def test_pose_masks():
    pos = np.array([[0, 0, 0], [0.001, 0, 0], [0.1, 0, 0]], dtype=np.float32)
    p, n = pose_masks(pos, pos_dist=0.002, neg_dist=0.01)
    assert p[0, 1] and p[1, 0] and not p[0, 0]  # self excluded
    assert not p[0, 2]
    assert n[0, 2] and n[2, 0] and not n[0, 1]


def test_batch_hard_triplet_loss():
    # two tight clusters in embedding space matching the pose clusters
    emb = jnp.array([[1.0, 0], [1.0, 0.01], [-1.0, 0], [-1.0, 0.01]])
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    pos = jnp.array([[0, 1], [1, 0], [0, 0], [0, 0]], dtype=bool)
    pos = jnp.zeros((4, 4), bool).at[0, 1].set(True).at[1, 0].set(True).at[
        2, 3
    ].set(True).at[3, 2].set(True)
    neg = ~pos & ~jnp.eye(4, dtype=bool)
    loss_good = float(batch_hard_triplet_loss(emb, pos, neg, margin=0.2))
    # embeddings anti-aligned with pose structure -> high loss
    emb_bad = emb[jnp.array([0, 2, 1, 3])]
    loss_bad = float(batch_hard_triplet_loss(emb_bad, pos, neg, margin=0.2))
    assert loss_good < 1e-4  # positives together, negatives far: zero loss
    assert loss_bad > loss_good + 0.1


def test_triplet_loss_no_valid_pairs():
    emb = jnp.eye(3)
    empty = jnp.zeros((3, 3), bool)
    loss = float(batch_hard_triplet_loss(emb, empty, empty, margin=0.2))
    assert loss == 0.0


def test_augment_heightmaps():
    from midastouch_tpu.train.train_tcn import augment_heightmaps

    key = jax.random.PRNGKey(0)
    hms = jnp.ones((4, 32, 24)) * 10.0
    masks = jnp.zeros((4, 32, 24), bool).at[:, 8:24, 6:18].set(True)
    hm2, m2 = augment_heightmaps(key, hms, masks)
    assert hm2.shape == hms.shape and m2.shape == masks.shape
    assert m2.dtype == jnp.bool_
    # perturbs but stays in the plausible few-px envelope
    delta = np.abs(np.asarray(hm2) - 10.0)
    assert delta.max() > 0.1 and delta.max() < 15.0
    # mask stays a perturbation of the original (within one dilation)
    m2 = np.asarray(m2)
    grown = np.asarray(
        jax.lax.reduce_window(
            masks.astype(jnp.float32)[:, None], -jnp.inf, jax.lax.max,
            (1, 1, 3, 3), (1, 1, 1, 1), "SAME",
        )[:, 0] > 0.5
    )
    assert not (m2 & ~grown).any()


def test_mine_hard_negatives():
    from midastouch_tpu.train.train_tcn import mine_hard_negatives

    # entry 3 is a far-pose alias of anchor 0 (same embedding, far pose);
    # entry 1 is nearby in pose (must be excluded despite sim=1)
    emb = np.array(
        [[1, 0], [1, 0], [0, 1], [1, 0], [0.5, 0.5]], dtype=np.float32
    )
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    pos = np.array(
        [[0, 0, 0], [0.001, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [0.3, 0, 0]],
        dtype=np.float32,
    )
    mined = mine_hard_negatives(emb, pos, np.array([0]), neg_dist=0.01, k=2)
    assert mined[0, 0] == 3  # the true alias
    assert 1 not in mined[0]  # pose-near entries are not negatives


def test_kernel_alignment_loss_shapes_similarity():
    """Perfectly kernel-aligned embeddings score ~0; anti-aligned score
    high — and the loss decreases under gradient steps on a toy table."""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.train.train_tcn import kernel_alignment_loss

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.005, 0.005, (16, 3)).astype(np.float32))
    # embeddings as free parameters: a direct sanity check of the gradient
    emb0 = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))

    def loss(e):
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return kernel_alignment_loss(e, pos, sigma=5e-3)

    l0 = float(loss(emb0))
    g = jax.jit(jax.grad(loss))
    e = emb0
    for _ in range(500):
        e = e - 1.0 * g(e)
    l1 = float(loss(e))
    assert l1 < 0.5 * l0, (l0, l1)
    # aligned table: cosine actually tracks the kernel now
    en = np.asarray(e / jnp.linalg.norm(e, axis=1, keepdims=True))
    sims = en @ en.T
    d = np.linalg.norm(np.asarray(pos)[:, None] - np.asarray(pos)[None], axis=-1)
    target = np.exp(-(d**2) / (2 * 5e-3**2))
    off = ~np.eye(16, dtype=bool)
    assert np.corrcoef(sims[off], target[off])[0, 1] > 0.7


def test_augment_canonical_flip_and_jitter():
    """180-deg flip augmentation: with jitter at zero magnitude the output
    is either the patch or its exact 180-deg rotation; shapes/finiteness."""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.train.train_tcn import augment_canonical

    rng = np.random.default_rng(0)
    x = rng.random((8, 24, 24, 2)).astype(np.float32)
    out = np.asarray(augment_canonical(
        jax.random.PRNGKey(3), jnp.asarray(x),
        max_shift_px=0.0, max_rot_deg=0.0))
    assert out.shape == x.shape and np.isfinite(out).all()
    flipped = x[:, ::-1, ::-1, :]
    for i in range(8):
        d_id = np.abs(out[i] - x[i]).max()
        d_fl = np.abs(out[i] - flipped[i]).max()
        assert min(d_id, d_fl) < 1e-4, (i, d_id, d_fl)
    # jitter produces valid, different patches
    out2 = np.asarray(augment_canonical(jax.random.PRNGKey(4), jnp.asarray(x)))
    assert np.isfinite(out2).all() and np.abs(out2 - x).max() > 1e-3


def test_contrastive_losses_well_posed():
    """Property tests for both TCN losses: finite gradients at a
    near-collapsed embedding, and both minimized by correct separation.
    (The loss CHOICE is an empirical question settled by measured
    single-touch numbers, not by a gradient argument — an earlier version
    of this test asserted supcon's collapse gradient dominates triplet's,
    which its own numbers falsified.)"""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.train.train_tcn import (
        batch_hard_triplet_loss, supcon_loss,
    )

    n, e = 16, 8
    base = jnp.ones((n, e)) / np.sqrt(e)
    # nearly collapsed: tiny random perturbation then renormalize
    pert = 1e-4 * jax.random.normal(jax.random.PRNGKey(0), (n, e))
    emb = base + pert
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    pos = np.zeros((n, n), bool)
    pos[np.arange(0, n, 2), np.arange(1, n, 2)] = True
    pos |= pos.T
    neg = ~pos & ~np.eye(n, dtype=bool)
    pos, neg = jnp.asarray(pos), jnp.asarray(neg)

    g_trip = jax.grad(
        lambda x: batch_hard_triplet_loss(x, pos, neg, 0.2))(emb)
    g_sup = jax.grad(lambda x: supcon_loss(x, pos, neg))(emb)
    assert np.isfinite(np.asarray(g_trip)).all()
    assert np.isfinite(np.asarray(g_sup)).all()
    assert float(jnp.abs(g_sup).max()) > 0.0
    assert float(jnp.abs(g_trip).max()) > 0.0

    # both losses are lower at correct separation than at collapse
    good = jnp.asarray(np.repeat(np.eye(n // 2, e)[: n // 2], 2, axis=0))
    good = good / jnp.linalg.norm(good, axis=1, keepdims=True)
    assert float(supcon_loss(good, pos, neg)) < float(supcon_loss(emb, pos, neg))
    assert float(
        batch_hard_triplet_loss(good, pos, neg, 0.2)
    ) < float(batch_hard_triplet_loss(emb, pos, neg, 0.2))
