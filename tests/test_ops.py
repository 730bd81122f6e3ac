"""Tests for resampling statistics, DBSCAN clustering, and image ops."""

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import DBSCAN

from midastouch_tpu.ops import cluster, image, resample


# ----------------------------- resampling ---------------------------------


def test_multinomial_resample_statistics():
    key = jax.random.PRNGKey(0)
    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    idx = resample.multinomial_resample(key, w, 40000)
    counts = np.bincount(np.asarray(idx), minlength=4) / 40000
    np.testing.assert_allclose(counts, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_systematic_resample_statistics():
    key = jax.random.PRNGKey(1)
    w = jnp.array([0.5, 0.25, 0.125, 0.125])
    idx = resample.systematic_resample(key, w, 8000)
    counts = np.bincount(np.asarray(idx), minlength=4) / 8000
    # systematic resampling has near-zero variance
    np.testing.assert_allclose(counts, [0.5, 0.25, 0.125, 0.125], atol=2e-3)


def test_resample_zero_weight_excluded():
    key = jax.random.PRNGKey(2)
    w = jnp.array([0.0, 1.0, 0.0, 1.0])
    for method in ("weighted_random", "low_var"):
        idx = np.asarray(resample.resample_indices(key, w, 1000, method))
        assert set(idx.tolist()) <= {1, 3}


def test_resample_degenerate_weights_uniform():
    key = jax.random.PRNGKey(3)
    w = jnp.zeros(8)
    idx = np.asarray(resample.multinomial_resample(key, w, 8000))
    counts = np.bincount(idx, minlength=8) / 8000
    np.testing.assert_allclose(counts, 1 / 8, atol=0.02)


def test_effective_sample_size():
    assert float(resample.effective_sample_size(jnp.ones(100))) == 100.0
    w = jnp.zeros(100).at[0].set(1.0)
    assert abs(float(resample.effective_sample_size(w)) - 1.0) < 1e-5


# ----------------------------- clustering ---------------------------------


def _two_blobs(rng, n=400, sep=1.0):
    a = rng.normal(size=(n // 2, 3)) * 0.01
    b = rng.normal(size=(n // 2, 3)) * 0.01 + sep
    return np.concatenate([a, b]).astype(np.float32)


def test_dbscan_matches_sklearn_two_blobs(rng):
    pts = _two_blobs(rng)
    eps, ms = 0.05, 40
    ours = np.asarray(cluster.dbscan(jnp.asarray(pts), eps, ms))
    ref = DBSCAN(eps=eps, min_samples=ms).fit(pts).labels_
    # same partition (label values differ): compare co-membership
    for labels in (ours, ref):
        assert len(set(labels[labels >= 0])) == 2
    same_ours = ours[:, None] == ours[None, :]
    same_ref = ref[:, None] == ref[None, :]
    noise = (ours < 0) | (ref < 0)
    keep = ~(noise[:, None] | noise[None, :])
    np.testing.assert_array_equal(same_ours[keep], same_ref[keep])
    # noise agreement
    np.testing.assert_array_equal(ours < 0, ref < 0)


def test_dbscan_single_blob(rng):
    pts = (rng.normal(size=(200, 3)) * 0.003).astype(np.float32)
    ours = np.asarray(cluster.dbscan(jnp.asarray(pts), 1e-2, 40))
    assert len(np.unique(ours)) == 1 and ours[0] >= 0


def test_compact_labels():
    labels = jnp.array([-1, 5, 5, 9, -1, 9, 9], dtype=jnp.int32)
    dense = np.asarray(cluster.compact_labels(labels, 8))
    assert dense.max() == 2
    # co-membership preserved
    assert dense[1] == dense[2] and dense[3] == dense[5] == dense[6]
    assert dense[0] == dense[4] != dense[1]


def test_cluster_positions_subsampled(rng):
    pts = _two_blobs(rng, n=5000)
    labels = np.asarray(
        cluster.cluster_positions(
            jnp.asarray(pts), eps=0.05, min_samples_frac=0.2, max_points=512,
            backend="xla",
        )
    )
    # two coherent groups
    l0 = labels[: 2500]
    l1 = labels[2500:]
    assert np.all(l0 == l0[0]) and np.all(l1 == l1[0]) and l0[0] != l1[0]


# ------------------------------ image ops ---------------------------------


def test_normalize_minmax():
    x = jnp.array([[1.0, 3.0], [5.0, 9.0]])
    out = np.asarray(image.normalize_minmax(x))
    assert out.min() == 0 and out.max() == 255


def test_normalize_illum_cancels_smooth_nuisance():
    # a fine-structure signal under two different smooth illumination
    # fields must normalize to (nearly) the same input
    h, w = 64, 48
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    signal = 20.0 * np.sin(xs * 2.1) * np.cos(ys * 1.7)
    vign_a = 120.0 + 40.0 * (xs / w)  # smooth gradient A
    vign_b = 150.0 - 50.0 * (ys / h)  # smooth gradient B
    img_a = np.stack([signal + vign_a] * 3, -1)
    img_b = np.stack([1.3 * (signal + vign_b)] * 3, -1)  # + gain change
    na = np.asarray(image.normalize_image(jnp.asarray(img_a), "illum33"))
    nb = np.asarray(image.normalize_image(jnp.asarray(img_b), "illum33"))
    # interior agreement (borders see partial windows)
    d = np.abs(na - nb)[8:-8, 8:-8]
    assert d.mean() < 0.2, d.mean()
    # the affine-only normalization does NOT cancel the spatial gradient
    pa = np.asarray(image.normalize_image(jnp.asarray(img_a), "per_channel"))
    pb = np.asarray(image.normalize_image(jnp.asarray(img_b), "per_channel"))
    assert np.abs(pa - pb)[8:-8, 8:-8].mean() > d.mean() * 2

    # divide variant parses + runs
    dv = np.asarray(image.normalize_image(jnp.asarray(img_a), "illum_div33"))
    assert dv.shape == img_a.shape and np.isfinite(dv).all()


def test_heightmap_mask_basic():
    h, w, b = 64, 48, 4
    bg = jnp.zeros((h, w))
    hm = jnp.zeros((h, w))
    # a strong bump covering ~25% of the crop
    hm = hm.at[16:48, 12:36].set(50.0)
    mask = np.asarray(
        image.heightmap_to_mask(hm, bg, border=b, ratio=0.2, clip=5.0)
    )
    assert mask[20, 20] and not mask[2, 2]
    # no contact -> empty mask (area gate)
    tiny = jnp.zeros((h, w)).at[30:32, 20:22].set(50.0)
    mask2 = np.asarray(
        image.heightmap_to_mask(tiny, bg, border=b, ratio=0.2, clip=5.0)
    )
    assert not mask2.any()


def test_heightmap_cloud_roundtrip():
    # flat plate at gel height `d` px -> all points at z = -(cam_dist - d*pixmm)
    pixmm, cam_dist, f = 0.03, 0.022, 277.0
    hm = jnp.full((32, 24), 10.0)
    mask = jnp.ones((32, 24), dtype=bool)
    pts, valid = image.heightmap_to_cloud(hm, mask, pixmm, cam_dist, f)
    assert bool(valid.all())
    depth = cam_dist - 10.0 * pixmm / 1000
    np.testing.assert_allclose(np.asarray(pts[:, 2]), -depth, atol=1e-7)
    # central pixel maps near x=y=0
    center = np.argmin(np.abs(np.asarray(pts[:, 0])) + np.abs(np.asarray(pts[:, 1])))
    assert abs(np.asarray(pts)[center, 0]) < depth / f * 1.1


def test_sample_cloud_fixed_size():
    key = jax.random.PRNGKey(0)
    pts = jnp.arange(300.0).reshape(100, 3)
    valid = jnp.zeros(100, dtype=bool).at[:10].set(True)
    out = np.asarray(image.sample_cloud(key, pts, valid, 32))
    assert out.shape == (32, 3)
    # all sampled points come from the valid set
    assert set(out[:, 0].tolist()) <= set(np.arange(0, 30, 3.0).tolist())
    # empty cloud -> zeros
    out2 = np.asarray(image.sample_cloud(key, pts, jnp.zeros(100, bool), 32))
    np.testing.assert_array_equal(out2, 0)


def test_scale_to_unit():
    pts = jnp.array([[0.0, 1.0, 2.0], [3.0, 4.0, 10.0]])
    out = np.asarray(image.scale_to_unit(pts))
    assert out.min() == -1.0 and out.max() == 1.0


def test_blend_heightmaps():
    w1 = jnp.ones((1, 4, 4))
    np.testing.assert_allclose(np.asarray(image.blend_heightmaps(w1)), 1.0)
    stack = jnp.stack([jnp.zeros((4, 4)), jnp.ones((4, 4))])
    out = np.asarray(image.blend_heightmaps(stack))
    # newest frame dominates
    assert 0.5 < out[0, 0] < 1.0


def _asym_patch(h=240, w=320, cx=160.0, cy=120.0, yaw=0.0):
    """Asymmetric two-bump contact patch rotated by `yaw` about (cx, cy)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    u = (xs - cx) * c + (ys - cy) * s
    v = -(xs - cx) * s + (ys - cy) * c
    hm = 30.0 * np.exp(-((u - 25) ** 2 + v**2) / 300.0) + 18.0 * np.exp(
        -((u + 18) ** 2 + (v - 10) ** 2) / 150.0
    )
    return hm.astype(np.float32), hm > 2.0


def test_canonicalize_patch_yaw_and_translation_invariant():
    """The canonical patch must be (approximately) invariant to the touch's
    in-plane yaw and image translation — the nuisance DOFs of random-yaw
    codebook sampling (pose_from_vertex_normal)."""
    hm0, m0 = _asym_patch(yaw=0.0)
    p0 = np.asarray(image.canonicalize_patch(jnp.asarray(hm0), jnp.asarray(m0)))
    assert p0.shape == (32, 32) and p0.max() > 1.0
    for yaw, cx, cy in ((0.8, 160, 120), (2.4, 190, 100), (-1.2, 140, 135)):
        hm, m = _asym_patch(cx=cx, cy=cy, yaw=yaw)
        p = np.asarray(image.canonicalize_patch(jnp.asarray(hm), jnp.asarray(m)))
        # correlation-level agreement (bilinear resampling blurs edges)
        a, b = p0.ravel(), p.ravel()
        corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert corr > 0.98, f"yaw={yaw}: canonical corr {corr:.3f}"


def test_canonicalize_patch_empty_mask_is_finite():
    hm = np.zeros((240, 320), np.float32)
    p = np.asarray(
        image.canonicalize_patch(jnp.asarray(hm), jnp.asarray(hm > 1))
    )
    assert np.all(np.isfinite(p)) and p.max() == 0.0


# -- sort-free rank selection (ops/select; replaces the annealing argsort) ----

def _argsort_masks(w, alive, k_bottom, k_top):
    """Oracle: the stable-argsort rank scheme select.py replaces."""
    wa = np.where(alive, w, np.inf)
    order = np.argsort(wa, kind="stable")
    rank_up = np.empty(len(w), np.int64)
    rank_up[order] = np.arange(len(w))
    n = int(alive.sum())
    rank_down = n - 1 - rank_up
    return alive & (rank_up < k_bottom), alive & (rank_down < k_top)


def test_select_masks_match_argsort():
    from midastouch_tpu.ops import select

    rng = np.random.default_rng(0)
    for n, k_b, k_t in ((64, 5, 9), (1000, 333, 0), (1000, 0, 250),
                        (4096, 1, 4095)):
        w = rng.gamma(2.0, 1.0, size=n).astype(np.float32)
        alive = rng.random(n) < 0.8
        k_b_eff = min(k_b, int(alive.sum()))
        bot, top = _argsort_masks(w, alive, k_b_eff, k_t)
        bot2 = np.asarray(select.bottom_k_mask(
            jnp.asarray(w), jnp.asarray(alive), jnp.asarray(k_b_eff)))
        top2 = np.asarray(select.top_k_mask(
            jnp.asarray(w), jnp.asarray(alive), jnp.asarray(k_t)))
        np.testing.assert_array_equal(bot, bot2)
        np.testing.assert_array_equal(top, top2)


def test_select_masks_ties_match_argsort():
    from midastouch_tpu.ops import select

    rng = np.random.default_rng(1)
    # heavy ties: weights drawn from 4 distinct values, plus the all-equal
    # population the post-init annealing sees
    for w in (
        rng.choice(np.float32([0.1, 0.2, 0.2, 0.7]), size=512),
        np.full(512, 1.0 / 512, np.float32),
    ):
        alive = np.ones(512, bool)
        alive[::7] = False
        for k in (0, 1, 100, 400):
            k_eff = min(k, int(alive.sum()))
            bot, top = _argsort_masks(w, alive, k_eff, k_eff)
            bot2 = np.asarray(select.bottom_k_mask(
                jnp.asarray(w), jnp.asarray(alive), jnp.asarray(k_eff)))
            top2 = np.asarray(select.top_k_mask(
                jnp.asarray(w), jnp.asarray(alive), jnp.asarray(k_eff)))
            np.testing.assert_array_equal(bot, bot2, err_msg=f"bottom k={k}")
            np.testing.assert_array_equal(top, top2, err_msg=f"top k={k}")


def test_select_masks_jit_traced_k():
    from midastouch_tpu.ops import select

    w = jnp.asarray(np.random.default_rng(2).random(256), jnp.float32)
    alive = jnp.ones(256, bool)

    @jax.jit
    def f(k):
        return select.bottom_k_mask(w, alive, k), select.top_k_mask(w, alive, k)

    b, t = f(jnp.asarray(17))
    assert int(b.sum()) == 17 and int(t.sum()) == 17
    assert not bool(jnp.any(b & t))


# -- depth_band (press-depth-invariant relief) --------------------------------

def test_depth_band_press_invariance():
    """Same surface pressed deeper = penetration + offset with larger
    support; the band representation must be identical on the band."""
    from midastouch_tpu.ops import image

    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    bump = 60 * np.exp(-(((yy - 120) / 40) ** 2 + ((xx - 160) / 55) ** 2))
    shallow = np.maximum(bump - 20, 0.0)
    deep = np.maximum(bump - 2, 0.0)   # 0.54 mm deeper press
    band_px = 0.5 / 0.03  # 0.5 mm band

    b1, m1 = image.depth_band(
        jnp.asarray(shallow), jnp.asarray(shallow > 0), band_px=band_px)
    b2, m2 = image.depth_band(
        jnp.asarray(deep), jnp.asarray(deep > 0), band_px=band_px)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_depth_band_anchor_robust_to_spike():
    from midastouch_tpu.ops import image

    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    bump = np.maximum(
        50 * np.exp(-(((yy - 120) / 50) ** 2 + ((xx - 160) / 60) ** 2)) - 10,
        0.0,
    )
    spiked = bump.copy()
    spiked[5, 5] = 500.0  # lone TDN spike far from the contact
    band_px = 20.0
    b_clean, _ = image.depth_band(
        jnp.asarray(bump), jnp.asarray(bump > 0), band_px=band_px)
    b_spiked, _ = image.depth_band(
        jnp.asarray(spiked), jnp.asarray(spiked > 0), band_px=band_px)
    # top-64 mean anchor moves < 8 px despite the 500 px outlier
    diff = np.abs(np.asarray(b_clean) - np.asarray(b_spiked))
    assert np.median(diff[np.asarray(bump) > 30]) < 8.0


# -- rectify_tilt (shear-tilt plane removal) -----------------------------------

def _tilted_touch(slope_x, slope_y, press_px=12.0, h=240, w=320):
    """Synthetic penetration image: fixed surface relief + a shear-tilt
    plane ramp + a press-depth offset, supported on the contact disc."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # gentle sub-band relief (a few px over the patch), as on real smooth
    # surfaces — the +-5 deg ramp is then the DOMINANT image structure
    relief = 6.0 * np.exp(-(((yy - 128) / 34) ** 2 + ((xx - 150) / 46) ** 2))
    relief += 4.0 * np.exp(-(((yy - 100) / 18) ** 2 + ((xx - 190) / 22) ** 2))
    ramp = slope_x * (xx - 160) + slope_y * (yy - 120)
    disc = ((yy - 120) ** 2 + (xx - 160) ** 2) < 95.0**2
    z = np.maximum(relief + ramp + press_px, 0.0) * disc
    return z.astype(np.float32), z > 0


def test_rectify_tilt_removes_plane_ramp():
    """On relief+ramp, the rectified output equals relief + const on the
    support (the ramp DOF is gone)."""
    from midastouch_tpu.ops import image

    z0, m0 = _tilted_touch(0.0, 0.0)
    z1, m1 = _tilted_touch(0.06, -0.04)  # ~3.4 deg / 2.3 deg tilt
    r1, _ = image.rectify_tilt(jnp.asarray(z1), jnp.asarray(m1))
    r1 = np.asarray(r1)
    both = m0 & m1
    # difference to the untilted touch is a constant on the shared support
    d = (r1 - z0)[both]
    assert d.std() < 0.8, f"residual ramp std {d.std():.2f} px"


def test_rectify_tilt_restores_canonical_patch_match():
    """The end-to-end diagnosis in miniature: two touches at the same site
    with different shear tilts + press depths produce nearly uncorrelated
    banded canonical patches WITHOUT rectification and nearly identical
    ones WITH it (scripts/diagnose_embedding.py measures the same effect
    at population scale: 11% -> strong top-1 site accuracy)."""
    from midastouch_tpu.ops import image

    band_px = 0.7 / 0.03

    def patch(slope_x, slope_y, press, rectify):
        z, m = _tilted_touch(slope_x, slope_y, press_px=press)
        z, m = jnp.asarray(z), jnp.asarray(m)
        if rectify:
            z, m = image.rectify_tilt(z, m)
        zb, mb = image.depth_band(z, m, band_px=band_px)
        return np.asarray(
            image.canonicalize_patch(zb, mb, out_h=48, out_w=48)
        ).ravel()

    def corr(a, b):
        a, b = a - a.mean(), b - b.mean()  # Pearson: the discriminative part
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    # +-5 deg shear ~ +-0.0875 px/px slope; press varies 0.36 vs 0.6 mm
    args = ((0.08, 0.03, 12.0), (-0.05, -0.07, 20.0))
    c_raw = corr(patch(*args[0], rectify=False), patch(*args[1], rectify=False))
    c_fix = corr(patch(*args[0], rectify=True), patch(*args[1], rectify=True))
    assert c_fix > 0.85, f"rectified corr {c_fix:.3f}"
    assert c_fix > c_raw + 0.1, f"rectify no help: {c_raw:.3f} -> {c_fix:.3f}"


def test_rectify_tilt_empty_and_degenerate_masks_finite():
    from midastouch_tpu.ops import image

    z = np.zeros((240, 320), np.float32)
    out, m = image.rectify_tilt(jnp.asarray(z), jnp.asarray(z > 1))
    assert np.all(np.isfinite(np.asarray(out))) and not bool(np.any(m))
    # single-pixel support: det == 0 path
    z[100, 100] = 5.0
    out, _ = image.rectify_tilt(jnp.asarray(z), jnp.asarray(z > 0))
    assert np.all(np.isfinite(np.asarray(out)))


def test_systematic_resample_large_n_is_permutation():
    """Regression: at N >= ~59k the old i*stride % N position spread
    overflowed int32 and silently duplicated/dropped particles. With
    uniform weights every parent has exactly one offspring, so the output
    must be a permutation of arange(N) — at N safely past the overflow
    point."""
    from midastouch_tpu.ops import resample

    for n in (59_000, 100_000):
        idx = np.asarray(resample.systematic_resample(
            jax.random.PRNGKey(0), jnp.ones((n,)) / n, n
        ))
        assert np.array_equal(np.sort(idx), np.arange(n)), f"N={n}"
        # prefix-exchangeability: any prefix draws ~uniformly over parents
        assert abs(idx[: n // 10].mean() / n - 0.5) < 0.05
