"""Model tests: FCRN (TDN) and VoxelFPN (TCN) shapes + invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midastouch_tpu.models.fcrn import FCRN, depth_to_space
from midastouch_tpu.models.params_io import load_variables, save_variables
from midastouch_tpu.models.voxfpn import VoxelFPN, voxelize


def test_depth_to_space_ordering():
    # channel blocks [c00, c01, c10, c11] -> 2x2 spatial offsets
    x = jnp.arange(4.0).reshape(1, 1, 1, 4)
    out = np.asarray(depth_to_space(x))[0, :, :, 0]
    np.testing.assert_array_equal(out, [[0, 1], [2, 3]])


@pytest.mark.slow
def test_fcrn_forward_shapes():
    model = FCRN(layers=(1, 1, 1, 1), out_size=(80, 60))
    x = jnp.zeros((2, 80, 60, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 80, 60)
    feat = model.apply(variables, x, train=False, bottleneck=True)
    # input/32 trunk resolution, 1024 channels
    assert feat.shape == (2, 3, 2, 1024)


@pytest.mark.slow
def test_fcrn_train_mode_updates_stats():
    model = FCRN(layers=(1, 1, 1, 1), out_size=(64, 64))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_params_io_roundtrip(tmp_path):
    model = FCRN(layers=(1, 1, 1, 1), out_size=(64, 64))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = str(tmp_path / "w.npz")
    save_variables(p, variables)
    loaded = load_variables(p)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: jnp.allclose(a, b), variables, loaded
        )
    )
    assert bool(chex_equal)
    out1 = model.apply(variables, x, train=False)
    out2 = model.apply(loaded, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_voxelize():
    pts = jnp.array([[[-1.0, -1, -1], [0.999, 0.999, 0.999], [0, 0, 0]]])
    occ = np.asarray(voxelize(pts, 8))
    assert occ.shape == (1, 8, 8, 8, 1)
    assert occ.sum() == 3
    assert occ[0, 0, 0, 0, 0] == 1 and occ[0, 7, 7, 7, 0] == 1 and occ[0, 4, 4, 4, 0] == 1
    # permutation invariance
    occ2 = np.asarray(voxelize(pts[:, ::-1], 8))
    np.testing.assert_array_equal(occ, occ2)


def test_voxelfpn_forward():
    model = VoxelFPN(planes=(8, 16, 16), feature_size=32)
    g = 16
    occ = voxelize(jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 3)) * 2 - 1, g)
    variables = model.init(jax.random.PRNGKey(1), occ, train=False)
    out = model.apply(variables, occ, train=False)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_voxelfpn_permutation_invariant():
    model = VoxelFPN(planes=(8, 16, 16), feature_size=32)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 256, 3)) * 2 - 1
    occ1 = voxelize(pts, 16)
    occ2 = voxelize(pts[:, ::-1], 16)
    variables = model.init(jax.random.PRNGKey(1), occ1, train=False)
    e1 = model.apply(variables, occ1, train=False)
    e2 = model.apply(variables, occ2, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


@pytest.mark.slow
def test_tdn_tcn_drivers_end_to_end():
    """Untrained nets through the full drivers on a small config."""
    from midastouch_tpu.models.tcn import TCN
    from midastouch_tpu.models.tdn import TDN
    from midastouch_tpu.utils.config import compose

    cfg = compose(
        [
            "tdn.render.width=60",
            "tdn.render.height=80",
            "tcn.model.grid_size=16",
            "tcn.model.num_points=512",
            "tcn.model.planes=[8,16,16]",
            "tcn.model.feature_size=32",
            "tcn.model.output_dim=32",
        ]
    )
    bg = jnp.zeros((80, 60))
    tdn = TDN(cfg.tdn, bg=bg, params_path="/nonexistent")
    img = (np.random.default_rng(0).random((80, 60, 3)) * 255).astype(np.uint8)
    hm = tdn.image2heightmap(img)
    assert hm.shape == (80, 60)
    mask = tdn.heightmap2mask(hm)
    assert mask.shape == (80, 60) and mask.dtype == bool

    emb = tdn.image2embedding(img)
    np.testing.assert_allclose(float(jnp.linalg.norm(emb)), 1.0, atol=1e-5)

    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path="/nonexistent")
    # synthetic bump heightmap with contact
    hm2 = jnp.zeros((80, 60)).at[30:50, 20:40].set(30.0)
    mask2 = jnp.zeros((80, 60), bool).at[30:50, 20:40].set(True)
    code = tcn.cloud_to_tactile_code(hm2, mask2)
    assert code.shape == (32,)
    np.testing.assert_allclose(float(jnp.linalg.norm(code)), 1.0, atol=1e-4)
    # batched path
    codes = tcn.cloud_to_tactile_code(
        jnp.stack([hm2, hm2]), jnp.stack([mask2, mask2])
    )
    assert codes.shape == (2, 32)
    # identical inputs, identical codes
    np.testing.assert_allclose(np.asarray(codes[0]), np.asarray(codes[1]), atol=1e-5)


def test_tcn_sensor_frame_scaling_preserves_depth_signal():
    """Two touches differing by a 0.5 mm bump must voxelize differently
    under sensor-frame scaling (the global min-max scale collapses this)."""
    import jax
    from midastouch_tpu.models.tcn import TCN
    from midastouch_tpu.models.voxfpn import voxelize
    from midastouch_tpu.utils.config import compose

    cfg = compose(
        ["tdn.render.width=60", "tdn.render.height=80",
         "tcn.model.grid_size=32", "tcn.model.num_points=512",
         "tcn.model.planes=[8,16,16]", "tcn.model.feature_size=32",
         "tcn.model.output_dim=32"]
    )
    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path="/nonexistent")
    assert tcn.scale_mode == "sensor_frame"

    def touch(depth_px):
        hm = jnp.zeros((80, 60)).at[30:50, 20:40].set(depth_px)
        # a small extra bump in one corner of the contact
        hm = hm.at[32:36, 22:26].add(0.5 / 0.03)  # +0.5 mm
        mask = jnp.zeros((80, 60), bool).at[30:50, 20:40].set(True)
        return hm, mask

    hm_a, mask = touch(30.0)
    hm_b = jnp.zeros((80, 60)).at[30:50, 20:40].set(30.0)  # no bump
    key = jax.random.PRNGKey(0)
    ca = tcn.heightmaps_to_clouds(key, hm_a[None], mask[None])
    cb = tcn.heightmaps_to_clouds(key, hm_b[None], mask[None])
    diff = float(jnp.abs(voxelize(ca, 32) - voxelize(cb, 32)).sum())
    assert diff > 2, f"depth bump invisible in voxel grid (diff={diff})"
    # clouds bounded in the unit cube
    assert float(jnp.max(jnp.abs(ca))) <= 1.0 + 1e-6
    # the depth signal must occupy a meaningful share of the z-range
    # (the global min-max scale collapses it to ~the gel-plane cell)
    z = np.asarray(ca[0][:, 2])
    assert z.max() - z.min() > 0.2


@pytest.mark.slow
def test_heightmap_fpn_tcn():
    """2-D backbone path through the driver + trainer step."""
    import optax
    from midastouch_tpu.models.tcn import TCN
    from midastouch_tpu.train.train_tcn import make_train_step, pose_masks
    from midastouch_tpu.utils.config import compose

    cfg = compose(
        ["tdn.render.width=60", "tdn.render.height=80",
         "tcn.model.model=HeightmapFPN", "tcn.model.planes=[8,16,16]",
         "tcn.model.feature_size=32", "tcn.model.output_dim=32",
         "tcn.model.num_points=256"]
    )
    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path="/nonexistent")
    assert tcn.arch == "HeightmapFPN"
    hm = jnp.zeros((80, 60)).at[30:50, 20:40].set(30.0)
    mask = jnp.zeros((80, 60), bool).at[30:50, 20:40].set(True)
    code = tcn.cloud_to_tactile_code(hm, mask)
    assert code.shape == (32,)
    np.testing.assert_allclose(float(jnp.linalg.norm(code)), 1.0, atol=1e-4)

    # a train step on this backbone runs and is finite
    tx = optax.adam(1e-3)
    params = tcn.variables["params"]
    stats = tcn.variables.get("batch_stats", {})
    step = make_train_step(tcn, tx, margin=0.2, kernel_weight=1.0)
    inputs = tcn.model_inputs(
        jax.random.PRNGKey(0), jnp.stack([hm] * 4), jnp.stack([mask] * 4)
    )
    pos = np.zeros((4, 4), bool); pos[0, 1] = pos[1, 0] = pos[2, 3] = pos[3, 2] = True
    neg = ~pos & ~np.eye(4, dtype=bool)
    positions = jnp.asarray(np.random.default_rng(0).uniform(
        -0.02, 0.02, (4, 3)).astype(np.float32))
    _, _, _, loss = step(
        params, stats, tx.init(params), inputs,
        jnp.asarray(pos), jnp.asarray(neg), positions,
    )
    assert np.isfinite(float(loss))


def test_patch_pca_embedder(tmp_path):
    """PatchPCA: training-free canonical-patch embedder — fit on its own
    renders, discriminative after fit, exact save/reload parity."""
    import os

    from midastouch_tpu.models.tcn import TCN
    from midastouch_tpu.utils.config import compose

    cfg = compose(["tcn.model.model=PatchPCA", "tcn.model.output_dim=32"])
    path = os.path.join(tmp_path, "pca.npz")
    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path=path)
    assert tcn.arch == "PatchPCA" and tcn.canonicalize and not tcn.is_fitted

    # two distinct synthetic contact geometries, several presses each
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    dome = 50 * np.exp(-(((yy - 120) / 40) ** 2 + ((xx - 160) / 40) ** 2))
    ridge = 50 * np.exp(-(((xx - 160) / 18) ** 2))
    hms, labels = [], []
    for base, lab in ((dome, 0), (ridge, 1)):
        # presses >= the 0.7 mm (23 px) band, so the band never truncates
        for press in (25.0, 30.0, 36.0, 42.0):
            hms.append(np.maximum(base - (50 - press), 0.0))
            labels.append(lab)
    hms = np.stack(hms)
    masks = hms > 0
    labels = np.asarray(labels)

    inputs = np.asarray(tcn.model_inputs(
        jax.random.PRNGKey(0), jnp.asarray(hms), jnp.asarray(masks)))
    assert inputs.shape[-1] == 2
    tcn.fit_patch_pca(inputs)
    assert tcn.is_fitted and os.path.exists(path)

    codes = np.asarray(tcn.cloud_to_tactile_code(
        jnp.asarray(hms), jnp.asarray(masks)))
    sims = codes @ codes.T
    same = sims[labels[:, None] == labels[None, :]].mean()
    cross = sims[labels[:, None] != labels[None, :]].mean()
    # press-depth invariance + discrimination: same-shape pairs (any press)
    # must be far more similar than cross-shape pairs
    assert same > cross + 0.5, (same, cross)

    tcn2 = TCN(cfg.tcn, cfg.tdn.render, params_path=path)
    codes2 = np.asarray(tcn2.cloud_to_tactile_code(
        jnp.asarray(hms), jnp.asarray(masks)))
    np.testing.assert_allclose(codes, codes2, atol=1e-6)


def test_patch_pca_pooled_and_rectified(tmp_path):
    """canonical_pool + canonical_rectify (the measured-best recipe):
    pooled input dims, fit/embed shapes, and tilt invariance of the codes
    (a plane-ramped copy of the same contact must embed near-identically
    after rectification)."""
    import os

    from midastouch_tpu.models.tcn import TCN
    from midastouch_tpu.utils.config import compose

    cfg = compose([
        "tcn.model.model=PatchPCA", "tcn.model.output_dim=16",
        "tcn.model.canonical_pool=8", "tcn.model.canonical_rectify=true",
        "tcn.model.canonical_size=48",
    ])
    path = os.path.join(tmp_path, "pca.npz")
    tcn = TCN(cfg.tcn, cfg.tdn.render, params_path=path)
    assert tcn.canonical_pool == 8 and tcn.canonical_rectify

    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    rng = np.random.default_rng(0)
    hms = []
    for i in range(48):  # a healthy fit population (few-sample PCA with
        # whitening amplifies residual noise directions arbitrarily)
        cx, cy = rng.uniform(120, 200), rng.uniform(90, 150)
        w1, w2 = rng.uniform(22, 40), rng.uniform(10, 16)
        bump = 40 * np.exp(-(((yy - cy) / w1) ** 2 + ((xx - cx) / (w1 + 5)) ** 2))
        bump += 20 * np.exp(
            -(((yy - cy - 20) / w2) ** 2 + ((xx - cx + 25) / (w2 + 2)) ** 2)
        )
        hms.append(np.maximum(bump - 8, 0.0))
    hms = np.stack(hms)
    masks = hms > 0

    inputs = np.asarray(tcn.model_inputs(
        jax.random.PRNGKey(0), jnp.asarray(hms), jnp.asarray(masks)))
    assert inputs.shape == (48, 6, 6, 2)  # 48 // 8
    tcn.fit_patch_pca(inputs)
    base = np.asarray(tcn.cloud_to_tactile_code(
        jnp.asarray(hms), jnp.asarray(masks)))

    # same contacts with a shear-tilt plane ramp added inside the support
    ramp = 0.07 * (xx - 160) + 0.04 * (yy - 120)
    hms_t = np.where(masks, np.maximum(hms + ramp, 0.0), 0.0)
    masks_t = hms_t > 0

    # the op's contract: the pooled canonical INPUT is tilt-invariant
    inp_t = np.asarray(tcn.model_inputs(
        jax.random.PRNGKey(0), jnp.asarray(hms_t), jnp.asarray(masks_t)))
    a = inputs.reshape(len(inputs), -1)
    b = inp_t.reshape(len(inp_t), -1)
    cos_in = np.sum(a * b, 1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-9
    )
    # (min is looser: the synthetic max(hm+ramp, 0) clips support edges
    # slightly, an artifact real tilted renders don't have)
    assert np.median(cos_in) > 0.995 and cos_in.min() > 0.97, (
        f"input tilt invariance: {cos_in}"
    )

    # code level: soft-whitening amplifies residuals, so only a median
    # bound is guaranteed per-sample (population metric: 0.766 single-touch
    # on the 10k bank, RESULTS.md 2c)
    tilted = np.asarray(tcn.cloud_to_tactile_code(
        jnp.asarray(hms_t), jnp.asarray(masks_t)))
    diag = np.sum(base * tilted, axis=1)
    assert np.median(diag) > 0.6, f"tilt invariance broken: {diag}"


def test_params_io_meta_roundtrip(tmp_path):
    variables = {"params": {"w": jnp.ones((2, 2))}}
    p = str(tmp_path / "w.npz")
    save_variables(p, variables, meta={"input_norm": "per_channel"})
    loaded, meta = load_variables(p, return_meta=True)
    assert meta == {"input_norm": "per_channel"}
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]), 1.0)
    # meta-less load keeps the old signature
    loaded2 = load_variables(p)
    assert "params" in loaded2 and "__meta__" not in loaded2


def test_tdn_input_norm_pinned_to_artifact(tmp_path):
    """The weight artifact's recorded training norm overrides the sensor
    path's configured norm (real path defaults to minmax while the shipped
    sim weights are per_channel-trained — OOD by construction otherwise)."""
    from midastouch_tpu.models.tdn import TDN
    from midastouch_tpu.utils.config import compose

    cfg = compose()
    model = FCRN(out_size=(int(cfg.tdn.render.height),
                           int(cfg.tdn.render.width)))
    x = jnp.zeros((1, int(cfg.tdn.render.height),
                   int(cfg.tdn.render.width), 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = str(tmp_path / "tdn.npz")
    save_variables(p, variables, meta={"input_norm": "per_channel"})
    tdn = TDN(cfg.tdn, real=True, params_path=p)  # real cfg says minmax
    assert tdn.input_norm == "per_channel"
