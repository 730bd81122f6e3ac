"""Converter equivalence tests: fused UpProject == 4 asymmetric torch convs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from midastouch_tpu.models.convert import _fuse_up_convs, _t2f_conv, convert_fcrn
from midastouch_tpu.models.fcrn import depth_to_space


def _torch_upproject_interleave(x, ws, bs):
    """The reference UpProject branch: 4 convs with asymmetric padding,
    interleaved to 2x upsampled output (fcrn.py:86-156). x: (B,C,H,W)."""
    pads = [(1, 1, 1, 1), (1, 1, 1, 0), (1, 0, 1, 1), (1, 0, 1, 0)]
    outs = [
        F.conv2d(F.pad(x, pad), w, b) for pad, w, b in zip(pads, ws, bs)
    ]
    o11, o12, o13, o14 = outs
    b, c, h, w = o11.shape
    # interleave columns (1_1 with 1_2), (1_3 with 1_4)
    top = torch.stack((o11, o12), dim=-3).permute(0, 1, 3, 4, 2).reshape(
        b, c, h, 2 * w
    )
    bot = torch.stack((o13, o14), dim=-3).permute(0, 1, 3, 4, 2).reshape(
        b, c, h, 2 * w
    )
    # interleave rows
    return torch.stack((top, bot), dim=-3).permute(0, 1, 3, 2, 4).reshape(
        b, c, 2 * h, 2 * w
    )


def test_fused_upconv_matches_torch_reference():
    rng = np.random.default_rng(0)
    cin, cout, h, w = 8, 4, 6, 5
    x = rng.normal(size=(2, cin, h, w)).astype(np.float32)
    shapes = [(cout, cin, 3, 3), (cout, cin, 2, 3), (cout, cin, 3, 2),
              (cout, cin, 2, 2)]
    ws = [rng.normal(size=s).astype(np.float32) * 0.2 for s in shapes]
    bs = [rng.normal(size=cout).astype(np.float32) for _ in range(4)]

    ref = _torch_upproject_interleave(
        torch.from_numpy(x), [torch.from_numpy(w_) for w_ in ws],
        [torch.from_numpy(b_) for b_ in bs],
    ).numpy()

    kernel, bias = _fuse_up_convs(ws, bs)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NHWC
    out = jax.lax.conv_general_dilated(
        xj, jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bias)
    out = depth_to_space(out)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))  # back to NCHW

    np.testing.assert_allclose(out, ref, atol=1e-5)


def _random_torch_fcrn_state_dict(rng):
    """Reference-shaped FCRN state_dict with random values (no torch model
    needed — shapes follow fcrn.py:174-272 for ResNet-50 / batch anything)."""
    sd = {}

    def conv(name, o, i, kh, kw, bias=False):
        sd[name + ".weight"] = rng.normal(size=(o, i, kh, kw)).astype(np.float32) * 0.05
        if bias:
            sd[name + ".bias"] = rng.normal(size=o).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7, 7)
    bn("bn1", 64)
    inplanes = 64
    for li, (blocks, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
        for b in range(blocks):
            p = f"layer{li+1}.{b}"
            conv(p + ".conv1", planes, inplanes, 1, 1)
            bn(p + ".bn1", planes)
            conv(p + ".conv2", planes, planes, 3, 3)
            bn(p + ".bn2", planes)
            conv(p + ".conv3", planes * 4, planes, 1, 1)
            bn(p + ".bn3", planes * 4)
            if b == 0:
                conv(p + ".downsample.0", planes * 4, inplanes, 1, 1)
                bn(p + ".downsample.1", planes * 4)
            inplanes = planes * 4
    conv("conv2", 1024, 2048, 1, 1)
    bn("bn2", 1024)
    cin = 1024
    for up in ("up1", "up2", "up3", "up4"):
        cout = cin // 2
        for branch in ("1", "2"):
            for i, (kh, kw) in enumerate([(3, 3), (2, 3), (3, 2), (2, 2)], 1):
                conv(f"{up}.conv{branch}_{i}", cout, cin, kh, kw, bias=True)
        conv(f"{up}.conv3", cout, cout, 3, 3, bias=True)
        bn(f"{up}.bn1_1", cout)
        bn(f"{up}.bn1_2", cout)
        bn(f"{up}.bn2", cout)
        cin = cout
    conv("conv3", 1, 64, 3, 3, bias=True)
    return sd


def test_convert_fcrn_structure_matches_flax_init():
    rng = np.random.default_rng(1)
    sd = _random_torch_fcrn_state_dict(rng)
    variables = convert_fcrn(sd)

    from midastouch_tpu.models.fcrn import FCRN

    model = FCRN(out_size=(64, 48))
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)),
                     train=False)

    def paths(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(paths(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = np.asarray(v).shape
        return out

    got_p = paths(variables["params"])
    ref_p = paths(ref["params"])
    assert got_p == ref_p, (
        f"missing: {set(ref_p) - set(got_p)}; extra: {set(got_p) - set(ref_p)}; "
        f"shape diffs: {[k for k in got_p if k in ref_p and got_p[k] != ref_p[k]][:5]}"
    )
    got_s = paths(variables["batch_stats"])
    ref_s = paths(ref["batch_stats"])
    assert got_s == ref_s

    # converted weights actually run
    out = model.apply(variables, jnp.zeros((1, 64, 48, 3)), train=False)
    assert out.shape == (1, 64, 48)
    assert np.all(np.isfinite(np.asarray(out)))
