"""Converter equivalence tests: fused UpProject == 4 asymmetric torch convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


class _TorchBottleneck(torch.nn.Module):
    """Reference ResNet bottleneck, spec-quoted from fcrn.py:21-59."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + r)


class _TorchUpProject(torch.nn.Module):
    """Reference UpProject, spec-quoted from fcrn.py:62-168 (the four
    asymmetric convs + interleave are shared with the fixture above)."""

    def __init__(self, cin, cout):
        super().__init__()
        nn = torch.nn
        sizes = [(3, 3), (2, 3), (3, 2), (2, 2)]
        self.b1 = nn.ModuleList(nn.Conv2d(cin, cout, s) for s in sizes)
        self.b2 = nn.ModuleList(nn.Conv2d(cin, cout, s) for s in sizes)
        self.bn1_1 = nn.BatchNorm2d(cout)
        self.bn1_2 = nn.BatchNorm2d(cout)
        self.conv3 = nn.Conv2d(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x):
        o1 = _torch_upproject_interleave(
            x, [c.weight for c in self.b1], [c.bias for c in self.b1]
        )
        o2 = _torch_upproject_interleave(
            x, [c.weight for c in self.b2], [c.bias for c in self.b2]
        )
        o1 = self.bn2(self.conv3(F.relu(self.bn1_1(o1))))
        return F.relu(o1 + self.bn1_2(o2))


class _TorchFCRN(torch.nn.Module):
    """Reference FCRN_net forward, spec-quoted from fcrn.py:174-272
    (without TorchScript), parameterized by output size for test speed."""

    def __init__(self, out_size=(64, 48)):
        super().__init__()
        nn = torch.nn
        self.out_size = out_size
        self.conv1 = nn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, padding=1)
        inplanes = 64
        for li, (blocks, planes) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))
        ):
            layer = []
            for b in range(blocks):
                stride = 2 if (li > 0 and b == 0) else 1
                down = None
                if b == 0:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                layer.append(_TorchBottleneck(inplanes, planes, stride, down))
                inplanes = planes * 4
            setattr(self, f"layer{li+1}", nn.Sequential(*layer))
        self.conv2 = nn.Conv2d(2048, 1024, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(1024)
        self.up1 = _TorchUpProject(1024, 512)
        self.up2 = _TorchUpProject(512, 256)
        self.up3 = _TorchUpProject(256, 128)
        self.up4 = _TorchUpProject(128, 64)
        self.conv3 = nn.Conv2d(64, 1, 3, padding=1)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.bn2(self.conv2(x))
        x = self.up4(self.up3(self.up2(self.up1(x))))
        x = F.relu(self.conv3(x))
        return F.interpolate(
            x, self.out_size, mode="bilinear", align_corners=False
        )

    def state_dict_reference_names(self):
        """state_dict under the reference's parameter names (the fixture
        stores UpProject branches as ModuleLists b1/b2; the reference names
        them conv{1,2}_{1..4})."""
        sd = {}
        for k, v in self.state_dict().items():
            for br, ref in (("b1.", "conv1_"), ("b2.", "conv2_")):
                if br in k:
                    pre, idx_rest = k.split(br)
                    idx, rest = idx_rest.split(".", 1)
                    k = f"{pre}{ref}{int(idx)+1}.{rest}"
            sd[k] = v
        return sd


@pytest.mark.slow
def test_convert_fcrn_full_network_numeric_parity():
    """End-to-end converter proof: a reference-architecture torch FCRN
    with random weights and the converted Flax FCRN produce the same
    heightmap (VERDICT round-1 item 5: the day real tdn_weights.pth.tar
    appear, the converter is already numerically trusted)."""
    torch.manual_seed(0)
    net = _TorchFCRN(out_size=(64, 48)).eval()
    # randomize BN stats too: running_mean/var defaults (0/1) would hide
    # mean/var mapping bugs
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(2, 3, 64, 48)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()[:, 0]

    from midastouch_tpu.models.fcrn import FCRN

    variables = convert_fcrn(net.state_dict_reference_names())
    model = FCRN(out_size=(64, 48))
    out = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
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
