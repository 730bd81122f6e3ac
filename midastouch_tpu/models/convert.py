"""Checkpoint conversion: reference torch FCRN weights -> Flax variables.

The reference ships `tdn_weights.pth.tar` (torch state_dict of
contrib/tdn_fcrn/fcrn.py). This converter maps it onto our FCRN module,
packing each UpProject block's four small convolutions
((3,3)/(2,3)/(3,2)/(2,2) with asymmetric top/left padding, fcrn.py:86-113)
into the single fused 3x3 conv of `FastUpConv`: the smaller kernels embed
into 3x3 kernels with zeroed bottom row / right column, which reproduces
the reference padding exactly (see tests/test_convert.py for the
torch-vs-jax equivalence proof on random weights).

Usage:
    python -m midastouch_tpu.models.convert tdn_weights.pth.tar out.npz
"""

from __future__ import annotations

import numpy as np

_LAYERS = (3, 4, 6, 3)  # ResNet-50


def _t2f_conv(w: np.ndarray) -> np.ndarray:
    """torch conv kernel (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _embed_kernel_3x3(w: np.ndarray) -> np.ndarray:
    """Embed (kh<=3, kw<=3, I, O) at the TOP-LEFT of a zero 3x3 kernel —
    equivalent under SAME padding to the reference's extra top/left pad."""
    kh, kw = w.shape[:2]
    out = np.zeros((3, 3) + w.shape[2:], dtype=w.dtype)
    out[:kh, :kw] = w
    return out


def _fuse_up_convs(kernels: list[np.ndarray], biases: list[np.ndarray]):
    """Four torch kernels -> one (3, 3, I, 4*O) fused kernel + bias, output
    channel blocks ordered [(0,0), (0,1), (1,0), (1,1)] to match
    depth_to_space in models/fcrn.py."""
    k = np.concatenate(
        [_embed_kernel_3x3(_t2f_conv(w)) for w in kernels], axis=-1
    )
    return k, np.concatenate(biases)


def convert_fcrn(state_dict: dict) -> dict:
    """torch FCRN state_dict -> flax variables for models.fcrn.FCRN."""
    sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_conv(path: tuple, kernel, bias=None):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = {"kernel": kernel}
        if bias is not None:
            leaf["bias"] = bias
        node[path[-1]] = leaf

    def put_bn(path: tuple, prefix: str):
        for tree, keys in ((params, ("weight", "bias")),
                           (stats, ("running_mean", "running_var"))):
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            if tree is params:
                node[path[-1]] = {"scale": sd[prefix + ".weight"],
                                  "bias": sd[prefix + ".bias"]}
            else:
                node[path[-1]] = {"mean": sd[prefix + ".running_mean"],
                                  "var": sd[prefix + ".running_var"]}

    # stem
    put_conv(("Conv_0",), _t2f_conv(sd["conv1.weight"]))
    put_bn(("BatchNorm_0",), "bn1")

    # trunk bottlenecks (flax names Bottleneck_0..15 in forward order;
    # inside each: Conv_0/BN_0, Conv_1/BN_1, Conv_2/BN_2 [, Conv_3/BN_3
    # for the downsample branch] matching models/fcrn.py creation order)
    bidx = 0
    for li, nblocks in enumerate(_LAYERS):
        for b in range(nblocks):
            p = f"layer{li+1}.{b}."
            scope = f"Bottleneck_{bidx}"
            put_conv((scope, "Conv_0"), _t2f_conv(sd[p + "conv1.weight"]))
            put_bn((scope, "BatchNorm_0"), p + "bn1")
            put_conv((scope, "Conv_1"), _t2f_conv(sd[p + "conv2.weight"]))
            put_bn((scope, "BatchNorm_1"), p + "bn2")
            put_conv((scope, "Conv_2"), _t2f_conv(sd[p + "conv3.weight"]))
            put_bn((scope, "BatchNorm_2"), p + "bn3")
            if p + "downsample.0.weight" in sd:
                put_conv((scope, "Conv_3"), _t2f_conv(sd[p + "downsample.0.weight"]))
                put_bn((scope, "BatchNorm_3"), p + "downsample.1")
            bidx += 1

    # neck 1x1
    put_conv(("Conv_1",), _t2f_conv(sd["conv2.weight"]))
    put_bn(("BatchNorm_1",), "bn2")

    # up-projection blocks
    for ui, up in enumerate(("up1", "up2", "up3", "up4")):
        scope = f"FastUpConv_{ui}"
        for branch, conv_name in (("1", "up_a"), ("2", "up_b")):
            ks = [sd[f"{up}.conv{branch}_{i}.weight"] for i in (1, 2, 3, 4)]
            bs = [sd[f"{up}.conv{branch}_{i}.bias"] for i in (1, 2, 3, 4)]
            k, b = _fuse_up_convs(ks, bs)
            put_conv((scope, conv_name), k, b)
        put_conv((scope, "conv_a"), _t2f_conv(sd[f"{up}.conv3.weight"]),
                 sd[f"{up}.conv3.bias"])
        put_bn((scope, "BatchNorm_0"), f"{up}.bn1_1")
        put_bn((scope, "BatchNorm_1"), f"{up}.bn2")
        put_bn((scope, "BatchNorm_2"), f"{up}.bn1_2")

    # head
    put_conv(("Conv_2",), _t2f_conv(sd["conv3.weight"]), sd["conv3.bias"])

    return {"params": params, "batch_stats": stats}


def main():
    import sys

    import torch

    from midastouch_tpu.models.params_io import save_variables

    src, dst = sys.argv[1], sys.argv[2]
    ckpt = torch.load(src, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    variables = convert_fcrn(sd)
    save_variables(dst, variables)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()
