"""FCRN tactile depth network in Flax (NHWC, bf16-friendly).

The reference TDN is Laina et al.'s fully-convolutional residual network:
ResNet-50 trunk + 1x1 2048->1024 + four "UpProject" fast-up-convolution
blocks + 3x3 head, bilinearly resized to 320x240
(`midastouch/contrib/tdn_fcrn/fcrn.py:174-272`).

TPU-native redesign of UpProject: the reference's interleaving of four
convolutions with kernel sizes (3,3)/(2,3)/(3,2)/(2,2) and asymmetric
padding (fcrn.py:86-156) is exactly a single 3x3 convolution producing 4x
channels followed by depth-to-space — the smaller kernels embed into 3x3
kernels with zeroed rows/columns. One big conv keeps the MXU busy instead
of four skinny ones; `models/convert.py` packs reference checkpoints into
this layout losslessly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4) (fcrn.py:21-59)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        # stride-2 3x3 convs use explicit symmetric (1,1) padding: XLA SAME
        # pads (0,1) under stride 2, shifting the sampling grid by one input
        # pixel vs the reference's torch padding=1 (fcrn.py:30-32) and
        # breaking checkpoint-conversion parity
        conv = lambda f, k, s=1: nn.Conv(
            f, (k, k), strides=(s, s),
            padding=((k // 2, k // 2),) * 2, use_bias=False, dtype=self.dtype,
        )
        residual = x
        out = nn.relu(norm()(conv(self.planes, 1)(x)))
        out = nn.relu(norm()(conv(self.planes, 3, self.stride)(out)))
        out = norm()(conv(self.planes * 4, 1)(out))
        if residual.shape[-1] != self.planes * 4 or self.stride != 1:
            residual = norm()(conv(self.planes * 4, 1, self.stride)(x))
        return nn.relu(out + residual)


def depth_to_space(x: jax.Array, block: int = 2) -> jax.Array:
    """NHWC depth-to-space; channel blocks ordered row-major over the
    (block x block) offsets, matching the reference's interleave order
    conv1_1=(0,0), conv1_2=(0,1), conv1_3=(1,0), conv1_4=(1,1)."""
    b, h, w, c = x.shape
    cout = c // (block * block)
    x = x.reshape(b, h, w, block, block, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * block, w * block, cout)


class FastUpConv(nn.Module):
    """UpProject block as fused conv + depth-to-space (fcrn.py:62-168)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        up = lambda name: nn.Conv(
            4 * self.features, (3, 3), padding="SAME", dtype=self.dtype, name=name
        )
        b1 = depth_to_space(up("up_a")(x))
        b1 = nn.relu(norm()(b1))
        b1 = nn.Conv(
            self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv_a"
        )(b1)
        b1 = norm()(b1)

        b2 = depth_to_space(up("up_b")(x))
        b2 = norm()(b2)
        return nn.relu(b1 + b2)


class FCRN(nn.Module):
    """Tactile image (B, H, W, 3) -> heightmap (B, out_h, out_w) in gel px.

    `bottleneck=True` returns the 1024-channel trunk feature instead
    (reference fcrn.py:258-259, used by image2embedding, tdn.py:117-137).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    out_size: tuple[int, int] = (320, 240)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, bottleneck: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        x = x.astype(self.dtype)
        # explicit torch-style symmetric padding (stem pad 3, pool pad 1):
        # under stride 2, XLA SAME pads asymmetrically and shifts the
        # sampling grid vs the reference (fcrn.py:181-184) — see Bottleneck
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.relu(norm()(x))
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        for i, (blocks, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(planes, stride, dtype=self.dtype)(x, train)

        x = nn.Conv(1024, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = norm()(x)

        if bottleneck:
            return x

        for feats in (512, 256, 128, 64):
            x = FastUpConv(feats, dtype=self.dtype)(x, train)

        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = jax.image.resize(
            x.astype(jnp.float32),
            (x.shape[0], self.out_size[0], self.out_size[1], 1),
            method="bilinear",
        )
        return x[..., 0]
