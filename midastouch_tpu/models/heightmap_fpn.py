"""HeightmapFPN: 2-D tactile code network over (heightmap, mask) images.

The reference pipeline lifts heightmaps to 3-D point clouds only because
MinkLoc3D was borrowed from LiDAR place recognition; the cloud is a
deterministic unprojection of the heightmap, so a 2-D CNN over
(penetration, mask) channels sees identical information while mapping far
better onto the MXU (dense 2-D convs, no voxel scatter). Same FPN
topology and GeM pooling as VoxelFPN; selectable via
`tcn.model.model=HeightmapFPN`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


from midastouch_tpu.models.voxfpn import make_norm


class BasicBlock2D(nn.Module):
    planes: int
    dtype: jnp.dtype = jnp.float32
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm, train, self.dtype)
        conv = lambda f: nn.Conv(
            f, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )
        residual = x
        out = nn.relu(norm()(conv(self.planes)(x)))
        out = norm()(conv(self.planes)(out))
        if residual.shape[-1] != self.planes:
            residual = norm()(
                nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
            )
        return nn.relu(out + residual)


class GeM2D(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask):
        p = self.param("p", lambda k: jnp.ones((1,)) * 3.0)
        xp = jnp.clip(x.astype(jnp.float32), self.eps, None) ** p
        num = jnp.sum(xp * mask, axis=(1, 2))
        den = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
        # +1e-4 inside the root: d/dx x^(1/p) is unbounded at 0 and
        # zero-contact samples (empty mask) hit exactly 0 -> NaN grads
        return (num / den + 1e-4) ** (1.0 / p)


class HeightmapFPN(nn.Module):
    """(B, H, W, 2) [penetration in pen_max units, contact mask]
    -> (B, feature_size) descriptor."""

    planes: Sequence[int] = (32, 64, 64)
    layers: Sequence[int] = (1, 1, 1)
    num_top_down: int = 1
    conv0_kernel_size: int = 5
    feature_size: int = 256
    dtype: jnp.dtype = jnp.float32
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm, train, self.dtype)
        mask = x[..., 1:2]
        x = x.astype(self.dtype)

        k0 = self.conv0_kernel_size
        x = nn.Conv(
            self.planes[0], (k0, k0), padding="SAME", use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.relu(norm()(x))

        feature_maps = []
        masks = [mask]
        if self.num_top_down == len(self.layers):
            feature_maps.append(x)

        inplanes = self.planes[0]
        for ndx, (plane, nblocks) in enumerate(zip(self.planes, self.layers)):
            x = nn.Conv(
                inplanes, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype
            )(x)
            x = nn.relu(norm()(x))
            for _ in range(nblocks):
                x = BasicBlock2D(plane, dtype=self.dtype, norm=self.norm)(x, train)
            inplanes = plane
            mask = nn.max_pool(mask, (2, 2), strides=(2, 2))
            masks.append(mask)
            if len(self.layers) - 1 - self.num_top_down <= ndx < len(self.layers) - 1:
                feature_maps.append(x)

        x = nn.Conv(self.feature_size, (1, 1), dtype=self.dtype)(x)
        out_level = len(self.layers)
        for ndx in range(self.num_top_down):
            x = nn.ConvTranspose(
                self.feature_size, (2, 2), strides=(2, 2), dtype=self.dtype
            )(x)
            lateral = nn.Conv(self.feature_size, (1, 1), dtype=self.dtype)(
                feature_maps[-ndx - 1]
            )
            # odd input dims: upsample may overshoot by one — crop to match
            x = x[:, : lateral.shape[1], : lateral.shape[2]] + lateral
            out_level -= 1

        mask = masks[out_level]
        h = min(x.shape[1], mask.shape[1])
        w = min(x.shape[2], mask.shape[2])
        return GeM2D()(x[:, :h, :w], mask[:, :h, :w])
