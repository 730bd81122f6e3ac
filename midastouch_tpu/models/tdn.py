"""TDN driver: tactile image -> heightmap / contact mask / embedding.

Mirrors `midastouch/contrib/tdn_fcrn/tdn.py:28-165` around the Flax FCRN:
min-max image normalization, jitted forward, exponential heightmap
blending (real data), border/quantile/area-gate mask thresholding.
"""

from __future__ import annotations

import collections
import os

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.models.fcrn import FCRN
from midastouch_tpu.models.params_io import load_variables, save_variables
from midastouch_tpu.ops import image as image_ops
from midastouch_tpu.utils.misc import DIRS


class TDN:
    def __init__(
        self,
        cfg,
        bg: jax.Array | np.ndarray | None = None,
        bottleneck: bool = False,
        real: bool = False,
        params_path: str | None = None,
        seed: int = 0,
        compute_dtype=jnp.float32,
    ):
        fcrn_cfg = cfg.fcrn.real if real else cfg.fcrn.sim
        self.b = int(fcrn_cfg.border)
        self.r = float(fcrn_cfg.ratio)
        self.clip = float(fcrn_cfg.clip)
        self.blend_sz = int(fcrn_cfg.blend_sz)
        # input normalization mode: 'minmax' (reference parity, tdn.py:108)
        # or 'per_channel' (lighting-robust; ops/image.normalize_per_channel)
        self.input_norm = str(fcrn_cfg.get("input_norm", "minmax"))
        self.bottleneck = bottleneck
        self.heightmap_window: collections.deque = collections.deque([])

        h, w = int(cfg.render.height), int(cfg.render.width)
        self.model = FCRN(out_size=(h, w), dtype=compute_dtype)

        if params_path is None:
            params_path = os.path.join(DIRS["weights"], str(cfg.tdn_weights))
        if os.path.exists(params_path):
            self.variables, meta = load_variables(params_path, return_meta=True)
            # the weight artifact records the normalization it was TRAINED
            # with; feeding it anything else is out-of-distribution by
            # construction (e.g. the real sensor path defaulting to minmax
            # while loading per_channel-trained sim weights), so the
            # artifact, not the sensor-path config, wins
            trained_norm = meta.get("input_norm")
            if trained_norm and trained_norm != self.input_norm:
                print(
                    f"[tdn] overriding input_norm={self.input_norm!r} with "
                    f"{trained_norm!r} recorded in {os.path.basename(params_path)}",
                    flush=True,
                )
                self.input_norm = trained_norm
        else:  # fresh init (no pretrained assets in this environment)
            key = jax.random.PRNGKey(seed)
            self.variables = self.model.init(
                key,
                jnp.zeros((1, h, w, image_ops.norm_channels(self.input_norm))),
                train=False,
            )

        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)
        )
        self._fwd_bottleneck = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False, bottleneck=True)
        )
        self.bg = None if bg is None else jnp.asarray(bg)

    def save(self, path: str) -> None:
        save_variables(path, self.variables)

    # -- forward paths (tdn.py:94-137) ---------------------------------------

    def preprocess(self, images: jax.Array) -> jax.Array:
        """Batched input normalization (B, H, W, 3) with the configured
        mode — the single place every sense path (live filter, codebook
        build, training) must route through so train/inference agree."""
        imgs = jnp.asarray(images, dtype=jnp.float32)
        return jax.vmap(
            lambda im: image_ops.normalize_image(im, self.input_norm)
        )(imgs)

    def image2heightmap(self, image: np.ndarray) -> jax.Array:
        """Single tactile image (H, W, 3) -> blended heightmap (H, W) px."""
        img = self.preprocess(jnp.asarray(image)[None])
        out = self._fwd(self.variables, img)[0]
        return self.blend_heightmaps(out)

    def images2heightmaps(self, images: np.ndarray) -> jax.Array:
        """Batched forward (no blending) for codebook builds."""
        return self._fwd(self.variables, self.preprocess(images))

    def image2embedding(self, image: np.ndarray) -> jax.Array:
        """Bottleneck trunk feature, L2-normalized (tdn.py:117-137)."""
        img = image_ops.normalize_image(
            jnp.asarray(image, dtype=jnp.float32), self.input_norm
        )
        feat = self._fwd_bottleneck(self.variables, img[None])[0]
        flat = feat.reshape(1, -1).astype(jnp.float32)
        return flat / jnp.maximum(jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)

    # -- blending (tdn.py:60-92) ----------------------------------------------

    def blend_heightmaps(self, heightmap: jax.Array) -> jax.Array:
        if not self.blend_sz:
            return heightmap
        if len(self.heightmap_window) >= self.blend_sz:
            self.heightmap_window.popleft()
        self.heightmap_window.append(heightmap)
        window = jnp.stack(list(self.heightmap_window))
        return image_ops.blend_heightmaps(window)

    # -- masking (tdn.py:139-165) ----------------------------------------------

    def heightmap2mask(
        self, heightmap: jax.Array, small_parts: bool = False
    ) -> jax.Array:
        return image_ops.heightmap_to_mask(
            heightmap, self.bg, self.b, self.r, self.clip, small_parts
        )

    def heightmaps2masks(
        self, heightmaps: jax.Array, small_parts: bool = False
    ) -> jax.Array:
        """Batched mask thresholding (one jit dispatch per batch)."""
        if not hasattr(self, "_masks_fn"):
            self._masks_fn = jax.jit(
                jax.vmap(
                    lambda h, sp: image_ops.heightmap_to_mask(
                        h, self.bg, self.b, self.r, self.clip, sp
                    ),
                    in_axes=(0, None),
                ),
                static_argnums=1,
            )
        return self._masks_fn(jnp.asarray(heightmaps), small_parts)
