"""Image / heightmap / point-cloud ops for the DIGIT sensing stack.

Pure JAX equivalents of the reference's OpenCV/torch glue:

  * min-max image normalization          (tdn.py:108 cv2.normalize)
  * heightmap -> contact mask            (tdn.py:139-165)
  * gel-frame px <-> camera-frame meters (digit_renderer.py:164-182)
  * heightmap -> pinhole point cloud     (digit_renderer.py:210-248)
  * fixed-size masked cloud sampling     (tcn.py:88-116, multinomial resample)
  * exponential heightmap blending       (tdn.py:60-92)

All functions are jit/vmap-safe with static shapes: the variable-length
"filter nonzero points" step of the reference becomes a validity mask plus
uniform without-replacement sampling via the Gumbel top-k trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def normalize_minmax(img: jax.Array, lo: float = 0.0, hi: float = 255.0) -> jax.Array:
    """cv2.NORM_MINMAX equivalent over the whole array."""
    mn, mx = jnp.min(img), jnp.max(img)
    scale = (hi - lo) / jnp.maximum(mx - mn, 1e-12)
    return (img - mn) * scale + lo


def pix_to_meter(pix: jax.Array, pixmm: float) -> jax.Array:
    """(digit_renderer.py:78-82)"""
    return pix * pixmm / 1000.0


def meter_to_pix(m: jax.Array, pixmm: float) -> jax.Array:
    """(digit_renderer.py:84-88)"""
    return m * 1000.0 / pixmm


def gel_px_to_cam_depth(hm_pix: jax.Array, pixmm: float, cam_dist: float) -> jax.Array:
    """Gel-frame heightmap in pixels -> camera-frame depth in meters
    (digit_renderer.py:173-182 with output_frame='cam')."""
    return -hm_pix * (pixmm / 1000.0) + cam_dist


def cam_depth_to_gel_px(depth_m: jax.Array, pixmm: float, cam_dist: float) -> jax.Array:
    """Camera-frame depth (m) -> gel-frame heightmap (px)
    (digit_renderer.py:164-171)."""
    return (cam_dist - depth_m) * (1000.0 / pixmm)


def heightmap_to_mask(
    heightmap: jax.Array,
    bg: jax.Array,
    border: int,
    ratio: float,
    clip: float,
    small_parts: bool = False,
) -> jax.Array:
    """Threshold a gel-frame heightmap (px) into a boolean contact mask
    (reference tdn.py:139-165): crop `border`, subtract background, clip,
    keep pixels above ratio * 80th percentile, zero the mask entirely if
    the contact area is below 10% (1% for small parts) of the crop."""
    hm = heightmap[border:-border, border:-border]
    bg_c = bg[border:-border, border:-border]
    diff = hm - bg_c
    diff = jnp.where(diff < clip, 0.0, diff)
    thresh = jnp.quantile(diff, 0.8) * ratio
    mask = diff > thresh

    total = mask.shape[0] * mask.shape[1]
    atleast = (0.01 if small_parts else 0.1) * total
    keep = jnp.count_nonzero(mask) >= atleast
    mask = mask & keep

    padded = jnp.zeros(heightmap.shape, dtype=bool)
    return padded.at[border:-border, border:-border].set(mask)


def heightmap_to_cloud(
    heightmap: jax.Array,
    mask: jax.Array,
    pixmm: float,
    cam_dist: float,
    focal_px: float,
) -> tuple[jax.Array, jax.Array]:
    """Unproject a gel-frame heightmap (px) to a camera-frame point cloud
    (reference digit_renderer.py:210-248). Returns fixed-size points
    (H*W, 3) and a validity mask (H*W,) instead of filtering rows."""
    depth = gel_px_to_cam_depth(heightmap, pixmm, cam_dist)  # (H, W) meters
    h, w = heightmap.shape
    cx, cy = w / 2.0, h / 2.0
    xs = (jnp.arange(w, dtype=depth.dtype) - cx) / focal_px
    ys = (jnp.arange(h, dtype=depth.dtype) - cy) / focal_px
    x = xs[None, :] * depth
    y = -ys[:, None] * depth
    z = -(depth * mask)
    pts = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    valid = mask.reshape(-1) & (z.reshape(-1) != 0)
    return pts, valid


@functools.partial(jax.jit, static_argnames=("n_points",))
def sample_cloud(
    key: jax.Array, points: jax.Array, valid: jax.Array, n_points: int
) -> jax.Array:
    """Uniformly sample `n_points` valid points without replacement (with
    wraparound replacement when fewer valid points exist), matching the
    reference's multinomial downsample (tcn.py:96-109). Empty clouds give
    all-zero points (tcn.py:89-94)."""
    n = points.shape[0]
    g = jax.random.uniform(key, (n,))
    score = jnp.where(valid, g, -jnp.inf)
    _, idx = jax.lax.top_k(score, n_points)
    count = jnp.sum(valid).astype(jnp.int32)
    wrap = jnp.arange(n_points, dtype=jnp.int32) % jnp.maximum(count, 1)
    idx = jnp.where(jnp.arange(n_points) < count, idx, idx[wrap])
    out = points[idx]
    return jnp.where(count > 0, out, jnp.zeros_like(out))


def scale_to_unit(points: jax.Array) -> jax.Array:
    """Scale the whole cloud into [-1, 1] using the global (all-axis)
    min/max, exactly as the reference does (tcn.py:111-116)."""
    mn, mx = jnp.min(points), jnp.max(points)
    return 2.0 * (points - mn) / jnp.maximum(mx - mn, 1e-12) - 1.0


def blend_heightmaps(window: jax.Array) -> jax.Array:
    """Exponentially-weighted blend over a stack (k, H, W) of recent
    heightmaps, newest last (reference tdn.py:60-92)."""
    k = window.shape[0]
    w = jnp.exp(jnp.arange(1, k + 1, dtype=window.dtype) / k)
    w = w / jnp.sum(w)
    return jnp.sum(window * w[:, None, None], axis=0)
