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


def normalize_per_channel(img: jax.Array) -> jax.Array:
    """Standardize each channel of (H, W, C) to zero mean / unit std.

    The DIGIT's LED ring randomizes per-channel color gain (up to +-15%,
    tacto config_digit_shadow jitter; render.digit._sample_lighting) and
    the global minmax normalization the reference uses (tdn.py:108) leaves
    that gain in the TDN input — measured as the dominant nuisance
    destabilizing estimated fine relief (PROBE_TDN_boulder.json: lighting
    alone drops same-site est retrieval 1.00 -> 0.35). Per-channel
    standardization removes the per-channel affine lighting component at
    the input, before the network has to learn invariance to it."""
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    std = jnp.std(img, axis=(0, 1), keepdims=True)
    return (img - mean) / jnp.maximum(std, 1e-6)


def box_blur(img: jax.Array, k: int) -> jax.Array:
    """Separable k x k box blur of (H, W) or (H, W, C) with SAME edge
    handling (border means are over the in-bounds window). Two 1-D
    reduce_windows (2k adds/px) instead of one dense k x k window (k^2
    adds/px — 30x more VPU work at k=65); exact because rectangular
    window sums and counts both factorize: mean2d = sum_y(sum_x) /
    (count_x * count_y)."""
    chan = img.ndim == 3
    x = img if chan else img[..., None]
    pad = (k // 2, k - 1 - k // 2)

    def sum1d(a, axis):
        win = [1, 1, 1]
        win[axis] = k
        pads = [(0, 0), (0, 0), (0, 0)]
        pads[axis] = pad
        return jax.lax.reduce_window(
            a, 0.0, jax.lax.add, tuple(win), (1, 1, 1), tuple(pads)
        )

    ssum = sum1d(sum1d(x, 0), 1)
    cnt = sum1d(sum1d(jnp.ones_like(x), 0), 1)
    out = ssum / cnt
    return out if chan else out[..., 0]


def normalize_illum(img: jax.Array, k: int = 65, div: bool = False) -> jax.Array:
    """Illumination-removing input normalization: subtract (or divide out)
    a large per-channel box blur, then standardize each channel.

    The DIGIT nuisances the TDN must be invariant to are SMOOTH in image
    space — per-unit background mottle (make_backgrounds: 6x8 coarse grid
    ~45 px/cell), radial vignette, LED color-gain gradients, global light
    scale — while the contact signal (shaded sub-mm relief) lives below
    ~1 mm ≈ 30 px. Removing the local illumination estimate (k x k blur)
    cancels every smooth nuisance EXACTLY, with no calibration image and
    no session background capture: measured round 5 as the lever that
    closes the est-path lighting instability (PROBE_TDN_boulder.json:
    with affine-only normalization, lighting jitter alone dropped
    same-site est retrieval to ~0.35; shadows/gradients are spatial, not
    per-channel-affine). `div=True` is the retinex variant (illumination
    is multiplicative in the Phong composite's light_scale)."""
    base = box_blur(img, k)
    x = img / jnp.maximum(base, 1e-3) - 1.0 if div else img - base
    return normalize_per_channel(x)


def normalize_image(img: jax.Array, mode: str = "minmax") -> jax.Array:
    """TDN input normalization: 'minmax' (reference parity, tdn.py:108),
    'per_channel' (lighting-robust affine; see normalize_per_channel),
    'illum'/'illum_div' (spatial illumination removal; normalize_illum),
    or 'pc_illum' (6-channel hybrid: per-channel-standardized absolute
    shading, which carries the depth scale, concatenated with the
    illumination-removed channels, which carry the lighting-stable
    relief — the downstream FCRN infers its input width from the data).
    An optional kernel suffix sets the blur size, e.g. 'illum33'."""
    if mode == "per_channel":
        return normalize_per_channel(img)
    if mode.startswith("pc_illum"):
        k = int(mode[len("pc_illum"):]) if mode[len("pc_illum"):] else 65
        return jnp.concatenate(
            [normalize_per_channel(img), normalize_illum(img, k=k)], axis=-1
        )
    if mode.startswith("illum"):
        div = mode.startswith("illum_div")
        suffix = mode[len("illum_div"):] if div else mode[len("illum"):]
        k = int(suffix) if suffix else 65
        return normalize_illum(img, k=k, div=div)
    if mode != "minmax":
        raise ValueError(f"unknown input_norm {mode!r}")
    return normalize_minmax(img)


def norm_channels(mode: str) -> int:
    """Channel count normalize_image produces for a 3-channel input —
    model init must agree with the configured input_norm."""
    return 6 if mode.startswith("pc_illum") else 3


def highpass(img: jax.Array, k: int = 9) -> jax.Array:
    """Image (H, W) minus its k x k box blur — the fine-relief component
    of a heightmap. reduce_window mean filter with SAME edge handling
    (border means are over the in-bounds window)."""
    ones = jnp.ones_like(img)
    win = (k, k)
    pads = ((k // 2, k - 1 - k // 2), (k // 2, k - 1 - k // 2))
    ssum = jax.lax.reduce_window(img, 0.0, jax.lax.add, win, (1, 1), pads)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, (1, 1), pads)
    return img - ssum / cnt


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


@jax.jit
def rectify_tilt(hm: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Remove the best-fit in-support plane ramp from a contact heightmap.

    Codebook/eval poses are sampled with a random shear tilt of up to
    +-shear_mag degrees off the surface normal (pose_from_vertex_normal,
    reference modules/pose.py:375-455). A 5-degree tilt across a ~7 mm
    contact patch adds a +-0.6 mm linear ramp to the penetration image —
    the size of the entire sub-mm relief signal — which measurably destroys
    appearance-space retrieval (scripts/diagnose_embedding.py: 79% -> 11%
    top-1 site accuracy). Fitting and subtracting the support-weighted
    least-squares plane is the 2-D small-angle approximation of rotating
    the local patch into its own reference frame: it removes the tilt DOF
    while preserving the relief (surface curvature and features) exactly
    to first order.

    The plane's constant term (mean penetration) is kept so downstream
    press-depth handling (depth_band) is unchanged. Returns the rectified
    heightmap (zero outside the support) and the support mask.
    """
    h, w = hm.shape
    z = jnp.maximum(hm, 0.0) * mask.astype(hm.dtype)
    sup = (z > 1e-6).astype(hm.dtype)
    n = jnp.maximum(jnp.sum(sup), 1.0)
    ys, xs = jnp.mgrid[0:h, 0:w].astype(hm.dtype)
    cx = jnp.sum(sup * xs) / n
    cy = jnp.sum(sup * ys) / n
    dx = (xs - cx) * sup
    dy = (ys - cy) * sup
    # normal equations for z ~ a*dx + b*dy (+ mean) over the support
    sxx = jnp.sum(dx * dx)
    syy = jnp.sum(dy * dy)
    sxy = jnp.sum(dx * dy)
    szx = jnp.sum(z * dx)
    szy = jnp.sum(z * dy)
    det = sxx * syy - sxy * sxy
    safe = jnp.abs(det) > 1e-9
    a = jnp.where(safe, (szx * syy - szy * sxy) / jnp.where(safe, det, 1.0), 0.0)
    b = jnp.where(safe, (szy * sxx - szx * sxy) / jnp.where(safe, det, 1.0), 0.0)
    ramp = a * (xs - cx) + b * (ys - cy)
    out = jnp.where(sup > 0, z - ramp, 0.0)
    return out, sup > 0


@functools.partial(jax.jit, static_argnames=("band_px", "top_k"))
def depth_band(
    hm: jax.Array,  # (H, W) gel-frame penetration heightmap, px units
    mask: jax.Array,  # (H, W) bool contact mask
    band_px: float,
    top_k: int = 64,
):
    """Press-depth-invariant penetration band.

    The heightmap is the surface profile intersected with the gel plane at
    a RANDOM press depth (~U(pen.min, pen.max), digit_renderer.py:271-275
    and :313-359) — the same surface point pressed 0.6 mm vs 1.8 mm deep
    yields nearly uncorrelated penetration images (measured same-site
    canonical-patch cosine 0.97 -> 0.05), which caps any appearance-space
    retrieval at chance. Penetration RELATIVE TO THE DEEPEST CONTACT POINT
    is a pure surface property: re-anchoring at the deepest point and
    keeping only the top `band_px` of relief removes the press-depth DOF
    exactly (up to band truncation when press < band).

    The anchor is the mean of the `top_k` deepest penetrations — robust to
    isolated estimation spikes in TDN-predicted heightmaps (on GT renders
    it equals the max up to interpolation).

    Returns (banded heightmap in [0, band_px], its support mask).
    """
    z = jnp.maximum(hm, 0.0) * mask.astype(hm.dtype)
    anchor = jnp.mean(jax.lax.top_k(z.ravel(), top_k)[0])
    zb = jnp.clip(z - (anchor - band_px), 0.0, band_px)
    return zb, zb > 1e-3


def _canonical_frame(z: jax.Array):
    """Depth-weighted centroid + principal-axis direction of a masked
    penetration image (the canonicalization frame of canonicalize_patch):
    2nd image moments give the axis, the sign of the 3rd moment along it
    fixes the 180-degree flip. Returns (cy, cx, cos, sin)."""
    h, w = z.shape
    total = jnp.maximum(jnp.sum(z), 1e-6)
    ys, xs = jnp.mgrid[0:h, 0:w].astype(z.dtype)
    cy = jnp.sum(z * ys) / total
    cx = jnp.sum(z * xs) / total
    dy, dx = ys - cy, xs - cx
    mu20 = jnp.sum(z * dx * dx) / total
    mu02 = jnp.sum(z * dy * dy) / total
    mu11 = jnp.sum(z * dx * dy) / total
    theta = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # skewness along the principal axis fixes the 180-degree flip
    proj = dx * c + dy * s
    skew = jnp.sum(z * proj**3)
    c, s = jnp.where(skew < 0, -c, c), jnp.where(skew < 0, -s, s)
    return cy, cx, c, s


def canonical_angle(hm: jax.Array, mask: jax.Array) -> jax.Array:
    """In-image-plane angle (radians, (-pi, pi]) of the canonicalization
    frame canonicalize_patch aligns to. Two touches at the same surface
    site related by a gel-frame yaw rotation have canonical angles that
    differ by exactly that yaw (up to the skew disambiguation) — storing
    this per codebook entry lets the filter score each particle's yaw
    against the live measurement (the DOF the yaw-canonical descriptor
    deliberately quotients out; see FilterStep yaw scoring)."""
    z = jnp.maximum(hm, 0.0) * mask.astype(hm.dtype)
    _, _, c, s = _canonical_frame(z)
    return jnp.arctan2(s, c)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "crop_px"))
def canonicalize_patch(
    hm: jax.Array,  # (H, W) gel-frame heightmap, px units (>=0 at contact)
    mask: jax.Array,  # (H, W) bool contact mask
    out_h: int = 32,
    out_w: int = 32,
    crop_px: float = 160.0,
) -> jax.Array:
    """Yaw/translation-canonical contact patch.

    The codebook samples touch poses with RANDOM yaw
    (pose_from_vertex_normal, reference modules/pose.py:375-455), so two
    touches at the same surface point generically differ by an in-plane
    rotation — appearance-space retrieval must either learn yaw invariance
    (the training data never teaches it) or remove the nuisance DOF. This
    removes it geometrically:

      1. depth-weighted centroid + principal axis of the contact patch
         (2nd image moments), 180-degree-disambiguated by the sign of the
         3rd moment (skewness) along the axis,
      2. bilinear resample of the masked penetration image on a grid
         centred on the centroid and aligned to the axis
         (`crop_px` x `crop_px` input pixels -> (out_h, out_w)).

    Returns the canonical patch (out_h, out_w), zero outside the contact.
    Nearly-isotropic or skew-free patches keep an ambiguous axis — callers
    that need full invariance can embed both 180-degree variants.
    """
    z = jnp.maximum(hm, 0.0) * mask.astype(hm.dtype)
    cy, cx, c, s = _canonical_frame(z)

    u = (jnp.arange(out_w, dtype=hm.dtype) / (out_w - 1) - 0.5) * crop_px
    v = (jnp.arange(out_h, dtype=hm.dtype) / (out_h - 1) - 0.5) * crop_px
    uu, vv = jnp.meshgrid(u, v)
    sample_x = cx + uu * c - vv * s
    sample_y = cy + uu * s + vv * c
    return jax.scipy.ndimage.map_coordinates(
        z, [sample_y, sample_x], order=1, mode="constant", cval=0.0
    )


def blend_heightmaps(window: jax.Array) -> jax.Array:
    """Exponentially-weighted blend over a stack (k, H, W) of recent
    heightmaps, newest last (reference tdn.py:60-92)."""
    k = window.shape[0]
    w = jnp.exp(jnp.arange(1, k + 1, dtype=window.dtype) / k)
    w = w / jnp.sum(w)
    return jnp.sum(window * w[:, None, None], axis=0)
