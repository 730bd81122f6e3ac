"""DIGIT tactile sensor renderer: batched ray-cast depth + gel optics.

Replaces the reference's TACTO/pyrender OpenGL stack
(`midastouch/render/digit_renderer.py`) with a TPU-resident pipeline:

  1. cull mesh triangles to a fixed-size budget near the sensor tip
     (the DIGIT gel sees a few mm — a dense top-k beats any BVH here)
  2. Möller–Trumbore ray-triangle intersection, rays chunked under lax.map,
     one (rays x faces) minimum per chunk — pure VPU work that XLA fuses
  3. gel-frame conversion, press-depth application with over-penetration
     compensation as a fixed two-pass render (digit_renderer.py:313-359)
  4. Phong-shaded tactile RGB with the DIGIT tri-color LED ring
     (tacto's config_digit_shadow lighting, approximated analytically)

Camera model: pinhole, OpenGL-style frame (looks along -z, y up), vertical
FOV from config; depth is distance along -z. The gel plane sits at
`cam_dist` in front of the camera; heightmaps are in gel-frame pixels with
`pixmm` vertical scale, exactly like the reference
(digit_renderer.py:164-182).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.geometry.mesh import Mesh
from midastouch_tpu.ops import image as image_ops
from midastouch_tpu.ops import se3


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 240
    height: int = 320
    pixmm: float = 0.03
    cam_dist: float = 0.022
    yfov_deg: float = 60.0
    pen_min: float = 0.0005
    pen_max: float = 0.002
    shear_mag: float = 5.0
    max_faces: int = 1024
    ray_chunk: int = 7680  # rays per lax.map chunk

    @property
    def focal_px(self) -> float:
        return 0.5 * self.height / np.tan(0.5 * np.radians(self.yfov_deg))

    @classmethod
    def from_cfg(cls, cfg, max_faces: int | None = None) -> "RenderConfig":
        return cls(
            width=int(cfg.width),
            height=int(cfg.height),
            pixmm=float(cfg.pixmm),
            cam_dist=float(cfg.cam_dist),
            yfov_deg=float(cfg.get("yfov_deg", 60.0)),
            pen_min=float(cfg.pen.min),
            pen_max=float(cfg.pen.max),
            shear_mag=float(cfg.get("shear_mag", 5.0)),
            **({"max_faces": int(max_faces)} if max_faces else {}),
        )


# ---------------------------------------------------------------------------
# functional core (jit/vmap-safe)
# ---------------------------------------------------------------------------


def _pixel_dirs(width: int, height: int, focal_px: float) -> np.ndarray:
    """Unnormalized camera-frame ray directions with dz = -1, so the ray
    parameter equals depth-along-view (matches heightmap2Pointcloud's
    unprojection, digit_renderer.py:210-248)."""
    cx, cy = width / 2.0, height / 2.0
    xs = (np.arange(width) - cx) / focal_px
    ys = -(np.arange(height) - cy) / focal_px
    dx, dy = np.meshgrid(xs, ys)  # (H, W)
    d = np.stack([dx, dy, -np.ones_like(dx)], axis=-1)
    return d.reshape(-1, 3).astype(np.float32)  # (H*W, 3)


def cull_faces(
    tri: jax.Array,
    centroids: jax.Array,
    tip: jax.Array,
    k: int,
    radii: jax.Array | None = None,
) -> jax.Array:
    """Gather the k triangles nearest the sensor tip point. Far triangles
    are padded out by the top-k itself (they simply never intersect).

    `radii` (per-face circumradius around the centroid) makes the ranking
    conservative for LARGE triangles — on decimated meshes a face whose
    centroid is far can still pass under the gel; ranking by
    (centroid distance - radius) lower-bounds the true surface distance."""
    d = jnp.sqrt(jnp.sum((centroids - tip[None, :]) ** 2, axis=1))
    if radii is not None:
        d = jnp.maximum(d - radii, 0.0)
    _, idx = jax.lax.top_k(-d, min(k, tri.shape[0]))
    return tri[idx]


def _woop_transforms(tri: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-triangle world->barycentric affine maps (Woop et al. style).

    M = [e1 e2 n]^-1 (closed-form adjugate) so that for p = v0 + u e1 +
    v e2 + w n:  (u, v, w) = M (p - v0). Rays then intersect via two dot
    products per triangle instead of three cross products per (ray, tri)
    pair — the heavy contraction becomes a single MXU matmul.

    Returns M (K, 3, 3) and b = -M v0 (K, 3).
    """
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    n = jnp.cross(e1, e2)
    # A = [e1 e2 n] columns; adjugate rows are cross products of columns
    r0 = jnp.cross(e2, n)  # ~ (e2 x n)
    r1 = jnp.cross(n, e1)
    r2 = n
    det = jnp.sum(e1 * r0, axis=-1, keepdims=True)  # = e1.(e2 x n) = |n|^2
    inv_det = jnp.where(jnp.abs(det) > 1e-18, 1.0 / det, 0.0)
    M = jnp.stack([r0, r1, r2], axis=1) * inv_det[..., None]  # (K, 3, 3)
    b = -(M @ v0[..., None])[..., 0]
    return M, b


def _raycast_chunk(
    o_bary: jax.Array,  # (K, 3)  M @ origin + b (shared by all rays)
    Mt: jax.Array,  # (3, 3K)   transform rows flattened for one matmul
    dirs: jax.Array,  # (C, 3)  world-frame ray dirs (dz = -1 param)
    far: float,
) -> jax.Array:
    """Min hit parameter per ray over all K triangles."""
    k = o_bary.shape[0]
    d_bary = (dirs @ Mt).reshape(dirs.shape[0], k, 3)  # (C, K, 3) via MXU
    du, dv, dw = d_bary[..., 0], d_bary[..., 1], d_bary[..., 2]
    ou, ov, ow = o_bary[:, 0], o_bary[:, 1], o_bary[:, 2]
    safe = jnp.abs(dw) > 1e-12
    t = -ow[None, :] / jnp.where(safe, dw, 1.0)  # (C, K)
    u = ou[None, :] + t * du
    v = ov[None, :] + t * dv
    hit = safe & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-7)
    return jnp.min(jnp.where(hit, t, far), axis=-1)  # (C,)


@functools.partial(
    jax.jit,
    static_argnames=("cam_dist", "width", "height", "ray_chunk", "max_faces", "use_pallas"),
)
def raycast_depth(
    tri: jax.Array,
    centroids: jax.Array,
    cam_pose: jax.Array,
    pix_dirs: jax.Array,
    cam_dist: float,
    width: int,
    height: int,
    ray_chunk: int,
    max_faces: int,
    use_pallas: bool = False,
    radii: jax.Array | None = None,
) -> jax.Array:
    """Depth map (H, W) in meters along -z for one camera pose (4,4).
    Rays beyond the gel plane clamp to `cam_dist` (the flat-gel background,
    digit_renderer.py:59-62)."""
    R, o = cam_pose[:3, :3], cam_pose[:3, 3]
    tip = o + R @ jnp.array([0.0, 0.0, -cam_dist], dtype=cam_pose.dtype)
    tri_near = cull_faces(tri, centroids, tip, max_faces, radii=radii)

    M, b = _woop_transforms(tri_near)  # (K,3,3), (K,3) — once per pose
    o_bary = (M @ o[None, :, None])[..., 0] + b  # (K, 3)
    n = pix_dirs.shape[0]
    far = 10.0 * cam_dist

    if use_pallas:
        from midastouch_tpu.render.raycast_pallas import (
            _TR,
            pack_triangle_tables,
            raycast_min_t,
        )

        # fold the camera rotation into the triangle transforms so the
        # ray table stays pose-independent: d_bary = (M R) d_cam
        Mc = M @ R  # (K, 3, 3)
        m_t, ob_t = pack_triangle_tables(Mc, o_bary)
        rpad = (-n) % _TR
        dirs8 = jnp.pad(pix_dirs, ((0, rpad), (0, 5)))
        t = raycast_min_t(dirs8, m_t, ob_t, far)[:n]
    else:
        # XLA fallback: chunked matmul + fused elementwise
        Mt = M.transpose(2, 0, 1).reshape(3, -1)
        dirs_world = pix_dirs @ R.T  # (H*W, 3); ray param still = depth
        pad = (-n) % ray_chunk
        if pad:
            dirs_world = jnp.concatenate(
                [dirs_world, jnp.zeros((pad, 3), dirs_world.dtype)], axis=0
            )
        nchunk = dirs_world.shape[0] // ray_chunk
        t = jax.lax.map(
            lambda d: _raycast_chunk(o_bary, Mt, d, far),
            dirs_world.reshape(nchunk, ray_chunk, 3),
        ).reshape(-1)[:n]

    return jnp.minimum(t.reshape(height, width), cam_dist)


DEFAULT_LIGHT_ANGLES = np.array([90.0, 210.0, 330.0], np.float32)
DEFAULT_LIGHT_RGB = np.array(
    [[0.95, 0.15, 0.15], [0.15, 0.95, 0.15], [0.2, 0.2, 0.95]], np.float32
)


def make_backgrounds(
    key: jax.Array, height: int, width: int, n: int = 30
) -> jax.Array:
    """Procedural DIGIT background library (n, H, W, 3) in [0,1].

    The reference composites renders over one of 30 captured sensor
    background photos chosen at random (digit_renderer.py:45-47). No image
    assets exist in this environment, so the library is synthesized with
    the statistics that matter for TDN robustness: per-unit LED color
    vignettes, smooth low-frequency mottling, and sensor noise.
    """
    ys, xs = jnp.mgrid[0:height, 0:width].astype(jnp.float32)
    yy = ys / (height - 1) - 0.5
    xx = xs / (width - 1) - 0.5
    r2 = xx**2 + yy**2

    def one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        base = 0.14 + 0.10 * jax.random.uniform(k1, ())
        vign = 1.0 - (0.5 + 0.7 * jax.random.uniform(k2, ())) * r2
        # LED color gradients from ring directions (jittered per unit)
        ang = jnp.radians(
            jnp.asarray(DEFAULT_LIGHT_ANGLES)
            + jax.random.normal(k3, (3,)) * 12.0
        )
        grad = 0.5 + 0.5 * (
            xx[..., None] * jnp.cos(ang) + yy[..., None] * jnp.sin(ang)
        )  # (H, W, 3)
        tint = jnp.einsum(
            "hwl,lc->hwc",
            grad,
            jnp.asarray(DEFAULT_LIGHT_RGB)
            * (0.8 + 0.4 * jax.random.uniform(k4, (3, 1))),
        )
        coarse = jax.random.normal(k5, (6, 8, 3)) * 0.02
        mottle = jax.image.resize(coarse, (height, width, 3), "bilinear")
        return jnp.clip(base * vign[..., None] * (1.0 + tint) + mottle, 0, 1)

    return jax.vmap(one)(jax.random.split(key, n))


def shade_rgb(
    heightmap_px: jax.Array,
    contact_mask: jax.Array,
    pixmm: float,
    light_scale: jax.Array | float = 1.0,
    bg_level: float = 0.35,
    light_angles_deg: jax.Array | None = None,
    light_rgb: jax.Array | None = None,
    background: jax.Array | None = None,
    shadows: bool = True,
) -> jax.Array:
    """Phong-lit tactile RGB (H, W, 3) float in [0,1] from a gel heightmap.

    DIGIT's three LEDs sit on a ring around the gel; tacto shades the gel
    surface with per-light Phong + shadow maps and randomizes light
    position/color per render (digit_renderer.py:149-162,
    config_digit_shadow). Here: surface normals from the heightmap
    gradient, three directional colored lights (angles/colors overridable
    per render), Lambert + specular, a screen-space horizon shadow term,
    composited over a background image (see `make_backgrounds`).
    """
    h_m = heightmap_px * (pixmm / 1000.0)
    gy, gx = jnp.gradient(h_m)
    # pixel pitch in meters on the gel plane (approx: pixmm lateral)
    pitch = pixmm / 1000.0
    n = jnp.stack([-gx / pitch, -gy / pitch, jnp.ones_like(gx)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)

    if light_angles_deg is None:
        light_angles_deg = jnp.asarray(DEFAULT_LIGHT_ANGLES)
    if light_rgb is None:
        light_rgb = jnp.asarray(DEFAULT_LIGHT_RGB)
    angles = jnp.radians(light_angles_deg)
    elev = jnp.radians(25.0)
    light_dirs = jnp.stack(
        [
            jnp.cos(angles) * jnp.cos(elev),
            jnp.sin(angles) * jnp.cos(elev),
            jnp.full_like(angles, jnp.sin(elev)),
        ],
        axis=-1,
    )  # (3, 3)

    lam = jnp.maximum(jnp.einsum("hwc,lc->hwl", n, light_dirs), 0.0)

    if shadows:
        # screen-space horizon shadows: a pixel is occluded from light l if
        # the surface `d` pixels TOWARD the light rises faster than the
        # light's elevation slope (tacto renders true shadow maps; this is
        # the heightfield equivalent at a few fixed sample distances)
        h_px_m = h_m  # (H, W)
        ys, xs = jnp.mgrid[0 : h_m.shape[0], 0 : h_m.shape[1]].astype(
            jnp.float32
        )
        tan_e = jnp.tan(elev)
        occ = []
        for li in range(3):
            dx = jnp.cos(angles[li])
            dy = -jnp.sin(angles[li])  # image y grows downward
            o = jnp.zeros_like(h_m)
            for d in (2.0, 5.0, 10.0, 20.0):
                hs = jax.scipy.ndimage.map_coordinates(
                    h_px_m, [ys + dy * d, xs + dx * d], order=1,
                    mode="nearest",
                )
                o = jnp.maximum(o, hs - h_px_m - d * pitch * tan_e)
            occ.append(o)
        occ = jnp.stack(occ, axis=-1)  # (H, W, 3)
        shadow = jax.nn.sigmoid(-occ / (0.5 * pitch))  # soft penumbra
        lam = lam * (0.25 + 0.75 * shadow)

    view = jnp.array([0.0, 0.0, 1.0])
    half = light_dirs + view
    half = half / jnp.linalg.norm(half, axis=-1, keepdims=True)
    spec = jnp.maximum(jnp.einsum("hwc,lc->hwl", n, half), 0.0) ** 32

    if background is None:
        base = jnp.full(h_m.shape + (3,), bg_level * 0.5)
    else:
        base = background
    rgb = base + jnp.einsum("hwl,lc->hwc", lam, light_rgb) * 0.55
    rgb = rgb + jnp.einsum("hwl,lc->hwc", spec, light_rgb) * 0.25
    return jnp.clip(rgb * light_scale, 0.0, 1.0)


# ---------------------------------------------------------------------------
# renderer class (host-facing)
# ---------------------------------------------------------------------------


class DigitRenderer:
    """Stateful wrapper bundling a mesh with the functional render core
    (API shape of reference `digit_renderer`, digit_renderer.py:33-359)."""

    def __init__(
        self,
        cfg: RenderConfig,
        mesh: Mesh,
        randomize: bool = False,
        seed: int = 0,
        backend: str = "auto",
    ):
        if backend == "auto":
            # The pallas kernel is faster once compiled, but Mosaic compiles
            # through this environment's TPU tunnel are minutes-slow and not
            # persistently cached; the XLA path compiles once and caches.
            # Flip to "pallas" explicitly for long-running serving setups.
            backend = "xla"
        self.backend = backend
        self.cfg = cfg
        self.mesh = mesh
        self.randomize = randomize
        self._key = jax.random.PRNGKey(seed)
        self.tri = jnp.asarray(mesh.triangles)
        self.centroids = jnp.asarray(mesh.triangles.mean(axis=1))
        # per-face circumradius for the conservative cull (large decimated
        # triangles must not be dropped by centroid distance alone)
        self.radii = jnp.asarray(
            np.linalg.norm(
                mesh.triangles - mesh.triangles.mean(axis=1, keepdims=True),
                axis=-1,
            ).max(axis=1)
        )
        # auto-scale the cull budget to the sensor's view disk: the FOV
        # reaches cam_dist * tan(diag half-angle) from the tip, and a dense
        # mesh needs every face inside that disk (cfg.max_faces is a FLOOR;
        # on >50k-face meshes 1024 nearest faces provably miss in-contact
        # geometry — see tests/test_renderer.py cull test)
        tanx = (cfg.width / 2.0) / cfg.focal_px
        tany = (cfg.height / 2.0) / cfg.focal_px
        r_view = cfg.cam_dist * float(np.hypot(tanx, tany)) * 1.15 + cfg.pen_max
        a_med = float(np.median(mesh.face_areas))
        needed = int(2.0 * np.pi * r_view**2 / max(a_med, 1e-12))
        self.max_faces_eff = min(
            len(mesh.faces), max(cfg.max_faces, -(-needed // 256) * 256)
        )
        self.pix_dirs = jnp.asarray(
            _pixel_dirs(cfg.width, cfg.height, cfg.focal_px)
        )
        # flat-gel background: uniform depth = cam_dist
        self.bg_depth = jnp.full(
            (cfg.height, cfg.width), cfg.cam_dist, dtype=jnp.float32
        )
        self.press_depth = 0.001
        self._batched_render = None
        # background library (reference: 30 captured photos, random id per
        # render, digit_renderer.py:45-47); one flat entry when not
        # randomizing so the render signature stays static
        if randomize:
            self.backgrounds = make_backgrounds(
                jax.random.PRNGKey(seed + 1), cfg.height, cfg.width, n=30
            )
        else:
            self.backgrounds = jnp.full(
                (1, cfg.height, cfg.width, 3), 0.175, dtype=jnp.float32
            )

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def update_pose_given_point(
        self, point: np.ndarray, shear_mag_deg: float = 0.0, seed: int = 0
    ) -> np.ndarray:
        """Gel pose at the mesh vertex nearest `point` (reference
        update_pose_given_point, digit_renderer.py:90-105)."""
        v = self.mesh.vertices
        idx = int(np.argmin(np.linalg.norm(v - np.asarray(point), axis=1)))
        key = jax.random.PRNGKey(seed)
        delta = jax.random.uniform(key, (1,), maxval=2 * np.pi)
        T = se3.pose_from_vertex_normal(
            jnp.asarray(v[idx][None]),
            jnp.asarray(self.mesh.vertex_normals[idx][None]),
            float(np.radians(shear_mag_deg)),
            delta,
            key,
        )
        return np.asarray(T[0])

    # -- frame algebra (digit_renderer.py:124-146) --------------------------

    def gel2cam(self, gel_pose: jax.Array) -> jax.Array:
        off = jnp.eye(4).at[2, 3].set(self.cfg.cam_dist)
        return gel_pose @ off

    def cam2gel(self, cam_pose: jax.Array) -> jax.Array:
        off = jnp.eye(4).at[2, 3].set(-self.cfg.cam_dist)
        return cam_pose @ off

    def add_press(self, cam_pose: jax.Array, press_depth) -> jax.Array:
        pen = jnp.eye(4).at[2, 3].set(-press_depth)
        return cam_pose @ pen

    def get_background(self, frame: str = "gel") -> jax.Array:
        if frame == "gel":
            return image_ops.cam_depth_to_gel_px(
                self.bg_depth, self.cfg.pixmm, self.cfg.cam_dist
            )
        return self.bg_depth

    # -- core renders --------------------------------------------------------

    def render_depth(self, cam_pose: jax.Array) -> jax.Array:
        c = self.cfg
        return raycast_depth(
            self.tri, self.centroids, cam_pose, self.pix_dirs, c.cam_dist,
            c.width, c.height, c.ray_chunk, self.max_faces_eff,
            use_pallas=(self.backend == "pallas"), radii=self.radii,
        )

    def _render_impl(self, gel_pose: jax.Array, press_depth: jax.Array,
                     light: jax.Array, light_angles: jax.Array | None = None,
                     light_rgb: jax.Array | None = None,
                     bg_id: jax.Array | None = None):
        """Jit-safe single-touch render core (two-pass over-pen comp)."""
        c = self.cfg
        cam0 = self.gel2cam(gel_pose)
        # pass 1: zero press — measure surface protrusion above gel plane
        d0 = self.render_depth(cam0)
        protrusion = jnp.max(c.cam_dist - d0)
        press_eff = jnp.clip(press_depth, 0.0, jnp.maximum(
            c.pen_max - protrusion, 0.0
        ))
        # pass 2: pressed camera
        cam = self.add_press(cam0, press_eff)
        depth = self.render_depth(cam)

        heightmap = image_ops.cam_depth_to_gel_px(depth, c.pixmm, c.cam_dist)
        contact = (self.bg_depth - depth) > jnp.abs(press_eff * 0.2)
        bg = self.backgrounds[
            bg_id % self.backgrounds.shape[0] if bg_id is not None else 0
        ]
        rgb = shade_rgb(
            heightmap, contact, c.pixmm, light_scale=light,
            light_angles_deg=light_angles, light_rgb=light_rgb,
            background=bg,
        )
        return rgb, heightmap, contact, press_eff, cam

    def render(
        self, gel_pose: jax.Array, press_depth: float | jax.Array | None = None
    ):
        """Render (tactile RGB, gel heightmap px, contact mask) at a gel
        pose with over-penetration-compensated press depth
        (digit_renderer.py:313-359, two-pass here instead of conditional)."""
        if press_depth is None:
            press_depth = self.press_depth
        light = jnp.asarray(1.0)
        angles = colors = bg_id = None
        if self.randomize:
            k1, k2, k3, k4 = jax.random.split(self._split(), 4)
            light = 0.8 + 0.4 * jax.random.uniform(k1, ())
            angles, colors, bg_id = self._sample_lighting(k2, k3, k4)
        return self._render_impl(
            jnp.asarray(gel_pose, dtype=jnp.float32),
            jnp.asarray(press_depth, dtype=jnp.float32),
            light, angles, colors, bg_id,
        )

    def _sample_lighting(self, ka, kc, kb, shape=()):
        """Per-render light randomization matching tacto's
        config_digit_shadow jitter (digit_renderer.py:160-161): LED ring
        angles +-10 deg, per-channel color scale 0.85-1.15, random bg id."""
        angles = jnp.asarray(DEFAULT_LIGHT_ANGLES) + jax.random.normal(
            ka, shape + (3,)
        ) * 10.0
        colors = jnp.asarray(DEFAULT_LIGHT_RGB) * (
            0.85 + 0.3 * jax.random.uniform(kc, shape + (3, 1))
        )
        bg_id = jax.random.randint(
            kb, shape, 0, self.backgrounds.shape[0], dtype=jnp.int32
        )
        return angles, colors, bg_id

    def render_batch(self, gel_poses: jax.Array, press_depths: jax.Array,
                     lights: jax.Array | None = None,
                     angles: jax.Array | None = None,
                     colors: jax.Array | None = None,
                     bg_ids: jax.Array | None = None):
        """Batched render: ONE jit, lax.map over poses — amortizes the
        per-call dispatch latency that dominates host-loop rendering.
        Returns stacked (rgb, heightmap, mask, press_eff, cam)."""
        n = gel_poses.shape[0]
        if lights is None:
            lights = jnp.ones(n, dtype=jnp.float32)
        if angles is None:
            angles = jnp.tile(jnp.asarray(DEFAULT_LIGHT_ANGLES), (n, 1))
        if colors is None:
            colors = jnp.tile(jnp.asarray(DEFAULT_LIGHT_RGB), (n, 1, 1))
        if bg_ids is None:
            bg_ids = jnp.zeros(n, dtype=jnp.int32)
        if self._batched_render is None:
            self._batched_render = jax.jit(
                lambda poses, press, lights, ang, col, bgs: jax.lax.map(
                    lambda args: self._render_impl(*args),
                    (poses, press, lights, ang, col, bgs),
                )
            )
        return self._batched_render(
            jnp.asarray(gel_poses, dtype=jnp.float32),
            jnp.asarray(press_depths, dtype=jnp.float32),
            lights, angles, colors, bg_ids,
        )

    def heightmap2Pointcloud(self, heightmap: jax.Array, contact_mask=None):
        """Camera-frame cloud + validity mask (digit_renderer.py:210-248)."""
        c = self.cfg
        if contact_mask is None:
            contact_mask = jnp.ones_like(heightmap, dtype=bool)
        return image_ops.heightmap_to_cloud(
            heightmap, contact_mask, c.pixmm, c.cam_dist, c.focal_px
        )

    # -- batched APIs (digit_renderer.py:250-359) ----------------------------

    def _render_chunked(self, poses: np.ndarray, press: np.ndarray,
                        lights: np.ndarray, chunk: int = 64,
                        angles=None, colors=None, bg_ids=None):
        """Fixed-chunk batched rendering (pads the tail) -> numpy stacks."""
        n = poses.shape[0]
        if angles is None:
            angles = np.tile(DEFAULT_LIGHT_ANGLES, (n, 1))
        if colors is None:
            colors = np.tile(DEFAULT_LIGHT_RGB, (n, 1, 1))
        if bg_ids is None:
            bg_ids = np.zeros(n, np.int32)
        arrs = [np.asarray(a) for a in (poses, press, lights, angles, colors, bg_ids)]
        pad = (-n) % chunk
        if pad:
            arrs = [np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrs]
        outs = []
        for i in range(0, arrs[0].shape[0], chunk):
            out = self.render_batch(*(a[i : i + chunk] for a in arrs))
            outs.append([np.asarray(x) for x in out])
        cat = [np.concatenate([o[k] for o in outs])[:n] for k in range(5)]
        rgbs, hms, masks, press_eff, cams = cat
        return rgbs, hms, masks, press_eff, cams

    def sample_render_aux(self, n: int):
        """Per-render randomization draws (press depth, light scale, LED
        angles/colors, background ids) for `n` unordered-pose renders.
        Callers that render through a different code path (e.g. the fused
        codebook build) see identical randomization only when they draw
        for the same `n` in the same order — the fused build draws aux for
        all samples in ONE call while the legacy loop drew per batch, so
        same-seed codebooks are deterministic within each path but not
        bit-identical across them."""
        press = np.asarray(jax.random.uniform(
            self._split(), (n,), minval=self.cfg.pen_min, maxval=self.cfg.pen_max
        ), np.float32)
        lights = np.ones(n, np.float32)
        angles = colors = bg_ids = None
        if self.randomize:
            k1, k2, k3, k4 = jax.random.split(self._split(), 4)
            lights = 0.8 + 0.4 * np.asarray(jax.random.uniform(k1, (n,)))
            angles, colors, bg_ids = self._sample_lighting(
                k2, k3, k4, shape=(n,)
            )
        return press, lights, angles, colors, bg_ids

    def render_sensor_poses(self, poses: np.ndarray, num_depths: int = 1):
        """Render an unordered pose set; returns stacked arrays:
        (heightmaps, masks, images, cam_poses, gel_poses)."""
        poses = np.atleast_3d(np.asarray(poses, dtype=np.float32))
        if num_depths > 1:
            poses = np.repeat(poses, num_depths, axis=0)
        n = poses.shape[0]
        press, lights, angles, colors, bg_ids = self.sample_render_aux(n)
        rgbs, hms, masks, press_eff, cams = self._render_chunked(
            poses, press, lights, angles=angles, colors=colors, bg_ids=bg_ids
        )
        gels = np.asarray(self.cam2gel(jnp.asarray(cams)))
        return hms, masks, rgbs, cams, gels

    def render_sensor_trajectory(
        self, poses: np.ndarray, m_noise: dict | None = None, pen_ratio: float = 1.0
    ):
        """Trajectory render with a press-depth random walk and measurement
        noise on the output poses (digit_renderer.py:250-311)."""
        poses = np.atleast_3d(np.asarray(poses, dtype=np.float32))
        n = poses.shape[0]
        c = self.cfg
        lo, hi = c.pen_min * pen_ratio, c.pen_max * pen_ratio
        rng = np.random.default_rng(int(jax.random.randint(self._split(), (), 0, 2**31 - 1)))
        press = rng.uniform(lo, hi)
        rng_span = (hi - lo) / 50.0
        press_list = []
        for _ in range(n):
            delta = rng.uniform(-rng_span, rng_span)
            press = press + delta if lo <= press + delta <= hi else press - delta
            press_list.append(press)

        rgbs, hms, masks, press_eff, camposes = self._render_chunked(
            poses, np.asarray(press_list, np.float32), np.ones(n, np.float32)
        )
        gelposes = np.asarray(self.cam2gel(jnp.asarray(camposes)))

        meas = gelposes
        if m_noise is not None:
            rot = rng.normal(0.0, m_noise["sig_r"], size=(n, 3))
            Rn = np.asarray(
                se3.euler_to_matrix(jnp.asarray(np.radians(rot), dtype=jnp.float32), "ZYX")
            )
            tn = rng.normal(0.0, m_noise["sig_t"], size=(n, 3))
            Tn = np.zeros((n, 4, 4), dtype=np.float32)
            Tn[:, :3, :3] = Rn
            Tn[:, :3, 3] = tn
            Tn[:, 3, 3] = 1
            meas = gelposes @ Tn

        return hms, masks, rgbs, camposes, gelposes, meas
