"""TCN driver: heightmap + contact mask -> 256-d tactile code.

Mirrors `midastouch/contrib/tcn_minkloc/tcn.py:18-148` around two
selectable Flax backbones (tcn.model.model):

  * "VoxelFPN" (default; reference architecture parity): unproject to a
    camera-frame cloud, resample to a fixed point count, scale, voxelize,
    3-D FPN + GeM. The whole pipeline is one jitted batched function —
    the reference crosses GPU->CPU for MinkowskiEngine quantization on
    every call (tcn.py:124-131).
  * "HeightmapFPN" (TPU-first alternative): 2-D FPN straight over the
    (penetration, mask) image — identical information (the cloud is a
    deterministic unprojection), better MXU mapping.

Cloud scaling before voxelization (scale_mode):
  * "sensor_frame" (default): fixed affine — x/y over the gel FOV, z
    stretched over the [0, 2*pen_max] penetration window (~0.06 mm depth
    cells at 64^3). The reference's global min-max scale (tcn.py:111-116)
    worked only because MinkowskiEngine quantized the [-1,1] cube at 1e-3
    (an effective 2000^3 grid); on a dense grid it collapses the +-1 mm
    depth signal into ~2 voxels.
  * "global": the reference behavior, for parity experiments.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.models.heightmap_fpn import HeightmapFPN
from midastouch_tpu.models.params_io import load_variables, save_variables
from midastouch_tpu.models.voxfpn import VoxelFPN, voxelize
from midastouch_tpu.ops import image as image_ops
from midastouch_tpu.utils.misc import DIRS


class TCN:
    def __init__(
        self,
        cfg,
        render_cfg,
        params_path: str | None = None,
        seed: int = 0,
        compute_dtype=jnp.float32,
    ):
        m = cfg.model
        self.arch = str(m.get("model", "VoxelFPN"))
        if self.arch == "MinkFPN":  # reference config name
            self.arch = "VoxelFPN"
        self.num_points = int(m.num_points)
        self.grid_size = int(m.get("grid_size", 64))
        self.batch_size = int(m.batch_size)
        self.output_dim = int(m.output_dim)
        self.normalize_embeddings = True
        self.scale_mode = str(m.get("scale_mode", "sensor_frame"))
        self.pen_max = float(render_cfg.pen.max)
        # yaw/translation-canonical input patches (HeightmapFPN only):
        # codebook poses sample yaw uniformly (pose_from_vertex_normal), so
        # two touches at one surface point differ by an in-plane rotation
        # the training data never teaches invariance to; canonicalization
        # removes the nuisance DOF geometrically (ops/image.py), making
        # codes position-functions and multiplying effective codebook
        # density by the yaw bins it no longer has to cover
        self.canonicalize = bool(m.get("canonicalize", False))
        self.canonical_size = int(m.get("canonical_size", 48))
        self.canonical_crop_px = float(m.get("canonical_crop_px", 192.0))
        # press-depth-invariant band (mm of relief below the deepest contact
        # point; 0 disables) — see ops/image.depth_band for why
        self.canonical_band_mm = float(m.get("canonical_band_mm", 0.7))
        # shear-tilt rectification (remove the best-fit in-support plane
        # ramp before banding) — see ops/image.rectify_tilt for why
        self.canonical_rectify = bool(m.get("canonical_rectify", False))
        # average-pool factor on the canonical patch (1 = off). Measured on
        # the 10k boulder GT bank (PATCH_CODEBOOK_boulder.json): coarse
        # 6x6 relief structure is the nuisance-robust signal — pool 8 took
        # PatchPCA single-touch 0.824 -> 0.789 and top1<5mm 41% -> 50%
        self.canonical_pool = int(m.get("canonical_pool", 1))
        self.pca_whiten_floor = float(m.get("pca_whiten_floor", 0.2))

        self.pixmm = float(render_cfg.pixmm)
        self.cam_dist = float(render_cfg.cam_dist)
        h = int(render_cfg.height)
        w = int(render_cfg.width)
        self.height, self.width = h, w
        self.focal_px = 0.5 * h / np.tan(
            0.5 * np.radians(float(render_cfg.get("yfov_deg", 60.0)))
        )
        self.half_fov_x = (w / 2.0) / self.focal_px * self.cam_dist
        self.half_fov_y = (h / 2.0) / self.focal_px * self.cam_dist

        kwargs = dict(
            planes=tuple(m.planes),
            layers=tuple(m.layers),
            num_top_down=int(m.num_top_down),
            conv0_kernel_size=int(m.conv0_kernel_size),
            feature_size=int(m.feature_size),
            dtype=compute_dtype,
            norm=str(m.get("norm", "group")),
        )
        if self.arch == "PatchPCA":
            # training-free embedder: yaw/translation/press-depth-canonical
            # patch -> soft-whitened PCA projection, fitted self-supervised
            # on the codebook's own renders (fit_patch_pca). The classical
            # baseline the learned TCN must beat; also the no-weights
            # fallback so a fresh checkout can localize.
            self.canonicalize = True
            cs = self.canonical_size // max(self.canonical_pool, 1)
            d = cs * cs * 2
            e = self.output_dim
            if params_path is None:
                params_path = os.path.join(DIRS["weights"], str(m.tcn_weights))
            self._weights_path = params_path
            if os.path.exists(params_path):
                self.variables = load_variables(params_path)
            else:  # random orthonormal projection until fitted
                q, _ = np.linalg.qr(
                    np.random.default_rng(seed).normal(size=(d, e))
                )
                self.variables = {"params": {
                    "mean": jnp.zeros((d,), jnp.float32),
                    "components": jnp.asarray(q, jnp.float32),
                    "fitted": jnp.zeros((), jnp.float32),
                }}
            self.model = None
            self._embed = jax.jit(self._embed_impl)
            return
        if self.arch == "HeightmapFPN":
            self.model = HeightmapFPN(**kwargs)
            if self.canonicalize:
                cs = self.canonical_size // max(self.canonical_pool, 1)
                dummy = jnp.zeros((1, cs, cs, 2))
            else:
                dummy = jnp.zeros((1, h, w, 2))
        else:
            self.model = VoxelFPN(**kwargs)
            g = self.grid_size
            dummy = jnp.zeros((1, g, g, g, 1))

        if params_path is None:
            params_path = os.path.join(DIRS["weights"], str(m.tcn_weights))
        if os.path.exists(params_path):
            self.variables = load_variables(params_path)
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(seed), dummy, train=False
            )

        self._embed = jax.jit(self._embed_impl)

    def save(self, path: str) -> None:
        save_variables(path, self.variables)

    # -- input pipelines -----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def heightmaps_to_clouds(self, key, heightmaps, masks):
        """(B, H, W) heightmaps/masks -> (B, P, 3) scaled clouds
        (tcn.py:78-116)."""

        def one(k, hm, mask):
            pts, valid = image_ops.heightmap_to_cloud(
                hm, mask, self.pixmm, self.cam_dist, self.focal_px
            )
            cloud = image_ops.sample_cloud(k, pts, valid, self.num_points)
            if self.scale_mode == "global":
                return image_ops.scale_to_unit(cloud)
            # sensor-frame fixed affine (module docstring)
            x = cloud[:, 0] / self.half_fov_x
            y = cloud[:, 1] / self.half_fov_y
            z = (cloud[:, 2] + self.cam_dist) / self.pen_max - 1.0
            return jnp.clip(jnp.stack([x, y, z], axis=-1), -1.0, 1.0)

        keys = jax.random.split(key, heightmaps.shape[0])
        return jax.vmap(one)(keys, heightmaps, masks)

    def heightmaps_to_images(self, heightmaps, masks):
        """(B, H, W) -> (B, H', W', 2) [penetration / pen_max, mask];
        H'/W' = sensor resolution, or canonical_size when canonicalizing.
        Jitted per batch shape: the eager vmap was one tunnel round-trip
        per op (~minutes per 10k-image codebook build)."""
        if not hasattr(self, "_h2i"):
            self._h2i = jax.jit(self._heightmaps_to_images_impl)
        return self._h2i(jnp.asarray(heightmaps), jnp.asarray(masks))

    def _canonical_prep(self, heightmaps, masks):
        """Shared pre-canonicalization pipeline (rectify + depth band) —
        the SAME preprocessing must feed both the canonical patches and
        the canonical yaw angles (ops/image.canonical_angle), or the
        stored angle would describe a different image than the patch."""
        from midastouch_tpu.ops import image as image_ops

        hm32 = heightmaps.astype(jnp.float32)
        if self.canonical_rectify:
            hm32, masks = jax.vmap(image_ops.rectify_tilt)(hm32, masks)
        if self.canonical_band_mm > 0:
            band_px = self.canonical_band_mm / self.pixmm
            hm32, masks = jax.vmap(
                lambda h, m: image_ops.depth_band(h, m, band_px=band_px)
            )(hm32, masks)
            scale = 1.0 / band_px  # band patch -> [0, 1]
        else:
            scale = (self.pixmm / 1000.0) / self.pen_max
        return hm32, masks, scale

    def _canonical_angles_impl(self, heightmaps, masks):
        """(B, H, W) heightmaps/masks -> (B,) canonical yaw angles (rad)."""
        from midastouch_tpu.ops import image as image_ops

        hm32, m, _ = self._canonical_prep(heightmaps, masks)
        return jax.vmap(image_ops.canonical_angle)(hm32, m)

    def canonical_angles(self, heightmaps, masks):
        if not hasattr(self, "_angles_fn"):
            self._angles_fn = jax.jit(self._canonical_angles_impl)
        return self._angles_fn(jnp.asarray(heightmaps), jnp.asarray(masks))

    def _heightmaps_to_images_impl(self, heightmaps, masks):
        if self.canonicalize:
            from midastouch_tpu.ops import image as image_ops

            cs, crop = self.canonical_size, self.canonical_crop_px
            hm32, masks, scale = self._canonical_prep(heightmaps, masks)
            patch = jax.vmap(
                lambda h, m: image_ops.canonicalize_patch(
                    h, m, out_h=cs, out_w=cs, crop_px=crop
                )
            )(hm32, masks)
            pen = patch * scale
            m = (patch > 1e-3).astype(jnp.float32)
            out = jnp.stack([jnp.clip(pen, 0.0, 2.0), m], axis=-1)
            p = self.canonical_pool
            if p > 1:
                b, hh, ww, c = out.shape
                out = out.reshape(b, hh // p, p, ww // p, p, c).mean((2, 4))
            return out
        pen = heightmaps * (self.pixmm / 1000.0) / self.pen_max
        m = masks.astype(jnp.float32)
        return jnp.stack([jnp.clip(pen, 0.0, 2.0) * m, m], axis=-1)

    # -- embedding ------------------------------------------------------------

    def _embed_impl(self, variables, inputs):
        if self.arch == "PatchPCA":
            p = variables["params"]
            x = inputs.reshape(inputs.shape[0], -1)
            emb = (x - p["mean"]) @ p["components"]
            return emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
        if self.arch == "HeightmapFPN":
            emb = self.model.apply(variables, inputs, train=False)
        else:
            occ = voxelize(inputs, self.grid_size)
            emb = self.model.apply(variables, occ, train=False)
        if self.normalize_embeddings:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
        return emb

    def clouds_to_codes(self, clouds: jax.Array) -> jax.Array:
        return self._embed(self.variables, clouds)

    @property
    def is_fitted(self) -> bool:
        """PatchPCA: whether a projection has been fitted (vs random init)."""
        if self.arch != "PatchPCA":
            return True
        return float(self.variables["params"].get("fitted", 0.0)) > 0.0

    def fit_patch_pca(
        self,
        inputs: np.ndarray,  # (N, cs, cs, 2) canonical model inputs
        whiten_floor: float | None = None,
        max_rows: int = 3072,
        seed: int = 0,
        save: bool = True,
    ) -> None:
        """Fit the PatchPCA projection: soft-whitened top-`output_dim`
        principal directions of the canonical patches. Soft whitening
        (scale 1/max(s_i, floor*s_0)) equalizes discriminative modes
        without exploding the noise floor the way full whitening does.
        floor=0.2 measured best on the 10k boulder bank (0.766 vs 0.789
        @0.05 and 0.794 unwhitened, /tmp scan recorded in RESULTS.md)."""
        assert self.arch == "PatchPCA"
        if whiten_floor is None:
            whiten_floor = self.pca_whiten_floor
        x = np.asarray(inputs, np.float32).reshape(len(inputs), -1)
        if len(x) > max_rows:
            sel = np.random.default_rng(seed).choice(
                len(x), max_rows, replace=False
            )
            x = x[sel]
        mean = x.mean(0)
        xc = x - mean
        _, s, vt = np.linalg.svd(xc, full_matrices=False)
        e = self.output_dim
        s_e, v_e = s[:e], vt[:e]
        scale = 1.0 / np.maximum(s_e, whiten_floor * max(s_e[0], 1e-12))
        comps = (v_e * scale[:, None]).T.astype(np.float32)  # (D, E)
        if comps.shape[1] < e:  # fewer samples than dims: pad
            pad = np.zeros((comps.shape[0], e - comps.shape[1]), np.float32)
            comps = np.concatenate([comps, pad], axis=1)
        self.variables = {"params": {
            "mean": jnp.asarray(mean),
            "components": jnp.asarray(comps),
            "fitted": jnp.ones((), jnp.float32),
        }}
        if save and getattr(self, "_weights_path", None):
            os.makedirs(os.path.dirname(self._weights_path), exist_ok=True)
            self.save(self._weights_path)

    def model_inputs(self, key, heightmaps, masks):
        """Backbone-appropriate inputs from heightmaps/masks."""
        if self.arch in ("HeightmapFPN", "PatchPCA"):
            return self.heightmaps_to_images(heightmaps, masks)
        return self.heightmaps_to_clouds(key, heightmaps, masks)

    def cloud_to_tactile_code(
        self, heightmaps, masks, key: jax.Array | None = None
    ) -> jax.Array:
        """Full heightmap(s) -> code(s) path (reference signature takes the
        renderer for unprojection; intrinsics live on this driver here)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        single = jnp.ndim(heightmaps) == 2
        hm = jnp.asarray(heightmaps, dtype=jnp.float32)
        mk = jnp.asarray(masks)
        if single:
            hm, mk = hm[None], mk[None]
        out = []
        for i in range(0, hm.shape[0], self.batch_size):
            kb = jax.random.fold_in(key, i)
            inputs = self.model_inputs(
                kb, hm[i : i + self.batch_size], mk[i : i + self.batch_size]
            )
            out.append(self.clouds_to_codes(inputs))
        emb = jnp.concatenate(out, axis=0)
        return emb[0] if single else emb
