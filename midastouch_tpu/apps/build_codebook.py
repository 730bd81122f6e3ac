"""Codebook builder (reference: tactile_tree/build_codebook.py:32-138).

Samples `expt.codebook_size` poses on the mesh, renders each touch, runs
the TDN->mask->TCN sensing stack (or the GT heightmap path with
`use_gt_heightmaps=true`), and writes the codebook npz.

Run:
    python -m midastouch_tpu.apps.build_codebook expt.obj_model=sphere \
        expt.codebook_size=5000
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.apps import common
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.utils.config import compose


def _inputs_cache_path(obj_model: str) -> str:
    return os.path.join(
        os.path.dirname(common.codebook_path(obj_model)), "inputs_cache.npz"
    )


def _canonical_params(m) -> tuple:
    return (
        int(m.canonical_size),
        float(m.canonical_crop_px),
        float(m.get("canonical_band_mm", 0.7)),
        float(bool(m.get("canonical_rectify", False))),
        float(m.get("canonical_pool", 1)),
    )


def _stack_fingerprint(cfg, use_gt_heightmaps: bool) -> str:
    """Hash of everything in FRONT of the cached TCN inputs: the TDN weight
    file bytes, the render config, and the GT/estimated path choice. A
    stale cache (TDN retrained, lighting changed, pen/pixmm edited) would
    otherwise silently produce a codebook that disagrees with the live
    sensing stack."""
    import hashlib

    from midastouch_tpu.utils.misc import DIRS

    r = cfg.tdn.render
    h = hashlib.sha256()
    h.update(repr((
        float(r.pixmm), float(r.cam_dist), int(r.height), int(r.width),
        float(r.pen.min), float(r.pen.max), float(r.get("shear_mag", 5.0)),
        float(r.get("yfov_deg", 60.0)), bool(use_gt_heightmaps),
        str(cfg.tdn.fcrn.sim.get("input_norm", "minmax")),
    )).encode())
    if not use_gt_heightmaps:
        wpath = os.path.join(DIRS["weights"], str(cfg.tdn.tdn_weights))
        if os.path.exists(wpath):
            with open(wpath, "rb") as fh:
                h.update(fh.read())
        else:
            h.update(b"no-tdn-weights")
    return h.hexdigest()


def reembed_codebook(cfg, obj_model: str | None = None, save: bool = True):
    """Rebuild a codebook's EMBEDDINGS from the cached canonical model
    inputs written by build_codebook — seconds instead of the ~hour of
    re-rendering + TDN, for iterating on TCN weights. The cache is only
    valid while the sensing stack in front of the TCN inputs (renderer,
    TDN weights, canonical params) is unchanged; cache metadata guards the
    canonical params."""
    import jax.numpy as jnp

    obj_model = obj_model or str(cfg.expt.obj_model)
    path = _inputs_cache_path(obj_model)
    z = np.load(path)
    m = cfg.tcn.model
    meta = _canonical_params(m)
    cached = tuple(z["canonical_params"])
    if len(cached) < len(meta):  # pre-rectify caches: rectify was off
        cached = cached + (0.0,) * (len(meta) - len(cached))
    if tuple(np.round(cached, 6)) != tuple(np.round(meta, 6)):
        raise ValueError(
            f"inputs cache {path} was built with canonical params {cached}, "
            f"config says {meta}; rebuild the codebook"
        )
    if "stack_fingerprint" in z:
        gt = bool(z["use_gt_heightmaps"]) if "use_gt_heightmaps" in z else False
        want = str(z["stack_fingerprint"])
        have = _stack_fingerprint(cfg, use_gt_heightmaps=gt)
        if want != have:
            raise ValueError(
                f"inputs cache {path} was built with a different sensing "
                "stack (TDN weights or render config changed); rebuild the "
                "codebook"
            )
    from midastouch_tpu.models.tcn import TCN

    tcn = TCN(cfg.tcn, cfg.tdn.render, compute_dtype=common.compute_dtype(cfg))
    inputs = z["inputs"].astype(np.float32)
    batch = int(m.batch_size)
    embeddings = np.zeros((len(inputs), int(m.output_dim)), np.float32)
    if tcn.arch == "PatchPCA" and not tcn.is_fitted:
        tcn.fit_patch_pca(inputs)
    for i in range(0, len(inputs), batch):
        embeddings[i : i + batch] = np.asarray(
            tcn.clouds_to_codes(jnp.asarray(inputs[i : i + batch]))
        )
    cb = Codebook.from_poses(
        z["gelposes"], z["camposes"], embeddings,
        canon_angle=z["canon_angles"] if "canon_angles" in z else None,
    )
    if save:
        cb.save(common.codebook_path(obj_model))
    return cb


def _fused_sensing_inputs(renderer, tdn, tcn, use_gt_heightmaps: bool):
    """One jitted chunk program: render -> (TDN heightmap -> mask, or the
    GT render heightmap/mask) -> canonical TCN model inputs.

    Keeps the 240x320 rgb/heightmap stacks on-device; only the canonical
    patches (few KB per chunk) and camera poses are returned. Numerically
    identical to the unfused render_sensor_poses + images2heightmaps +
    heightmaps2masks + model_inputs chain (tests/test_apps.py)."""
    from midastouch_tpu.ops import image as image_ops

    def fused(tdn_vars, poses, press, lights, angles, colors, bg_ids):
        rgb, hm, mask, _press_eff, cam = jax.lax.map(
            lambda a: renderer._render_impl(*a),
            (poses, press, lights, angles, colors, bg_ids),
        )
        if not use_gt_heightmaps:
            imgs = jax.vmap(
                lambda im: image_ops.normalize_image(im, tdn.input_norm)
            )(rgb * 255.0)
            hm = tdn.model.apply(tdn_vars, imgs, train=False)
            mask = jax.vmap(
                lambda h: image_ops.heightmap_to_mask(
                    h, tdn.bg, tdn.b, tdn.r, tdn.clip, False
                )
            )(hm)
        hm32 = jnp.asarray(hm, jnp.float32)
        m = jnp.asarray(mask) > 0
        inputs = tcn._heightmaps_to_images_impl(hm32, m)
        angles = tcn._canonical_angles_impl(hm32, m)
        return inputs, angles, cam

    return jax.jit(fused)


def build_codebook(
    cfg,
    obj_model: str | None = None,
    use_gt_heightmaps: bool = False,
    seed: int = 0,
    save: bool = True,
    refit_pca: bool = True,
) -> Codebook:
    """`refit_pca`: a full build always refits the PatchPCA projection on
    THIS codebook's canonical inputs (and saves it, so the live filter
    loads the same projection) — a stale tcn_pca_weights.npz from a
    previous object would otherwise be silently reused. Pass False for the
    shared-TCN multi-object flow, which fits once on pooled inputs and
    re-embeds every codebook afterwards (scripts/multiobj_pipeline.py)."""
    obj_model = obj_model or str(cfg.expt.obj_model)
    num_samples = int(cfg.expt.codebook_size)
    rng = np.random.default_rng(seed)

    mesh = common.resolve_mesh(obj_model)
    renderer = common.make_renderer(cfg, mesh, randomize=True, seed=seed)
    tdn, tcn = common.make_nets(cfg, bg=renderer.get_background("gel"))

    print(f"object: {obj_model}, codebook size: {num_samples}, gt={use_gt_heightmaps}")
    poses = sample_poses_on_mesh(
        mesh, num_samples, rng, edges=False,
        shear_mag_deg=float(cfg.tdn.render.shear_mag),
    )

    batch = int(cfg.tcn.model.batch_size)
    pca_inputs: list = []
    gelposes = np.zeros((num_samples, 4, 4), np.float32)
    camposes = np.zeros((num_samples, 4, 4), np.float32)
    embeddings = np.zeros((num_samples, int(cfg.tcn.model.output_dim)), np.float32)

    t0 = time.perf_counter()
    use_fused = tcn.arch in ("HeightmapFPN", "PatchPCA") and tcn.canonicalize
    if use_fused:
        # Fused on-device chunk pipeline: render -> (TDN -> mask | GT) ->
        # canonical inputs as ONE jitted program. Only the ~KB canonical
        # patches and the camera poses ever cross the host boundary — the
        # per-batch round trip of 240x320 rgb/heightmap stacks through the
        # TPU tunnel was the build's wall (~2.7 poses/s measured; the
        # compute itself is milliseconds per pose).
        chunk = 64
        press, lights, angles, colors, bg_ids = renderer.sample_render_aux(
            num_samples
        )
        if angles is None:  # non-randomizing renderer: static lighting
            from midastouch_tpu.render.digit import (
                DEFAULT_LIGHT_ANGLES, DEFAULT_LIGHT_RGB)

            angles = np.tile(DEFAULT_LIGHT_ANGLES, (num_samples, 1))
            colors = np.tile(DEFAULT_LIGHT_RGB, (num_samples, 1, 1))
            bg_ids = np.zeros(num_samples, np.int32)
        fused = _fused_sensing_inputs(renderer, tdn, tcn, use_gt_heightmaps)
        arrs = [np.asarray(a) for a in
                (poses, press, lights, angles, colors, bg_ids)]
        pad = (-num_samples) % chunk
        if pad:
            arrs = [np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrs]
        from midastouch_tpu.utils.runtime import retry_transient

        angles_all = np.zeros(num_samples, np.float32)
        for i in range(0, num_samples + pad, chunk):
            inp, ang, cam = retry_transient(
                fused, tdn.variables,
                *(jnp.asarray(a[i : i + chunk]) for a in arrs),
            )
            pca_inputs.append(np.asarray(inp, np.float16))
            sl = slice(i, min(i + chunk, num_samples))
            camposes[sl] = np.asarray(cam)[: sl.stop - sl.start]
            angles_all[sl] = np.asarray(ang)[: sl.stop - sl.start]
            done = sl.stop
            rate = done / (time.perf_counter() - t0)
            print(f"\r{done}/{num_samples} ({rate:.1f} poses/s)",
                  end="", flush=True)
        print()
        gelposes[:] = np.asarray(renderer.cam2gel(jnp.asarray(camposes)))
        inputs_all = np.concatenate(pca_inputs)[:num_samples]
        pca_inputs = [inputs_all]
        if tcn.arch == "PatchPCA":
            pass  # fit + embed handled in the shared canonicalize tail
        else:
            for i in range(0, num_samples, batch):
                embeddings[i : i + batch] = np.asarray(tcn.clouds_to_codes(
                    jnp.asarray(inputs_all[i : i + batch].astype(np.float32))
                ))
    if not use_fused:
        angles_all = np.zeros(num_samples, np.float32)
        for i in range(0, num_samples, batch):
            sl = slice(i, min(i + batch, num_samples))
            hms, masks, rgbs, cams, gels = renderer.render_sensor_poses(poses[sl])
            gelposes[sl], camposes[sl] = gels, cams

            if not use_gt_heightmaps:
                est_h = tdn.images2heightmaps(rgbs * 255.0)
                est_m = tdn.heightmaps2masks(est_h)
                hms, masks = np.asarray(est_h), np.asarray(est_m)
            key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            if tcn.canonicalize:
                angles_all[sl] = np.asarray(tcn.canonical_angles(
                    jnp.asarray(hms, jnp.float32), jnp.asarray(masks > 0)
                ))
                # keep the canonical model inputs: PatchPCA fits on them after
                # the loop, and they are cached to disk so TCN-weight retrains
                # can re-embed in seconds (reembed_codebook) instead of
                # re-rendering the whole codebook
                pca_inputs.append(np.asarray(tcn.model_inputs(
                    key, jnp.asarray(hms, jnp.float32), jnp.asarray(masks > 0)
                ), np.float16))
                if tcn.arch != "PatchPCA":
                    embeddings[sl] = np.asarray(tcn.clouds_to_codes(
                        jnp.asarray(pca_inputs[-1].astype(np.float32))
                    ))
            else:
                embeddings[sl] = np.asarray(
                    tcn.cloud_to_tactile_code(hms, masks, key=key)
                )
            done = sl.stop
            rate = done / (time.perf_counter() - t0)
            print(f"\r{done}/{num_samples} ({rate:.1f} poses/s)", end="", flush=True)
    print()

    if tcn.canonicalize:
        inputs = np.concatenate(pca_inputs)
        if tcn.arch == "PatchPCA":
            if refit_pca or not tcn.is_fitted:
                tcn.fit_patch_pca(inputs.astype(np.float32), seed=seed)
                print(f"fitted PatchPCA projection -> {tcn._weights_path}")
            for i in range(0, num_samples, batch):
                embeddings[i : i + batch] = np.asarray(tcn.clouds_to_codes(
                    jnp.asarray(inputs[i : i + batch].astype(np.float32))
                ))
        if save:
            m = cfg.tcn.model
            cache = _inputs_cache_path(obj_model)
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(
                cache, inputs=inputs, gelposes=gelposes, camposes=camposes,
                canon_angles=angles_all,
                canonical_params=np.asarray(_canonical_params(m), np.float64),
                stack_fingerprint=np.asarray(
                    _stack_fingerprint(cfg, use_gt_heightmaps)
                ),
                use_gt_heightmaps=np.asarray(use_gt_heightmaps),
            )
            print(f"cached canonical inputs -> {cache}")

    cb = Codebook.from_poses(
        gelposes, camposes, embeddings,
        canon_angle=angles_all if tcn.canonicalize else None,
    )
    if save:
        path = common.codebook_path(obj_model)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cb.save(path)
        print(f"saved codebook to {path}")
    return cb


def main(argv=None):
    cfg = compose(argv if argv is not None else sys.argv[1:])
    build_codebook(cfg)


if __name__ == "__main__":
    main()
