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


def build_codebook(
    cfg,
    obj_model: str | None = None,
    use_gt_heightmaps: bool = False,
    seed: int = 0,
    save: bool = True,
) -> Codebook:
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
    for i in range(0, num_samples, batch):
        sl = slice(i, min(i + batch, num_samples))
        hms, masks, rgbs, cams, gels = renderer.render_sensor_poses(poses[sl])
        gelposes[sl], camposes[sl] = gels, cams

        if not use_gt_heightmaps:
            est_h = tdn.images2heightmaps(rgbs * 255.0)
            est_m = tdn.heightmaps2masks(est_h)
            hms, masks = np.asarray(est_h), np.asarray(est_m)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        if tcn.arch == "PatchPCA":
            # embed after the loop: the projection is fitted on these very
            # patches (self-supervised — no separate training run)
            pca_inputs.append(np.asarray(tcn.model_inputs(
                key, jnp.asarray(hms, jnp.float32), jnp.asarray(masks > 0)
            )))
        else:
            embeddings[sl] = np.asarray(
                tcn.cloud_to_tactile_code(hms, masks, key=key)
            )
        done = sl.stop
        rate = done / (time.perf_counter() - t0)
        print(f"\r{done}/{num_samples} ({rate:.1f} poses/s)", end="", flush=True)
    print()

    if tcn.arch == "PatchPCA":
        inputs = np.concatenate(pca_inputs)
        if not tcn.is_fitted:
            tcn.fit_patch_pca(inputs, seed=seed)
            print(f"fitted PatchPCA projection -> {tcn._weights_path}")
        for i in range(0, num_samples, batch):
            embeddings[i : i + batch] = np.asarray(
                tcn.clouds_to_codes(jnp.asarray(inputs[i : i + batch]))
            )

    cb = Codebook.from_poses(gelposes, camposes, embeddings)
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
