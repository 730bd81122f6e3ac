"""TDN evaluation: heightmap RMSE (mm) + contact-mask IoU over a dataset
(reference contrib/tdn_fcrn/test.py:28-127 and tdn.py:218-230).

Run:
    python -m midastouch_tpu.eval.tdn_eval expt.obj_model=sphere
"""

from __future__ import annotations

import sys

import numpy as np

from midastouch_tpu.utils import dataio
from midastouch_tpu.utils.config import compose


def evaluate_tdn(cfg, data_path: str, max_frames: int | None = 200) -> dict:
    from midastouch_tpu.apps import common

    mesh = common.resolve_mesh(str(cfg.expt.obj_model))
    renderer = common.make_renderer(cfg, mesh)
    tdn, _ = common.make_nets(cfg, bg=renderer.get_background("gel"))

    images = dataio.load_images(data_path, max_frames)
    gt_h = dataio.load_heightmaps(data_path, max_frames)
    gt_m = dataio.load_masks(data_path, max_frames)
    pixmm = float(cfg.tdn.render.pixmm)

    rmses, ious = [], []
    for img, h, m in zip(images, gt_h, gt_m):
        est_h = np.asarray(tdn.image2heightmap(img))
        est_m = np.asarray(tdn.heightmap2mask(est_h))
        rmses.append(float(np.sqrt(np.mean((est_h - h) ** 2))) * pixmm)
        inter = np.logical_and(m, est_m).sum()
        union = m.sum() + est_m.sum() - inter
        ious.append(float(inter / union) if union > 0 else 1.0)
    return {
        "heightmap_rmse_mm": float(np.mean(rmses)),
        "contact_mask_iou": float(np.mean(ious)),
        "frames": len(rmses),
    }


def main(argv=None):
    cfg = compose(argv if argv is not None else sys.argv[1:])
    path = dataio.dataset_path(str(cfg.expt.obj_model), cfg.expt.log_id)
    print(evaluate_tdn(cfg, path))


if __name__ == "__main__":
    main()
