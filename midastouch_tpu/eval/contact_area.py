"""Contact/surface-area evals (reference eval/compute_contact_area.py:23-79,
eval/compute_surface_area.py:17-30)."""

from __future__ import annotations

import sys

import numpy as np

from midastouch_tpu.utils import dataio
from midastouch_tpu.utils.config import compose


def average_contact_area(cfg, data_path: str) -> dict:
    """Mean contact-patch area (mm^2) across a log's GT masks."""
    masks = dataio.load_masks(data_path)
    pixmm = float(cfg.tdn.render.pixmm)
    areas = masks.reshape(len(masks), -1).sum(axis=1) * pixmm * pixmm
    return {
        "mean_contact_area_mm2": float(areas.mean()),
        "contact_fraction": float((areas > 0).mean()),
    }


def surface_area_ratio(cfg) -> dict:
    """Object surface area vs sensor gel area — how many touches tile the
    object (compute_surface_area.py:17-30)."""
    from midastouch_tpu.apps import common

    mesh = common.resolve_mesh(str(cfg.expt.obj_model))
    r = cfg.tdn.render
    gel_area = (int(r.width) * float(r.pixmm) / 1000.0) * (
        int(r.height) * float(r.pixmm) / 1000.0
    )
    return {
        "mesh_area_m2": mesh.surface_area,
        "gel_area_m2": gel_area,
        "ratio": mesh.surface_area / gel_area,
    }


def main(argv=None):
    cfg = compose(argv if argv is not None else sys.argv[1:])
    path = dataio.dataset_path(str(cfg.expt.obj_model), cfg.expt.log_id)
    print(average_contact_area(cfg, path))
    print(surface_area_ratio(cfg))


if __name__ == "__main__":
    main()
