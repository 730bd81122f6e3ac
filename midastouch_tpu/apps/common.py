"""Shared app plumbing: mesh resolution, renderer/net construction."""

from __future__ import annotations

import os

import jax.numpy as jnp

from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import Mesh, load_mesh
from midastouch_tpu.models.tcn import TCN
from midastouch_tpu.models.tdn import TDN
from midastouch_tpu.render.digit import DigitRenderer, RenderConfig
from midastouch_tpu.utils import objects
from midastouch_tpu.utils.misc import DIRS


def resolve_mesh(obj_model: str) -> Mesh:
    """Procedural objects come from geometry/procedural.py; downloaded
    assets live under DIRS['obj_models']/<obj>/nontextured.{npz,stl,obj}
    (reference path scheme, filter.py:81)."""
    if objects.is_procedural(obj_model):
        return procedural.get_test_mesh(obj_model)
    base = os.path.join(DIRS["obj_models"], obj_model)
    for name in ("nontextured.npz", "nontextured.stl", "nontextured.obj", "nontextured_decimated.stl"):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return load_mesh(p)
    raise FileNotFoundError(
        f"no mesh for {obj_model!r} under {base}; procedural objects: "
        f"{objects.procedural_models}"
    )


def make_renderer(cfg, mesh: Mesh, randomize: bool = False, seed: int = 0):
    rc = RenderConfig.from_cfg(
        cfg.tdn.render, max_faces=int(cfg.tpu.render_max_faces)
    )
    return DigitRenderer(
        rc, mesh, randomize=randomize, seed=seed,
        backend=str(cfg.tpu.get("render_backend", "auto")),
    )


def compute_dtype(cfg):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(cfg.tpu.compute_dtype)
    ]


def make_nets(cfg, bg, real: bool = False):
    dtype = compute_dtype(cfg)
    tdn = TDN(cfg.tdn, bg=bg, real=real, compute_dtype=dtype)
    tcn = TCN(cfg.tcn, cfg.tdn.render, compute_dtype=dtype)
    return tdn, tcn


def ann_kwargs(cfg, codebook) -> dict:
    """FilterStep kwargs for the codebook-NN search strategy, from the
    tpu.codebook_ann / ann_top_cells / ann_window / ann_probes knobs,
    plus the drift-gate source (tpu.drift_from_codebook)."""
    kind = cfg.tpu.get("codebook_ann")
    kw = {
        "drift_from_codebook": bool(cfg.tpu.get("drift_from_codebook", True)),
        "yaw_kappa": float(cfg.tpu.get("yaw_kappa", 0.0)),
        "yaw_sign": float(cfg.tpu.get("yaw_sign", 1.0)),
    }
    if not kind or kind == "false":
        kw["ann_index"] = None
        return kw
    kw.update(
        ann_index=codebook.build_ann_index(
            kind=kind if isinstance(kind, str) else "windowed"
        ),
        ann_top_cells=int(cfg.tpu.ann_top_cells),
        ann_window=int(cfg.tpu.ann_window),
        ann_probes=int(cfg.tpu.ann_probes),
    )
    return kw


def prepare_codebook(cfg, codebook):
    """Apply config-level codebook transforms (bf16 embedding table)."""
    if bool(cfg.tpu.get("embeddings_bf16", False)):
        codebook = codebook.astype_embeddings(jnp.bfloat16)
    return codebook


def codebook_path(obj_model: str) -> str:
    return os.path.join(DIRS["trees"], obj_model, "codebook.npz")


def small_parts(obj_model: str) -> bool:
    return objects.is_small_part(obj_model)
