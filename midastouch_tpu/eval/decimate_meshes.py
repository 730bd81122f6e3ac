"""Decimate object meshes for visualization (reference
eval/decimate_meshes.py:1-26 — 10x quadric decimation via pyvista; here
vertex-clustering decimation from geometry.mesh).

Run:
    python -m midastouch_tpu.eval.decimate_meshes 004_sugar_box ...
"""

from __future__ import annotations

import os
import sys

from midastouch_tpu.geometry.mesh import decimate, load_mesh, save_mesh
from midastouch_tpu.utils.misc import DIRS


def decimate_object(obj_model: str, factor: int = 10) -> str | None:
    base = os.path.join(DIRS["obj_models"], obj_model)
    src = os.path.join(base, "nontextured.stl")
    if not os.path.exists(src):
        src = os.path.join(base, "nontextured.npz")
    if not os.path.exists(src):
        print(f"skip {obj_model}: no mesh")
        return None
    mesh = load_mesh(src)
    out = decimate(mesh, max(len(mesh.faces) // factor, 64))
    dst = os.path.join(base, "nontextured_decimated.npz")
    save_mesh(dst, out)
    print(f"{obj_model}: {len(mesh.faces)} -> {len(out.faces)} faces -> {dst}")
    return dst


if __name__ == "__main__":
    for obj in sys.argv[1:]:
        decimate_object(obj)
