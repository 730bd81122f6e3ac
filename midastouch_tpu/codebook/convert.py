"""Reference codebook ingestion: `codebook.pkl` (pickled tactile_tree)
-> this framework's npz Codebook.

The reference persists codebooks as dill/pickle dumps of a live
`tactile_tree` torch nn.Module holding poses (M,4,4), cam_poses (M,4,4),
embeddings (M,E) and a fitted pynanoflann KDTree
(tactile_tree/tactile_tree.py:13-41, build_codebook.py:135-137). Loading
one normally requires the `midastouch` package AND `pynanoflann` to be
importable — neither exists here, so `_PermissiveUnpickler` substitutes
opaque stand-ins for any class the environment cannot import (the KD-tree
is rebuilt on our side anyway; only the three tensors matter).

CLI dry run + round-trip test: tests/test_codebook.py
(`test_reference_pickle_roundtrip`) constructs a byte-identical-layout
pickle under the reference's module path and converts it.

Usage:
    python -m midastouch_tpu.codebook.convert ref_codebook.pkl out.npz
"""

from __future__ import annotations

import io
import pickle
import sys

import numpy as np

from midastouch_tpu.codebook.codebook import Codebook


class _Opaque:
    """Stand-in for unimportable classes inside reference pickles
    (pynanoflann.KDTree, the tactile_tree class itself). Absorbs any
    construction/state protocol pickle throws at it."""

    def __init__(self, *a, **kw):
        pass

    def __call__(self, *a, **kw):  # classes used as factories
        return _Opaque()

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)

    def __reduce_ex__(self, protocol):  # keep converted objects dumpable
        return (_Opaque, ())


class _PermissiveUnpickler(pickle.Unpickler):
    """Resolve classes normally when possible; anything unimportable
    (midastouch.*, pynanoflann, dill-internal helpers) becomes _Opaque.
    torch tensor rebuilds resolve normally (torch is available)."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _Opaque


def _to_numpy(x) -> np.ndarray:
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def load_reference_codebook(path: str) -> Codebook:
    """Load a reference `codebook.pkl` and return a native Codebook (keys
    + canonical angles are (re)derived on our side; the reference stores
    neither — its KD-tree is refit at load, tactile_tree.py:34-41)."""
    with open(path, "rb") as fh:
        data = fh.read()
    obj = _PermissiveUnpickler(io.BytesIO(data)).load()
    state = obj if isinstance(obj, dict) else obj.__dict__
    # nn.Module instances place tensors either directly in __dict__ or in
    # the module's buffer/parameter registries depending on torch version
    def find(name):
        if name in state:
            return state[name]
        for reg in ("_buffers", "_parameters"):
            if isinstance(state.get(reg), dict) and name in state[reg]:
                return state[reg][name]
        raise KeyError(
            f"{name!r} not found in pickle (fields: {sorted(state)[:12]})"
        )

    poses = _to_numpy(find("poses")).astype(np.float32)
    cam_poses = _to_numpy(find("cam_poses")).astype(np.float32)
    embeddings = _to_numpy(find("embeddings")).astype(np.float32)
    if poses.ndim != 3 or poses.shape[1:] != (4, 4):
        raise ValueError(f"poses shape {poses.shape} != (M, 4, 4)")
    if len(cam_poses) != len(poses) or len(embeddings) != len(poses):
        raise ValueError(
            f"row mismatch: poses {len(poses)}, cam {len(cam_poses)}, "
            f"emb {len(embeddings)}"
        )
    return Codebook.from_poses(poses, cam_poses, embeddings)


def convert_reference_codebook(pkl_path: str, npz_path: str) -> Codebook:
    cb = load_reference_codebook(pkl_path)
    cb.save(npz_path)
    return cb


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(1)
    cb = convert_reference_codebook(argv[0], argv[1])
    print(f"converted {argv[0]} ({len(cb)} entries) -> {argv[1]}")


if __name__ == "__main__":
    main()
