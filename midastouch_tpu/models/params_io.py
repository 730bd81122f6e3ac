"""Flat .npz persistence for Flax variable collections (weights story).

The reference ships torch .pth.tar checkpoints; this framework stores
variables as a flat npz of '{collection}/{path/to/leaf}' arrays — readable
anywhere, no pickle."""

from __future__ import annotations

import numpy as np
from flax import traverse_util


_META_PREFIX = "__meta__/"


def save_variables(path: str, variables: dict, meta: dict | None = None) -> None:
    """meta: optional flat str->str dict pinned to the artifact (e.g. the
    input normalization the weights were trained with) — stored as
    `__meta__/<key>` string arrays so the weight file, not the sensor-path
    config, is the source of truth for training-time preprocessing."""
    flat = {}
    for col, tree in variables.items():
        for keys, leaf in traverse_util.flatten_dict(tree).items():
            flat[col + "/" + "/".join(keys)] = np.asarray(leaf)
    for k, v in (meta or {}).items():
        flat[_META_PREFIX + k] = np.asarray(str(v))
    np.savez_compressed(path, **flat)


def load_variables(path: str, return_meta: bool = False):
    import jax.numpy as jnp

    flat = np.load(path)
    out: dict = {}
    meta: dict = {}
    for name in flat.files:
        if name.startswith(_META_PREFIX):
            meta[name[len(_META_PREFIX):]] = str(flat[name])
            continue
        col, rest = name.split("/", 1)
        out.setdefault(col, {})[tuple(rest.split("/"))] = jnp.asarray(flat[name])
    variables = {
        col: traverse_util.unflatten_dict(tree) for col, tree in out.items()
    }
    return (variables, meta) if return_meta else variables
