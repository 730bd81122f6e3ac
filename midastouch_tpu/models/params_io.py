"""Flat .npz persistence for Flax variable collections (weights story).

The reference ships torch .pth.tar checkpoints; this framework stores
variables as a flat npz of '{collection}/{path/to/leaf}' arrays — readable
anywhere, no pickle."""

from __future__ import annotations

import numpy as np
from flax import traverse_util


def save_variables(path: str, variables: dict) -> None:
    flat = {}
    for col, tree in variables.items():
        for keys, leaf in traverse_util.flatten_dict(tree).items():
            flat[col + "/" + "/".join(keys)] = np.asarray(leaf)
    np.savez_compressed(path, **flat)


def load_variables(path: str) -> dict:
    import jax.numpy as jnp

    flat = np.load(path)
    out: dict = {}
    for name in flat.files:
        col, rest = name.split("/", 1)
        out.setdefault(col, {})[tuple(rest.split("/"))] = jnp.asarray(flat[name])
    return {col: traverse_util.unflatten_dict(tree) for col, tree in out.items()}
