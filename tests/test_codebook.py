"""Codebook construction, persistence, queries, and eval metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.codebook import Codebook
from midastouch_tpu.codebook.tools import sanity_check
from midastouch_tpu.eval.single_touch import top_n_error
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.ops import se3


def _make_codebook(rng, m=500, smooth=True):
    mesh = procedural.icosphere(radius=0.04, subdivisions=2)
    poses = sample_poses_on_mesh(mesh, m, rng, edges=False)
    cam = poses.copy()
    cam[:, :3, 3] += cam[:, :3, 2] * 0.022
    if smooth:
        keys = np.asarray(se3.se3_key_from_tf(jnp.asarray(poses.astype(np.float32))))
        w = np.random.default_rng(1).normal(size=(6, 32)) * 100
        emb = np.concatenate([np.sin(keys @ w), np.cos(keys @ w)], axis=1)
    else:
        emb = np.random.default_rng(2).normal(size=(m, 64))
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
    return Codebook.from_poses(poses, cam, emb)


def test_codebook_roundtrip(tmp_path, rng):
    cb = _make_codebook(rng)
    p = str(tmp_path / "cb.npz")
    cb.save(p)
    cb2 = Codebook.load(p)
    assert len(cb2) == len(cb)
    np.testing.assert_allclose(np.asarray(cb2.keys), np.asarray(cb.keys))
    np.testing.assert_allclose(
        np.asarray(cb2.embeddings), np.asarray(cb.embeddings)
    )


def test_codebook_self_query(rng):
    cb = _make_codebook(rng)
    assert sanity_check(cb, n_queries=10)


def test_codebook_nn_returns_nearby_pose(rng):
    cb = _make_codebook(rng, m=800)
    # perturb stored poses slightly: NN should return a nearby entry
    q = cb.q[:50]
    t = cb.t[:50] + 1e-5
    gq, gt, _, _, emb, idx = cb.se3_nn(q, t, backend="xla")
    d = np.linalg.norm(np.asarray(gt) - np.asarray(cb.t[:50]), axis=1)
    assert d.max() < 1e-4


def test_codebook_pytree_jittable(rng):
    cb = _make_codebook(rng, m=100)

    @jax.jit
    def f(codebook, q, t):
        return codebook.se3_nn_idx(q, t, backend="xla")

    idx = f(cb, cb.q[:5], cb.t[:5])
    np.testing.assert_array_equal(np.asarray(idx), np.arange(5))


def test_single_touch_metric_discriminates(rng):
    smooth = _make_codebook(rng, m=600, smooth=True)
    random_cb = _make_codebook(rng, m=600, smooth=False)
    s = top_n_error(smooth, n=10)
    r = top_n_error(random_cb, n=10)
    # smooth embeddings retrieve nearby poses; random retrieval scores ~1
    assert s["median_normalized_error"] < 0.6
    assert 0.7 < r["median_normalized_error"] < 1.4


def test_reference_pickle_roundtrip(rng, tmp_path):
    """Reference-asset ingestion dry run: forge a pickle with the EXACT
    class/module path and field layout of the reference's tactile_tree
    (tactile_tree/tactile_tree.py:13-41 — a torch nn.Module with poses /
    cam_poses / embeddings tensors and a pynanoflann tree), then convert
    it WITHOUT the midastouch/pynanoflann packages installed and check
    query parity against a natively-built Codebook."""
    import pickle
    import sys
    import types

    import torch

    from midastouch_tpu.codebook.convert import (
        convert_reference_codebook,
        load_reference_codebook,
    )

    m = 400
    mesh = procedural.icosphere(radius=0.04, subdivisions=3)
    poses = sample_poses_on_mesh(mesh, m, np.random.default_rng(0), edges=False)
    cam = poses.copy()
    cam[:, :3, 3] += cam[:, :3, 2] * 0.022
    emb = np.random.default_rng(1).normal(size=(m, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    # forge the reference's class under its module path
    class tactile_tree(torch.nn.Module):
        def __init__(self, poses, cam_poses, embeddings):
            super().__init__()
            self.poses = poses
            self.cam_poses = cam_poses
            self.embeddings = embeddings
            self.tree = object.__new__(_FakeKDTree)
            self.tree_size = len(poses)

    class _FakeKDTree:  # stands in for pynanoflann.KDTree
        pass

    fake_mod = types.ModuleType("midastouch.tactile_tree.tactile_tree")
    tactile_tree.__module__ = "midastouch.tactile_tree.tactile_tree"
    tactile_tree.__qualname__ = "tactile_tree"
    _FakeKDTree.__module__ = "pynanoflann"
    _FakeKDTree.__qualname__ = "KDTree"
    fake_mod.tactile_tree = tactile_tree
    fake_pyn = types.ModuleType("pynanoflann")
    fake_pyn.KDTree = _FakeKDTree
    pkg1 = types.ModuleType("midastouch")
    pkg2 = types.ModuleType("midastouch.tactile_tree")
    sys.modules.update({
        "midastouch": pkg1,
        "midastouch.tactile_tree": pkg2,
        "midastouch.tactile_tree.tactile_tree": fake_mod,
        "pynanoflann": fake_pyn,
    })
    try:
        tree = tactile_tree(
            torch.tensor(poses, dtype=torch.float32),
            torch.tensor(cam, dtype=torch.float32),
            torch.tensor(emb, dtype=torch.float32),
        )
        pkl = tmp_path / "codebook.pkl"
        with open(pkl, "wb") as fh:
            pickle.dump(tree, fh)
    finally:
        # the converter must work WITHOUT these modules importable
        for name in ("midastouch", "midastouch.tactile_tree",
                     "midastouch.tactile_tree.tactile_tree", "pynanoflann"):
            sys.modules.pop(name, None)

    npz = str(tmp_path / "codebook.npz")
    cb = convert_reference_codebook(str(pkl), npz)
    assert len(cb) == m

    # parity vs a natively-built codebook from the same arrays
    native = Codebook.from_poses(poses, cam, emb)
    np.testing.assert_allclose(np.asarray(cb.keys), np.asarray(native.keys),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cb.embeddings), np.asarray(native.embeddings), atol=1e-6
    )

    # reload from the saved npz and run a query end-to-end
    cb2 = Codebook.load(npz)
    q, t = cb2.q[:16], cb2.t[:16]
    idx = np.asarray(cb2.se3_nn_idx(q, t, backend="xla"))
    np.testing.assert_array_equal(idx, np.arange(16))

    # load_reference_codebook alone (no npz round trip)
    cb3 = load_reference_codebook(str(pkl))
    np.testing.assert_allclose(np.asarray(cb3.t), poses[:, :3, 3], atol=1e-6)
