"""Tests for the brute-force NN kernels vs scipy/sklearn golden outputs."""

import jax.numpy as jnp
import numpy as np
from sklearn.neighbors import KDTree

from midastouch_tpu.ops import knn


def test_nn_xla_vs_sklearn(rng):
    q = rng.normal(size=(513, 6)).astype(np.float32)
    p = rng.normal(size=(1000, 6)).astype(np.float32)
    dist, idx = knn.nn_search(jnp.asarray(q), jnp.asarray(p), backend="xla")
    tree = KDTree(p)
    d_ref, i_ref = tree.query(q, k=1)
    np.testing.assert_array_equal(np.asarray(idx), i_ref[:, 0])
    np.testing.assert_allclose(np.sqrt(np.asarray(dist)), d_ref[:, 0], atol=1e-3)


def test_nn_pallas_interpret_matches_xla(rng):
    # Run the pallas kernel in interpreter mode on CPU and compare.
    import midastouch_tpu.ops.knn as k

    q = rng.normal(size=(300, 6)).astype(np.float32)
    p = rng.normal(size=(5000, 6)).astype(np.float32)
    d_ref, i_ref = k.nn_search(jnp.asarray(q), jnp.asarray(p), backend="xla")

    import jax
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
        k._nn_pallas._clear_cache()
        d, i = k._nn_pallas(jnp.asarray(q), jnp.asarray(p))
    finally:
        pl.pallas_call = orig
        k._nn_pallas._clear_cache()
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-3)


def test_min_distance(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    p = rng.normal(size=(512, 3)).astype(np.float32)
    d = knn.min_distance(jnp.asarray(q), jnp.asarray(p), backend="xla")
    tree = KDTree(p)
    d_ref, _ = tree.query(q, k=1)
    np.testing.assert_allclose(np.asarray(d), d_ref[:, 0], atol=1e-4)


def test_knn_search(rng):
    q = rng.normal(size=(100, 6)).astype(np.float32)
    p = rng.normal(size=(2000, 6)).astype(np.float32)
    dist, idx = knn.knn_search(jnp.asarray(q), jnp.asarray(p), k=25)
    tree = KDTree(p)
    d_ref, i_ref = tree.query(q, k=25)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)
    np.testing.assert_allclose(np.sqrt(np.asarray(dist)), d_ref, atol=1e-3)


def test_cosine_similarity(rng):
    q = rng.normal(size=(256,)).astype(np.float32)
    t = rng.normal(size=(1000, 256)).astype(np.float32)
    sims = np.asarray(knn.cosine_similarity(jnp.asarray(q), jnp.asarray(t)))
    ref = (t / np.linalg.norm(t, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    np.testing.assert_allclose(sims, ref, atol=1e-5)


def test_cosine_topk(rng):
    q = rng.normal(size=(64,)).astype(np.float32)
    t = rng.normal(size=(500, 64)).astype(np.float32)
    vals, idx = knn.cosine_topk(jnp.asarray(q), jnp.asarray(t), k=10)
    sims = np.asarray(knn.cosine_similarity(jnp.asarray(q), jnp.asarray(t)))
    order = np.argsort(-sims)[:10]
    np.testing.assert_array_equal(np.asarray(idx), order)


def test_nn_identical_points():
    # query exactly on a point: distance 0, correct index
    p = np.arange(30, dtype=np.float32).reshape(10, 3)
    q = p[[3, 7]]
    dist, idx = knn.nn_search(jnp.asarray(q), jnp.asarray(p), backend="xla")
    np.testing.assert_array_equal(np.asarray(idx), [3, 7])
    np.testing.assert_allclose(np.asarray(dist), 0.0, atol=1e-4)
