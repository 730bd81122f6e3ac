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
