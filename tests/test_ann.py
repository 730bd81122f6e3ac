"""Bucketed ANN: recall and distance-regret gates vs exact brute force."""

import jax.numpy as jnp
import numpy as np

from midastouch_tpu.ops import knn
from midastouch_tpu.ops.ann import build_bucket_index, nn_search_bucketed


def _codebook_keys(rng, m=8000):
    """Realistic key distribution: positions on a sphere surface (0.99x)
    plus small rotation-log components (0.01x)."""
    p = rng.normal(size=(m, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True) * 0.04 * 0.99
    r = rng.normal(size=(m, 3)) * 0.01 * 2.0
    return np.concatenate([p, r], axis=1).astype(np.float32)


def test_index_covers_all_entries(rng):
    keys = _codebook_keys(rng, 2000)
    idx = build_bucket_index(keys, num_cells=64)
    members = np.asarray(idx.members)
    present = np.unique(members[members < 2000])
    assert len(present) == 2000  # nothing dropped


def test_recall_and_regret(rng):
    keys = _codebook_keys(rng, 8000)
    queries = _codebook_keys(rng, 4000) + rng.normal(
        size=(4000, 6)
    ).astype(np.float32) * 1e-3
    index = build_bucket_index(keys, num_cells=128)

    approx = np.asarray(
        nn_search_bucketed(jnp.asarray(queries), index, top_cells=8, chunk=1024)
    )
    _, exact = knn.nn_search(jnp.asarray(queries), jnp.asarray(keys), backend="xla")
    exact = np.asarray(exact)

    recall = np.mean(approx == exact)
    assert recall > 0.99, f"recall {recall}"

    # where it misses, the returned neighbour must be nearly as close
    d_approx = np.linalg.norm(keys[approx] - queries, axis=1)
    d_exact = np.linalg.norm(keys[exact] - queries, axis=1)
    regret = d_approx - d_exact
    assert np.quantile(regret, 0.999) < 1e-3, f"regret q999 {np.quantile(regret, 0.999)}"


def test_exact_self_queries(rng):
    keys = _codebook_keys(rng, 3000)
    index = build_bucket_index(keys, num_cells=64)
    approx = np.asarray(
        nn_search_bucketed(jnp.asarray(keys[:500]), index, top_cells=2, chunk=512)
    )
    # querying stored keys: distance must be exactly 0 even if a duplicate
    # id is returned
    d = np.linalg.norm(keys[approx] - keys[:500], axis=1)
    assert d.max() < 1e-6


def test_windowed_nn_recall(rng):
    from midastouch_tpu.ops.ann import build_sorted_index, nn_search_windowed

    keys = _codebook_keys(rng, 8000)
    queries = _codebook_keys(rng, 4000) + rng.normal(
        size=(4000, 6)
    ).astype(np.float32) * 1e-3
    index = build_sorted_index(keys, num_cells=256)
    _, exact = knn.nn_search(jnp.asarray(queries), jnp.asarray(keys), backend="xla")
    exact = np.asarray(exact)
    d_e = np.linalg.norm(keys[exact] - queries, axis=1)

    # single-band: measured envelope ~0.93 (curve seams)
    approx1 = np.asarray(
        nn_search_windowed(jnp.asarray(queries), index, window=4096, tile=256,
                           probes=1)
    )
    recall1 = np.mean(approx1 == exact)
    assert recall1 > 0.9, f"single-band recall {recall1}"

    # multi-pass probing (re-sort by each query's k-th cell): recall >0.99
    # at this density, regret negligible
    approx3 = np.asarray(
        nn_search_windowed(jnp.asarray(queries), index, window=4096, tile=256,
                           probes=3)
    )
    recall3 = np.mean(approx3 == exact)
    d_a = np.linalg.norm(keys[approx3] - queries, axis=1)
    assert recall3 > 0.99, f"3-probe recall {recall3}"
    assert recall3 > recall1
    assert np.mean(d_a - d_e) < 5e-5, f"3-probe mean regret {np.mean(d_a - d_e)}"


def test_blocked_nn_recall(rng):
    from midastouch_tpu.ops.ann import build_blocked_index, nn_search_blocked

    keys = _codebook_keys(rng, 8000)
    queries = _codebook_keys(rng, 4000) + rng.normal(
        size=(4000, 6)
    ).astype(np.float32) * 1e-3
    index = build_blocked_index(keys, num_cells=256, block=1024, probes=6)
    _, exact = knn.nn_search(jnp.asarray(queries), jnp.asarray(keys), backend="xla")
    exact = np.asarray(exact)
    d_e = np.linalg.norm(keys[exact] - queries, axis=1)

    approx3 = np.asarray(
        nn_search_blocked(jnp.asarray(queries), index, tile=256, probes=3)
    )
    recall3 = np.mean(approx3 == exact)
    assert recall3 > 0.9, f"3-slab recall {recall3}"

    approx6 = np.asarray(
        nn_search_blocked(jnp.asarray(queries), index, tile=256, probes=6)
    )
    recall6 = np.mean(approx6 == exact)
    d_a = np.linalg.norm(keys[approx6] - queries, axis=1)
    assert recall6 > 0.98, f"6-slab recall {recall6}"
    assert recall6 >= recall3
    assert np.mean(d_a - d_e) < 5e-5, f"6-slab mean regret {np.mean(d_a - d_e)}"


def test_blocked_self_queries(rng):
    """Stored keys must come back at distance 0, incl. tiny codebooks
    where the table is a single partial slab."""
    from midastouch_tpu.ops.ann import build_blocked_index, nn_search_blocked

    for m, blk in ((3000, 1024), (700, 1024), (120, 64)):
        keys = _codebook_keys(rng, m)
        index = build_blocked_index(keys, num_cells=64, block=blk, probes=3)
        got = np.asarray(
            nn_search_blocked(jnp.asarray(keys[:256]), index, tile=128)
        )
        d = np.linalg.norm(keys[got] - keys[:256], axis=1)
        assert d.max() < 1e-6, f"m={m} blk={blk} max d {d.max()}"


def test_hilbert_order_unit_steps():
    """Defining property of the Hilbert curve: consecutive ranks on a dense
    grid are spatially adjacent (unit steps) — Morton order is not."""
    from midastouch_tpu.ops.ann import _hilbert_order

    g = np.stack(
        np.meshgrid(*[np.arange(8)] * 3, indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float32)
    o = _hilbert_order(g, bits=3)
    steps = np.linalg.norm(np.diff(g[o], axis=0), axis=1)
    assert steps.max() == 1.0
