"""Clustering semantics validation against sklearn DBSCAN (the reference's
clusterer, particle_filter.py:208-228: eps=1e-2, min_samples=20% of the
population, euclidean positions).

The framework clusters a bounded subsample on device and broadcasts labels
by nearest neighbour (ops/cluster.py). These tests check that this matches
full-population sklearn DBSCAN on realistic multimodal particle
distributions (adjusted Rand index >= 0.9), and that label quality is
stable in the subsample size.
"""

import numpy as np
import pytest
from sklearn.cluster import DBSCAN
from sklearn.metrics import adjusted_rand_score

from midastouch_tpu.ops.cluster import cluster_positions

EPS = 1e-2  # reference eps (m)
FRAC = 0.2  # reference min_samples fraction


def _blobs(rng, n, centers, weights, sigma=3e-3, noise_frac=0.0):
    """Multimodal particle cloud: Gaussian blobs + uniform stray noise."""
    weights = np.asarray(weights, np.float64)
    counts = (weights / weights.sum() * n * (1 - noise_frac)).astype(int)
    pts = [
        rng.normal(c, sigma, size=(k, 3)).astype(np.float32)
        for c, k in zip(centers, counts)
    ]
    n_noise = n - sum(counts)
    if n_noise:
        lo = np.min(centers, axis=0) - 0.05
        hi = np.max(centers, axis=0) + 0.05
        pts.append(rng.uniform(lo, hi, size=(n_noise, 3)).astype(np.float32))
    out = np.concatenate(pts)
    return out[rng.permutation(len(out))]


def _sklearn_labels(pts):
    return DBSCAN(eps=EPS, min_samples=max(int(len(pts) * FRAC), 1)).fit(
        pts
    ).labels_


@pytest.mark.parametrize(
    "centers,weights,noise_frac",
    [
        # bimodal: the canonical aliased-localization posterior
        ([(0, 0, 0), (0.05, 0, 0)], [0.6, 0.4], 0.0),
        # trimodal with stray particles
        ([(0, 0, 0), (0.05, 0, 0), (0, 0.06, 0.02)], [0.4, 0.35, 0.25], 0.04),
        # unimodal + wide stray cloud (post-convergence shape)
        ([(0.02, 0.01, 0)], [1.0], 0.08),
    ],
)
def test_subsampled_dbscan_matches_sklearn_full_population(
    rng, centers, weights, noise_frac
):
    pts = _blobs(rng, 12_000, centers, weights, noise_frac=noise_frac)
    ref = _sklearn_labels(pts)
    got = np.asarray(
        cluster_positions(pts, EPS, FRAC, max_points=2048, backend="xla")
    )
    ari = adjusted_rand_score(ref, got)
    assert ari >= 0.9, f"ARI {ari:.3f} vs sklearn on {len(centers)} blobs"
    # cluster COUNTS drive annealing — they must agree too (noise label -1
    # is its own group in both implementations)
    n_ref = len(set(ref[ref >= 0]))
    n_got = len(set(got[got >= 0].tolist()))
    assert n_got == n_ref


def test_subsample_size_stability_at_production_scale(rng):
    """50k particles (production capacity): labels from the default 2048-pt
    subsample agree with an 8192-pt subsample — the approximation is
    converged in the subsample size, so the 2048 default is safe."""
    pts = _blobs(
        rng, 50_000, [(0, 0, 0), (0.05, 0, 0), (0.03, 0.05, 0)],
        [0.5, 0.3, 0.2], noise_frac=0.05,
    )
    a = np.asarray(cluster_positions(pts, EPS, FRAC, max_points=2048, backend="xla"))
    b = np.asarray(cluster_positions(pts, EPS, FRAC, max_points=8192, backend="xla"))
    ari = adjusted_rand_score(a, b)
    assert ari >= 0.95, f"subsample-size instability: ARI {ari:.3f}"


def test_sub_threshold_blob_is_noise_both_ways(rng):
    """A mode holding <20% of the mass is below min_samples: both sklearn
    and the on-device path must mark it noise, not a cluster."""
    pts = _blobs(rng, 12_000, [(0, 0, 0), (0.06, 0, 0)], [0.9, 0.1])
    ref = _sklearn_labels(pts)
    got = np.asarray(
        cluster_positions(pts, EPS, FRAC, max_points=2048, backend="xla")
    )
    assert len(set(ref[ref >= 0])) == 1
    assert len(set(got[got >= 0].tolist())) == 1
    assert adjusted_rand_score(ref, got) >= 0.9
