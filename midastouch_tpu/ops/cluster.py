"""On-device DBSCAN-equivalent clustering for particle distributions.

The reference calls sklearn DBSCAN on the CPU every 50 filter steps
(particle_filter.py:208-228, eps=1e-2, min_samples=N/5). With min_samples
at 20% of the population there can be at most 5 clusters, so an exact dense
implementation over a bounded subsample is cheap and stays on device:

  1. pairwise sq-distances -> eps-adjacency (n x n bitmap)
  2. core points: neighbour count >= min_samples
  3. connected components of the core-core graph by iterative min-label
     propagation (a masked (n x n) min-reduce per sweep; converges in
     O(graph diameter) sweeps, bounded by `max_sweeps`)
  4. border points adopt the min core-neighbour label; isolated -> -1 (noise)

For N beyond `n` the caller clusters a strided subsample and broadcasts
labels to all particles by nearest-subsample-point (see `assign_labels`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from midastouch_tpu.ops import knn


@functools.partial(jax.jit, static_argnames=("min_samples", "max_sweeps"))
def dbscan(
    points: jax.Array,
    eps: float,
    min_samples: int,
    max_sweeps: int = 64,
) -> jax.Array:
    """Exact DBSCAN labels for points (n, d). Returns (n,) int32: cluster
    ids are the minimum member index of each cluster; noise is -1."""
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=1)
    d2 = sq[:, None] - 2.0 * (points @ points.T) + sq[None, :]
    adj = d2 <= eps * eps  # includes self

    counts = jnp.sum(adj, axis=1)
    core = counts >= min_samples  # (n,)

    # min-label propagation over the core-core subgraph
    core_adj = adj & core[:, None] & core[None, :]
    init = jnp.where(core, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    def sweep(state):
        labels, _, it = state
        # candidate labels from core neighbours (big sentinel where no edge)
        cand = jnp.where(core_adj, labels[None, :], jnp.int32(n))
        new = jnp.minimum(labels, jnp.min(cand, axis=1))
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, sweep, (init, jnp.bool_(True), jnp.int32(0))
    )

    # border points: adopt min label among core neighbours
    border_cand = jnp.where(adj & core[None, :], labels[None, :], jnp.int32(n))
    border_label = jnp.min(border_cand, axis=1)
    out = jnp.where(core, labels, border_label)
    return jnp.where(out >= n, jnp.int32(-1), out).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def compact_labels(labels: jax.Array, num_clusters: int) -> jax.Array:
    """Map arbitrary label values (incl. -1 noise) to dense ids 0..K-1.

    Mirrors the reference's `torch.unique(labels)` enumeration in
    get_cluster_centers (particle_filter.py:164-172), where noise (-1) is
    treated as just another cluster. Labels beyond num_clusters collapse
    into the last slot (cannot occur when min_samples > n/num_clusters).
    """
    uniq = jnp.unique(labels, size=num_clusters, fill_value=jnp.int32(2**30))
    dense = jnp.searchsorted(uniq, labels).astype(jnp.int32)
    return jnp.clip(dense, 0, num_clusters - 1)


def assign_labels(
    positions: jax.Array, sub_positions: jax.Array, sub_labels: jax.Array,
    backend: str = "auto",
) -> jax.Array:
    """Broadcast subsample cluster labels to the full population by nearest
    subsample point."""
    _, idx = knn.nn_search(positions, sub_positions, backend=backend)
    return sub_labels[idx]


def cluster_positions(
    positions: jax.Array,
    eps: float = 1e-2,
    min_samples_frac: float = 0.2,
    max_points: int = 2048,
    backend: str = "auto",
) -> jax.Array:
    """Full clustering pipeline matching reference `cluster_particles`
    (particle_filter.py:208-228): DBSCAN in euclidean position space with
    min_samples = 20% of the population, subsampled for tractability."""
    n = positions.shape[0]
    if n <= max_points:
        return dbscan(positions, eps, max(int(n * min_samples_frac), 1))
    stride = -(-n // max_points)  # ceil
    sub = positions[::stride]
    m = sub.shape[0]
    sub_labels = dbscan(sub, eps, max(int(m * min_samples_frac), 1))
    return assign_labels(positions, sub, sub_labels, backend=backend)
