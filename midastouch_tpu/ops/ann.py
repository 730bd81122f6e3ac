"""Bucketed approximate nearest neighbour for codebook queries.

Exact brute-force 1-NN over a 50k-entry codebook costs O(N*M) per filter
step and its argmin is VPU-bound; that caps the filter near ~100 steps/s.
This index trades a tunable sliver of recall for a ~20x candidate
reduction:

  build (host, offline — codebooks are static per object):
    * k-means the 6-D keys into B coarse cells
    * assign every entry to its nearest cell with free capacity (greedy
      spill to the next-nearest cell, so NOTHING is dropped)
    * store cells as a dense (B, L) member table padded with a sentinel

  query (device, in-jit):
    * exact 1-NN of each query against the B centroids (same dense kernel)
    * gather the top-T cells' members (T*L candidates) and take the exact
      argmin among them

With T=8 probed cells the true NN is almost always inside the candidate
set (see tests/test_ann.py for the measured recall gate); the filter's
weighting is stochastic, so sub-1% recall loss is far below its noise
floor — validated end-to-end by RMSE parity in the e2e test.

PERFORMANCE NOTE (measured on v5e): this gather-based query is currently
~30x SLOWER than the dense brute-force kernel — TPU random-access gathers
run orders of magnitude below streaming matmul throughput, so candidate
reduction does not pay off in this form. Kept as a correct, tested
capability; a competitive TPU ANN needs a gather-free design (queries
sorted/bucketed into per-cell dense tiles). Exact search remains the
default everywhere.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.ops import knn

_SENTINEL = 1.0e6


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BucketIndex:
    centroids: jax.Array  # (B, D)
    members: jax.Array  # (B, L) int32 entry ids; padding = M (sentinel row)
    keys_padded: jax.Array  # (M + 1, D); last row = sentinel far point

    def tree_flatten(self):
        return (self.centroids, self.members, self.keys_padded), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_cells(self) -> int:
        return self.centroids.shape[0]

    @property
    def cell_capacity(self) -> int:
        return self.members.shape[1]


def build_bucket_index(
    keys: np.ndarray,
    num_cells: int = 256,
    capacity_factor: float = 3.0,
    seed: int = 0,
) -> BucketIndex:
    """Host-side index construction (k-means + capacity-bounded greedy
    assignment). Runs at codebook-build time."""
    from sklearn.cluster import KMeans

    keys = np.asarray(keys, dtype=np.float32)
    m, d = keys.shape
    b = min(num_cells, max(m // 4, 1))
    km = KMeans(n_clusters=b, n_init=3, random_state=seed).fit(keys)
    centroids = km.cluster_centers_.astype(np.float32)

    cap = max(int(np.ceil(m / b * capacity_factor)), 4)
    # greedy: nearest cell with free space (spill to next-nearest)
    d2 = (
        np.sum(keys**2, axis=1)[:, None]
        - 2 * keys @ centroids.T
        + np.sum(centroids**2, axis=1)[None, :]
    )
    order = np.argsort(d2, axis=1)
    members = np.full((b, cap), m, dtype=np.int32)
    fill = np.zeros(b, dtype=np.int64)
    for i in range(m):
        for c in order[i]:
            if fill[c] < cap:
                members[c, fill[c]] = i
                fill[c] += 1
                break
        else:  # all cells full (cannot happen with capacity_factor >= 1)
            raise RuntimeError("bucket index overflow")

    keys_padded = np.concatenate(
        [keys, np.full((1, d), _SENTINEL, dtype=np.float32)], axis=0
    )
    return BucketIndex(
        centroids=jnp.asarray(centroids),
        members=jnp.asarray(members),
        keys_padded=jnp.asarray(keys_padded),
    )


# ---------------------------------------------------------------------------
# gather-free windowed variant
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SortedIndex:
    """Codebook entries sorted by Morton-ordered k-means cell: a cell (and
    its spatial neighbourhood) is a CONTIGUOUS range of rows, so candidate
    fetching is a dynamic_slice — a streaming DMA — instead of the random
    gathers that sink `nn_search_bucketed` on TPU."""

    centroids: jax.Array  # (B, D) in Morton order
    cell_start: jax.Array  # (B + 1,) int32 row offsets into the sorted table
    keys_sorted: jax.Array  # (M, D)
    perm: jax.Array  # (M,) sorted-row -> original entry id

    def tree_flatten(self):
        return (self.centroids, self.cell_start, self.keys_sorted, self.perm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _morton_order(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """Z-order curve rank of 3-D points (first 3 dims used)."""
    p = points[:, :3]
    lo, hi = p.min(0), p.max(0)
    q = ((p - lo) / np.maximum(hi - lo, 1e-12) * (2**bits - 1)).astype(np.uint64)
    code = np.zeros(len(p), dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1) << np.uint64(3 * b + d)
    return np.argsort(code, kind="stable")


def _hilbert_order(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """Hilbert curve rank of 3-D points (Skilling's transpose algorithm,
    vectorized). Adjacent ranks are spatially adjacent — no Z-order seams —
    so a contiguous row window around a cell covers its true spatial
    neighbourhood much more often than Morton order."""
    n = 3
    p = points[:, :n]
    lo, hi = p.min(0), p.max(0)
    X = ((p - lo) / np.maximum(hi - lo, 1e-12) * (2**bits - 1)).astype(np.uint64)
    X = X.copy()

    # axes -> Hilbert transpose (Skilling, "Programming the Hilbert curve")
    M = np.uint64(1) << np.uint64(bits - 1)
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            invert = (X[:, i] & Q) != 0
            X[invert, 0] ^= P
            keep = ~invert
            t = (X[keep, 0] ^ X[keep, i]) & P
            X[keep, 0] ^= t
            X[keep, i] ^= t
        Q >>= np.uint64(1)
    # gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), dtype=np.uint64)
    Q = M
    while Q > np.uint64(1):
        sel = (X[:, n - 1] & Q) != 0
        t[sel] ^= Q - np.uint64(1)
        Q >>= np.uint64(1)
    for i in range(n):
        X[:, i] ^= t

    # interleave transpose bits into one rank (MSB of X[0] leads)
    code = np.zeros(len(X), dtype=np.uint64)
    for b in range(bits):
        for i in range(n):
            code |= ((X[:, i] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * n + (n - 1 - i)
            )
    return np.argsort(code, kind="stable")


def build_sorted_index(
    keys: np.ndarray,
    num_cells: int = 512,
    seed: int = 0,
    curve: str = "hilbert",
) -> SortedIndex:
    """Host-side build: k-means cells, space-filling-curve-order the cells
    (Hilbert by default; "morton" selectable), sort entries by cell id."""
    from sklearn.cluster import KMeans

    keys = np.asarray(keys, dtype=np.float32)
    m = len(keys)
    b = min(num_cells, max(m // 8, 1))
    km = KMeans(n_clusters=b, n_init=3, random_state=seed).fit(keys)
    order_fn = _hilbert_order if curve == "hilbert" else _morton_order
    order = order_fn(km.cluster_centers_)
    rank = np.empty(b, dtype=np.int64)
    rank[order] = np.arange(b)
    cells = rank[km.labels_]  # Morton-ordered cell id per entry

    perm = np.argsort(cells, kind="stable")
    cells_sorted = cells[perm]
    cell_start = np.searchsorted(cells_sorted, np.arange(b + 1)).astype(np.int32)
    return SortedIndex(
        centroids=jnp.asarray(km.cluster_centers_[order].astype(np.float32)),
        cell_start=jnp.asarray(cell_start),
        keys_sorted=jnp.asarray(keys[perm]),
        perm=jnp.asarray(perm.astype(np.int32)),
    )


# ---------------------------------------------------------------------------
# slab-gather (blocked) variant
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockedIndex:
    """Slab-gather ANN: the Hilbert-sorted key table padded to whole
    (block, d) slabs, plus a host-precomputed per-CELL probe table that
    names which P slabs to score for a query landing in that cell.

    The candidate fetch is a gather of whole contiguous (block, d) slabs
    along the leading axis instead of the windowed variant's per-tile
    dynamic-sliced bands; what the fixed slab alignment loses in
    centering, the probe table buys back on the host: for each cell it
    stores (1) the slab holding the cell's rows, (2) the rank-adjacent
    slab on the side the cell leans toward, and (3+) seam-partner slabs
    — slabs of the spatially nearest cells whose rows are NOT already
    covered, the windowed variant's per-tile partner mechanism paid once
    at build time instead of per query.

    MEASURED (round 5, v5e, ANN_RECALL.json): per CANDIDATE this probes
    slightly better than windowed (recall 0.945 vs 0.929 at 2048
    candidates, 0.989 at 6144), but end-to-end it is NOT faster (260 vs
    271 steps/s at equal candidates) — the windowed variant's band fetch
    was never its bottleneck; scoring the candidates is. Kept as a
    correct, tested alternative; `windowed` stays the default."""

    centroids: jax.Array  # (B, d) in Hilbert order
    probe_blocks: jax.Array  # (B, P) int32 slab ids per cell
    keys_blocked: jax.Array  # (nb, block, d); tail padded with sentinel
    perm: jax.Array  # (M,) sorted-row -> original entry id

    def tree_flatten(self):
        return (
            self.centroids, self.probe_blocks, self.keys_blocked, self.perm
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def block(self) -> int:
        return self.keys_blocked.shape[1]

    @property
    def max_probes(self) -> int:
        return self.probe_blocks.shape[1]


def build_blocked_index(
    keys: np.ndarray,
    num_cells: int = 512,
    block: int = 2048,
    probes: int = 6,
    seed: int = 0,
    curve: str = "hilbert",
) -> BlockedIndex:
    """Host-side build: k-means cells, Hilbert-order them, sort entries by
    cell, pad to whole blocks, and precompute the per-cell probe table."""
    from sklearn.cluster import KMeans

    keys = np.asarray(keys, dtype=np.float32)
    m, d = keys.shape
    b = min(num_cells, max(m // 8, 1))
    km = KMeans(n_clusters=b, n_init=3, random_state=seed).fit(keys)
    order_fn = _hilbert_order if curve == "hilbert" else _morton_order
    order = order_fn(km.cluster_centers_)
    rank = np.empty(b, dtype=np.int64)
    rank[order] = np.arange(b)
    cells = rank[km.labels_]
    cent = km.cluster_centers_[order].astype(np.float32)

    perm = np.argsort(cells, kind="stable")
    cells_sorted = cells[perm]
    cell_start = np.searchsorted(cells_sorted, np.arange(b + 1))

    blk = max(min(block, m), 1)
    nb = (m + blk - 1) // blk
    pad = nb * blk - m
    keys_blocked = np.concatenate(
        [keys[perm], np.full((pad, d), _SENTINEL, dtype=np.float32)], axis=0
    ).reshape(nb, blk, d)

    p = min(probes, nb) if nb > 1 else 1
    mid = (cell_start[:-1] + np.maximum(cell_start[1:], cell_start[:-1] + 1)) // 2
    b0 = np.clip(mid // blk, 0, nb - 1)
    lean_up = (mid % blk) >= blk // 2
    nbr = np.clip(np.where(lean_up, b0 + 1, b0 - 1), 0, nb - 1)

    # seam partners: spatially nearest cells' primary slabs, in distance
    # order, skipping slabs already probed
    d2 = (
        np.sum(cent**2, axis=1)[:, None]
        - 2 * cent @ cent.T
        + np.sum(cent**2, axis=1)[None, :]
    )
    near = np.argsort(d2, axis=1)  # (B, B), col 0 = self
    probe = np.zeros((b, p), dtype=np.int32)
    for c in range(b):
        chosen = []
        for cand in [b0[c], nbr[c]] + [b0[o] for o in near[c, 1:]]:
            if cand not in chosen:
                chosen.append(int(cand))
            if len(chosen) == p:
                break
        while len(chosen) < p:  # fewer distinct slabs than probes
            chosen.append(chosen[-1])
        probe[c] = chosen

    return BlockedIndex(
        centroids=jnp.asarray(cent),
        probe_blocks=jnp.asarray(probe),
        keys_blocked=jnp.asarray(keys_blocked),
        perm=jnp.asarray(perm.astype(np.int32)),
    )


@functools.partial(jax.jit, static_argnames=("tile", "probes"))
def nn_search_blocked(
    queries: jax.Array,
    index: BlockedIndex,
    tile: int = 256,
    probes: int | None = None,
) -> jax.Array:
    """Approximate 1-NN via whole-slab candidate fetch.

    1. nearest cell per query (dense matmul + argmin)
    2. ONE `lax.sort` by cell carrying the row id; gather query rows once
    3. per tile of 256 sorted queries: look up the mid query's cell in the
       probe table, gather its P (block, d) slabs — contiguous leading-axis
       DMAs — and take the exact argmin over the P*block candidates
    4. unsort with one int32 scatter

    Same recall levers as `nn_search_windowed` (rank-neighbourhood +
    seam partners), but zero row-level gathers in the hot path."""
    n, d = queries.shape
    m = index.perm.shape[0]
    nb, blk, _ = index.keys_blocked.shape
    p = min(probes or index.max_probes, index.max_probes)
    q = knn._pad_axis(queries.astype(jnp.float32), 0, tile, 0.0)
    npad = q.shape[0]

    cent = index.centroids
    cn = jnp.sum(cent * cent, axis=1)
    cdist = cn[None, :] - 2.0 * (q @ cent.T)
    cells = jnp.argmin(cdist, axis=1).astype(jnp.int32)

    iota = jnp.arange(npad, dtype=jnp.int32)
    cells_s, orig_id = jax.lax.sort((cells, iota), num_keys=1)
    q_s = q[orig_id]

    # slab norms: loop-invariant inside a scan (XLA hoists), one pass here
    bn = jnp.sum(index.keys_blocked * index.keys_blocked, axis=-1)  # (nb, blk)

    def body(args):
        qt, ct = args  # (tile, d), (tile,)
        blocks = index.probe_blocks[ct[tile // 2], :p]  # (P,)
        cand = index.keys_blocked[blocks].reshape(p * blk, d)
        cnorm = bn[blocks].reshape(p * blk)
        dist = cnorm[None, :] - 2.0 * (qt @ cand.T)
        j = jnp.argmin(dist, axis=1).astype(jnp.int32)
        return blocks[j // blk] * blk + (j % blk)  # sorted-row id

    ntiles = npad // tile
    rows = jax.vmap(body)(
        (q_s.reshape(ntiles, tile, d), cells_s.reshape(ntiles, tile))
    ).reshape(-1)
    out = jnp.zeros(npad, jnp.int32).at[orig_id].set(rows)
    return index.perm[jnp.minimum(out[:n], m - 1)]


@functools.partial(jax.jit, static_argnames=("window", "tile", "probes"))
def nn_search_windowed(
    queries: jax.Array,
    index: SortedIndex,
    window: int = 4096,
    tile: int = 256,
    probes: int = 2,
) -> jax.Array:
    """Approximate 1-NN via sorted-query tiles over contiguous key windows.

    1. nearest curve-ordered cell per query (dense matmul + argmin)
    2. ONE fused `lax.sort` by that cell carrying the query columns and
       the original row id — a tile of consecutive queries then spans only
       a couple of cells; no per-probe re-sorts, no post-sort gathers
    3. per tile: dynamic_slice a `window`-row band of the sorted key table
       centred on the tile's median cell, plus one band per extra probe
       centred on that cell's "seam partner" — the centroid-nearest cell
       whose rows lie OUTSIDE the bands already probed. A 1-D
       space-filling order of a 2-D surface has unavoidable seams, and the
       true NN beyond a seam lives near a spatially-close but row-distant
       cell; that partner is a property of the CELL, so every query in the
       tile shares it (computed per tile from the (B, d) centroid table —
       a few hundred flops). Exact argmin across all bands, merged
       in-tile.
    4. unsort with a single (N,) int32 scatter keyed on the carried row id

    All bulk memory traffic is streaming; the only random access is the
    final scatter. Earlier designs re-sorted the queries per probe (an
    argsort each — measured 12 ms/extra probe at 50k on v5e) and used
    per-QUERY second-nearest cells, which are incoherent within a tile
    once sorted by primary cell; the cell-level partner restores the
    multi-probe recall at tile-level cost.
    """
    n, d = queries.shape
    m = index.keys_sorted.shape[0]
    q = knn._pad_axis(queries.astype(jnp.float32), 0, tile, 0.0)
    npad = q.shape[0]

    cent = index.centroids
    b = cent.shape[0]
    cn = jnp.sum(cent * cent, axis=1)
    cdist = cn[None, :] - 2.0 * (q @ cent.T)  # (Np, B)
    cells = jnp.argmin(cdist, axis=1).astype(jnp.int32)

    w = min(window, m)
    nprobe = min(probes, b)
    # cells whose rank is within ±halo of a probed cell are already inside
    # its window: exclude them when picking the next seam partner
    halo = max(int(b * w / (2 * m)) + 1, 1)

    # sort only (cell, row-id) and gather the query rows once after: a
    # multi-operand bitonic sort permutes EVERY operand through all
    # O(log^2 n) stages, so carrying the d=6 query columns through the
    # sort cost ~3x more than one post-sort row gather
    iota = jnp.arange(npad, dtype=jnp.int32)
    cells_s, orig_id = jax.lax.sort((cells, iota), num_keys=1)
    q_s = q[orig_id]  # (Np, d)
    ranks = jnp.arange(b, dtype=jnp.int32)

    def body(args):
        qt, ct = args  # (tile, d), (tile,)
        mid = ct[tile // 2]
        best_d = jnp.full((tile,), jnp.inf, jnp.float32)
        best_i = jnp.zeros((tile,), jnp.int32)
        # distance of every cell to the tile's cell, for partner picking
        cd = jnp.sum((cent - cent[mid]) ** 2, axis=1)  # (B,)
        covered = jnp.abs(ranks - mid) <= halo
        cell_p = mid
        for p in range(nprobe):
            start = jnp.clip(index.cell_start[cell_p] - w // 2, 0, m - w)
            band = jax.lax.dynamic_slice(index.keys_sorted, (start, 0), (w, d))
            bn = jnp.sum(band * band, axis=1)
            dist = bn[None, :] - 2.0 * (qt @ band.T)
            dmin = jnp.min(dist, axis=1)
            imin = start + jnp.argmin(dist, axis=1).astype(jnp.int32)
            better = dmin < best_d
            best_d = jnp.where(better, dmin, best_d)
            best_i = jnp.where(better, imin, best_i)
            if p + 1 < nprobe:
                cell_p = jnp.argmin(
                    jnp.where(covered, jnp.inf, cd)
                ).astype(jnp.int32)
                covered = covered | (jnp.abs(ranks - cell_p) <= halo)
        return best_i

    ntiles = npad // tile
    # vmap, not lax.map: the per-tile work is ~6 MFLOP, so a sequential
    # map pays ~200 iterations of dispatch/serialization overhead for
    # nothing (measured 5.2 ms of a 5.6 ms fused update at 50k x 50k).
    # Batched, the probe matmuls fuse into one (ntiles, tile, window)
    # MXU contraction and the band slices into one gather; total band
    # traffic at 50k is ~19 MB — memory was never the constraint.
    idx_s = jax.vmap(body)(
        (q_s.reshape(ntiles, tile, d), cells_s.reshape(ntiles, tile))
    ).reshape(-1)
    out = jnp.zeros(npad, jnp.int32).at[orig_id].set(idx_s)
    return index.perm[out[:n]]


@functools.partial(jax.jit, static_argnames=("top_cells", "chunk", "backend"))
def nn_search_bucketed(
    queries: jax.Array,
    index: BucketIndex,
    top_cells: int = 2,
    chunk: int = 8192,
    backend: str = "xla",
) -> jax.Array:
    """Approximate 1-NN entry id per query, (N,) int32."""
    n = queries.shape[0]
    q = knn._pad_axis(queries.astype(jnp.float32), 0, chunk, 0.0)

    cent = index.centroids
    cn = jnp.sum(cent * cent, axis=1)

    def body(qc):
        # stage 1: top-T cells by centroid distance
        d = cn[None, :] - 2.0 * (qc @ cent.T)
        _, cells = jax.lax.top_k(-d, top_cells)  # (c, T)
        # stage 2: exact argmin among the cells' members
        cand = index.members[cells].reshape(qc.shape[0], -1)  # (c, T*L)
        ck = index.keys_padded[cand]  # (c, T*L, D)
        dd = jnp.sum((ck - qc[:, None, :]) ** 2, axis=-1)
        best = jnp.argmin(dd, axis=1)
        return jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]

    nchunks = q.shape[0] // chunk
    idx = jax.lax.map(body, q.reshape(nchunks, chunk, -1))
    return idx.reshape(-1)[:n]
