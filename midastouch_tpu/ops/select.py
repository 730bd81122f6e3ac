"""Sort-free dynamic-k rank selection.

The annealing step of the particle filter (reference
midastouch/filter/particle_filter.py:405-447) removes the `num_remove`
lowest-weight particles and doubles the `num_add` highest-weight ones,
where both counts are data-dependent scalars. The direct translation is a
full argsort of the live weights per step — on TPU, XLA lowers a 50k-row
sort to hundreds of bitonic passes, far more HBM traffic than the rest of
the update. Ranks themselves are never needed, only the two membership
masks, so this module computes them with an exact 32-step bisection over
the sortable-integer encoding of float32: each step is one O(n) masked
count (a single VPU reduction), 32 steps pin the k-th order statistic to
the exact bit pattern, and one prefix-sum resolves ties with the same
stable-ordering semantics `jnp.argsort` would produce. Total cost is
~64 streaming passes over n floats vs O(log^2 n) ~ 256 sort stages each
moving key+payload.

Everything here is shape-static and jit/scan-safe (k may be a traced
scalar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sortable_u32(x: jax.Array) -> jax.Array:
    """Monotone map float32 -> uint32 (IEEE-754 total order trick):
    flip all bits of negatives, set the sign bit of non-negatives."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = bits >= jnp.uint32(0x80000000)
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _kth_smallest_u32(key: jax.Array, valid: jax.Array, k: jax.Array):
    """Smallest v with count(valid & key <= v) >= k, via 32-step bisection.
    Returns v (uint32). Assumes 1 <= k <= count(valid); out-of-range k
    degrades gracefully (v saturates to 0xFFFFFFFF)."""

    def body(_, bounds):
        lo, hi = bounds
        mid = lo + (hi - lo) // jnp.uint32(2)
        c = jnp.sum((valid & (key <= mid)).astype(jnp.int32))
        return jnp.where(c >= k, lo, mid + jnp.uint32(1)), jnp.where(
            c >= k, mid, hi
        )

    lo, hi = jax.lax.fori_loop(
        0, 32, body, (jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    )
    return hi


def bottom_k_mask(
    values: jax.Array,
    valid: jax.Array,
    k: jax.Array,
    tie_from_end: bool = False,
) -> jax.Array:
    """Boolean mask of the k smallest `values` among `valid` entries.

    Exactly reproduces `rank < k` over a stable ascending argsort of the
    valid subset: ties at the k-th value are broken by position (lowest
    index first, or highest first when `tie_from_end`). `k` may be a
    traced scalar; k <= 0 yields an empty mask, k >= n_valid the full one.
    """
    k = jnp.asarray(k, jnp.int32)
    key = jnp.where(valid, _sortable_u32(values), jnp.uint32(0xFFFFFFFF))
    # invalid rows carry the sentinel key; exclude them from counts so a
    # real value of +inf can still be selected
    v = _kth_smallest_u32(key, valid, jnp.maximum(k, 1))
    below = valid & (key < v)
    at = valid & (key == v)
    extra = k - jnp.sum(below.astype(jnp.int32))
    ai = at.astype(jnp.int32)
    if tie_from_end:
        # exclusive suffix count of ties
        tie_rank = jnp.cumsum(ai[::-1])[::-1] - ai
    else:
        tie_rank = jnp.cumsum(ai) - ai
    return jnp.where(k > 0, below | (at & (tie_rank < extra)), False)


def top_k_mask(
    values: jax.Array, valid: jax.Array, k: jax.Array
) -> jax.Array:
    """Boolean mask of the k largest `values` among `valid` entries, with
    stable-argsort tie semantics: `rank_desc < k` where rank_desc =
    n - 1 - rank_asc (ties at the cut go to the highest indices), matching
    the reference annealing's top-of-population selection."""
    return bottom_k_mask(-values, valid, k, tie_from_end=True)
