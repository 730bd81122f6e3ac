"""Particle resampling, fully in-jit (fixed shapes, no host round-trips).

The reference resamples on CPU: `WeightedRandomSampler` iterated in Python
("weighted_random", particle_filter.py:243-249) or low-variance systematic
variants (:252-307). Both are inverse-CDF samplers; here they are a cumsum +
searchsorted on-device, O(N log N), which XLA vectorizes.
"""

from __future__ import annotations

import functools
from math import gcd as _gcd

import jax
import jax.numpy as jnp


def normalize_weights(w: jax.Array) -> jax.Array:
    """Safe weight normalization; returns uniform if degenerate (reference
    guards particle_filter.py:240-241 by skipping the resample instead)."""
    s = jnp.sum(w)
    ok = (s > 0) & jnp.isfinite(s)
    return jnp.where(ok, w / jnp.where(ok, s, 1.0), jnp.ones_like(w) / w.shape[0])


def effective_sample_size(w: jax.Array) -> jax.Array:
    wn = normalize_weights(w)
    return 1.0 / jnp.maximum(jnp.sum(wn * wn), 1e-12)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def multinomial_resample(
    key: jax.Array, weights: jax.Array, num_samples: int
) -> jax.Array:
    """Multinomial (weighted-random) resampling via inverse CDF.

    Equivalent in distribution to the reference's WeightedRandomSampler
    (particle_filter.py:243-249) but runs on device. Returns int32 indices.
    """
    wn = normalize_weights(weights)
    cdf = jnp.cumsum(wn)
    cdf = cdf / cdf[-1]
    u = jax.random.uniform(key, (num_samples,))
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="right").astype(jnp.int32),
        0,
        weights.shape[0] - 1,
    )


@functools.partial(jax.jit, static_argnames=("num_samples",))
def systematic_resample(
    key: jax.Array, weights: jax.Array, num_samples: int
) -> jax.Array:
    """Low-variance (systematic) resampling: one shared uniform offset,
    evenly spaced sample locations (reference "low_var"/"low_var_batch",
    particle_filter.py:252-307).

    Search-free formulation: offspring counts come in closed form from the
    CDF (count_j = floor(N*cdf_j - u) - floor(N*cdf_{j-1} - u)), and the
    index sequence is reconstructed with one scatter + cumsum — no
    vectorized binary search (searchsorted is ~17 gather rounds on TPU).
    """
    k_u, k_perm = jax.random.split(key)
    wn = normalize_weights(weights)
    cdf = jnp.cumsum(wn)
    cdf = cdf / cdf[-1]
    u = jax.random.uniform(k_u, ())
    # number of sample locations strictly below cdf_j
    below = jnp.floor(num_samples * cdf - u).astype(jnp.int32) + 1
    below = jnp.clip(below, 0, num_samples)
    counts = jnp.diff(below, prepend=0)
    # first output slot of each parent = exclusive cumsum of counts; write
    # the parent INDEX there and fill the runs with a running maximum
    first_slot = below - counts
    parents = jnp.arange(weights.shape[0], dtype=jnp.int32)
    z = jnp.zeros(num_samples, jnp.int32).at[
        jnp.where(counts > 0, first_slot, num_samples)
    ].max(parents, mode="drop")
    idx = jax.lax.associative_scan(jnp.maximum, z)
    # The run-length construction emits draws SORTED by parent index; any
    # prefix of that is a spatially biased subsample, which breaks the
    # fixed-capacity filter's alive-prefix masking when annealing shrinks
    # the population. A coprime-stride spread with a random rotation
    # restores prefix-exchangeability: every parent's run is distributed
    # evenly over the output, so any prefix holds ~proportional mass from
    # each parent. (jax.random.permutation would sort N random keys — an
    # argsort-sized cost, ~1 ms at 50k on v5e — for no statistical gain
    # the filter can see.)
    # Spread at BLOCK granularity when possible: an element-wise strided
    # permutation is a worst-case random-access gather (measured 1.3 ms of
    # the 2.0 ms resample stage at 50k on v5e), while permuting contiguous
    # blocks moves the same mass in ~N/B coherent row reads. A prefix of
    # the output then holds whole spread blocks plus one partial block —
    # prefix mass stays ~proportional per parent with granularity B/N
    # (~0.5%), far below what annealing's shrink steps can resolve.
    assert num_samples < 2**30, "systematic_resample: num_samples too large"
    # small blocks only: each block is a run of CONSECUTIVE parents, and
    # slot-adjacency correlates spatially more each step the filter
    # resamples, so coarse blocks (80 at 50k) measurably degraded e2e
    # convergence (bench_localization 2.9 -> 7.6 mm final). Blocks <= 16
    # keep the gather ~6x cheaper than the element-wise spread while the
    # prefix bias stays below what annealing can resolve.
    block = 1
    for b in range(min(16, num_samples // 512), 1, -1):
        if num_samples % b == 0:
            block = b
            break
    nb = num_samples // block
    stride = max(int(round(nb * 0.6180339887)), 1)
    while _gcd(stride, nb) != 1:
        stride += 1
    r = jax.random.randint(k_perm, (), 0, nb)
    # provably overflow-free fast path: the computed expression reaches
    # r + (nb-1)*stride with r < nb, so guard the true maximum — nb*stride
    # alone under-guards by up to ~nb in the narrow band just below 2**31
    if (nb - 1) * max(stride, 1) + nb < 2**31:
        bpos = (r + jnp.arange(nb, dtype=jnp.int32) * stride) % nb
    else:  # modular-add scan avoids int32 overflow for huge N/B
        inc = jnp.full((nb,), stride % nb, jnp.int32).at[0].set(r)
        bpos = jax.lax.associative_scan(lambda a, b: (a + b) % nb, inc)
    return idx.reshape(nb, block)[bpos].reshape(-1)


def resample_indices(
    key: jax.Array, weights: jax.Array, num_samples: int, method: str = "weighted_random"
) -> jax.Array:
    """Dispatch matching the reference's `resampler` method names
    (particle_filter.py:230-307). "low_var" and "low_var_batch" share one
    implementation here — they were two implementations of the same sampler."""
    if method == "weighted_random":
        return multinomial_resample(key, weights, num_samples)
    if method in ("low_var", "low_var_batch", "systematic"):
        return systematic_resample(key, weights, num_samples)
    raise ValueError(f"unknown resample method {method}")
