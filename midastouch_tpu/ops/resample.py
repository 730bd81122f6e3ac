"""Particle resampling, fully in-jit (fixed shapes, no host round-trips).

The reference resamples on CPU: `WeightedRandomSampler` iterated in Python
("weighted_random", particle_filter.py:243-249) or low-variance systematic
variants (:252-307). Both are inverse-CDF samplers; here they are a cumsum +
searchsorted on-device, O(N log N), which XLA vectorizes.
"""

from __future__ import annotations

import functools

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
    particle_filter.py:252-307)."""
    wn = normalize_weights(weights).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    cdf = jnp.cumsum(wn)
    cdf = cdf / cdf[-1]
    offset = jax.random.uniform(key, ()) / num_samples
    locs = jnp.arange(num_samples, dtype=cdf.dtype) / num_samples + offset
    return jnp.clip(
        jnp.searchsorted(cdf, locs, side="right").astype(jnp.int32),
        0,
        weights.shape[0] - 1,
    )


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
