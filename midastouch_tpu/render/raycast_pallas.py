"""Pallas TPU kernel for the DIGIT depth ray-cast.

The XLA path in render/digit.py materializes (rays x triangles)
intermediates in HBM; this kernel tiles rays on the grid, streams the
(Woop-transformed) triangle table through VMEM, and keeps the running
per-ray minimum hit parameter in scratch — zero HBM intermediates.

Inputs are pose-independent pixel rays in the CAMERA frame: the per-pose
rotation is folded into the triangle transforms (M' = M R), so the ray
table is loaded once and reused across the whole render batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 256  # rays per grid step (VMEM: 3 x (TR, TK) f32 tiles + temps)
_TK = 1024  # triangles per inner tile


def _kernel(d_ref, mu_ref, mv_ref, mw_ref, ob_ref, t_ref, best_ref, *, far):
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, far)

    d = d_ref[:]  # (TR, 8)
    dot = lambda m_ref: jax.lax.dot_general(
        d, m_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TR, TK)
    du, dv, dw = dot(mu_ref), dot(mv_ref), dot(mw_ref)
    ou = ob_ref[:, 0][None, :]
    ov = ob_ref[:, 1][None, :]
    ow = ob_ref[:, 2][None, :]

    safe = jnp.abs(dw) > 1e-12
    t = -ow / jnp.where(safe, dw, 1.0)
    u = ou + t * du
    v = ov + t * dv
    hit = safe & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-7)
    tile_min = jnp.min(jnp.where(hit, t, far), axis=1, keepdims=True)
    best_ref[:] = jnp.minimum(best_ref[:], tile_min)

    @pl.when(j == nk - 1)
    def _finish():
        t_ref[:] = best_ref[:]


@functools.partial(jax.jit, static_argnames=("far", "tr", "tk"))
def raycast_min_t(
    dirs8: jax.Array,  # (R, 8) camera-frame ray dirs, cols 3..7 zero
    mu: jax.Array,  # (K, 8) Woop row 0 (already camera-rotated), padded
    mv: jax.Array,  # (K, 8)
    mw: jax.Array,  # (K, 8)
    ob: jax.Array,  # (K, 3) barycentric origin per triangle
    far: float,
    tr: int = _TR,
    tk: int = _TK,
) -> jax.Array:
    """Min hit parameter per ray, (R,). Caller pads R and K."""
    r, k = dirs8.shape[0], mu.shape[0]
    assert r % tr == 0 and k % tk == 0
    grid = (r // tr, k // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, far=far),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tr, 1), jnp.float32)],
    )(dirs8, mu, mv, mw, ob)
    return out[:, 0]
