"""Pallas TPU kernel for the DIGIT depth ray-cast.

The XLA path in render/digit.py materializes (rays x triangles)
intermediates in HBM; this kernel tiles rays on the grid, streams the
(Woop-transformed) triangle table through VMEM, and keeps the running
per-ray minimum hit parameter in scratch — zero HBM intermediates.

Layouts are chosen for Mosaic: triangle tables are stored TRANSPOSED
((8, K): components on sublanes, triangles on lanes) so the dot_general
needs no relayout and the per-component rows broadcast naturally. Inputs
are pose-independent pixel rays in the CAMERA frame: the per-pose rotation
is folded into the triangle transforms (M' = M R), so the ray table is
loaded once and reused across the whole render batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 512  # rays per grid step
_TK = 1024  # triangles per inner tile


def _kernel(d_ref, m_ref, ob_ref, t_ref, best_ref, *, far):
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, far)

    d = d_ref[:]  # (TR, 8): [dx, dy, dz, 0...]
    m = m_ref[:]  # (24, TK): rows 0-7 Mu, 8-15 Mv, 16-23 Mw (cols 3+ zero)
    dot = lambda rows: jax.lax.dot_general(
        d, rows, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TR, TK)
    du = dot(m[0:8, :])
    dv = dot(m[8:16, :])
    dw = dot(m[16:24, :])
    ou = ob_ref[0:1, :]  # (1, TK) rows broadcast over rays
    ov = ob_ref[1:2, :]
    ow = ob_ref[2:3, :]

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
    m_t: jax.Array,  # (24, K) transposed Woop rows (camera-rotated)
    ob_t: jax.Array,  # (8, K) barycentric origins, rows 0..2 used
    far: float,
    tr: int = _TR,
    tk: int = _TK,
) -> jax.Array:
    """Min hit parameter per ray, (R,). Caller pads R and K."""
    r, k = dirs8.shape[0], m_t.shape[1]
    assert r % tr == 0 and k % tk == 0
    grid = (r // tr, k // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, far=far),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((24, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tr, 1), jnp.float32)],
    )(dirs8, m_t, ob_t)
    return out[:, 0]


def pack_triangle_tables(Mc: jax.Array, o_bary: jax.Array, tk: int = _TK):
    """(K,3,3) camera-rotated Woop transforms + (K,3) origins ->
    ((24, Kpad), (8, Kpad)) transposed padded tables."""
    k = Mc.shape[0]
    kpad = (-k) % tk
    Mc = jnp.pad(Mc, ((0, kpad), (0, 0), (0, 0)))
    ob = jnp.pad(o_bary, ((0, kpad), (0, 0)))
    rows = []
    for i in range(3):  # Mu, Mv, Mw
        block = jnp.pad(Mc[:, i, :], ((0, 0), (0, 5)))  # (K, 8)
        rows.append(block.T)  # (8, K)
    m_t = jnp.concatenate(rows, axis=0)  # (24, K)
    ob_t = jnp.pad(ob, ((0, 0), (0, 5))).T  # (8, K)
    return m_t, ob_t
