"""MXU-friendly row gather: one-hot matmul Pallas kernels.

XLA's native TPU ``gather`` costs ~25 ns/row (a scalar loop) — profiling the
render step showed per-pixel face-attribute gathers dominating the whole
pipeline.  The TPU-native alternative: express ``table[idx]`` as
``one_hot(idx) @ table`` so the MXU does the indexing, materializing one-hot
*tiles in VMEM only*.

Layout matters as much as the matmul: on TPU the minor dimension pads to 128
lanes, so a (P, 3) gather output would carry 42x write amplification.  The
core kernel is therefore **channel-major**: ``take_rows_cm(table, idx)``
returns ``(D, *idx.shape)`` — the D channels land on the (cheaply padded)
sublane axis and the big pixel axis stays lane-aligned.  The render pipeline
is channel-major end-to-end for the same reason.

    grid over (pixel tiles x face chunks):
        oh   = (idx_tile == face_iota)                  # (TILE_F, TILE_P), VPU
        out += table_t_chunk @ oh                       # (D, TILE_P), MXU

HBM traffic is just idx + table + out; FLOPs are P*F*D*2 — dense, so the
kernel is used when the table has at most ``MAX_ONEHOT_ROWS`` rows (per-face
attribute tables, small texture maps); larger tables fall back to XLA gather
(and the rasterizer's binning prepass bounds F per call for huge meshes).

Differentiable w.r.t. ``table``: the VJP is the transposed one-hot matmul
(``d_table = one_hot^T @ g``) with the same tiling — a matmul, not a
scatter-add.  Out-of-range indices (the rasterizer's -1 padding) produce
zero rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["take_rows", "take_rows_cm", "take_rows_batched", "MAX_ONEHOT_ROWS"]

_TILE_P = 2048     # pixel columns per inner row (16 f32 lane-tiles)
_ROWS = 8          # inner rows per grid step (sublane-aligned idx blocks)
_SUPER_P = _ROWS * _TILE_P
_TILE_F = 128      # face-chunk rows per grid step (MXU-width)

# Above this table size the dense one-hot matmul wastes more FLOPs than the
# scalar gather costs; fall back to XLA's gather.
MAX_ONEHOT_ROWS = 8192

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_cm_kernel(idx_ref, table_ref, out_ref, *, tile_f):
    """out[:, p] = table_t[:, idx[p]] for one pixel super-tile, accumulated
    over face chunks.  idx block (1, ROWS, TILE_P); table_t block
    (d_pad, TILE_F); out block (d_pad, SUPER_P)."""
    f_chunk = pl.program_id(1)

    @pl.when(f_chunk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = f_chunk * tile_f
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tile_f, _TILE_P), 0) + base
    table = table_ref[:]
    idx = idx_ref[0]                                    # (ROWS, TILE_P)
    for r in range(_ROWS):
        oh = (idx[r:r + 1, :] == row_iota).astype(table.dtype)
        # HIGHEST precision: the MXU otherwise truncates f32 to bf16 —
        # one-hot selection must reproduce table rows exactly.
        out_ref[:, r * _TILE_P:(r + 1) * _TILE_P] += jax.lax.dot_general(
            table, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)


def _pallas_take_rows_cm(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table_t: (D, F) f32; idx: (P,) int32.  Returns (D, P)."""
    d, f = table_t.shape
    p = idx.shape[0]
    # Deeper face chunks amortize MXU dot latency for multi-chunk tables
    # (each dot is M=d_pad-shallow; fewer, deeper dots win).
    tile_f = _TILE_F if f <= _TILE_F else min(512, _round_up(f, _TILE_F))
    f_pad = _round_up(max(f, tile_f), tile_f)
    d_pad = _round_up(d, 8)
    p_pad = _round_up(max(p, _SUPER_P), _SUPER_P)
    if (f_pad, d_pad) == (f, d):
        table_p = table_t
    else:
        table_p = jnp.zeros((d_pad, f_pad), table_t.dtype).at[:d, :f].set(
            table_t)
    idx = idx.astype(jnp.int32)
    if p_pad == p:
        idx_p = idx.reshape(p_pad // _SUPER_P, _ROWS, _TILE_P)
    else:
        idx_p = jnp.full((p_pad,), -1, jnp.int32).at[:p].set(idx).reshape(
            p_pad // _SUPER_P, _ROWS, _TILE_P)

    out = pl.pallas_call(
        partial(_gather_cm_kernel, tile_f=tile_f),
        grid=(p_pad // _SUPER_P, f_pad // tile_f),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _TILE_P), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, tile_f), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_pad, _SUPER_P), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, p_pad), jnp.float32),
    )(idx_p, table_p)
    return out[:d, :p]


def _scatter_cm_kernel(idx_ref, g_ref, out_ref):
    """d_table_t[:, f] += sum_{p: idx[p]==f} g[:, p] — transposed one-hot
    matmul, accumulated over pixel super-tiles."""
    p_chunk = pl.program_id(1)

    @pl.when(p_chunk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    f_chunk = pl.program_id(0)
    base = f_chunk * _TILE_F
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_TILE_F, _TILE_P), 0) + base
    idx = idx_ref[0]                                    # (ROWS, TILE_P)
    for r in range(_ROWS):
        oh = (idx[r:r + 1, :] == row_iota).astype(g_ref.dtype)
        g_r = g_ref[:, r * _TILE_P:(r + 1) * _TILE_P]   # (d_pad, TILE_P)
        out_ref[:] += jax.lax.dot_general(
            g_r, oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)


def _pallas_scatter_rows_cm(g: jnp.ndarray, idx: jnp.ndarray, f: int) -> jnp.ndarray:
    """g: (D, P); idx: (P,).  Returns (D, F) accumulation."""
    d, p = g.shape
    f_pad = _round_up(max(f, _TILE_F), _TILE_F)
    d_pad = _round_up(d, 8)
    p_pad = _round_up(max(p, _SUPER_P), _SUPER_P)
    if (d_pad, p_pad) == (d, p):
        g_p = g
    else:
        g_p = jnp.zeros((d_pad, p_pad), g.dtype).at[:d, :p].set(g)
    idx = idx.astype(jnp.int32)
    if p_pad == p:
        idx_p = idx.reshape(p_pad // _SUPER_P, _ROWS, _TILE_P)
    else:
        idx_p = jnp.full((p_pad,), -1, jnp.int32).at[:p].set(idx).reshape(
            p_pad // _SUPER_P, _ROWS, _TILE_P)

    out = pl.pallas_call(
        _scatter_cm_kernel,
        grid=(f_pad // _TILE_F, p_pad // _SUPER_P),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _TILE_P), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, _SUPER_P), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_pad, _TILE_F), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, f_pad), jnp.float32),
    )(idx_p, g_p)
    return out[:d, :f]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _masked_gather_cm_small(table_t, idx):
    """Huge-F fallback gather, one 1-D gather per channel: 1-D outputs get
    linear layouts, so XLA can't pick a lane-minor-D layout that pads the
    result 14-42x (observed 20 GB allocations at 512^2 x K=150 x 82k faces)."""
    f = table_t.shape[1]
    valid = ((idx >= 0) & (idx < f)).astype(table_t.dtype)
    safe = jnp.clip(idx, 0, f - 1)
    rows = [table_t[i][safe] * valid for i in range(table_t.shape[0])]
    return jnp.stack(rows, axis=0)


_GATHER_CHUNK = 1 << 21  # bound XLA-gather transients for huge-F fallbacks


def _masked_gather_cm(table_t, idx):
    p = idx.shape[0]
    if p <= _GATHER_CHUNK:
        return _masked_gather_cm_small(table_t, idx)
    d = table_t.shape[0]
    p_pad = _round_up(p, _GATHER_CHUNK)
    if p_pad != p:
        idx = jnp.full((p_pad,), -1, jnp.int32).at[:p].set(idx)
    nc = p_pad // _GATHER_CHUNK

    def body(out, i):
        ix = jax.lax.dynamic_slice_in_dim(idx, i * _GATHER_CHUNK,
                                          _GATHER_CHUNK)
        vals = _masked_gather_cm_small(table_t, ix)
        out = jax.lax.dynamic_update_slice(out, vals, (0, i * _GATHER_CHUNK))
        return out, None

    out, _ = jax.lax.scan(body, jnp.zeros((d, p_pad), table_t.dtype),
                          jnp.arange(nc))
    return out[:, :p]


@jax.custom_vjp
def _take_rows_cm_2d(table_t, idx):
    """table_t: (D, F); idx: (P,) -> (D, P)."""
    if _on_tpu() and table_t.shape[1] <= MAX_ONEHOT_ROWS:
        return _pallas_take_rows_cm(table_t, idx)
    return _masked_gather_cm(table_t, idx)


def _take_rows_cm_fwd(table_t, idx):
    return _take_rows_cm_2d(table_t, idx), (idx, table_t.shape[1])


def _masked_scatter_cm_fallback(g, idx, f):
    """Chunked segment-sum scatter for huge-F fallbacks (bounds the lane-
    padded (P, D) transpose transient)."""
    d, p = g.shape

    def one(g_c, idx_c):
        valid = ((idx_c >= 0) & (idx_c < f)).astype(g_c.dtype)
        return jax.ops.segment_sum(
            (g_c * valid[None, :]).T, jnp.clip(idx_c, 0, f - 1),
            num_segments=f).T

    if p <= _GATHER_CHUNK:
        return one(g, idx)
    p_pad = _round_up(p, _GATHER_CHUNK)
    if p_pad != p:
        g = jnp.zeros((d, p_pad), g.dtype).at[:, :p].set(g)
        idx = jnp.full((p_pad,), -1, jnp.int32).at[:p].set(idx)
    nc = p_pad // _GATHER_CHUNK

    def body(acc, args):
        g_c, idx_c = args
        return acc + one(g_c, idx_c), None

    g3 = jnp.moveaxis(g.reshape(d, nc, _GATHER_CHUNK), 1, 0)
    idx2 = idx.reshape(nc, _GATHER_CHUNK)
    acc, _ = jax.lax.scan(body, jnp.zeros((d, f), g.dtype), (g3, idx2))
    return acc


def _take_rows_cm_bwd(res, g):
    idx, f = res
    if _on_tpu() and f <= MAX_ONEHOT_ROWS:
        d_table = _pallas_scatter_rows_cm(g, idx, f)
    else:
        d_table = _masked_scatter_cm_fallback(g, idx, f)
    return d_table, None


_take_rows_cm_2d.defvjp(_take_rows_cm_fwd, _take_rows_cm_bwd)


def take_rows_cm(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Channel-major differentiable gather: ``table[idx]`` with channels first.

    table: (F, ...) float (channels = prod of trailing dims, flattened);
    idx: any-shape int.  Returns (D, *idx.shape) with D = prod(table.shape[1:]).
    Negative / out-of-range indices give zero columns.
    """
    f = table.shape[0]
    d = int(np.prod(table.shape[1:])) if table.ndim > 1 else 1
    table_t = table.reshape(f, d).astype(jnp.float32).T
    out = _take_rows_cm_2d(table_t, idx.reshape(-1))
    return out.reshape((d,) + idx.shape)


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row-major convenience wrapper: ``table[idx]`` -> (*idx.shape, ...).

    Prefer :func:`take_rows_cm` on hot paths — this wrapper transposes the
    channel axis back to minor position, which re-introduces lane padding for
    small channel counts.
    """
    inner = table.shape[1:]
    out = take_rows_cm(table, idx)                     # (D, *idx.shape)
    out = jnp.moveaxis(out, 0, -1)                     # (*idx.shape, D)
    return out.reshape(idx.shape + inner)


def take_rows_batched(tables: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched ``tables[n, idx[n]]``: tables (N, F, ...), idx (N, ...)."""
    n, f = tables.shape[0], tables.shape[1]
    offsets = (jnp.arange(n, dtype=idx.dtype) * f).reshape(
        (n,) + (1,) * (idx.ndim - 1))
    idx_off = jnp.where(idx >= 0, idx + offsets, -1)
    flat = tables.reshape((n * f,) + tables.shape[2:])
    return take_rows(flat, idx_off)


def take_rows_cm_batched(tables: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Channel-major batched gather: tables (N, F, ...), idx (N, ...) ->
    (D, N, ...)."""
    n, f = tables.shape[0], tables.shape[1]
    offsets = (jnp.arange(n, dtype=idx.dtype) * f).reshape(
        (n,) + (1,) * (idx.ndim - 1))
    idx_off = jnp.where(idx >= 0, idx + offsets, -1)
    flat = tables.reshape((n * f,) + tables.shape[2:])
    return take_rows_cm(flat, idx_off)
