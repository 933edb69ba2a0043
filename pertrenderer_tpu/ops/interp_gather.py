"""Fused barycentric-interpolating gather (Pallas, MXU).

``interp_rows_cm(tables, idx, w0, w1, w2)`` computes, channel-major,

    out[:, p] = w0[p] * tables[idx[p], 0] + w1[p] * tables[idx[p], 1]
              + w2[p] * tables[idx[p], 2]

i.e. barycentric interpolation of per-face corner attributes — the inner
loop of texture sampling and Phong shading.  Doing this as
gather-then-interpolate materializes a (3*D, P) corner tensor (the single
largest allocation in render-step profiles: 3.5-9 GB at batch>1); this
kernel folds the weights into the one-hot matmul,

    out_tile = sum_v  table_v_chunk @ (one_hot(idx) * w_v)

so only the (D, P) result ever reaches HBM.  Matmul FLOPs are identical to
the unfused gather (3 corner tables either way).

Differentiable w.r.t. the tables (transposed weighted one-hot matmuls) and
the weights (per-corner gathered values dotted with the cotangent); ``idx``
is integral.  Out-of-range indices give zero rows.  Falls back to jnp
gathers on CPU / for tables above ``MAX_ONEHOT_ROWS``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pertrenderer_tpu.ops.gather import (
    MAX_ONEHOT_ROWS,
    _on_tpu,
    _round_up,
)

__all__ = ["interp_rows_cm", "interp_rows_cm_batched"]

_TILE_P = 2048
_ROWS = 8
_SUPER = _ROWS * _TILE_P
_TILE_F = 128
_HI = jax.lax.Precision.HIGHEST


def _pad_inputs(table_t, idx, w0, w1, w2):
    """table_t: (3, D, F); idx/w: (P,).  Pad F, D and P to tile multiples."""
    three, d, f = table_t.shape
    p = idx.shape[0]
    f_pad = _round_up(max(f, _TILE_F), _TILE_F)
    d_pad = _round_up(d, 8)
    p_pad = _round_up(max(p, _SUPER), _SUPER)
    if (f_pad, d_pad) != (f, d):
        table_p = jnp.zeros((3, d_pad, f_pad), table_t.dtype
                            ).at[:, :d, :f].set(table_t)
    else:
        table_p = table_t
    idx = idx.astype(jnp.int32)
    if p_pad != p:
        idx = jnp.full((p_pad,), -1, jnp.int32).at[:p].set(idx)
        w0 = jnp.zeros((p_pad,), jnp.float32).at[:p].set(w0)
        w1 = jnp.zeros((p_pad,), jnp.float32).at[:p].set(w1)
        w2 = jnp.zeros((p_pad,), jnp.float32).at[:p].set(w2)
    shape2 = (p_pad // _TILE_P, _TILE_P)
    return (table_p,
            idx.reshape(p_pad // _SUPER, _ROWS, _TILE_P),
            w0.reshape(shape2), w1.reshape(shape2), w2.reshape(shape2),
            d, f, p, d_pad, f_pad, p_pad)


def _fwd_kernel(idx_ref, w0_ref, w1_ref, w2_ref, t0_ref, t1_ref, t2_ref,
                out_ref):
    f_chunk = pl.program_id(1)

    @pl.when(f_chunk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = f_chunk * _TILE_F
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_TILE_F, _TILE_P), 0) + base
    idx = idx_ref[0]                                   # (ROWS, TILE_P)
    tables = (t0_ref[:], t1_ref[:], t2_ref[:])
    weights = (w0_ref, w1_ref, w2_ref)
    for r in range(_ROWS):
        oh = (idx[r:r + 1, :] == row_iota).astype(jnp.float32)
        acc = jnp.zeros((t0_ref.shape[0], _TILE_P), jnp.float32)
        for v in range(3):
            wv = weights[v][r:r + 1, :]                # (1, TILE_P)
            acc += jax.lax.dot_general(
                tables[v], oh * wv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
        out_ref[:, r * _TILE_P:(r + 1) * _TILE_P] += acc


def _bwd_tables_kernel(idx_ref, w0_ref, w1_ref, w2_ref, g_ref, out_ref):
    """d_table_v[:, f] = sum_p w_v[p] * onehot[f, p] * g[:, p]; grid
    (f chunks, p tiles), accumulated over p."""
    p_chunk = pl.program_id(1)

    @pl.when(p_chunk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    f_chunk = pl.program_id(0)
    base = f_chunk * _TILE_F
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_TILE_F, _TILE_P), 0) + base
    idx = idx_ref[0]
    weights = (w0_ref, w1_ref, w2_ref)
    d_pad = out_ref.shape[0] // 3
    for r in range(_ROWS):
        oh = (idx[r:r + 1, :] == row_iota).astype(jnp.float32)
        g_r = g_ref[:, r * _TILE_P:(r + 1) * _TILE_P]
        for v in range(3):
            wv = weights[v][r:r + 1, :]
            out_ref[v * d_pad:(v + 1) * d_pad, :] += jax.lax.dot_general(
                g_r, oh * wv, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)


def _bwd_weights_kernel(idx_ref, g_ref, t0_ref, t1_ref, t2_ref,
                        dw0_ref, dw1_ref, dw2_ref):
    """d_w_v[p] = sum_d tables[v][:, idx[p]][d] * g[d, p]; grid
    (p tiles, f chunks), accumulated over f."""
    f_chunk = pl.program_id(1)

    @pl.when(f_chunk == 0)
    def _():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    base = f_chunk * _TILE_F
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_TILE_F, _TILE_P), 0) + base
    idx = idx_ref[0]
    tables = (t0_ref[:], t1_ref[:], t2_ref[:])
    outs = (dw0_ref, dw1_ref, dw2_ref)
    for r in range(_ROWS):
        oh = (idx[r:r + 1, :] == row_iota).astype(jnp.float32)
        g_r = g_ref[:, r * _TILE_P:(r + 1) * _TILE_P]   # (d_pad, TILE_P)
        for v in range(3):
            vals = jax.lax.dot_general(
                tables[v], oh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            outs[v][r:r + 1, :] += jnp.sum(vals * g_r, axis=0, keepdims=True)


def _w_spec():
    return pl.BlockSpec((_ROWS, _TILE_P), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _t_spec(d_pad):
    return pl.BlockSpec((d_pad, _TILE_F), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)


@jax.custom_vjp
def _interp_cm_core(table_t, idx, w0, w1, w2):
    """table_t: (3, D, F); idx/w: (P,) -> (D, P)."""
    if not (_on_tpu() and table_t.shape[2] <= MAX_ONEHOT_ROWS):
        f = table_t.shape[2]
        valid = ((idx >= 0) & (idx < f)).astype(jnp.float32)
        safe = jnp.clip(idx, 0, f - 1)
        out = (table_t[0][:, safe] * (w0 * valid)[None]
               + table_t[1][:, safe] * (w1 * valid)[None]
               + table_t[2][:, safe] * (w2 * valid)[None])
        return out

    (table_p, idx3, w0b, w1b, w2b, d, f, p, d_pad, f_pad,
     p_pad) = _pad_inputs(table_t, idx, w0, w1, w2)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(p_pad // _SUPER, f_pad // _TILE_F),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _TILE_P), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec(), _w_spec(), _w_spec(),
            _t_spec(d_pad), _t_spec(d_pad), _t_spec(d_pad),
        ],
        out_specs=pl.BlockSpec((d_pad, _SUPER), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, p_pad), jnp.float32),
    )(idx3, w0b, w1b, w2b, table_p[0], table_p[1], table_p[2])
    return out[:d, :p]


def _interp_fwd(table_t, idx, w0, w1, w2):
    return _interp_cm_core(table_t, idx, w0, w1, w2), (table_t, idx, w0, w1,
                                                       w2)


def _interp_bwd(res, g):
    table_t, idx, w0, w1, w2 = res
    three, d, f = table_t.shape
    p = idx.shape[0]

    if not (_on_tpu() and f <= MAX_ONEHOT_ROWS):
        valid = ((idx >= 0) & (idx < f)).astype(jnp.float32)
        safe = jnp.clip(idx, 0, f - 1)
        d_tables = []
        d_ws = []
        for v, wv in enumerate((w0, w1, w2)):
            contrib = g * (wv * valid)[None]              # (D, P)
            d_tables.append(jax.ops.segment_sum(contrib.T, safe,
                                                num_segments=f).T)
            vals = table_t[v][:, safe] * valid[None]
            d_ws.append(jnp.sum(vals * g, axis=0))
        return (jnp.stack(d_tables), None, d_ws[0], d_ws[1], d_ws[2])

    (table_p, idx3, w0b, w1b, w2b, d_, f_, p_, d_pad, f_pad,
     p_pad) = _pad_inputs(table_t, idx, w0, w1, w2)
    g_p = jnp.zeros((d_pad, p_pad), jnp.float32).at[:d, :p].set(g)

    d_table = pl.pallas_call(
        _bwd_tables_kernel,
        grid=(f_pad // _TILE_F, p_pad // _SUPER),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _TILE_P), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _TILE_P), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _TILE_P), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _TILE_P), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, _SUPER), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * d_pad, _TILE_F), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * d_pad, f_pad), jnp.float32),
    )(idx3, w0b, w1b, w2b, g_p)
    d_table = d_table.reshape(3, d_pad, f_pad)[:, :d, :f]

    dw0, dw1, dw2 = pl.pallas_call(
        _bwd_weights_kernel,
        grid=(p_pad // _SUPER, f_pad // _TILE_F),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _TILE_P), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, _SUPER), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            _t_spec(d_pad), _t_spec(d_pad), _t_spec(d_pad),
        ],
        out_specs=tuple(
            pl.BlockSpec((_ROWS, _TILE_P), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((p_pad // _TILE_P, _TILE_P), jnp.float32)
            for _ in range(3)),
    )(idx3, g_p, table_p[0], table_p[1], table_p[2])
    return (d_table, None,
            dw0.reshape(-1)[:p], dw1.reshape(-1)[:p], dw2.reshape(-1)[:p])


_interp_cm_core.defvjp(_interp_fwd, _interp_bwd)


def interp_rows_cm(tables: jnp.ndarray, idx: jnp.ndarray, w0, w1, w2):
    """tables: (F, 3, ...) per-face corner attributes; idx/w0/w1/w2: any
    common shape.  Returns (D, *idx.shape), D = prod(tables.shape[2:])."""
    f = tables.shape[0]
    d = int(np.prod(tables.shape[2:])) if tables.ndim > 2 else 1
    # (F, 3, D) -> (3, D, F)
    table_t = jnp.moveaxis(tables.reshape(f, 3, d).astype(jnp.float32),
                           0, -1)
    out = _interp_cm_core(
        table_t, idx.reshape(-1),
        w0.reshape(-1).astype(jnp.float32),
        w1.reshape(-1).astype(jnp.float32),
        w2.reshape(-1).astype(jnp.float32))
    return out.reshape((d,) + idx.shape)


def interp_rows_cm_batched(tables: jnp.ndarray, idx: jnp.ndarray, w0, w1, w2):
    """Batched variant: tables (N, F, 3, ...), idx/w (N, ...) ->
    (D, N, ...)."""
    n, f = tables.shape[0], tables.shape[1]
    offsets = (jnp.arange(n, dtype=idx.dtype) * f).reshape(
        (n,) + (1,) * (idx.ndim - 1))
    idx_off = jnp.where(idx >= 0, idx + offsets, -1)
    flat = tables.reshape((n * f,) + tables.shape[2:])
    return interp_rows_cm(flat, idx_off, w0, w1, w2)
