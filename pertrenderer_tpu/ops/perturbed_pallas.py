"""Fused Pallas TPU kernels for the perturbed estimators.

The XLA fallback in ops/perturbed.py runs a `lax.scan` over Monte-Carlo
samples: each of the S iterations generates counter-based threefry noise in
HBM and round-trips the full fragment volume.  These kernels fuse the whole
sample loop into VMEM using the TPU's native PRNG (`pltpu.prng_random_bits`):
one read of the inputs, S on-chip sampling+accumulation rounds, one write.

Noise families are generated from raw uniform bits (Box-Muller for gaussian,
inverse-CDF for cauchy/logistic/gumbel/uniform), matching the sampling
semantics of `/root/reference/randomras/smoothrast.py:17-31` and
`smoothagg.py:16-32` (including the ±1e7 cauchy clamp).  Streams are seeded
per (kernel, grid-tile) from the caller's JAX PRNG key, so forward and
backward replay identical noise — the rematerialization contract of the
custom VJPs in ops/perturbed.py.

Shapes: the Heaviside kernels are elementwise over a flattened, supertile-
padded (rows, 2048) view.  The argmax kernels are **channel-major**
(C, P): channels on sublanes (so the per-pixel max/one-hot is a sublane
reduction), pixels lane-aligned.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "heaviside_mean_pallas", "heaviside_coeff_pallas",
    "argmax_mean_pallas", "argmax_grads_pallas",
]

_TILE_P = 2048
_ROWS = 8
_SUPER = _ROWS * _TILE_P
_CAUCHY_CLAMP = 1e7
_TWO_PI = 2.0 * np.pi


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _to_uniform(bits):
    """Raw PRNG bits -> uniform (0, 1) floats.  Mask to the low 23 bits
    (keeps the value non-negative in signed int32 — Mosaic supports neither
    uint32->f32 casts nor logical right shifts of signed bits)."""
    masked = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
    return (masked.astype(jnp.float32) + 0.5) * (2.0 ** -23)


def _sample(shape, noise_type, seed0, seed1, s):
    """One standard-noise draw of ``shape`` for sample index ``s``.

    The per-core PRNG is RE-SEEDED for every (tile, sample) pair: stateful
    draw ops inside a fori_loop are otherwise identical across iterations and
    the compiler may CSE/hoist them.  The seed op serializes the single draw
    that follows it."""
    pltpu.prng_seed(seed0 + s * jnp.int32(40503), seed1)
    if noise_type == "gaussian":
        bits = pltpu.prng_random_bits((2,) + shape)
        u1 = _to_uniform(bits[0])
        u2 = _to_uniform(bits[1])
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        return r * jnp.cos(_TWO_PI * u2)
    u = _to_uniform(pltpu.prng_random_bits(shape))
    if noise_type == "cauchy":
        return jnp.clip(jnp.tan(np.pi * (u - 0.5)), -_CAUCHY_CLAMP,
                        _CAUCHY_CLAMP)
    if noise_type == "logistic":
        return jnp.log(u) - jnp.log1p(-u)
    if noise_type == "gumbel":
        return -jnp.log(-jnp.log(u))
    if noise_type == "uniform":
        return u - 0.5
    raise ValueError(f"noise type {noise_type!r} not implemented")


def _score(noise, noise_type):
    if noise_type == "gaussian":
        return noise
    if noise_type == "cauchy":
        return 2.0 * noise / (1.0 + noise * noise)
    raise ValueError(f"gradient for noise {noise_type!r} not implemented")


def _tile_seed(seed_ref, tile_ref):
    """First seed word mixed with the tile id (Knuth multiplicative hash) for
    a distinct per-tile stream.  The tile id comes from an INPUT indexed by
    the pixel-tile grid dim (not program_id) so the kernels stay correct
    under vmap, which prepends a batch grid dimension."""
    return seed_ref[0, 0] + tile_ref[0, 0, 0] * jnp.int32(-1640531527)


def _heaviside(x):
    return jnp.where(x >= 0, 1.0, 0.0)


def _key_seeds(key):
    """Two (1, 1) int32 seed words from a JAX PRNG key.  Shaped 2-D so the
    pallas vmap batching rule produces legal block specs when callers vmap
    over per-problem keys."""
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key
    data = data.reshape(-1).astype(jnp.uint32)
    s0 = data[0].astype(jnp.int32).reshape(1, 1)
    s1 = data[-1].astype(jnp.int32).reshape(1, 1)
    return s0, s1


def _tile_ids(n_tiles):
    return jnp.arange(n_tiles, dtype=jnp.int32).reshape(n_tiles, 1, 1)


def _flatten_super(x):
    n = x.size
    n_pad = _round_up(max(n, _SUPER), _SUPER)
    flat = x.reshape(-1).astype(jnp.float32)
    if n_pad != n:
        flat = jnp.zeros((n_pad,), jnp.float32).at[:n].set(flat)
    return flat.reshape(n_pad // _TILE_P, _TILE_P), n


# ---------------------------------------------------------------------------
# Perturbed Heaviside
# ---------------------------------------------------------------------------

def _ph_mean_kernel(s0_ref, s1_ref, tile_ref, d_ref, sig_ref, out_ref, *,
                    S, noise_type):
    s0 = _tile_seed(s0_ref, tile_ref)
    s1 = s1_ref[0, 0]
    d = d_ref[:]
    sigma = sig_ref[0, 0]

    def body(s, acc):
        z = _sample(d.shape, noise_type, s0, s1, s)
        return acc + _heaviside(d + sigma * z)

    acc = jax.lax.fori_loop(0, S, body, jnp.zeros_like(d))
    out_ref[:] = acc * (1.0 / S)


def _ph_coeff_kernel(s0_ref, s1_ref, tile_ref, d_ref, sig_ref, out_ref, *,
                     S, noise_type, variance_reduction):
    s0 = _tile_seed(s0_ref, tile_ref)
    s1 = s1_ref[0, 0]
    d = d_ref[:]
    sigma = sig_ref[0, 0]
    h0 = _heaviside(d) if variance_reduction else jnp.zeros_like(d)

    def body(s, acc):
        z = _sample(d.shape, noise_type, s0, s1, s)
        h = _heaviside(d + sigma * z)
        return acc + (h - h0) * _score(z, noise_type)

    acc = jax.lax.fori_loop(0, S, body, jnp.zeros_like(d))
    out_ref[:] = acc / (S * sigma)


def _ph_call(kernel, d, sigma, key, S, noise_type, **kw):
    d2, n = _flatten_super(d)
    rows = d2.shape[0]
    n_tiles = rows // _ROWS
    s0, s1 = _key_seeds(key)
    sig = jnp.reshape(sigma, (1, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        partial(kernel, S=S, noise_type=noise_type, **kw),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _TILE_P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, _TILE_P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(d2.shape, jnp.float32),
    )(s0, s1, _tile_ids(n_tiles), d2, sig)
    return out.reshape(-1)[:n].reshape(d.shape)


def heaviside_mean_pallas(d, sigma, key, S, noise_type):
    """mean_s H(d + sigma * Z_s) — fused forward."""
    return _ph_call(_ph_mean_kernel, d, sigma, key, S, noise_type)


def heaviside_coeff_pallas(d, sigma, key, S, noise_type, variance_reduction):
    """mean_s (H(d + sigma*Z_s) - H(d)*vr) * score(Z_s) / sigma — the
    elementwise gradient coefficient (same noise stream as the forward)."""
    return _ph_call(_ph_coeff_kernel, d, sigma, key, S, noise_type,
                    variance_reduction=variance_reduction)


# ---------------------------------------------------------------------------
# Perturbed argmax (channel-major)
# ---------------------------------------------------------------------------

def _onehot_max(z):
    """One-hot of per-pixel max over the channel (sublane) axis.  Continuous
    noise makes ties measure-zero."""
    zmax = jnp.max(z, axis=0, keepdims=True)
    return (z >= zmax).astype(jnp.float32)


def _onehot_max_first(z):
    """First-wins one-hot (torch.max scatter semantics, smoothagg.py:37-39)
    — used for the VR baseline, whose input can carry exact ties."""
    zmax = jnp.max(z, axis=0, keepdims=True)
    ridx = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    first = jnp.min(jnp.where(z >= zmax, ridx, jnp.int32(1 << 30)), axis=0,
                    keepdims=True)
    return (ridx == first).astype(jnp.float32)


def _pa_mean_kernel(s0_ref, s1_ref, tile_ref, z_ref, gam_ref, out_ref, *,
                    S, noise_type):
    s0 = _tile_seed(s0_ref, tile_ref)
    s1 = s1_ref[0, 0]
    z = z_ref[:]
    gamma = gam_ref[0, 0]

    def body(s, acc):
        noise = _sample(z.shape, noise_type, s0, s1, s)
        return acc + _onehot_max(z + gamma * noise)

    acc = jax.lax.fori_loop(0, S, body, jnp.zeros_like(z))
    out_ref[:] = acc * (1.0 / S)


def _pa_grads_kernel(s0_ref, s1_ref, tile_ref, z_ref, g_ref, gam_ref,
                     cmask_ref, gz_ref, gg_ref, *, S, noise_type,
                     variance_reduction):
    s0 = _tile_seed(s0_ref, tile_ref)
    s1 = s1_ref[0, 0]
    z = z_ref[:]
    g = g_ref[:]
    gamma = gam_ref[0, 0]
    cmask = cmask_ref[:]                     # (C_pad, 1): 1 for real channels
    w0 = _onehot_max_first(z) if variance_reduction else jnp.zeros_like(z)

    def body(s, carry):
        acc_z, acc_g = carry
        noise = _sample(z.shape, noise_type, s0, s1, s) * cmask
        w = _onehot_max(z + gamma * noise)
        diff = (w - w0) * cmask
        score = _score(noise, noise_type)
        dot = jnp.sum(g * diff, axis=0, keepdims=True)
        acc_z = acc_z + dot * score
        if noise_type == "gaussian":
            phi = jnp.sum(noise * noise, axis=0, keepdims=True)
        else:
            phi = jnp.sum(score * noise, axis=0, keepdims=True)
        acc_g = acc_g + dot * (phi - 1.0)
        return acc_z, acc_g

    acc_z, acc_g = jax.lax.fori_loop(
        0, S, body,
        (jnp.zeros_like(z), jnp.zeros((1, z.shape[1]), jnp.float32)))
    gz_ref[:] = acc_z / (S * gamma)
    gg_ref[:] = jnp.broadcast_to(acc_g / (S * gamma), gg_ref.shape)


def _pa_prep(z_cm):
    """Pad channels to a sublane multiple (with -inf so they never win) and
    pixels to the lane tile."""
    c, p = z_cm.shape
    c_pad = _round_up(max(c, 8), 8)
    p_pad = _round_up(max(p, _TILE_P), _TILE_P)
    z_p = jnp.full((c_pad, p_pad), -jnp.inf, jnp.float32)
    z_p = z_p.at[:c, :p].set(z_cm.astype(jnp.float32))
    cmask = (jnp.arange(c_pad) < c).astype(jnp.float32)[:, None]
    return z_p, cmask, c, p


def argmax_mean_pallas(z_cm, gamma, key, S, noise_type):
    """z_cm: (C, P) channel-major.  Returns mean one-hot (C, P)."""
    z_p, _, c, p = _pa_prep(z_cm)
    n_tiles = z_p.shape[1] // _TILE_P
    s0, s1 = _key_seeds(key)
    gam = jnp.reshape(gamma, (1, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        partial(_pa_mean_kernel, S=S, noise_type=noise_type),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((z_p.shape[0], _TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((z_p.shape[0], _TILE_P), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(z_p.shape, jnp.float32),
    )(s0, s1, _tile_ids(n_tiles), z_p, gam)
    return out[:c, :p]


def argmax_grads_pallas(z_cm, g_cm, gamma, key, S, noise_type,
                        variance_reduction):
    """Backward: returns (grad_z (C, P), gamma_term (P,)) with
    grad_gamma = sum(gamma_term) (same noise stream as the forward)."""
    z_p, cmask, c, p = _pa_prep(z_cm)
    g_p = jnp.zeros_like(z_p).at[:c, :p].set(g_cm.astype(jnp.float32))
    n_tiles = z_p.shape[1] // _TILE_P
    s0, s1 = _key_seeds(key)
    gam = jnp.reshape(gamma, (1, 1)).astype(jnp.float32)
    gz, gg = pl.pallas_call(
        partial(_pa_grads_kernel, S=S, noise_type=noise_type,
                variance_reduction=variance_reduction),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((z_p.shape[0], _TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((z_p.shape[0], _TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((z_p.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((z_p.shape[0], _TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(z_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, z_p.shape[1]), jnp.float32),
        ),
    )(s0, s1, _tile_ids(n_tiles), z_p, g_p, gam, cmask)
    return gz[:c, :p], gg[0, :p]
