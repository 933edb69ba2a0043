"""Monolithic fused Pallas render kernel: rasterize -> shade -> texture ->
perturbed estimators -> blend, all resident in VMEM.

This is the TPU-native stand-in for the reference's CUDA hot loop — the
PyTorch3D ``rasterize_meshes`` kernel consumed at
`/root/reference/randomras/random_rasterizer.py:17` plus the entire shading /
blending chain above it (`random_rasterizer.py:34-116`).  The XLA-composed
pipeline (ops/rasterize.py + shading.py + blending.py) round-trips 13-40 MB
fragment tensors through HBM ~20x per render; this kernel reads O(F) face
tables, keeps every per-fragment quantity in VMEM, and writes the image once.

Design
------
**Slots are faces.**  The perturbed blend
(`/root/reference/randomras/random_rasterizer.py:34-56`) is permutation-
invariant across the K fragment slots: coverage probabilities, the alpha
product, the z_map aggregation and the weighted color sum are all symmetric
in slots, and a zero-coverage slot is an exact no-op (prob 0, z_map -inf).
So whenever F <= faces_per_pixel, top-K selection/sorting is unnecessary:
every face gets its own slot and all per-fragment arrays are dense
(F_pad, P_tile) channel-major blocks — pure 2-D outer-product math between
(F_pad, 1) face-table columns and (1, P_tile) pixel coordinates.  No gathers,
no sorts, no scatter.

**Backward = in-kernel jax.vjp + PRNG replay.**  The deterministic segments
(geometry/shading/texturing, the z_map preamble with ``log_corrected`` /
``prod_corrected``, the blend) are differentiated *inside the backward
kernel* with ``jax.vjp`` — so clip/min/max tie-handling and the corrected
primitives' custom VJPs match the XLA path by construction.  The stochastic
estimators use the reference's variance-reduced score-function gradients
(`/root/reference/randomras/smoothrast.py:39-59`, ``smoothagg.py:44-73``),
replaying the forward noise from a counter-based hash PRNG keyed on the
*absolute* pixel position — identical bits in forward and backward.  The
integer hash + uniform stage is bit-identical on every backend; the full
gaussian/cauchy draws are bit-identical between compiled Mosaic and
interpreter mode *on the same backend*, but differ from CPU by <=2e-4
absolute because the TPU's fast transcendentals (notably ``log``, ~1e-4
relative) round differently than CPU libm — see ``prng_probe`` and the
three-level identity pin in bench.py.

**Gamma-gradient channel count.**  The reference's gamma gradient uses
``phi = ||Z||^2`` summed over all K+1 noise channels (smoothagg.py:54-56),
so its mean depends on the channel count even though empty slots never win
the argmax.  With F_pad+1 physical channels we add the deterministic
compensation ``K - F_pad`` (the expectation of the missing empty-slot
``Z^2`` terms, each ~ chi^2(1) with mean 1): the gamma gradient matches the
K-slot XLA path exactly in expectation, with slightly lower variance.

Supported configurations (others fall back to the XLA path — see
``try_render``): every entry of the experiment noise menu
(`/root/reference/experiments/eval.py:145-163`), Phong or texel-only
shading, Point/Directional lights, vertex / atlas / baked-UV textures,
perspective-correct and backface-cull options, batched via vmap.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pertrenderer_tpu.ops.perturbed import log_corrected, prod_corrected
from pertrenderer_tpu.ops.rasterize import _face_pixel_geometry

__all__ = ["FusedConfig", "fused_available", "try_render",
           "try_render_loss", "MAX_SLOTS", "RenderPlan", "render_plan"]

MAX_SLOTS = 256          # flat-mode face budget (F_pad <= MAX_SLOTS)
MAX_BIN_SLOTS = 160      # binned-mode per-tile face budget (VMEM-bound:
                         # the backward's vjp residuals measure ~85 KB per
                         # slot-row at p_tile=128 against the 16 MB limit;
                         # M=168 still overflows by ~70 KB after the
                         # round-3 geometry precomputation widened live
                         # ranges slightly)
_BIN_P_TILE = 128        # binned tile width (min lane width on TPU; tests
                         # shrink it in interpreter mode for small images)
_CAUCHY_CLAMP = 1e7

# --- packed scalar-parameter layout (one (1, NS) f32 vector) ---------------
_S_LIGHT = 0      # light location (point) or direction (directional)
_S_LAMB = 3       # lights.ambient_color
_S_LDIFF = 6      # lights.diffuse_color
_S_LSPEC = 9      # lights.specular_color
_S_MAMB = 12      # materials.ambient_color
_S_MDIFF = 15     # materials.diffuse_color
_S_MSPEC = 18     # materials.specular_color
_S_SHIN = 21      # materials.shininess (non-diff: stop-gradient, see bwd)
_S_CAM = 22       # camera center
_S_BG = 25        # background color
_S_ZNEAR = 28
_S_ZFAR = 29
_S_SIGMA = 30     # smoothrast.sigma
_S_GAMMA = 31     # smoothagg.gamma
_S_ALPHA = 32     # smoothagg.alpha
_S_BLUR = 33      # blur radius (traced: annealing never recompiles)
_NS = 34


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class FusedConfig:
    """Static (trace-time) configuration of the fused kernel."""

    image_size: int
    f_pad: int                 # face slots (multiple of 8)
    f_real: int                # actual face count (<= f_pad)
    k: int                     # reference faces_per_pixel (phi channel count)
    p_tile: int                # pixels per grid step (multiple of 128)
    blur_radius: float
    rast_kind: str             # 'soft' | 'affine' | 'hard' | 'mc'
    rast_noise: str            # 'gaussian' | 'cauchy'
    rast_vr: bool
    s_rast: int
    agg_kind: str              # 'soft' | 'hard' | 'mc'
    agg_noise: str
    agg_vr: bool
    s_agg: int
    eps_bg: float
    shade: str                 # 'phong' | 'none'
    light_kind: str            # 'point' | 'directional'
    tex_mode: str              # 'corner' | 'atlas'
    tex_d: int                 # columns of the texel table
    atlas_r: int
    clip_bary: bool
    perspective_correct: bool
    interpret: bool
    binned: bool = False       # slots are bin-local face lists, not all faces
    prob_ext: bool = False     # sample-axis sharding: coverage prob comes in
                               # as a pmean'd input; fwd also emits weights
    stream: bool = False       # chunked streaming over y-sorted windows
    rw: int = 0                # streaming window rows (multiple of chunk)
    tile_w: int = 0            # 2-D pixel tiles: each grid step covers a
                               # (p_tile // tile_w, tile_w) image rectangle
                               # instead of a row strip (0 = strips).  The
                               # kernels' HBM pixel axis is then tile-major;
                               # the public entries permute at the boundary.
    pack_m: int = 0            # per-tile face packing (flat mode): tiles
                               # whose conservative bbox-band overlap count
                               # fits in pack_m - 1 face slots (+ background)
                               # run the whole pipeline on pack_m rows
                               # instead of f_pad — exact, because the
                               # excluded faces are out-of-band for every
                               # pixel of the tile.  0 = off.

    @property
    def bg_row(self) -> int:
        """Row index of the background channel in z_map.

        When the real face count is below f_pad, the background channel is
        *compacted* into the first dead sublane row (slots f_real..f_pad-1
        are zero-coverage no-ops), so the z_map block — and the argmax noise
        drawn over it — stays f_pad rows instead of f_pad + 8.
        """
        return self.f_real if self.f_real < self.f_pad else self.f_pad

    @property
    def c_zpad(self) -> int:
        # z_map rows: slots + background, padded to a sublane multiple.
        # Compacted layout (f_real < f_pad) fits inside f_pad rows.
        return _round_up(self.bg_row + 1, 8)


# ---------------------------------------------------------------------------
# Counter-based hash PRNG (murmur3 finalizer), identical on CPU/TPU.
# ---------------------------------------------------------------------------

def _mix(x):
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 16))
    x = x * jnp.int32(-2048144789)        # 0x85EBCA6B
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 13))
    x = x * jnp.int32(-1028477387)        # 0xC2B2AE35
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 16))
    return x


def _uniform01(h):
    """Low 23 bits -> uniform (0, 1); mask keeps the int32 carrier
    non-negative (Mosaic has no uint32->f32 cast)."""
    m = jnp.bitwise_and(h, jnp.int32(0x7FFFFF))
    return (m.astype(jnp.float32) + 0.5) * (2.0 ** -23)


def _hash_words(seed0, seed1, s, rows, pos):
    """Mixed counter for (seed, sample index s, channel row, absolute pixel
    position).  Position-keyed streams make the backward replay exact
    regardless of tiling.

    The channel row folds into the seed word with its own odd multiplier
    (not packed into spare position bits), so arbitrarily large row ids —
    the streaming kernel keys noise on absolute sorted-face indices — never
    collide.  The sample index shares the seed word linearly, which is what
    lets sample-axis sharding express global sample offsets as a seed
    adjustment."""
    x = _mix(pos)
    x = _mix(jnp.bitwise_xor(
        x, seed0 + s * jnp.int32(-1640531527)
        + rows * jnp.int32(-2048144777)))
    return jnp.bitwise_xor(x, seed1)


def _draw_block(noise_type: str, seed0, seed1, s, c, p, pos, row_base=0):
    """(c, p) block of iid standard noise (c must be even — always true for
    the sublane-padded channel counts).  Gaussian uses both Box-Muller
    outputs (cos and sin halves), halving the uniform-draw cost.  (A
    polynomial fast-math ln/sincos was tried and measured SLOWER than the
    Mosaic builtins — 0.391 vs 0.380 ms/step on the headline config; the
    ~60 us transcendental budget is already near the VPU floor.)

    ``row_base`` offsets the hashed channel ids — the streaming kernel
    draws chunk blocks whose rows key on absolute sorted-face indices."""
    if noise_type == "gaussian":
        ch = c // 2
        rows = jax.lax.broadcasted_iota(jnp.int32, (ch, p), 0) + row_base
        x = _hash_words(seed0, seed1, s, rows, pos)
        u1 = _uniform01(x)                       # x is already well mixed
        u2 = _uniform01(_mix(x + jnp.int32(-1150833019)))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        th = (2.0 * np.pi) * u2
        return jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0) + row_base
    x = _hash_words(seed0, seed1, s, rows, pos)
    u = _uniform01(_mix(x + jnp.int32(0x6A09E667)))
    if noise_type == "cauchy":
        return jnp.clip(jnp.tan(np.pi * (u - 0.5)), -_CAUCHY_CLAMP,
                        _CAUCHY_CLAMP)
    if noise_type == "uniform":
        # The raw uniform stage: integer hash + power-of-two scaling only,
        # so (unlike the transcendental-mapped draws) the bits are
        # identical on every backend.  Used by the prng_probe identity pin.
        return u
    raise ValueError(f"fused kernel: noise {noise_type!r} unsupported")


def prng_probe(noise_type: str = "gaussian", s: int = 4, c: int = 16,
               p: int = 256, interpret: bool = False):
    """Draw ``s`` (c, p) noise blocks through a real pallas_call — the
    identity probe for the hash PRNG.  Three levels are pinned (goldens in
    tests/goldens/prng_goldens.npz; bench.py re-checks on every driver run):

    1. ``noise_type='uniform'`` (integer hash + power-of-two scale) is
       bit-exact against the goldens on EVERY backend — this pins the PRNG
       stream itself.
    2. gaussian/cauchy compiled-vs-interpreter on the SAME backend is
       bit-exact — this is the Mosaic-toolchain-split hazard check.
    3. gaussian/cauchy compiled-on-TPU vs the CPU-recorded goldens agree to
       a tight tolerance (<=5e-4 abs for gaussian, <=1e-5 relative for
       cauchy): cross-platform bit-identity is unattainable because TPU
       transcendentals (and even mul+add FMA contraction, div, sqrt) round
       1-2 ulp differently than CPU — measured 2026-08-18, TPU fast ``log``
       is ~1e-4 relative off CPU libm."""

    def kernel(seed_ref, out_ref):
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) + 7
        for i in range(s):
            out_ref[i] = _draw_block(noise_type, seed_ref[0, 0],
                                     seed_ref[0, 1], i, c, p, pos)

    seeds = jnp.asarray([[1234567, -987654]], jnp.int32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, c, p), jnp.float32),
        interpret=interpret,
    )(seeds)


def _score(noise, noise_type: str):
    if noise_type == "gaussian":
        return noise
    return 2.0 * noise / (1.0 + noise * noise)      # cauchy


def _heaviside(x):
    return jnp.where(x >= 0, 1.0, 0.0)


# ---------------------------------------------------------------------------
# Tile-level pipeline pieces (pure jnp; shared by fwd and bwd kernels)
# ---------------------------------------------------------------------------

def _col(tab, i):
    return tab[:, i:i + 1]


def _tile_coords(cfg: FusedConfig, tile):
    """Absolute pixel position (1, P) and NDC center coords for this tile.

    2-D mode (cfg.tile_w > 0): the tile covers a (TH, TW) image rectangle
    at grid position (tile // ntx, tile % ntx).  ``pos`` stays the absolute
    row-major pixel id either way, so the PRNG streams (and the backward
    replay) are independent of the tiling."""
    p = cfg.p_tile
    w = h = cfg.image_size
    i = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    if cfg.tile_w:
        tw = cfg.tile_w
        ntx = w // tw
        row = (tile // ntx) * (p // tw) + i // tw
        col = (tile % ntx) * tw + i % tw
        pos = row * w + col
        pixvalid = jnp.full(i.shape, True)
    else:
        pos = tile * p + i
        col = pos % w
        row = pos // w
        pixvalid = pos < (h * w)
    px = (w - 1.0 - 2.0 * col.astype(jnp.float32)) / w
    py = (h - 1.0 - 2.0 * row.astype(jnp.float32)) / h
    return pos, px, py, pixvalid


def _make_det1(cfg: FusedConfig, px, py, pixvalid, validb):
    """Geometry + texturing + shading: tables -> (dist, z, c0, c1, c2, maskf).

    ``maskf`` (per-slot candidacy, float) is a stop-gradient output.  Colors,
    interpolated points/normals and texels are masked exactly where the XLA
    path's gather masks them (empty fragments read as zero), which also keeps
    inf/nan off the non-candidate slots so the in-kernel vjp stays clean.
    """

    def det1(fv_ndc, fv_world, fn_world, tex, scal):
        coords = [_col(fv_ndc, i) for i in range(9)]
        w0, w1, w2, z, dist, inside, degen = _face_pixel_geometry(
            px, py, *coords, cfg.clip_bary, cfg.perspective_correct)
        cand = ((inside | (dist <= scal[0, _S_BLUR])) & ~degen
                & validb & (z > 0) & pixvalid)
        maskf = jax.lax.stop_gradient(cand.astype(jnp.float32))

        # Texel colors per slot (masked like the XLA gather: empty -> 0).
        if cfg.tex_mode == "corner":
            texel = [(w0 * _col(tex, c) + w1 * _col(tex, 3 + c)
                      + w2 * _col(tex, 6 + c)) * maskf for c in range(3)]
        elif cfg.atlas_r == 1:   # one texel per face: plain masked read
            texel = [maskf * _col(tex, c) for c in range(3)]
        else:  # atlas: (F_pad, R*R*3), cell from quantized (w1, w2)
            r = cfg.atlas_r
            xi = jnp.clip((jnp.clip(w1, 0.0, 1.0) * r).astype(jnp.int32),
                          0, r - 1)
            yi = jnp.clip((jnp.clip(w2, 0.0, 1.0) * r).astype(jnp.int32),
                          0, r - 1)
            cell = yi * r + xi
            texel = [jnp.zeros_like(w0) for _ in range(3)]
            for j in range(r * r):
                sel = (cell == j).astype(jnp.float32) * maskf
                for c in range(3):
                    texel[c] = texel[c] + sel * _col(tex, j * 3 + c)

        if cfg.shade == "none":
            c0, c1, c2 = texel
        else:
            sc = lambda i: scal[0, i]
            # Interpolate world positions / vertex normals (masked, like the
            # XLA interp-gather; normals are NOT re-normalized, matching
            # shading.phong_shading_cm).
            pnt = [(w0 * _col(fv_world, v) + w1 * _col(fv_world, 3 + v)
                    + w2 * _col(fv_world, 6 + v)) * maskf for v in range(3)]
            nrm = [(w0 * _col(fn_world, v) + w1 * _col(fn_world, 3 + v)
                    + w2 * _col(fn_world, 6 + v)) * maskf for v in range(3)]
            if cfg.light_kind == "point":
                tl = [sc(_S_LIGHT + v) - pnt[v] for v in range(3)]
            else:
                tl = [jnp.broadcast_to(-sc(_S_LIGHT + v), pnt[v].shape)
                      for v in range(3)]
            tln = jnp.sqrt(tl[0] * tl[0] + tl[1] * tl[1] + tl[2] * tl[2])
            tl = [v / jnp.maximum(tln, 1e-8) for v in tl]
            cos = nrm[0] * tl[0] + nrm[1] * tl[1] + nrm[2] * tl[2]

            vd = [sc(_S_CAM + v) - pnt[v] for v in range(3)]
            vdn = jnp.sqrt(vd[0] * vd[0] + vd[1] * vd[1] + vd[2] * vd[2])
            vd = [v / jnp.maximum(vdn, 1e-8) for v in vd]
            refl = [2.0 * cos * nrm[v] - tl[v] for v in range(3)]
            spec_a = jnp.maximum(
                vd[0] * refl[0] + vd[1] * refl[1] + vd[2] * refl[2], 0.0)
            facing = (cos > 0.0).astype(jnp.float32)
            shin = jax.lax.stop_gradient(sc(_S_SHIN))
            spec_pow = facing * jnp.power(spec_a, shin)

            cmax = jnp.maximum(cos, 0.0)
            out = []
            for c in range(3):
                ambient = sc(_S_MAMB + c) * sc(_S_LAMB + c)
                diffuse = cmax * sc(_S_LDIFF + c) * sc(_S_MDIFF + c)
                specular = spec_pow * sc(_S_LSPEC + c) * sc(_S_MSPEC + c)
                out.append((ambient + diffuse) * texel[c] + specular)
            c0, c1, c2 = out
        return dist, z, c0, c1, c2, maskf

    return det1


def _make_det_rast(cfg: FusedConfig):
    """Deterministic coverage front-ends (models/smoothrast.py semantics)."""

    def det_rast(dist, scal):
        sigma = scal[0, _S_SIGMA]
        if cfg.rast_kind == "soft":
            return jax.nn.sigmoid(-dist / sigma)
        if cfg.rast_kind == "affine":
            p = -dist / sigma + 0.5
            p = jnp.where(-dist / sigma > 0.5, jnp.ones_like(p), p)
            return jnp.maximum(p, 0.0)
        if cfg.rast_kind == "hard":
            return _heaviside(-dist)
        raise AssertionError(cfg.rast_kind)

    return det_rast


def _make_det2(cfg: FusedConfig, maskf):
    """The shared aggregation preamble (models/smoothagg.py:43-58):
    z_inv, corrected log-prob scaling, background channel.

    Compacted layout (f_real < f_pad): the background value overwrites dead
    slot row ``bg_row`` elementwise (dead slots are -inf no-ops either way),
    so the z_map block stays f_pad rows.  Classic layout (f_real == f_pad):
    background + -inf padding rows are concatenated below the slots."""

    def det2(prob, z, scal):
        znear = scal[0, _S_ZNEAR]
        zfar = scal[0, _S_ZFAR]
        z_inv = (zfar - z) / (zfar - znear) * maskf
        z_inv_max = jnp.maximum(jnp.max(z_inv, axis=0, keepdims=True),
                                cfg.eps_bg)
        lp = log_corrected(prob)
        if cfg.agg_kind == "hard":
            scaled = jnp.float32(1.0 / 1e6) * lp       # smoothagg.py:281
        else:
            gal = scal[0, _S_GAMMA] / scal[0, _S_ALPHA]
            scaled = prod_corrected(gal, lp)
        zmap = scaled + z_inv - z_inv_max
        bg = cfg.eps_bg - z_inv_max
        if cfg.bg_row < cfg.f_pad:
            ridx = jax.lax.broadcasted_iota(jnp.int32, zmap.shape, 0)
            return jnp.where(ridx == cfg.bg_row, bg, zmap)
        rows = [zmap, bg]
        n_pad = cfg.c_zpad - cfg.f_pad - 1
        if n_pad:
            rows.append(jnp.full((n_pad, zmap.shape[1]), -jnp.inf,
                                 jnp.float32))
        return jnp.concatenate(rows, axis=0)

    return det2


def _det2b_soft(zmap_full, scal):
    """SoftAgg: softmax(prod_corrected(1/gamma, z_map))
    (models/smoothagg.py:80)."""
    inv_gamma = 1.0 / scal[0, _S_GAMMA]
    return jax.nn.softmax(prod_corrected(inv_gamma, zmap_full), axis=0)


def _hard_onehot_rows(zf):
    """First-wins one-hot of the row-axis argmax (torch.max semantics,
    `/root/reference/randomras/smoothagg.py:283-287`)."""
    zmax = jnp.max(zf, axis=0, keepdims=True)
    ism = zf >= zmax
    ridx = jax.lax.broadcasted_iota(jnp.int32, zf.shape, 0)
    first = jnp.min(jnp.where(ism, ridx, jnp.int32(1 << 30)), axis=0,
                    keepdims=True)
    return (ridx == first).astype(jnp.float32)


def _make_det3(cfg: FusedConfig):
    """Blend: weighted colors + background, alpha = 1 - prod(1 - prob)
    (`/root/reference/randomras/random_rasterizer.py:48-54`).  The alpha
    product is an unrolled multiply chain so its vjp is Mosaic-friendly."""

    def det3(weights, prob, c0, c1, c2, scal):
        # Slot rows: in the compacted layout the background row sits inside
        # [:f_pad] but its color is identically 0 (dead-slot mask), so the
        # weighted sum is unaffected by including it.
        wz = weights[:cfg.f_pad]
        wb = weights[cfg.bg_row:cfg.bg_row + 1]
        rgb = []
        for c, cc in enumerate((c0, c1, c2)):
            rgb.append(jnp.sum(wz * cc, axis=0, keepdims=True)
                       + wb * scal[0, _S_BG + c])
        ap = jnp.ones((1, prob.shape[1]), jnp.float32)
        for i in range(cfg.f_pad):
            ap = ap * (1.0 - prob[i:i + 1])
        return jnp.concatenate(rgb + [1.0 - ap], axis=0)

    return det3


# --- MC estimator sample loops (hash-PRNG; replayed in backward) -----------

_UNROLL = 16   # sample loops up to this trip count unroll to straight-line
               # code (no Mosaic loop overhead; sample index is a constant)


def _sample_loop(n, body, carry, unroll=True):
    """fori_loop over samples, unrolled for small static trip counts.

    Binned-mode kernels keep the rolled loop: unrolling widens Mosaic's
    live ranges enough to push the M=176-slot backward past the 16 MB
    scoped-VMEM limit."""
    if unroll and n <= _UNROLL:
        for s in range(n):
            carry = body(s, carry)
        return carry
    return jax.lax.fori_loop(0, n, body, carry)


def _mc_rast_forward(cfg, d, sigma, s0, s1, pos, row_base=0):
    c, p = d.shape

    def body(s, acc):
        z = _draw_block(cfg.rast_noise, s0, s1, s, c, p, pos, row_base)
        return acc + _heaviside(d + sigma * z)

    acc = _sample_loop(cfg.s_rast, body, jnp.zeros_like(d),
                       unroll=not cfg.binned)
    return acc * (1.0 / cfg.s_rast)


def _mc_rast_coeff(cfg, d, sigma, s0, s1, pos, row_base=0):
    """Variance-reduced score coefficient: grad wrt d is coeff * g and the
    sigma grad is sum(coeff * g) (the reference's sigma-grad overwrite quirk,
    `/root/reference/randomras/smoothrast.py:55-58`)."""
    c, p = d.shape
    h0 = _heaviside(d) if cfg.rast_vr else jnp.zeros_like(d)

    def body(s, acc):
        z = _draw_block(cfg.rast_noise, s0, s1, s, c, p, pos, row_base)
        h = _heaviside(d + sigma * z)
        return acc + (h - h0) * _score(z, cfg.rast_noise)

    acc = _sample_loop(cfg.s_rast, body, jnp.zeros_like(d),
                       unroll=not cfg.binned)
    return acc / (cfg.s_rast * sigma)


def _mc_rast_fwd_coeff(cfg, d, sigma, s0, s1, pos, row_base=0):
    """Fused forward mean + score coefficient (one noise pass for backward).
    Identical streams to _mc_rast_forward/_mc_rast_coeff."""
    c, p = d.shape
    h0 = _heaviside(d) if cfg.rast_vr else jnp.zeros_like(d)

    def body(s, carry):
        acc_p, acc_c = carry
        z = _draw_block(cfg.rast_noise, s0, s1, s, c, p, pos, row_base)
        h = _heaviside(d + sigma * z)
        return acc_p + h, acc_c + (h - h0) * _score(z, cfg.rast_noise)

    acc_p, acc_c = _sample_loop(
        cfg.s_rast, body, (jnp.zeros_like(d), jnp.zeros_like(d)),
        unroll=not cfg.binned)
    return acc_p * (1.0 / cfg.s_rast), acc_c / (cfg.s_rast * sigma)


def _onehot_ge(z):
    zmax = jnp.max(z, axis=0, keepdims=True)
    return (z >= zmax).astype(jnp.float32)


def _mc_agg_forward(cfg, zmap_full, gamma, s0, s1, pos):
    c, p = zmap_full.shape

    def body(s, acc):
        n = _draw_block(cfg.agg_noise, s0, s1, s, c, p, pos)
        return acc + _onehot_ge(zmap_full + gamma * n)

    acc = _sample_loop(cfg.s_agg, body, jnp.zeros_like(zmap_full),
                       unroll=not cfg.binned)
    return acc * (1.0 / cfg.s_agg)


def _agg_masks(cfg, shape):
    """Channel mask plus the phi (gamma-gradient) channel accounting.

    phi must sum the squared noise of every channel that can decide the
    argmax (their covariance with the weight perturbation is the signal) —
    that is every slot row plus background (rows <= bg_row; in the
    compacted layout rows past bg_row are dead padding).  The reference
    draws exactly k+1 channels (smoothagg.py:54); the deterministic
    compensation k - bg_row adds/removes the expectation of the count
    difference (independent chi^2(1) terms, mean 1 each), so the estimator
    mean matches the k-slot reference for any physical channel count.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cmask = (rows <= cfg.bg_row).astype(jnp.float32)     # slots + background
    return cmask, cmask, float(cfg.k - cfg.bg_row)


def _mc_agg_fwd_grads(cfg, zmap_full, g_w, gamma, s0, s1, pos):
    """Perturbed-argmax forward AND backward in one replay loop
    (`/root/reference/randomras/smoothagg.py:13-73`): returns
    (weights, g_zmap, gamma_term (1, P)).

    ``g_w`` is linear in the blend colors so the caller can build it before
    the weights exist.  phi uses the deterministic channel-count
    compensation (see module docstring): real rows contribute their drawn
    Z^2, the K-F_pad empty XLA-path channels their expectation 1 each.
    The masked noise leaves the one-hot unchanged (masked rows are -inf in
    z_map), so the accumulated weights equal _mc_agg_forward's exactly.
    """
    shape = zmap_full.shape
    cmask, phimask, phi_comp = _agg_masks(cfg, shape)
    # First-wins one-hot for the VR baseline (torch.max scatter semantics,
    # smoothagg.py:37-39); the perturbed draws keep the cheaper >=-max
    # one-hot (continuous noise makes their ties measure-zero).
    w0 = (_hard_onehot_rows(zmap_full) if cfg.agg_vr
          else jnp.zeros_like(zmap_full))

    def body(s, carry):
        acc_w, acc_z, acc_g = carry
        n = _draw_block(cfg.agg_noise, s0, s1, s, shape[0], shape[1],
                        pos) * cmask
        w = _onehot_ge(zmap_full + gamma * n)
        diff = (w - w0) * cmask
        dot = jnp.sum(g_w * diff, axis=0, keepdims=True)
        acc_z = acc_z + dot * _score(n, cfg.agg_noise)
        if cfg.agg_noise == "gaussian":
            phi = jnp.sum(n * n * phimask, axis=0, keepdims=True) + phi_comp
        else:
            phi = (jnp.sum(_score(n, cfg.agg_noise) * n * phimask, axis=0,
                           keepdims=True) + phi_comp)
        acc_g = acc_g + dot * (phi - 1.0)
        return acc_w + w, acc_z, acc_g

    acc_w, acc_z, acc_g = _sample_loop(
        cfg.s_agg, body,
        (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
         jnp.zeros((1, shape[1]), jnp.float32)), unroll=not cfg.binned)
    return (acc_w * (1.0 / cfg.s_agg), acc_z / (cfg.s_agg * gamma),
            acc_g / (cfg.s_agg * gamma))


def _mc_agg_grads(cfg, zmap_full, g_w, gamma, s0, s1, pos):
    """Backward-only replay (kept for the estimator statistics tests)."""
    _, g_zmap, gterm = _mc_agg_fwd_grads(cfg, zmap_full, g_w, gamma, s0, s1,
                                         pos)
    return g_zmap, gterm


def _build_g_w(cfg: FusedConfig, c0, c1, c2, g_rgb, scal):
    """Weight cotangent of the (linear) blend, laid out like z_map:
    g_w[slot] = <colors_slot, g_rgb>, g_w[bg_row] = <bg_color, g_rgb>."""
    g_w_slots = c0 * g_rgb[0] + c1 * g_rgb[1] + c2 * g_rgb[2]
    g_w_bg = (scal[0, _S_BG] * g_rgb[0]
              + scal[0, _S_BG + 1] * g_rgb[1]
              + scal[0, _S_BG + 2] * g_rgb[2])
    if cfg.bg_row < cfg.f_pad:
        # Compacted layout: bg lives in a dead slot row (colors there are 0).
        ridx = jax.lax.broadcasted_iota(jnp.int32, g_w_slots.shape, 0)
        return jnp.where(ridx == cfg.bg_row, g_w_bg, g_w_slots)
    return jnp.concatenate(
        [g_w_slots, g_w_bg,
         jnp.zeros((cfg.c_zpad - cfg.f_pad - 1, g_w_slots.shape[1]),
                   jnp.float32)], axis=0)


def _agg_stash(cfg: FusedConfig) -> bool:
    """The loss-and-grad kernel's aggregation forward and backward are two
    loops (the weight cotangent needs the rendered image); stashing the
    drawn noise in VMEM scratch between them removes one of the kernel's
    three noise generations.  Bounded by scratch size."""
    return (cfg.agg_kind == "mc"
            and cfg.s_agg * cfg.c_zpad * cfg.p_tile * 4 <= 4 * 1024 * 1024)


def _mc_agg_forward_stash(cfg, zmap_full, gamma, s0, s1, pos, noise_ref):
    """_mc_agg_forward that also records each raw draw into scratch."""
    c, p = zmap_full.shape

    def body(s, acc):
        n = _draw_block(cfg.agg_noise, s0, s1, s, c, p, pos)
        # Row-sliced store: the packed branch stashes its pack_m-row draws
        # into the full-size scratch slot (c <= scratch rows).
        noise_ref[pl.ds(s, 1), pl.ds(0, c)] = n[None]
        return acc + _onehot_ge(zmap_full + gamma * n)

    acc = _sample_loop(cfg.s_agg, body, jnp.zeros_like(zmap_full),
                       unroll=not cfg.binned)
    return acc * (1.0 / cfg.s_agg)


def _mc_agg_grads_stashed(cfg, zmap_full, g_w, gamma, noise_ref):
    """Perturbed-argmax backward replaying the stashed noise (identical
    values to a fresh _draw_block replay)."""
    shape = zmap_full.shape
    cmask, phimask, phi_comp = _agg_masks(cfg, shape)
    w0 = (_hard_onehot_rows(zmap_full) if cfg.agg_vr
          else jnp.zeros_like(zmap_full))

    def body(s, carry):
        acc_z, acc_g = carry
        n = noise_ref[pl.ds(s, 1), pl.ds(0, shape[0])][0] * cmask
        w = _onehot_ge(zmap_full + gamma * n)
        diff = (w - w0) * cmask
        dot = jnp.sum(g_w * diff, axis=0, keepdims=True)
        acc_z = acc_z + dot * _score(n, cfg.agg_noise)
        if cfg.agg_noise == "gaussian":
            phi = jnp.sum(n * n * phimask, axis=0, keepdims=True) + phi_comp
        else:
            phi = (jnp.sum(_score(n, cfg.agg_noise) * n * phimask, axis=0,
                           keepdims=True) + phi_comp)
        acc_g = acc_g + dot * (phi - 1.0)
        return acc_z, acc_g

    acc_z, acc_g = _sample_loop(
        cfg.s_agg, body,
        (jnp.zeros(shape, jnp.float32),
         jnp.zeros((1, shape[1]), jnp.float32)), unroll=not cfg.binned)
    return acc_z / (cfg.s_agg * gamma), acc_g / (cfg.s_agg * gamma)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _rd(cfg):
    """Table reader: binned tables are blocked per tile with a leading 1."""
    return (lambda r: r[0]) if cfg.binned else (lambda r: r[:])


def _tile_setup(cfg, tile_ref, valid_ref, fv_ndc_ref):
    tile = tile_ref[0, 0, 0]
    rd = _rd(cfg)
    pos, px, py, pixvalid = _tile_coords(cfg, tile)
    validb = rd(valid_ref) > 0.5                         # (F_pad, 1)
    # Face-level behind-camera cull (ops/rasterize.py:_face_validity).
    fv = rd(fv_ndc_ref)
    zmaxf = jnp.maximum(jnp.maximum(_col(fv, 2), _col(fv, 5)), _col(fv, 8))
    validb = validb & (zmaxf > 0)
    return pos, px, py, pixvalid, validb


def _bg_image(cfg, scal):
    """What the pipeline produces on a tile with zero candidate coverage:
    background color, alpha 0 (background weight is exactly 1 — slots are
    prob 0 / z_map -inf no-ops)."""
    p = cfg.p_tile
    rows = [jnp.full((1, p), scal[0, _S_BG + c]) for c in range(3)]
    return jnp.concatenate(rows + [jnp.zeros((1, p), jnp.float32)], axis=0)


def _bg_weights(cfg):
    """Weights on a zero-coverage tile: the background one-hot."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (cfg.c_zpad, cfg.p_tile), 0)
    return (rows == cfg.bg_row).astype(jnp.float32)


def _validb_tables(fv_ndc, valid_col):
    """Per-slot validity from a (rows, ...) table pair: declared validity
    plus the behind-camera cull (ops/rasterize.py:_face_validity)."""
    validb = valid_col > 0.5
    zmaxf = jnp.maximum(jnp.maximum(_col(fv_ndc, 2), _col(fv_ndc, 5)),
                        _col(fv_ndc, 8))
    return validb & (zmaxf > 0)


def _cfg_packed(cfg: FusedConfig) -> FusedConfig:
    """The packed branch's effective config: pack_m slot rows, background
    in the last row (f_real = pack_m - 1 -> bg_row = pack_m - 1,
    c_zpad = pack_m)."""
    return dataclasses.replace(cfg, f_pad=cfg.pack_m, f_real=cfg.pack_m - 1,
                               pack_m=0)


def _pack_onehots(cfg: FusedConfig, pack_ref):
    """Both one-hot operators of the tile's packed face-row selection:
    (pack_m, f_pad) for gathering tables, (f_pad, pack_m) for scattering
    gradients back.  Filler slots carry the out-of-range id f_pad, so
    their one-hot rows/columns are identically zero (packed rows read as
    zero tables -> invalid -> exact no-ops; scatter deposits nothing)."""
    m, f = cfg.pack_m, cfg.f_pad
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, f), 1)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (f, 1), 0)
    rows, cols = [], []
    for j in range(m):
        idj = pack_ref[0, j, 0]
        rows.append((iota_row == idj).astype(jnp.float32))
        cols.append((iota_col == idj).astype(jnp.float32))
    return jnp.concatenate(rows, axis=0), jnp.concatenate(cols, axis=1)


def _pack_tables(onehot, tabs):
    """Gather the packed rows of each (f_pad, D) table as an exact one-hot
    matmul (HIGHEST precision keeps the MXU pass from rounding the gathered
    values — measured ~4e-3 relative under the default bf16 pass)."""
    return [jax.lax.dot(onehot, t, precision=jax.lax.Precision.HIGHEST)
            for t in tabs]


def _forward_kernel(tile_ref, active_ref, seeds_ref, fv_ndc_ref,
                    fv_world_ref, fn_ref, tex_ref, valid_ref, scal_ref,
                    *rest, cfg):
    pack_ref = None
    if cfg.pack_m:                       # never with prob_ext (plan gates)
        pack_ref, rest = rest[0], rest[1:]
    if cfg.prob_ext:
        prob_ref, out_ref, weights_ref = rest
    else:
        (out_ref,) = rest
    pos, px, py, pixvalid, validb = _tile_setup(cfg, tile_ref, valid_ref,
                                                fv_ndc_ref)
    scal = scal_ref[:]

    rd = _rd(cfg)

    def run_pipeline(cfgx, fv_ndc_t, fv_world_t, fn_t, tex_t, validbx):
        det1 = _make_det1(cfgx, px, py, pixvalid, validbx)
        dist, z, c0, c1, c2, maskf = det1(fv_ndc_t, fv_world_t, fn_t,
                                          tex_t, scal)

        if cfgx.prob_ext:
            prob = prob_ref[:]          # pmean'd across the sample axis
        else:
            if cfgx.rast_kind == "mc":
                prob_raw = _mc_rast_forward(cfgx, -dist, scal[0, _S_SIGMA],
                                            seeds_ref[0, 0],
                                            seeds_ref[0, 1], pos)
            else:
                prob_raw = _make_det_rast(cfgx)(dist, scal)
            prob = prob_raw * maskf

        zmap_full = _make_det2(cfgx, maskf)(prob, z, scal)
        if cfgx.agg_kind == "soft":
            weights = _det2b_soft(zmap_full, scal)
        elif cfgx.agg_kind == "hard":
            weights = _hard_onehot_rows(zmap_full)
        else:
            weights = _mc_agg_forward(cfgx, zmap_full, scal[0, _S_GAMMA],
                                      seeds_ref[0, 2], seeds_ref[0, 3], pos)
        out = _make_det3(cfgx)(weights, prob, c0, c1, c2, scal)
        return (out, weights) if cfgx.prob_ext else out

    def full_pipeline(_):
        return run_pipeline(cfg, rd(fv_ndc_ref), rd(fv_world_ref),
                            rd(fn_ref), rd(tex_ref), validb)

    def packed_pipeline(_):
        ohg, _ = _pack_onehots(cfg, pack_ref)
        fvp, fwp, fnp, txp, vlp = _pack_tables(
            ohg, [fv_ndc_ref[:], fv_world_ref[:], fn_ref[:], tex_ref[:],
                  valid_ref[:]])
        return run_pipeline(_cfg_packed(cfg), fvp, fwp, fnp, txp,
                            _validb_tables(fvp, vlp))

    def bg_only(_):
        bg = _bg_image(cfg, scal)
        return (bg, _bg_weights(cfg)) if cfg.prob_ext else bg

    act = active_ref[0, 0, 0]
    if cfg.pack_m:
        res = jax.lax.cond(
            act > 0,
            lambda _: jax.lax.cond(act == 2, packed_pipeline,
                                   full_pipeline, None),
            bg_only, None)
    else:
        res = jax.lax.cond(act > 0, full_pipeline, bg_only, None)
    if cfg.prob_ext:
        out_ref[:], weights_ref[:] = res
    else:
        out_ref[:] = res


def _backward_kernel(tile_ref, active_ref, seeds_ref, fv_ndc_ref,
                     fv_world_ref, fn_ref, tex_ref, valid_ref, scal_ref,
                     g_out_ref, *rest, cfg):
    pack_ref = None
    if cfg.pack_m:
        pack_ref, rest = rest[0], rest[1:]
    g_ndc_ref, g_world_ref, g_fn_ref, g_tex_ref, g_scal_ref = rest
    pos, px, py, pixvalid, validb = _tile_setup(cfg, tile_ref, valid_ref,
                                                fv_ndc_ref)
    scal = scal_ref[:]
    g_rgba = g_out_ref[:]

    rd = _rd(cfg)

    def run_pipeline(cfgx, fv_ndc_t, fv_world_t, fn_t, tex_t, validbx):
        det1 = _make_det1(cfgx, px, py, pixvalid, validbx)
        (dist, z, c0, c1, c2, maskf), vjp1 = jax.vjp(
            det1, fv_ndc_t, fv_world_t, fn_t, tex_t, scal)

        sigma = scal[0, _S_SIGMA]
        gamma = scal[0, _S_GAMMA]
        # Coverage forward + score coefficient share one replay loop.
        if cfgx.rast_kind == "mc":
            prob_raw, coeff = _mc_rast_fwd_coeff(
                cfgx, -dist, sigma, seeds_ref[0, 0], seeds_ref[0, 1], pos)
            vjp_rast = None
        else:
            prob_raw, vjp_rast = jax.vjp(_make_det_rast(cfgx), dist, scal)
        prob = prob_raw * maskf

        zmap_full, vjp2 = jax.vjp(_make_det2(cfgx, maskf), prob, z, scal)

        # Aggregation: weights + backward.  The blend is linear in the
        # weights, so the weight cotangent is available before the weights:
        # g_w[slot] = sum_c colors_c * g_rgb_c, g_w[bg] = sum_c bg_c * g_rgb_c
        # — letting the MC path fuse its forward and backward into one loop.
        g_rgb = [g_rgba[c:c + 1] for c in range(3)]
        g_scal_extra = jnp.zeros((1, _NS), jnp.float32)
        if cfgx.agg_kind == "soft":
            weights, vjp2b = jax.vjp(_det2b_soft, zmap_full, scal)
        elif cfgx.agg_kind == "hard":
            weights, vjp2b = _hard_onehot_rows(zmap_full), None
        else:
            g_w = _build_g_w(cfgx, c0, c1, c2, g_rgb, scal)
            weights, g_zmap, gamma_term = _mc_agg_fwd_grads(
                cfgx, zmap_full, g_w, gamma, seeds_ref[0, 2],
                seeds_ref[0, 3], pos)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
            g_scal_extra = g_scal_extra + jnp.where(
                cols == _S_GAMMA, jnp.sum(gamma_term), 0.0)

        _, vjp3 = jax.vjp(_make_det3(cfgx), weights, prob, c0, c1, c2, scal)
        g_weights, g_prob3, g_c0, g_c1, g_c2, g_scal3 = vjp3(g_rgba)

        if cfgx.agg_kind == "soft":
            g_zmap, g_scal2b = vjp2b(g_weights)
            g_scal_extra = g_scal_extra + g_scal2b
        elif cfgx.agg_kind == "hard":
            g_zmap = jnp.zeros_like(zmap_full)

        g_prob2, g_z, g_scal2 = vjp2(g_zmap)
        g_prob = g_prob2 + g_prob3
        g_prob_raw = g_prob * maskf

        # Coverage backward -> g_dist (+ sigma grad, the reference's
        # sum-of-distance-grads quirk).
        if cfgx.rast_kind == "mc":
            g_d = coeff * g_prob_raw
            g_dist = -g_d
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
            g_scal_extra = g_scal_extra + jnp.where(
                cols == _S_SIGMA, jnp.sum(g_d), 0.0)
        else:
            g_dist, g_scal_r = vjp_rast(g_prob_raw)
            g_scal_extra = g_scal_extra + g_scal_r

        g_ndc, g_world, g_fn, g_tex, g_scal1 = vjp1(
            (g_dist, g_z, g_c0, g_c1, g_c2, jnp.zeros_like(maskf)))
        g_scal = g_scal3 + g_scal_extra + g_scal2 + g_scal1
        return g_ndc, g_world, g_fn, g_tex, g_scal

    def full_pipeline(_):
        return run_pipeline(cfg, rd(fv_ndc_ref), rd(fv_world_ref),
                            rd(fn_ref), rd(tex_ref), validb)

    def packed_pipeline(_):
        ohg, ohs = _pack_onehots(cfg, pack_ref)
        fvp, fwp, fnp, txp, vlp = _pack_tables(
            ohg, [fv_ndc_ref[:], fv_world_ref[:], fn_ref[:], tex_ref[:],
                  valid_ref[:]])
        g_ndc_p, g_world_p, g_fn_p, g_tex_p, g_scal = run_pipeline(
            _cfg_packed(cfg), fvp, fwp, fnp, txp,
            _validb_tables(fvp, vlp))
        sc = lambda gp: jax.lax.dot(ohs, gp,
                                    precision=jax.lax.Precision.HIGHEST)
        return (sc(g_ndc_p), sc(g_world_p), sc(g_fn_p), sc(g_tex_p),
                g_scal)

    def bg_only(_):
        # Zero-coverage tile: the only surviving gradient is the background
        # color (weights are exactly the background one-hot).
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
        g_scal = jnp.zeros((1, _NS), jnp.float32)
        for c in range(3):
            g_scal = g_scal + jnp.where(cols == _S_BG + c,
                                        jnp.sum(g_rgba[c]), 0.0)
        zf9 = jnp.zeros((cfg.f_pad, 9), jnp.float32)
        return (zf9, zf9, zf9,
                jnp.zeros((cfg.f_pad, cfg.tex_d), jnp.float32), g_scal)

    act = active_ref[0, 0, 0]
    if cfg.pack_m:
        g_ndc, g_world, g_fn, g_tex, g_scal = jax.lax.cond(
            act > 0,
            lambda _: jax.lax.cond(act == 2, packed_pipeline,
                                   full_pipeline, None),
            bg_only, None)
    else:
        g_ndc, g_world, g_fn, g_tex, g_scal = jax.lax.cond(
            act > 0, full_pipeline, bg_only, None)

    first = tile_ref[0, 0, 0] == 0

    if cfg.binned:
        # Bin-local table gradients: each tile owns its output block; the
        # scatter back to faces happens through take_rows' transposed-matmul
        # VJP in the XLA wrapper.
        g_ndc_ref[0] = g_ndc
        g_world_ref[0] = g_world
        g_fn_ref[0] = g_fn
        g_tex_ref[0] = g_tex

        @pl.when(first)
        def _init():
            g_scal_ref[:] = g_scal

        @pl.when(jnp.logical_not(first))
        def _accum():
            g_scal_ref[:] = g_scal_ref[:] + g_scal
    else:
        @pl.when(first)
        def _init():
            g_ndc_ref[:] = g_ndc
            g_world_ref[:] = g_world
            g_fn_ref[:] = g_fn
            g_tex_ref[:] = g_tex
            g_scal_ref[:] = g_scal

        @pl.when(jnp.logical_not(first))
        def _accum():
            g_ndc_ref[:] = g_ndc_ref[:] + g_ndc
            g_world_ref[:] = g_world_ref[:] + g_world
            g_fn_ref[:] = g_fn_ref[:] + g_fn
            g_tex_ref[:] = g_tex_ref[:] + g_tex
            g_scal_ref[:] = g_scal_ref[:] + g_scal


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, s=nd: (0,) * s,
                        memory_space=pltpu.VMEM)


def _common_specs(cfg: FusedConfig):
    f, dt = cfg.f_pad, cfg.tex_d
    per_tile = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i, s=len(shape): (i,) + (0,) * s,
        memory_space=pltpu.VMEM)
    tbl = per_tile if cfg.binned else _const_spec
    return [
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # tile ids
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # active-tile bits
        _const_spec((1, 8)),                            # seeds
        tbl((f, 9)),                                    # fv_ndc
        tbl((f, 9)),                                    # fv_world
        tbl((f, 9)),                                    # fn_world
        tbl((f, dt)),                                   # tex
        tbl((f, 1)),                                    # valid
        _const_spec((1, _NS)),                          # scal
    ]


def _n_tiles(cfg: FusedConfig) -> int:
    hw = cfg.image_size * cfg.image_size
    return -(-hw // cfg.p_tile)


def _to_tilemajor(cfg: FusedConfig, x):
    """Permute a row-major pixel minor axis (..., H*W) into the 2-D tile
    grid's tile-major order.  Identity for strip tiling (tile_w == 0, where
    tiles ARE contiguous pixel ranges).  2-D mode guarantees exact cover
    (H*W == n_tiles * p_tile)."""
    if not cfg.tile_w:
        return x
    h = w = cfg.image_size
    tw = cfg.tile_w
    th = cfg.p_tile // tw
    lead = x.shape[:-1]
    x = x.reshape(lead + (h // th, th, w // tw, tw))
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(lead + (h * w,))


def _from_tilemajor(cfg: FusedConfig, x):
    """Inverse of _to_tilemajor on the minor axis."""
    if not cfg.tile_w:
        return x
    h = w = cfg.image_size
    tw = cfg.tile_w
    th = cfg.p_tile // tw
    lead = x.shape[:-1]
    x = x.reshape(lead + (h // th, w // tw, th, tw))
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(lead + (h * w,))


def _tile_ids(cfg: FusedConfig):
    return jnp.arange(_n_tiles(cfg), dtype=jnp.int32).reshape(-1, 1, 1)


def _tile_y_ranges(cfg: FusedConfig):
    """Static NDC y span of each tile's pixel rows."""
    h = w = cfg.image_size
    p, nt = cfg.p_tile, _n_tiles(cfg)
    starts = np.arange(nt) * p
    ends = np.minimum(starts + p, h * w) - 1
    r0, r1 = starts // w, ends // w
    y_hi = jnp.asarray((h - 1.0 - 2.0 * r0) / h, jnp.float32)  # (nt,)
    y_lo = jnp.asarray((h - 1.0 - 2.0 * r1) / h, jnp.float32)
    return y_hi, y_lo


def _tile_rects(cfg: FusedConfig):
    """Static per-tile NDC rectangle (y_hi, y_lo, x_hi, x_lo), each (nt,)
    numpy — the pixel-center bounds of the tile for strip and 2-D tilings
    (used by the streaming chunk-list prepass)."""
    h = w = cfg.image_size
    p, nt = cfg.p_tile, _n_tiles(cfg)
    if cfg.tile_w:
        tw = cfg.tile_w
        th, ntx = p // tw, w // tw
        tids = np.arange(nt)
        r0 = (tids // ntx) * th
        c0 = (tids % ntx) * tw
        y_hi = (h - 1.0 - 2.0 * r0) / h
        y_lo = (h - 1.0 - 2.0 * (r0 + th - 1)) / h
        x_hi = (w - 1.0 - 2.0 * c0) / w
        x_lo = (w - 1.0 - 2.0 * (c0 + tw - 1)) / w
    else:
        starts = np.arange(nt) * p
        ends = np.minimum(starts + p, h * w) - 1
        r0, r1 = starts // w, ends // w
        y_hi = (h - 1.0 - 2.0 * r0) / h
        y_lo = (h - 1.0 - 2.0 * r1) / h
        if p < w and w % p == 0:
            c0 = starts % w
            x_hi = (w - 1.0 - 2.0 * c0) / w
            x_lo = (w - 1.0 - 2.0 * (c0 + p - 1)) / w
        else:
            x_hi = np.full(nt, (w - 1.0) / w)
            x_lo = np.full(nt, -(w - 1.0) / w)
    return (y_hi.astype(np.float32), y_lo.astype(np.float32),
            x_hi.astype(np.float32), x_lo.astype(np.float32))


# SAT refinement is worth its (n_tiles, F, 3-axis) projection cost only in
# the low-poly flat regime, where single large triangles' bboxes cover tiles
# their blur band never touches (the headline cube: ~15% of active tiles are
# bbox-only).  High-poly scenes have near-tight bboxes (face extent << band).
_SAT_MAX_F = 128


def _tile_face_overlap_sat(fv_ndc, band, y_hi, y_lo, x_hi, x_lo):
    """Exact separating-axis overlap of each band-dilated triangle with each
    tile's pixel-center rectangle — (n_tiles, F) bool.

    Triangle (+ Minkowski disk of radius ``band``) and rectangle are both
    convex, so SAT over the rect normals (the bbox test, done by the caller)
    plus the 3 edge normals is exact: a False is a PROOF that every pixel
    center in the tile is farther than band from the triangle, hence
    zero-candidate for every pixel (`_make_det1`'s inside|dist<=blur mask
    with dist the squared point-edge distance and band = sqrt(blur)).
    Degenerate edges skip their axis (conservative: SAT is an AND)."""
    tri_x = fv_ndc[:, 0::3]                               # (F, 3)
    tri_y = fv_ndc[:, 1::3]
    ok = None
    for e in range(3):
        j = (e + 1) % 3
        ex = tri_x[:, j] - tri_x[:, e]
        ey = tri_y[:, j] - tri_y[:, e]
        ln = jnp.sqrt(ex * ex + ey * ey)
        good = ln > 1e-12
        nx = jnp.where(good, -ey / jnp.maximum(ln, 1e-12), 0.0)   # (F,)
        ny = jnp.where(good, ex / jnp.maximum(ln, 1e-12), 0.0)
        tproj = tri_x * nx[:, None] + tri_y * ny[:, None]         # (F, 3)
        tmin = jnp.min(tproj, axis=1) - band
        tmax = jnp.max(tproj, axis=1) + band
        # Rect corner projections: extremes of n.x*x + n.y*y over the 4
        # corners factor per axis (interval arithmetic is exact here).
        rx_min = jnp.minimum(nx[None, :] * x_lo[:, None],
                             nx[None, :] * x_hi[:, None])         # (nt, F)
        rx_max = jnp.maximum(nx[None, :] * x_lo[:, None],
                             nx[None, :] * x_hi[:, None])
        ry_min = jnp.minimum(ny[None, :] * y_lo[:, None],
                             ny[None, :] * y_hi[:, None])
        ry_max = jnp.maximum(ny[None, :] * y_lo[:, None],
                             ny[None, :] * y_hi[:, None])
        rmin = rx_min + ry_min
        rmax = rx_max + ry_max
        ax_ok = ((rmin <= tmax[None, :]) & (rmax >= tmin[None, :])) \
            | ~good[None, :]
        ok = ax_ok if ok is None else (ok & ax_ok)
    return ok


def _tile_face_overlap(cfg: FusedConfig, fv_ndc, validb, blur):
    """(n_tiles, F) conservative face/tile overlap from bboxes expanded by
    the blur band, refined by an exact separating-axis test for small F
    (see _tile_face_overlap_sat).  Tiles spanning whole pixel rows test y
    only; sub-row tiles (p_tile divides the image width — the
    high-resolution regime) also test x, which is 2-D binning.  ``blur``
    may be traced."""
    h = w = cfg.image_size
    p, nt = cfg.p_tile, _n_tiles(cfg)
    fv_ndc = jax.lax.stop_gradient(fv_ndc)
    band = jnp.sqrt(jnp.maximum(blur, 0.0))
    ys = fv_ndc[:, 1::3]                                  # (F, 3)
    fy_min = jnp.min(ys, axis=1) - band
    fy_max = jnp.max(ys, axis=1) + band

    def x_test(c0, ncols):
        xs = fv_ndc[:, 0::3]
        fx_min = jnp.min(xs, axis=1) - band
        fx_max = jnp.max(xs, axis=1) + band
        x_hi = jnp.asarray((w - 1.0 - 2.0 * c0) / w, jnp.float32)
        x_lo = jnp.asarray((w - 1.0 - 2.0 * (c0 + ncols - 1)) / w,
                           jnp.float32)
        return ((fx_min[None, :] <= x_hi[:, None])
                & (fx_max[None, :] >= x_lo[:, None]))

    def sat(overlap):
        if fv_ndc.shape[0] > _SAT_MAX_F:
            return overlap
        ry_hi, ry_lo, rx_hi, rx_lo = (jnp.asarray(a)
                                      for a in _tile_rects(cfg))
        return overlap & _tile_face_overlap_sat(fv_ndc, band, ry_hi, ry_lo,
                                                rx_hi, rx_lo)

    if cfg.tile_w:
        tw = cfg.tile_w
        th, ntx = p // tw, w // tw
        tids = np.arange(nt)
        r0 = (tids // ntx) * th
        y_hi = jnp.asarray((h - 1.0 - 2.0 * r0) / h, jnp.float32)
        y_lo = jnp.asarray((h - 1.0 - 2.0 * (r0 + th - 1)) / h, jnp.float32)
        overlap = ((fy_min[None, :] <= y_hi[:, None])
                   & (fy_max[None, :] >= y_lo[:, None])
                   & validb[None, :])
        return sat(overlap & x_test((tids % ntx) * tw, tw))

    y_hi, y_lo = _tile_y_ranges(cfg)
    overlap = ((fy_min[None, :] <= y_hi[:, None])
               & (fy_max[None, :] >= y_lo[:, None])
               & validb[None, :])
    if p < w and w % p == 0:
        overlap = overlap & x_test((np.arange(nt) * p) % w, p)
    return sat(overlap)


def _face_validb(fv_ndc, valid_col):
    zs = jax.lax.stop_gradient(fv_ndc)[:, 2::3]
    return (valid_col > 0.5) & (jnp.max(zs, axis=1) > 0)


def _active_tiles(cfg: FusedConfig, fv_ndc, valid, blur):
    """Per-tile activity bits — conservative, so inactive tiles provably
    have zero candidate coverage and the kernels take the background fast
    path.  (n_tiles, 1, 1) int32."""
    if cfg.binned:
        # valid: (n_tiles, M, 1) bin-local slot validity.
        return jnp.any(valid[:, :, 0] > 0.5, axis=1).astype(
            jnp.int32).reshape(-1, 1, 1)
    overlap = _tile_face_overlap(cfg, fv_ndc,
                                 _face_validb(fv_ndc, valid[:, 0]), blur)
    return jnp.any(overlap, axis=1).astype(jnp.int32).reshape(-1, 1, 1)


def _pack_tiles(cfg: FusedConfig, fv_ndc, valid, blur):
    """Per-tile activity codes + packed face-id lists for flat-mode face
    packing (cfg.pack_m > 0).

    Codes: 0 = zero candidate coverage (background fast path, as in
    `_active_tiles`); 2 = the tile's conservative band-overlap count fits
    in pack_m - 1 face slots (packed pipeline — exact, the excluded faces
    are out-of-band for every pixel of the tile); 1 = full pipeline.

    The id list is (n_tiles, pack_m, 1) int32: overlapping face ids in
    ascending order, fillers (and the last row, which the packed layout
    reserves for the background channel) carry the out-of-range sentinel
    f_pad whose one-hot row is identically zero."""
    overlap = _tile_face_overlap(cfg, fv_ndc,
                                 _face_validb(fv_ndc, valid[:, 0]), blur)
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)          # (nt,)
    m, f = cfg.pack_m, cfg.f_pad
    iota_f = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
    key = jnp.where(overlap, f - iota_f, -1)                      # (nt, F)
    kv, _ = jax.lax.top_k(key, m - 1)                             # (nt, m-1)
    ids = jnp.where(kv > 0, f - kv, f)
    ids = jnp.concatenate([ids, jnp.full((ids.shape[0], 1), f,
                                         jnp.int32)], axis=1)     # bg row
    codes = jnp.where(counts == 0, 0,
                      jnp.where(counts <= m - 1, 2, 1)).astype(jnp.int32)
    return codes.reshape(-1, 1, 1), ids[:, :, None].astype(jnp.int32)


# Above this face count the per-tile top_k over the full (n_tiles, F)
# score matrix dominates the step (275 ms at 82k faces / 512^2); switch to
# y-sorted contiguous-range selection (see _binned_tables_sorted).
_COARSE_THRESHOLD = 8192
_RANGE_GROUP = 16         # tiles per range group
# Face rows per group's contiguous slice.  The window is dominated by the
# blur-band bbox inflation (sqrt(blur) ~ 0.1 NDC at sigma=1e-3 — ~25 rows
# both sides at 512^2), NOT by the group's own y-span: BASELINE config 5
# (81,920 faces, 512^2) needs ~10-12k rows per group.  4096 silently
# clamped those windows (detected by _check_bin_overflow, but every face
# outside the clamp vanished — measured err ~1.0 on silhouette strips).
_RANGE_MAX = 16384


def _front_rel_scores(cfg: FusedConfig, overlap, covers, xlo, xhi, fz):
    """Binned-mode selection score under slot overflow: COVERING faces
    first, then band-only faces, each tier ranked by depth relative to the
    LOCAL front.

    Global nearest-M selection (score = -fz) clusters every slot at the
    tile's depth minimum when a tile overflows M: on a curved surface z
    varies along the 128-px tile, so covering faces at the tile's far end
    lose their slots to occluded-but-nearer faces at the near end
    (measured at BASELINE config-5 density: ~10% of row energy wrong, max
    pixel error 1.0 — whole silhouette strips render background).  Two
    fixes compose here:

    1. ``covers`` (true, UN-inflated footprint-bbox overlap) outranks
       band-only candidacy by a constant tier bonus: a pixel's actual
       front faces can never lose their slots to another pixel's blur-band
       tail.  Covering faces per tile are bounded by the footprint density
       (~130 at BASELINE config-5 density), so tier 1 fits in M=160.
    2. Within a tier, faces rank by ``front[group(x_center)] - fz`` where
       front is the minimum candidate depth of the face's x column group —
       so near-front faces survive across the WHOLE tile and the drop
       order is locally-farthest-first, the same degradation direction as
       the reference's per-pixel keep-K-nearest (occluded fragments carry
       exponentially small blend weight).

    When nothing overflows the selected SET is unchanged (the score only
    reorders it; the blend is slot-permutation invariant).

    overlap/covers: (nt, R) bool; xlo/xhi/fz: (nt, R) f32 (broadcastable).
    Returns (nt, R) f32 top_k score (-inf on non-candidates).
    """
    w = cfg.image_size
    nt = overlap.shape[0]
    p = min(cfg.p_tile, w)
    q = max(1, min(16, p // 8))          # column groups of >= 8 px
    gw = p // q
    if cfg.p_tile < w and w % cfg.p_tile == 0:
        c0 = (jnp.arange(nt, dtype=jnp.int32) * cfg.p_tile) % w
    else:
        c0 = jnp.zeros((nt,), jnp.int32)
    fz_ = jnp.broadcast_to(fz, overlap.shape)
    xlo_ = jnp.broadcast_to(xlo, overlap.shape)
    xhi_ = jnp.broadcast_to(xhi, overlap.shape)

    # NDC x of pixel column c is (w-1-2c)/w, decreasing in c.
    def x_of(c):
        return (w - 1.0 - 2.0 * c.astype(jnp.float32)) / w

    # Face's column group from its bbox x-center (clipped into the tile).
    xc = 0.5 * (xlo_ + xhi_)
    cf = 0.5 * (w - 1.0 - w * xc)
    grp = jnp.clip(((cf - c0[:, None].astype(jnp.float32)) / gw)
                   .astype(jnp.int32), 0, q - 1)

    tile_front = jnp.min(jnp.where(overlap, fz_, np.inf), axis=1,
                         keepdims=True)
    front = jnp.broadcast_to(tile_front, overlap.shape)
    for j in range(q):
        ca = c0 + j * gw
        cb = c0 + (j + 1) * gw - 1
        og = (overlap & (xlo_ <= x_of(ca)[:, None])
              & (xhi_ >= x_of(cb)[:, None]))
        fj = jnp.min(jnp.where(og, fz_, np.inf), axis=1, keepdims=True)
        # Groups with no candidates fall back to the tile-global front.
        fj = jnp.where(jnp.isfinite(fj), fj, tile_front)
        front = jnp.where(grp == j, fj, front)
    # Tier bonus: NDC depths are O(1), front - fz is bounded by the scene's
    # z-range, so 1e4 strictly separates the tiers.
    tier = jnp.where(covers, jnp.float32(1e4), jnp.float32(0.0))
    return jnp.where(overlap, tier + front - fz_, -np.inf)


def _bin_face_ids(cfg: FusedConfig, fv_ndc, valid_col, blur):
    """Bin-local face lists: the M faces overlapping each tile that are
    nearest the LOCAL front (see _front_rel_scores), -1 padded — the
    `max_faces_per_bin` layout of the reference's binned kernel
    (`/root/reference/experiments/eval.py:139`).  When a tile overflows M,
    the locally-farthest faces are dropped — the same degradation
    direction as the reference's keep-K-nearest fragment truncation
    (occluded fragments carry exponentially small blend weight); overflow
    is *detected* (see RasterizationSettings.bin_overflow) via the
    returned per-tile counts.

    Returns (ids (nt, M), counts (nt,) candidate faces per tile).
    """
    m = cfg.f_pad
    fv_ndc = jax.lax.stop_gradient(fv_ndc)
    validb = _face_validb(fv_ndc, valid_col)
    f = fv_ndc.shape[0]
    band = jnp.sqrt(jnp.maximum(blur, 0.0))
    xs = fv_ndc[:, 0::3]
    fz_min = jnp.min(fv_ndc[:, 2::3], axis=1)            # (F,)
    overlap = _tile_face_overlap(cfg, fv_ndc, validb, blur)
    covers = _tile_face_overlap(cfg, fv_ndc, validb, jnp.zeros_like(blur))
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)  # (nt,)
    score = _front_rel_scores(cfg, overlap, covers,
                              (jnp.min(xs, axis=1) - band)[None, :],
                              (jnp.max(xs, axis=1) + band)[None, :],
                              fz_min[None, :])
    top, idx = jax.lax.top_k(score, min(m, f))
    out = jnp.where(jnp.isfinite(top), idx.astype(jnp.int32), -1)
    if m > f:
        out = jnp.pad(out, ((0, 0), (0, m - f)), constant_values=-1)
    return out, counts                                    # (nt, M), (nt,)


_CALLBACK_OK = None


def _callbacks_supported() -> bool:
    """One-time probe: can this backend execute host callbacks?  (The axon
    dev relay cannot; jitted programs containing them fail to build.)"""
    global _CALLBACK_OK
    if _CALLBACK_OK is None:
        try:
            def f(x):
                jax.debug.callback(lambda v: None, x)
                return x + 1.0
            # The check usually runs while tracing the caller's jit, where
            # an inner jit would be INLINED (landing the callback in the
            # outer program without ever raising here) — force an actual
            # compile+execute of the probe.
            with jax.ensure_compile_time_eval():
                jax.block_until_ready(jax.jit(f)(jnp.zeros(())))
                jax.effects_barrier()
            _CALLBACK_OK = True
        except Exception:
            _CALLBACK_OK = False
    return _CALLBACK_OK


def _check_bin_overflow(cfg: FusedConfig, settings, max_tile_count,
                        max_range, range_limit=None):
    """Runtime capacity check for binned mode (never silent truncation):
    ``settings.bin_overflow`` is 'warn' (default — one warning per
    occurrence), 'error' (raise), or 'allow' (skip the check entirely —
    the documented nearest-M approximation, no host callback in the
    step)."""
    mode = getattr(settings, "bin_overflow", "warn")
    if mode == "allow":
        return
    if not _callbacks_supported():
        # e.g. the axon dev relay cannot run host callbacks; real TPU/CPU
        # backends keep the runtime check.
        import warnings

        warnings.warn(
            "in-trace binned capacity checks are disabled: this backend "
            "has no host-callback support. The experiment harness checks "
            "capacity_stats() at every scan-segment boundary instead "
            "(callback-free); library users can do the same, or set "
            "bin_overflow='allow' to silence this.", stacklevel=2)
        return

    m = cfg.f_pad if not cfg.stream else (1 << 30)
    rlimit = range_limit if range_limit is not None else _RANGE_MAX

    def cb(mt, mr):
        import warnings

        msgs = []
        if int(mt) > m:
            msgs.append(
                f"a tile has {int(mt)} candidate faces > {m} bin slots "
                "(farthest faces dropped)")
        if mr is not None and int(mr) > rlimit:
            msgs.append(
                f"a y-sorted group range holds {int(mr)} faces > "
                f"{rlimit} (range clamped)")
        if not msgs:
            return
        msg = ("binned fused render capacity exceeded: " + "; ".join(msgs)
               + ". Results deviate from the exact top-K semantics; raise "
               "max_faces_per_bin/image tiling or use "
               "RasterizationSettings(bin_overflow='allow') to accept.")
        if mode == "error":
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)

    if max_range is None:
        jax.debug.callback(lambda mt: cb(mt, None), max_tile_count)
    else:
        jax.debug.callback(cb, max_tile_count, max_range)


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """``x[perm]`` for a permutation, whose backward is the *gather*
    ``g[inv_perm]`` instead of XLA's scatter-add (a TPU scalar loop)."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], (perm, inv_perm)


def _permute_rows_bwd(res, g):
    perm, inv_perm = res
    return g[inv_perm], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _binned_tables_sorted(cfg: FusedConfig, merged, fv_ndc, valid_col,
                          blur):
    """Y-sorted contiguous-range binning for high-poly meshes (NOTES.md
    round-3 blueprint): faces are argsorted once by blur-expanded bbox
    y-min, so each group of _RANGE_GROUP tiles draws its candidates from a
    CONTIGUOUS slice [s_g, s_g + _RANGE_MAX) of the sorted table.  Tables
    reach the per-tile layout via cheap dynamic slices + the one-hot-matmul
    gather (MXU) against each <=4096-row group slice — no scalar gather of
    (n_tiles x M) rows from the full face table, forward or backward (the
    permutation's VJP is a gather by the inverse permutation; the slice
    VJPs are dynamic-update-slice adds; the one-hot VJP is a transposed
    matmul).

    Selection semantics match the direct per-tile nearest-M top_k whenever
    no group range overflows _RANGE_MAX (detected via returned counts).

    Returns (tiles (nt, M, D), ids (nt, M), counts (nt,), max_range ()).
    """
    h = w = cfg.image_size
    p, nt = cfg.p_tile, _n_tiles(cfg)
    m = cfg.f_pad
    g = _RANGE_GROUP
    ng = -(-nt // g)
    f = fv_ndc.shape[0]
    rmax = min(_RANGE_MAX, _round_up(f, 8))
    band = jnp.sqrt(jnp.maximum(blur, 0.0))

    fv_s = jax.lax.stop_gradient(fv_ndc)
    validb = _face_validb(fv_ndc, valid_col)
    ys = fv_s[:, 1::3]
    xs = fv_s[:, 0::3]
    lo = jnp.min(ys, axis=1) - band                      # (F,)
    hi = jnp.max(ys, axis=1) + band
    xlo = jnp.min(xs, axis=1) - band
    xhi = jnp.max(xs, axis=1) + band
    fz = jnp.min(fv_s[:, 2::3], axis=1)

    key = jnp.where(validb, lo, np.inf)                  # invalid sort last
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)
    sk = key[perm]
    maxext = jnp.max(jnp.where(validb, hi - lo, 0.0))

    # Group y spans from the tile spans (y decreases with pixel row).
    y_hi_t, y_lo_t = _tile_y_ranges(cfg)                 # (nt,)
    pad_t = ng * g - nt
    y_hi_g = jnp.max(jnp.pad(y_hi_t, (0, pad_t),
                             constant_values=-np.inf).reshape(ng, g), axis=1)
    y_lo_g = jnp.min(jnp.pad(y_lo_t, (0, pad_t),
                             constant_values=np.inf).reshape(ng, g), axis=1)

    # Candidate range per group: lo <= y_hi_g  and  hi >= y_lo_g
    # (hi = lo + ext <= lo + maxext bounds the start).
    e_g = jnp.searchsorted(sk, y_hi_g, side="right")     # (ng,)
    s_g = jnp.searchsorted(sk, y_lo_g - maxext, side="left")
    range_counts = jnp.maximum(e_g - s_g, 0)
    max_range = jnp.max(range_counts)

    f_rows = max(_round_up(f, 8), rmax)
    cs = jnp.clip(s_g, 0, f_rows - rmax)                 # clamped starts

    # Per-group bbox/depth column slices of the sorted order.  Rows outside
    # the true range fail the overlap test by construction (rows before s_g
    # have hi < y_lo_g; rows past e_g have lo > y_hi_g; invalid rows carry
    # +inf sentinels), so the clamped window needs no extra masking.
    cols = jnp.stack([lo, hi, xlo, xhi, fz], axis=1)[perm]
    sentinel = jnp.asarray([np.inf, -np.inf, np.inf, -np.inf, np.inf],
                           jnp.float32)
    cols = jnp.concatenate(
        [cols, jnp.broadcast_to(sentinel, (f_rows - f, 5))], axis=0)
    cslices = jnp.stack([
        jax.lax.dynamic_slice(cols, (cs[i], 0), (rmax, 5))
        for i in range(ng)])                             # (ng, rmax, 5)

    def rep(a):                                          # (ng, rmax) -> (nt, rmax)
        return jnp.repeat(a, g, axis=0)[:nt]
    # Inflated bbox columns, and the UN-inflated footprint bboxes for the
    # covering tier (the slices store lo-band/hi+band, so strip the band).
    lo_r, hi_r = rep(cslices[..., 0]), rep(cslices[..., 1])
    xlo_r, xhi_r = rep(cslices[..., 2]), rep(cslices[..., 3])
    overlap_t = (lo_r <= y_hi_t[:, None]) & (hi_r >= y_lo_t[:, None])
    covers_t = ((lo_r + band <= y_hi_t[:, None])
                & (hi_r - band >= y_lo_t[:, None]))
    if p < w and w % p == 0:
        c0 = (np.arange(nt) * p) % w
        x_hi = jnp.asarray((w - 1.0 - 2.0 * c0) / w, jnp.float32)
        x_lo = jnp.asarray((w - 1.0 - 2.0 * (c0 + p - 1)) / w, jnp.float32)
        overlap_t = overlap_t & ((xlo_r <= x_hi[:, None])
                                 & (xhi_r >= x_lo[:, None]))
        covers_t = covers_t & ((xlo_r + band <= x_hi[:, None])
                               & (xhi_r - band >= x_lo[:, None]))
    counts = jnp.sum(overlap_t.astype(jnp.int32), axis=1)
    score_t = _front_rel_scores(cfg, overlap_t, covers_t & overlap_t,
                                xlo_r, xhi_r, rep(cslices[..., 4]))
    topv, pos = jax.lax.top_k(score_t, min(m, rmax))     # (nt, M)
    local = jnp.where(jnp.isfinite(topv), pos.astype(jnp.int32), -1)
    if m > rmax:
        local = jnp.pad(local, ((0, 0), (0, m - rmax)), constant_values=-1)

    # Tables: permute -> pad -> per-group slices -> one-hot MXU gather.
    from pertrenderer_tpu.ops.gather import take_rows

    d = merged.shape[1]
    merged_s = _permute_rows(merged, perm, inv_perm)
    merged_s = jnp.concatenate(
        [merged_s, jnp.zeros((f_rows - f, d), merged.dtype)], axis=0)
    gtabs = jnp.stack([
        jax.lax.dynamic_slice(merged_s, (cs[i], 0), (rmax, d))
        for i in range(ng)])                             # (ng, rmax, D)
    local_pad = jnp.pad(local, ((0, ng * g - nt), (0, 0)),
                        constant_values=-1)
    tiles = jax.vmap(take_rows)(gtabs, local_pad.reshape(ng, g * m))
    tiles = tiles.reshape(ng * g, m, d)[:nt]             # (nt, M, D)

    # Global ids (diagnostics / validity): window start + local position.
    ids = jnp.where(local >= 0, cs[
        jnp.minimum(jnp.arange(nt) // g, ng - 1)][:, None] + local, -1)
    return tiles, ids, counts, max_range


def _pallas_forward(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds,
                    active, prob=None, pack=None):
    nt = _n_tiles(cfg)
    in_specs = _common_specs(cfg)
    args = [_tile_ids(cfg), active, seeds, fv_ndc, fv_world, fn, tex, valid,
            scal]
    if cfg.pack_m:
        in_specs = in_specs + [pl.BlockSpec((1, cfg.pack_m, 1),
                                            lambda i: (i, 0, 0),
                                            memory_space=pltpu.VMEM)]
        args.append(pack)
    out_specs = pl.BlockSpec((4, cfg.p_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((4, nt * cfg.p_tile), jnp.float32)
    if cfg.prob_ext:
        in_specs = in_specs + [
            pl.BlockSpec((cfg.f_pad, cfg.p_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)]
        args.append(prob)
        out_specs = (out_specs,
                     pl.BlockSpec((cfg.c_zpad, cfg.p_tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((cfg.c_zpad, nt * cfg.p_tile),
                                          jnp.float32))
    out = pl.pallas_call(
        partial(_forward_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(*args)
    return out


def _pallas_backward(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds,
                     active, g_out, pack=None):
    nt = _n_tiles(cfg)
    f, dt = cfg.f_pad, cfg.tex_d
    acc = lambda shape: pl.BlockSpec(shape, lambda i, s=len(shape): (0,) * s,
                                     memory_space=pltpu.VMEM)
    if cfg.binned:
        tblspec = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda i, s=len(shape): (i,) + (0,) * s,
            memory_space=pltpu.VMEM)
        tblshape = lambda shape: jax.ShapeDtypeStruct((nt,) + shape,
                                                      jnp.float32)
    else:
        tblspec = acc
        tblshape = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    in_specs = _common_specs(cfg) + [
        pl.BlockSpec((4, cfg.p_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [_tile_ids(cfg), active, seeds, fv_ndc, fv_world, fn, tex,
            valid, scal, g_out]
    if cfg.pack_m:
        in_specs.append(pl.BlockSpec((1, cfg.pack_m, 1),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(pack)
    grads = pl.pallas_call(
        partial(_backward_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(tblspec((f, 9)), tblspec((f, 9)), tblspec((f, 9)),
                   tblspec((f, dt)), acc((1, _NS))),
        out_shape=(
            tblshape((f, 9)), tblshape((f, 9)), tblshape((f, 9)),
            tblshape((f, dt)),
            jax.ShapeDtypeStruct((1, _NS), jnp.float32),
        ),
        interpret=cfg.interpret,
    )(*args)
    return grads


def _active_and_pack(cfg, fv_ndc, valid, blur):
    if cfg.pack_m:
        return _pack_tiles(cfg, fv_ndc, valid, blur)
    return _active_tiles(cfg, fv_ndc, valid, blur), None


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_core(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds):
    active, pack = _active_and_pack(cfg, fv_ndc, valid, scal[0, _S_BLUR])
    return _pallas_forward(cfg, fv_ndc, fv_world, fn, tex, valid, scal,
                           seeds, active, pack=pack)


def _fused_core_fwd(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds):
    out = _fused_core(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds)
    return out, (fv_ndc, fv_world, fn, tex, valid, scal, seeds)


def _fused_core_bwd(cfg, res, g):
    fv_ndc, fv_world, fn, tex, valid, scal, seeds = res
    active, pack = _active_and_pack(cfg, fv_ndc, valid, scal[0, _S_BLUR])
    g_ndc, g_world, g_fn, g_tex, g_scal = _pallas_backward(
        cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds, active, g,
        pack=pack)
    g_seeds = np.zeros(seeds.shape, jax.dtypes.float0)
    return (g_ndc, g_world, g_fn, g_tex, jnp.zeros_like(valid), g_scal,
            g_seeds)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ---------------------------------------------------------------------------
# Sample-axis-sharded fused path
# ---------------------------------------------------------------------------
#
# Under shard_map with the MC sample axis on a mesh axis (SURVEY §2.5), each
# device draws its own slice of the global sample sequence (seed offsets make
# the union of device streams bit-equal to a single-device run with
# S_total = D * S_local samples).  The estimators are sample means
# (`/root/reference/randomras/smoothrast.py:36`, `smoothagg.py:41`), and the
# render decomposes so that every cross-device combination point is a mean of
# per-device partial means:
#
#   forward:   prob  = pmean(prob kernel)            [nonlinear z_map follows]
#              image = pmean(fwd kernel w/ external prob)  [blend linear in w]
#   backward:  g_zmap = pmean(agg-bwd kernel)        [local argmax replay]
#              grads  = pmean(det-bwd kernel w/ external prob/weights/g_zmap)
#
# The det-bwd kernel's only sample-dependent term is the coverage score
# coefficient, which multiplies *globally* pmean'd cotangents — so the pmean
# of its outputs equals the folded single-device gradients exactly (modulo
# float summation order).

def _prob_kernel(tile_ref, active_ref, seeds_ref, fv_ndc_ref, valid_ref,
                 scal_ref, out_ref, *, cfg):
    pos, px, py, pixvalid, validb = _tile_setup(cfg, tile_ref, valid_ref,
                                                fv_ndc_ref)
    scal = scal_ref[:]

    def full_pipeline(_):
        fv = fv_ndc_ref[:]
        coords = [_col(fv, i) for i in range(9)]
        w0, w1, w2, z, dist, inside, degen = _face_pixel_geometry(
            px, py, *coords, cfg.clip_bary, cfg.perspective_correct)
        cand = ((inside | (dist <= scal[0, _S_BLUR])) & ~degen
                & validb & (z > 0) & pixvalid)
        maskf = cand.astype(jnp.float32)
        prob_raw = _mc_rast_forward(cfg, -dist, scal[0, _S_SIGMA],
                                    seeds_ref[0, 0], seeds_ref[0, 1], pos)
        return prob_raw * maskf

    out_ref[:] = jax.lax.cond(
        active_ref[0, 0, 0] > 0, full_pipeline,
        lambda _: jnp.zeros((cfg.f_pad, cfg.p_tile), jnp.float32), None)


def _pallas_prob(cfg, fv_ndc, valid, scal, seeds, active):
    nt = _n_tiles(cfg)
    specs = _common_specs(cfg)
    # tile ids, active, seeds, fv_ndc, valid, scal
    in_specs = [specs[0], specs[1], specs[2], specs[3], specs[7], specs[8]]
    return pl.pallas_call(
        partial(_prob_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cfg.f_pad, cfg.p_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cfg.f_pad, nt * cfg.p_tile),
                                       jnp.float32),
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, seeds, fv_ndc, valid, scal)


def _agg_bwd_kernel(tile_ref, active_ref, seeds_ref, fv_ndc_ref,
                    fv_world_ref, fn_ref, tex_ref, valid_ref, scal_ref,
                    prob_ref, g_out_ref, gz_ref, gg_ref, *, cfg):
    pos, px, py, pixvalid, validb = _tile_setup(cfg, tile_ref, valid_ref,
                                                fv_ndc_ref)
    scal = scal_ref[:]
    g_rgba = g_out_ref[:]

    def full_pipeline(_):
        det1 = _make_det1(cfg, px, py, pixvalid, validb)
        dist, z, c0, c1, c2, maskf = det1(
            fv_ndc_ref[:], fv_world_ref[:], fn_ref[:], tex_ref[:], scal)
        prob = prob_ref[:]
        zmap_full = _make_det2(cfg, maskf)(prob, z, scal)
        g_rgb = [g_rgba[c:c + 1] for c in range(3)]
        g_w = _build_g_w(cfg, c0, c1, c2, g_rgb, scal)
        g_zmap, gamma_term = _mc_agg_grads(
            cfg, zmap_full, g_w, scal[0, _S_GAMMA], seeds_ref[0, 2],
            seeds_ref[0, 3], pos)
        return g_zmap, jnp.sum(gamma_term)

    def bg_only(_):
        return (jnp.zeros((cfg.c_zpad, cfg.p_tile), jnp.float32),
                jnp.float32(0.0))

    g_zmap, gterm = jax.lax.cond(active_ref[0, 0, 0] > 0, full_pipeline,
                                 bg_only, None)
    gz_ref[:] = g_zmap
    first = tile_ref[0, 0, 0] == 0

    @pl.when(first)
    def _init():
        gg_ref[:] = jnp.reshape(gterm, (1, 1))

    @pl.when(jnp.logical_not(first))
    def _accum():
        gg_ref[:] = gg_ref[:] + jnp.reshape(gterm, (1, 1))


def _pallas_agg_bwd(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds,
                    active, prob, g_out):
    nt = _n_tiles(cfg)
    pix = lambda c: pl.BlockSpec((c, cfg.p_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_agg_bwd_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=_common_specs(cfg) + [pix(cfg.f_pad), pix(4)],
        out_specs=(pix(cfg.c_zpad), _const_spec((1, 1))),
        out_shape=(jax.ShapeDtypeStruct((cfg.c_zpad, nt * cfg.p_tile),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, seeds, fv_ndc, fv_world, fn, tex, valid, scal,
      prob, g_out)


def _det_bwd_kernel(tile_ref, active_ref, seeds_ref, fv_ndc_ref,
                    fv_world_ref, fn_ref, tex_ref, valid_ref, scal_ref,
                    prob_ref, weights_ref, gz_ref, g_out_ref, g_ndc_ref,
                    g_world_ref, g_fn_ref, g_tex_ref, g_scal_ref, *, cfg):
    pos, px, py, pixvalid, validb = _tile_setup(cfg, tile_ref, valid_ref,
                                                fv_ndc_ref)
    scal = scal_ref[:]
    g_rgba = g_out_ref[:]

    def full_pipeline(_):
        det1 = _make_det1(cfg, px, py, pixvalid, validb)
        (dist, z, c0, c1, c2, maskf), vjp1 = jax.vjp(
            det1, fv_ndc_ref[:], fv_world_ref[:], fn_ref[:], tex_ref[:],
            scal)

        sigma = scal[0, _S_SIGMA]
        coeff = _mc_rast_coeff(cfg, -dist, sigma, seeds_ref[0, 0],
                               seeds_ref[0, 1], pos)
        prob = prob_ref[:]
        _, vjp2 = jax.vjp(_make_det2(cfg, maskf), prob, z, scal)
        weights = weights_ref[:]
        _, vjp3 = jax.vjp(_make_det3(cfg), weights, prob, c0, c1, c2, scal)
        _, g_prob3, g_c0, g_c1, g_c2, g_scal3 = vjp3(g_rgba)
        g_zmap = gz_ref[:]
        g_prob2, g_z, g_scal2 = vjp2(g_zmap)
        g_prob_raw = (g_prob2 + g_prob3) * maskf

        g_d = coeff * g_prob_raw
        g_dist = -g_d
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
        g_scal_extra = jnp.where(cols == _S_SIGMA, jnp.sum(g_d), 0.0)

        g_ndc, g_world, g_fn, g_tex, g_scal1 = vjp1(
            (g_dist, g_z, g_c0, g_c1, g_c2, jnp.zeros_like(maskf)))
        g_scal = g_scal3 + g_scal_extra + g_scal2 + g_scal1
        return g_ndc, g_world, g_fn, g_tex, g_scal

    def bg_only(_):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
        g_scal = jnp.zeros((1, _NS), jnp.float32)
        for c in range(3):
            g_scal = g_scal + jnp.where(cols == _S_BG + c,
                                        jnp.sum(g_rgba[c:c + 1]), 0.0)
        zf9 = jnp.zeros((cfg.f_pad, 9), jnp.float32)
        return (zf9, zf9, zf9,
                jnp.zeros((cfg.f_pad, cfg.tex_d), jnp.float32), g_scal)

    g_ndc, g_world, g_fn, g_tex, g_scal = jax.lax.cond(
        active_ref[0, 0, 0] > 0, full_pipeline, bg_only, None)

    first = tile_ref[0, 0, 0] == 0

    @pl.when(first)
    def _init():
        g_ndc_ref[:] = g_ndc
        g_world_ref[:] = g_world
        g_fn_ref[:] = g_fn
        g_tex_ref[:] = g_tex
        g_scal_ref[:] = g_scal

    @pl.when(jnp.logical_not(first))
    def _accum():
        g_ndc_ref[:] = g_ndc_ref[:] + g_ndc
        g_world_ref[:] = g_world_ref[:] + g_world
        g_fn_ref[:] = g_fn_ref[:] + g_fn
        g_tex_ref[:] = g_tex_ref[:] + g_tex
        g_scal_ref[:] = g_scal_ref[:] + g_scal


def _pallas_det_bwd(cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds,
                    active, prob, weights, g_zmap, g_out):
    nt = _n_tiles(cfg)
    f, dt = cfg.f_pad, cfg.tex_d
    acc = lambda shape: pl.BlockSpec(shape, lambda i, s=len(shape): (0,) * s,
                                     memory_space=pltpu.VMEM)
    pix = lambda c: pl.BlockSpec((c, cfg.p_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_det_bwd_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=_common_specs(cfg) + [pix(f), pix(cfg.c_zpad),
                                       pix(cfg.c_zpad), pix(4)],
        out_specs=(acc((f, 9)), acc((f, 9)), acc((f, 9)), acc((f, dt)),
                   acc((1, _NS))),
        out_shape=(
            jax.ShapeDtypeStruct((f, 9), jnp.float32),
            jax.ShapeDtypeStruct((f, 9), jnp.float32),
            jax.ShapeDtypeStruct((f, 9), jnp.float32),
            jax.ShapeDtypeStruct((f, dt), jnp.float32),
            jax.ShapeDtypeStruct((1, _NS), jnp.float32),
        ),
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, seeds, fv_ndc, fv_world, fn, tex, valid, scal,
      prob, weights, g_zmap, g_out)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_core_sharded(cfg, axis, fv_ndc, fv_world, fn, tex, valid, scal,
                        seeds):
    out, _ = _fcs_fwd(cfg, axis, fv_ndc, fv_world, fn, tex, valid, scal,
                      seeds)
    return out


def _fcs_fwd(cfg, axis, fv_ndc, fv_world, fn, tex, valid, scal, seeds):
    active = _active_tiles(cfg, fv_ndc, valid, scal[0, _S_BLUR])
    prob_local = _pallas_prob(cfg, fv_ndc, valid, scal, seeds, active)
    prob = jax.lax.pmean(prob_local, axis)
    out_local, weights_local = _pallas_forward(
        cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds, active,
        prob=prob)
    out = jax.lax.pmean(out_local, axis)
    weights = jax.lax.pmean(weights_local, axis)
    return out, (fv_ndc, fv_world, fn, tex, valid, scal, seeds, prob,
                 weights)


def _fcs_bwd(cfg, axis, res, g):
    fv_ndc, fv_world, fn, tex, valid, scal, seeds, prob, weights = res
    active = _active_tiles(cfg, fv_ndc, valid, scal[0, _S_BLUR])
    gz_local, gg_local = _pallas_agg_bwd(
        cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds, active, prob, g)
    g_zmap = jax.lax.pmean(gz_local, axis)
    g_gamma = jax.lax.pmean(gg_local[0, 0], axis)
    grads_local = _pallas_det_bwd(
        cfg, fv_ndc, fv_world, fn, tex, valid, scal, seeds, active, prob,
        weights, g_zmap, g)
    g_ndc, g_world, g_fn, g_tex, g_scal = jax.tree.map(
        lambda x: jax.lax.pmean(x, axis), grads_local)
    cols = jnp.arange(_NS)[None, :]
    g_scal = g_scal + jnp.where(cols == _S_GAMMA, g_gamma, 0.0)
    g_seeds = np.zeros(seeds.shape, jax.dtypes.float0)
    return (g_ndc, g_world, g_fn, g_tex, jnp.zeros_like(valid), g_scal,
            g_seeds)


_fused_core_sharded.defvjp(_fcs_fwd, _fcs_bwd)


# ---------------------------------------------------------------------------
# Streaming chunked mode: exact mid/high-coverage rendering, no slot caps
# ---------------------------------------------------------------------------
#
# The M-slot binned mode truncates when a tile's candidate set exceeds
# MAX_BIN_SLOTS (VMEM-bound); dense scenes at 128^2-256^2 (the icosphere at
# 128^2, the cow at 256^2) need hundreds-to-thousands of candidates per
# tile.  Streaming mode processes each tile's candidate chunks — an
# explicit per-tile list built by an XLA prepass over the (y-bucket, x)
# two-level-sorted face table — in fixed _STREAM_CHUNK-face chunks with
# O(chunk) VMEM, maintaining running per-sample argmax winners (and an
# online softmax for SoftAgg) — every candidate face participates, exactly
# like flat mode's slots-are-faces semantics, with no truncation at any
# coverage density.  The chunk list is read in-kernel from SMEM with a
# traced index (capability pinned by tools/probe_smem_rows.py).
#
# Deliberate deviation from the flat kernel (documented): the z_map
# max-stabilization shift (z_inv_max, smoothagg.py:50-53) is omitted.  The
# shift is common to all channels of a pixel, so argmax weights and softmax
# weights are mathematically unchanged (softmax re-stabilizes internally);
# its only trace is a zero-mean per-sample term in the MC z-gradients (and
# exactly zero for the deterministic members).
#
# Noise channels key on *absolute sorted-face* rows (plus the absolute
# pixel position): replay-exact between the forward kernel and the
# backward's two replay passes regardless of which chunks a tile visits,
# independent across pixels.

_STREAM_CHUNK = int(os.environ.get("PERTRENDERER_STREAM_CHUNK", "64"))
# faces per streamed chunk.  64 measured best across the density range
# (vs 128: sphere@128^2 9.27->7.21 ms, cow@256^2 35.2->28.1, config 5
# 862->749 — finer chunks cut window-alignment slop; 256 is 31% worse).
# Noise replay keys on ABSOLUTE sorted-table rows (row_base = chunk id *
# chunk), so face streams are chunk-size-invariant (the background row
# keys on rw = round_up(F, chunk), so cross-chunk-size renders differ by
# the bg draw only; within a size, replay is exact).
_STREAM_BUCKET_ROWS = int(os.environ.get("PERTRENDERER_STREAM_BUCKET", "16"))
# y-bucket height (px) of the two-level sort key
_BIG_LO = 1e30            # sort-key sentinel for invalid/padding rows


def _prod_rows(x):
    """Product over the row axis by successive halving (log-depth chain of
    elementwise multiplies)."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo = x[:half] * x[half:2 * half]
        x = jnp.concatenate([lo, x[2 * half:]], axis=0) if n % 2 else lo
        n = x.shape[0]
    return x                                            # (1, P)


def _row_at(x, s):
    """Row s of (S, P); static fast path for the unrolled sample loop.
    Traced s (rolled loops, S > _UNROLL) uses an iota-masked reduction —
    Mosaic has no value-level dynamic_slice."""
    if isinstance(s, int):
        return x[s:s + 1]
    hot = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == s
    return jnp.sum(jnp.where(hot, x, 0.0), axis=0, keepdims=True)


def _row_set(x, s, v):
    if isinstance(s, int):
        # No empty concat operands: Mosaic rejects zero-row vector types.
        parts = ([x[:s]] if s > 0 else []) + [v] \
            + ([x[s + 1:]] if s + 1 < x.shape[0] else [])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=0)
    hot = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == s
    return jnp.where(hot, v, x)     # v (1, P) broadcasts over the rows


def _first_hot_rows(val):
    """First-wins one-hot of the row-axis max; returns (max (1, P), hot)."""
    m = jnp.max(val, axis=0, keepdims=True)
    ridx = jax.lax.broadcasted_iota(jnp.int32, val.shape, 0)
    first = jnp.min(jnp.where(val >= m, ridx, jnp.int32(1 << 30)), axis=0,
                    keepdims=True)
    return m, (ridx == first).astype(jnp.float32), first


def _stream_chunk_det(cfg, px, py, pixvalid, scal, blk):
    """Geometry + shading for one streamed chunk block (ch, Df)."""
    td = cfg.tex_d
    lo_col = blk[:, 27 + td:28 + td]
    validb = lo_col < _BIG_LO
    det1 = _make_det1(cfg, px, py, pixvalid, validb)
    return det1(blk[:, :9], blk[:, 9:18], blk[:, 18:27], blk[:, 27:27 + td],
                scal)


def _stream_zmap(cfg, prob, z, maskf, scal):
    """Chunk z_map WITHOUT the common stabilization shift (see section
    docstring).  z_inv is masked like the flat det2 so dead rows carry no
    depth gradients."""
    znear = scal[0, _S_ZNEAR]
    zfar = scal[0, _S_ZFAR]
    z_inv = (zfar - z) / (zfar - znear) * maskf
    lp = log_corrected(prob)
    if cfg.agg_kind == "hard":
        scaled = jnp.float32(1.0 / 1e6) * lp
    else:
        gal = scal[0, _S_GAMMA] / scal[0, _S_ALPHA]
        scaled = prod_corrected(gal, lp)
    return scaled + z_inv


def _stream_chunk_iter(rows_ref, n_ref, body, carry):
    """fori over the tile's explicit chunk list: ``rows_ref`` holds the
    ascending chunk ids that overlap this tile (prepass bbox test), ``n``
    their count.  The list lives in SMEM so the traced loop index can read
    each chunk id dynamically (lowering pinned by
    tools/probe_smem_rows.py); ``body`` receives the CHUNK ID, not the
    loop position."""
    def b(q, c):
        return body(rows_ref[0, 0, q], c)
    return jax.lax.fori_loop(0, n_ref[0, 0, 0], b, carry)


def _stream_chunk_iter_db(rows_ref, n_ref, tab_hbm, scratch, sem, body,
                          carry):
    """Double-buffered chunk loop: chunk q+1's HBM->VMEM table DMA is
    started before chunk q's compute, so transfer latency hides behind the
    estimator loops.  ``scratch`` is (2, chunk, Df) VMEM, ``sem`` a (2,)
    DMA-semaphore array; ``body`` receives (loop position, chunk id, table
    block, carry).  Every started copy is waited exactly once, so the
    buffers are clean for a following loop over the same list."""
    ch = scratch.shape[1]
    n = n_ref[0, 0, 0]

    def dma(q, slot):
        cid = rows_ref[0, 0, q]
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(cid * ch, ch), :], scratch.at[slot],
            sem.at[slot])

    @pl.when(n > 0)
    def _warm():
        dma(0, 0).start()

    def b(q, c):
        slot = jax.lax.rem(q, 2)

        @pl.when(q + 1 < n)
        def _next():
            dma(q + 1, 1 - slot).start()

        dma(q, slot).wait()
        return body(q, rows_ref[0, 0, q], scratch[slot], c)

    return jax.lax.fori_loop(0, n, b, carry)


def _stream_forward_kernel(tile_ref, active_ref, rows_ref, n_ref,
                           seeds_ref, tab_hbm, scal_ref, out_ref,
                           scratch, sem, *, cfg):
    tile = tile_ref[0, 0, 0]
    pos, px, py, pixvalid = _tile_coords(cfg, tile)
    scal = scal_ref[:]
    ch, p = _STREAM_CHUNK, cfg.p_tile
    gamma = scal[0, _S_GAMMA]
    sigma = scal[0, _S_SIGMA]
    s_agg = cfg.s_agg if cfg.agg_kind == "mc" else 1
    bgc = [jnp.full((1, p), scal[0, _S_BG + c]) for c in range(3)]

    def pipeline(_):
        # Aggregation state, initialized with the background channel.
        if cfg.agg_kind == "soft":
            inv_g = 1.0 / gamma
            x_bg = jnp.full((1, p), cfg.eps_bg * inv_g)
            st0 = (jnp.ones((1, p), jnp.float32), x_bg,
                   jnp.ones((1, p), jnp.float32),
                   [c.astype(jnp.float32) for c in bgc])
            # (alpha, M, den, num[3]) with den/num relative to M
        else:
            def bg_row(s):
                if cfg.agg_kind == "hard":
                    return jnp.full((1, p), cfg.eps_bg)
                n = _draw_block(cfg.agg_noise, seeds_ref[0, 2],
                                seeds_ref[0, 3], s, 2, p, pos,
                                row_base=cfg.rw)[0:1]
                return cfg.eps_bg + gamma * n
            runmax = jnp.concatenate([bg_row(s) for s in range(s_agg)], 0)
            winc = [jnp.concatenate([c] * s_agg, 0) for c in bgc]  # (S, P)
            st0 = (jnp.ones((1, p), jnp.float32), runmax, winc)

        def body(_q, cid, blk, st):
            dist, z, c0, c1, c2, maskf = _stream_chunk_det(
                cfg, px, py, pixvalid, scal, blk)
            if cfg.rast_kind == "mc":
                prob_raw = _mc_rast_forward(cfg, -dist, sigma,
                                            seeds_ref[0, 0], seeds_ref[0, 1],
                                            pos, row_base=cid * ch)
            else:
                prob_raw = _make_det_rast(cfg)(dist, scal)
            prob = prob_raw * maskf
            # Dead rows carry prob 0 -> log_corrected gives -inf z_map:
            # they can never win the argmax and vanish in the softmax.
            zmap = _stream_zmap(cfg, prob, z, maskf, scal)
            alpha = st[0] * _prod_rows(1.0 - prob)

            if cfg.agg_kind == "soft":
                _, m_old, den, num = st
                x = zmap * (1.0 / gamma)   # bit-matches prod_corrected form
                mc_ = jnp.max(x, axis=0, keepdims=True)
                m_new = jnp.maximum(m_old, mc_)
                scale = jnp.exp(m_old - m_new)
                e = jnp.exp(x - m_new)
                den = den * scale + jnp.sum(e, axis=0, keepdims=True)
                num = [n_ * scale + jnp.sum(e * cc, axis=0, keepdims=True)
                       for n_, cc in zip(num, (c0, c1, c2))]
                return (alpha, m_new, den, num)

            _, runmax, winc = st

            def s_body(s, sst):
                runmax, w0_, w1_, w2_ = sst
                if cfg.agg_kind == "hard":
                    val = zmap
                else:
                    n = _draw_block(cfg.agg_noise, seeds_ref[0, 2],
                                    seeds_ref[0, 3], s, ch, p, pos,
                                    row_base=cid * ch)
                    val = zmap + gamma * n
                m, hot, _ = _first_hot_rows(val)
                cc = [jnp.sum(hot * ci, axis=0, keepdims=True)
                      for ci in (c0, c1, c2)]
                rm = _row_at(runmax, s)
                better = m > rm
                runmax = _row_set(runmax, s, jnp.where(better, m, rm))
                outs = []
                for w_, ci in zip((w0_, w1_, w2_), cc):
                    outs.append(_row_set(
                        w_, s, jnp.where(better, ci, _row_at(w_, s))))
                return (runmax,) + tuple(outs)

            runmax, wc0, wc1, wc2 = _sample_loop(
                s_agg, s_body, (runmax, winc[0], winc[1], winc[2]))
            return (alpha, runmax, [wc0, wc1, wc2])

        st = _stream_chunk_iter_db(rows_ref, n_ref, tab_hbm, scratch, sem,
                                   body, st0)
        if cfg.agg_kind == "soft":
            alpha, _, den, num = st
            rgb = [n_ / den for n_ in num]
        else:
            alpha, _, winc = st
            rgb = [jnp.mean(w_, axis=0, keepdims=True) for w_ in winc]
        return jnp.concatenate(rgb + [1.0 - alpha], axis=0)

    out_ref[:] = jax.lax.cond(active_ref[0, 0, 0] > 0, pipeline,
                              lambda _: _bg_image(cfg, scal), None)


def _stream_backward_kernel(tile_ref, active_ref, rows_ref, n_ref,
                            seeds_ref, tab_hbm, scal_ref, g_out_ref,
                            gz_hbm, g_gtab_hbm, g_scal_ref,
                            scratch, gscr, sem, semr, semw, *, cfg):
    _stream_grad_impl(cfg, None, tile_ref, active_ref, rows_ref, n_ref,
                      seeds_ref, tab_hbm, scal_ref, g_out_ref, None, None,
                      None, g_gtab_hbm, g_scal_ref, scratch, gscr, sem,
                      semr, semw)


def _stream_loss_grad_kernel(tile_ref, active_ref, rows_ref, n_ref,
                             seeds_ref, tab_hbm, scal_ref, target_ref,
                             lscale_ref, gz_hbm, loss_ref, g_gtab_hbm,
                             g_scal_ref, scratch, gscr, sem, semr, semw, *,
                             cfg, loss_kind):
    """Streaming value-and-grad: the backward's two chunk passes with the
    image-loss cotangent derived in place after the replay pass — a full
    loss+grad step costs TWO chunk sweeps instead of the three of
    forward-kernel + backward-kernel (flat-mode analog: _loss_grad_kernel).
    The alpha/product track is skipped entirely: the image losses read only
    the RGB channels, so the alpha cotangent is identically zero."""
    _stream_grad_impl(cfg, loss_kind, tile_ref, active_ref, rows_ref, n_ref,
                      seeds_ref, tab_hbm, scal_ref, None, target_ref,
                      lscale_ref, loss_ref, g_gtab_hbm, g_scal_ref, scratch,
                      gscr, sem, semr, semw)


def _stream_grad_impl(cfg, loss_kind, tile_ref, active_ref, rows_ref, n_ref,
                      seeds_ref, tab_hbm, scal_ref, g_out_ref, target_ref,
                      lscale_ref, loss_ref, g_gtab_hbm, g_scal_ref,
                      scratch, gscr, sem, semr, semw):
    tile = tile_ref[0, 0, 0]
    pos, px, py, pixvalid = _tile_coords(cfg, tile)
    scal = scal_ref[:]
    ch, p, rw = _STREAM_CHUNK, cfg.p_tile, cfg.rw
    gamma = scal[0, _S_GAMMA]
    sigma = scal[0, _S_SIGMA]
    td = cfg.tex_d
    df = 27 + td + 1
    mc_agg = cfg.agg_kind == "mc"
    s_agg = cfg.s_agg if mc_agg else 1
    track_alpha = loss_kind is None
    if track_alpha:
        g_rgba = g_out_ref[:]
        g_rgb_ext = [g_rgba[c:c + 1] for c in range(3)]
        g_alpha = g_rgba[3:4]
    else:
        pvf = pixvalid.astype(jnp.float32)
        lscale = lscale_ref[0, 0]
    bgc = [jnp.full((1, p), scal[0, _S_BG + c]) for c in range(3)]
    cols_ns = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)

    # The gradient table lives in HBM (aliased to a zeros input); chunks
    # accumulate by read-modify-write.  The TPU grid is sequential, so the
    # RMW is race-free across tiles.
    def grmw_read(q, slot):
        cid = rows_ref[0, 0, q]
        return pltpu.make_async_copy(
            g_gtab_hbm.at[pl.ds(cid * ch, ch), :], gscr.at[slot],
            semr.at[slot])

    def grmw_write(q, slot):
        cid = rows_ref[0, 0, q]
        return pltpu.make_async_copy(
            gscr.at[slot], g_gtab_hbm.at[pl.ds(cid * ch, ch), :],
            semw.at[slot])

    def agg_noise(s, cid):
        return _draw_block(cfg.agg_noise, seeds_ref[0, 2], seeds_ref[0, 3],
                           s, ch, p, pos, row_base=cid * ch)

    def pipeline(_):
        # ---- pass B1: replay forward, stash per-sample winner info -------
        if cfg.agg_kind == "soft":
            inv_g = 1.0 / gamma
            x_bg = jnp.full((1, p), cfg.eps_bg * inv_g)
            st0 = (jnp.zeros((1, p), jnp.float32),     # zcnt
                   jnp.ones((1, p), jnp.float32),      # pnz
                   x_bg,                               # M
                   jnp.ones((1, p), jnp.float32),      # den
                   [c.astype(jnp.float32) for c in bgc])   # num
        else:
            def bg_row(s):
                if cfg.agg_kind == "hard":
                    return jnp.full((1, p), cfg.eps_bg), jnp.zeros((1, p))
                n = _draw_block(cfg.agg_noise, seeds_ref[0, 2],
                                seeds_ref[0, 3], s, 2, p, pos,
                                row_base=rw)[0:1]
                return cfg.eps_bg + gamma * n, n
            bg_rows = [bg_row(s) for s in range(s_agg)]
            runmax = jnp.concatenate([r for r, _ in bg_rows], 0)   # (S, P)
            if cfg.agg_noise == "gaussian" or cfg.agg_kind == "hard":
                phi = jnp.concatenate([n * n for _, n in bg_rows], 0)
            else:
                phi = jnp.concatenate(
                    [_score(n, cfg.agg_noise) * n for _, n in bg_rows], 0)
            winid = jnp.full((s_agg, p), jnp.float32(rw))
            winc = [jnp.concatenate([c] * s_agg, 0) for c in bgc]
            rm0 = jnp.full((1, p), cfg.eps_bg)
            w0c = [c.astype(jnp.float32) for c in bgc]
            st0 = (jnp.zeros((1, p), jnp.float32),
                   jnp.ones((1, p), jnp.float32),
                   runmax, winid, winc, phi, rm0, w0c,
                   jnp.float32(0.0))                   # nreal

        def body1(_q, cid, blk, st):
            dist, z, c0, c1, c2, maskf = _stream_chunk_det(
                cfg, px, py, pixvalid, scal, blk)
            if cfg.rast_kind == "mc":
                prob_raw = _mc_rast_forward(cfg, -dist, sigma,
                                            seeds_ref[0, 0], seeds_ref[0, 1],
                                            pos, row_base=cid * ch)
            else:
                prob_raw = _make_det_rast(cfg)(dist, scal)
            prob = prob_raw * maskf
            zmap = _stream_zmap(cfg, prob, z, maskf, scal)
            if track_alpha:
                one = (prob >= 1.0)
                zcnt = st[0] + jnp.sum(one.astype(jnp.float32), axis=0,
                                       keepdims=True)
                pnz = st[1] * _prod_rows(jnp.where(one, 1.0, 1.0 - prob))
            else:
                zcnt, pnz = st[0], st[1]

            if cfg.agg_kind == "soft":
                _, _, m_old, den, num = st
                x = zmap * (1.0 / gamma)
                m_new = jnp.maximum(m_old,
                                    jnp.max(x, axis=0, keepdims=True))
                sc = jnp.exp(m_old - m_new)
                e = jnp.exp(x - m_new)
                den = den * sc + jnp.sum(e, axis=0, keepdims=True)
                num = [n_ * sc + jnp.sum(e * cc, axis=0, keepdims=True)
                       for n_, cc in zip(num, (c0, c1, c2))]
                return (zcnt, pnz, m_new, den, num)

            _, _, runmax, winid, winc, phi, rm0, w0c, nreal = st

            # Hard-argmax control variate track (no noise).
            m0, hot0, _ = _first_hot_rows(zmap)
            b0 = m0 > rm0
            rm0 = jnp.where(b0, m0, rm0)
            w0c = [jnp.where(b0, jnp.sum(hot0 * cc, axis=0, keepdims=True),
                             w_) for w_, cc in zip(w0c, (c0, c1, c2))]

            def s_body(s, sst):
                runmax, winid, w0_, w1_, w2_, phi = sst
                if cfg.agg_kind == "hard":
                    val, n = zmap, None
                else:
                    n = agg_noise(s, cid)
                    val = zmap + gamma * n
                m, hot, first = _first_hot_rows(val)
                cc = [jnp.sum(hot * ci, axis=0, keepdims=True)
                      for ci in (c0, c1, c2)]
                rm = _row_at(runmax, s)
                better = m > rm
                runmax = _row_set(runmax, s, jnp.where(better, m, rm))
                wid = _row_at(winid, s)
                winid = _row_set(winid, s, jnp.where(
                    better, (first + cid * ch).astype(jnp.float32), wid))
                outs = []
                for w_, ci in zip((w0_, w1_, w2_), cc):
                    outs.append(_row_set(
                        w_, s, jnp.where(better, ci, _row_at(w_, s))))
                if n is not None:
                    if cfg.agg_noise == "gaussian":
                        ph = jnp.sum(n * n, axis=0, keepdims=True)
                    else:
                        ph = jnp.sum(_score(n, cfg.agg_noise) * n, axis=0,
                                     keepdims=True)
                    phi = _row_set(phi, s, _row_at(phi, s) + ph)
                return (runmax, winid) + tuple(outs) + (phi,)

            runmax, winid, wc0, wc1, wc2, phi = _sample_loop(
                s_agg, s_body,
                (runmax, winid, winc[0], winc[1], winc[2], phi))
            return (zcnt, pnz, runmax, winid, [wc0, wc1, wc2], phi, rm0,
                    w0c, nreal + ch)

        st = _stream_chunk_iter_db(rows_ref, n_ref, tab_hbm, scratch, sem,
                                   body1, st0)

        # ---- post-B1: loss cotangent + per-sample cotangent scalars ------
        if loss_kind is None:
            g_rgb, loss_tile = g_rgb_ext, jnp.float32(0.0)
        else:
            # Reconstruct the forward RGB from the replay state; the loss
            # cotangent needs no separate forward sweep.
            if cfg.agg_kind == "soft":
                rgb_rows = [num_c / st[3] for num_c in st[4]]
            else:
                rgb_rows = [jnp.mean(w_, axis=0, keepdims=True)
                            for w_ in st[4]]
            loss_tile, g_rgb = _loss_cotangent(loss_kind, rgb_rows,
                                               target_ref, pvf, lscale)
        g_scal = jnp.zeros((1, _NS), jnp.float32)
        g_prod = -g_alpha if track_alpha else None  # alpha = 1 - prod(1 - p)
        if cfg.agg_kind == "soft":
            zcnt, pnz, m_fin, den, num = st
            rgb = [n_ / den for n_ in num]
            dot_w = sum(r * g for r, g in zip(rgb, g_rgb))     # (1, P)
            # Background channel contributions (weight + color cotangent).
            w_bg = jnp.exp(x_bg - m_fin) / den
            for cidx in range(3):
                g_scal = g_scal + jnp.where(
                    cols_ns == _S_BG + cidx,
                    jnp.sum(w_bg * g_rgb[cidx]), 0.0)
            gb_x = w_bg * (sum(b * g for b, g in zip(bgc, g_rgb)) - dot_w)
            # bg x = eps * (1/gamma): its only parameter path is gamma.
            g_scal = g_scal + jnp.where(
                cols_ns == _S_GAMMA,
                -jnp.sum(cfg.eps_bg * gb_x) / (gamma * gamma), 0.0)
            aux = (m_fin, den, dot_w)
            dot = winid = None
        else:
            (zcnt, pnz, runmax, winid, winc, phi, rm0, w0c, nreal) = st
            dot = sum((w_ - b_) * g for w_, b_, g in
                      zip(winc, w0c, g_rgb))                  # (S, P)
            comp = jnp.float32(cfg.k) - nreal
            gamma_term = jnp.sum(dot * (phi + comp - 1.0)) / (s_agg * gamma)
            if cfg.agg_kind == "mc":
                g_scal = g_scal + jnp.where(cols_ns == _S_GAMMA, gamma_term,
                                            0.0)
            # Background weight cotangent -> background color gradient.
            wbg_mean = jnp.mean((winid >= rw).astype(jnp.float32),
                                axis=0, keepdims=True)
            for cidx in range(3):
                g_scal = g_scal + jnp.where(
                    cols_ns == _S_BG + cidx,
                    jnp.sum(wbg_mean * g_rgb[cidx]), 0.0)
            aux = None

        # ---- pass B2: per-chunk gradients --------------------------------
        # The gradient-table read-modify-write pipelines with the compute:
        # chunk q's grad rows stream in while its cotangents are built, and
        # the write-back overlaps chunk q+1 (chunk ids are distinct within
        # a tile, so in-flight reads/writes never alias).
        def body2(q, cid, blk, carry):
            g_scal_acc = carry
            slot = jax.lax.rem(q, 2)

            @pl.when(q >= 2)
            def _drain():      # free this slot: chunk q-2's write-back
                grmw_write(q - 2, slot).wait()

            grmw_read(q, slot).start()
            (dist, z, c0, c1, c2, maskf), vjp1 = jax.vjp(
                lambda a, b, d, e, f: _stream_chunk_det(
                    cfg, px, py, pixvalid, f,
                    jnp.concatenate([a, b, d, e,
                                     blk[:, 27 + td:28 + td]], axis=1)),
                blk[:, :9], blk[:, 9:18], blk[:, 18:27],
                blk[:, 27:27 + td], scal)
            if cfg.rast_kind == "mc":
                prob_raw, coeff = _mc_rast_fwd_coeff(
                    cfg, -dist, sigma, seeds_ref[0, 0], seeds_ref[0, 1],
                    pos, row_base=cid * ch)
                vjp_rast = None
            else:
                prob_raw, vjp_rast = jax.vjp(_make_det_rast(cfg), dist, scal)
                coeff = None
            prob = prob_raw * maskf
            zmap, vjp_z = jax.vjp(
                lambda pr, zz, sc: _stream_zmap(cfg, pr, zz, maskf, sc),
                prob, z, scal)

            rows_f = (jax.lax.broadcasted_iota(jnp.int32, (ch, p), 0)
                      + cid * ch).astype(jnp.float32)

            # z_map cotangent from the aggregation.
            if cfg.agg_kind == "soft":
                m_fin, den, dot_w = aux
                x = zmap * (1.0 / gamma)
                wgt = jnp.exp(x - m_fin) / den
                g_w_rows = c0 * g_rgb[0] + c1 * g_rgb[1] + c2 * g_rgb[2]
                g_x = wgt * (g_w_rows - dot_w)
                g_zmap = g_x * (1.0 / gamma)
                zsafe = jnp.where(jnp.isinf(zmap), 0.0, zmap)
                g_ig = jnp.sum(zsafe * g_x)        # d/d(1/gamma) partial
                g_scal_c = jnp.where(cols_ns == _S_GAMMA,
                                     -g_ig / (gamma * gamma), 0.0)
                g_c = [wgt * g for g in g_rgb]
            elif cfg.agg_kind == "hard":
                g_zmap = jnp.zeros((ch, p), jnp.float32)
                g_scal_c = jnp.zeros((1, _NS), jnp.float32)
                g_c = [(winid[0:1] == rows_f).astype(jnp.float32) * g
                       for g in g_rgb]
            else:
                # One S-loop for both the score accumulation (z_map
                # cotangent) and the winner-selection color cotangent.
                def sb(s, carry):
                    acc, gc = carry
                    n = agg_noise(s, cid)
                    acc = acc + _row_at(dot, s) * _score(n, cfg.agg_noise)
                    sel = (_row_at(winid, s) == rows_f).astype(jnp.float32)
                    return (acc, [a + sel * g for a, g in zip(gc, g_rgb)])
                acc_z, g_c = _sample_loop(
                    s_agg, sb, (jnp.zeros((ch, p), jnp.float32),
                                [jnp.zeros((ch, p), jnp.float32)
                                 for _ in range(3)]))
                g_zmap = acc_z / (s_agg * gamma)
                g_scal_c = jnp.zeros((1, _NS), jnp.float32)
                g_c = [g / s_agg for g in g_c]

            g_prob_z, g_z, g_scal_z = vjp_z(g_zmap)

            if track_alpha:
                # alpha-product cotangent (exact exclusion products).
                one = (prob >= 1.0)
                excl = jnp.where(
                    one, jnp.where(zcnt == 1.0, pnz, 0.0),
                    jnp.where(zcnt == 0.0,
                              pnz / jnp.where(one, 1.0, 1.0 - prob), 0.0))
                g_prob = g_prob_z + g_prod * (-excl)
            else:
                g_prob = g_prob_z
            g_prob_raw = g_prob * maskf

            if cfg.rast_kind == "mc":
                g_d = coeff * g_prob_raw
                g_dist = -g_d
                g_scal_r = jnp.where(cols_ns == _S_SIGMA, jnp.sum(g_d), 0.0)
            else:
                g_dist, g_scal_r = vjp_rast(g_prob_raw)

            g_ndc, g_world, g_fn, g_tex, g_scal_1 = vjp1(
                (g_dist, g_z, g_c[0], g_c[1], g_c[2],
                 jnp.zeros_like(maskf)))
            gblk = jnp.concatenate(
                [g_ndc, g_world, g_fn, g_tex,
                 jnp.zeros((ch, gscr.shape[2] - df + 1), jnp.float32)],
                axis=1)
            grmw_read(q, slot).wait()
            gscr[slot] = gscr[slot] + gblk
            grmw_write(q, slot).start()
            return (g_scal_acc + g_scal_z + g_scal_c + g_scal_r + g_scal_1)

        g_scal = _stream_chunk_iter_db(rows_ref, n_ref, tab_hbm, scratch,
                                       sem, body2, g_scal)
        nq = n_ref[0, 0, 0]

        @pl.when(nq >= 2)      # drain the trailing write-backs
        def _drain_2():
            grmw_write(nq - 2, jax.lax.rem(nq - 2, 2)).wait()

        @pl.when(nq >= 1)
        def _drain_1():
            grmw_write(nq - 1, jax.lax.rem(nq - 1, 2)).wait()

        return loss_tile, g_scal

    def bg_only(_):
        g_scal = jnp.zeros((1, _NS), jnp.float32)
        if loss_kind is None:
            loss_tile, grgb = jnp.float32(0.0), g_rgb_ext
        else:
            bg_rows = [jnp.full((1, p), scal[0, _S_BG + c])
                       for c in range(3)]
            loss_tile, grgb = _loss_cotangent(loss_kind, bg_rows,
                                              target_ref, pvf, lscale)
        for c in range(3):
            g_scal = g_scal + jnp.where(cols_ns == _S_BG + c,
                                        jnp.sum(grgb[c]), 0.0)
        return loss_tile, g_scal

    loss_tile, g_scal_tile = jax.lax.cond(active_ref[0, 0, 0] > 0, pipeline,
                                          bg_only, None)

    @pl.when(tile == 0)
    def _init():
        g_scal_ref[:] = g_scal_tile
        if loss_kind is not None:
            loss_ref[:] = jnp.reshape(loss_tile, (1, 1))

    @pl.when(tile != 0)
    def _accum():
        g_scal_ref[:] = g_scal_ref[:] + g_scal_tile
        if loss_kind is not None:
            loss_ref[:] = loss_ref[:] + jnp.reshape(loss_tile, (1, 1))


def _stream_specs(cfg: FusedConfig):
    nch = cfg.rw // _STREAM_CHUNK
    return [
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # tile ids
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # active bits
        pl.BlockSpec((1, 1, nch), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),          # per-tile chunk list
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),          # chunk count
        _const_spec((1, 8)),                            # seeds
        pl.BlockSpec(memory_space=pl.ANY),           # sorted face table
        _const_spec((1, _NS)),                          # scal
    ]


def _pallas_stream_forward(cfg, tab, rows, n, active, scal, seeds):
    nt = _n_tiles(cfg)
    df = _round_up(27 + cfg.tex_d + 1, 128)
    return pl.pallas_call(
        partial(_stream_forward_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=_stream_specs(cfg),
        out_specs=pl.BlockSpec((4, cfg.p_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, nt * cfg.p_tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _STREAM_CHUNK, df), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, rows, n, seeds, tab, scal)


def _pallas_stream_backward(cfg, tab, rows, n, active, scal, seeds, g_out):
    nt = _n_tiles(cfg)
    df = _round_up(27 + cfg.tex_d + 1, 128)
    return pl.pallas_call(
        partial(_stream_backward_kernel, cfg=cfg),
        grid=(nt,),
        in_specs=_stream_specs(cfg) + [
            pl.BlockSpec((4, cfg.p_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # grad-table zeros
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),       # grad table (HBM)
            _const_spec((1, _NS)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cfg.rw, df), jnp.float32),
            jax.ShapeDtypeStruct((1, _NS), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _STREAM_CHUNK, df), jnp.float32),
            pltpu.VMEM((2, _STREAM_CHUNK, df), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={8: 0},
        # The in-kernel vjp's residual live set scales with (chunk x tile)
        # pixels; the compiler's default 16M scoped-vmem budget caps tiles
        # at (1, 128).  Physical VMEM is far larger — raise the budget so
        # (8, 128) tiles fit (measured 54M at p_tile=1024).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, rows, n, seeds, tab, scal, g_out,
      jnp.zeros((cfg.rw, df), jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_core_stream(cfg, tab, scal, rows, n, active, seeds):
    return _pallas_stream_forward(cfg, tab, rows, n, active, scal, seeds)


def _fcstream_fwd(cfg, tab, scal, rows, n, active, seeds):
    out = _fused_core_stream(cfg, tab, scal, rows, n, active, seeds)
    return out, (tab, scal, rows, n, active, seeds)


def _fcstream_bwd(cfg, res, g):
    tab, scal, rows, n, active, seeds = res
    g_tab, g_scal = _pallas_stream_backward(cfg, tab, rows, n, active,
                                            scal, seeds, g)
    return (g_tab, g_scal,
            np.zeros(rows.shape, jax.dtypes.float0),
            np.zeros(n.shape, jax.dtypes.float0),
            np.zeros(active.shape, jax.dtypes.float0),
            np.zeros(seeds.shape, jax.dtypes.float0))


_fused_core_stream.defvjp(_fcstream_fwd, _fcstream_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_core_stream_sharded(cfg, axis, tab, scal, rows, n, active,
                               seeds):
    """Streaming render under MC sample-axis sharding.

    The streaming kernels never materialize the per-(face, pixel) coverage
    field, so the flat path's pmean-before-z_map decomposition cannot
    apply.  Instead the RAST samples replicate (identical seeds on every
    device — _prepare_inputs skips their offset) and only the AGG samples
    shard.  Every remaining sharded quantity is a per-sample mean that the
    unmodified kernels already compute locally, and every consumer is
    LINEAR in it:

    * forward RGB = mean over agg samples of winner colors -> pmean exact;
      alpha is deterministic in prob (identical on all devices);
    * backward: g_zmap, the winner-selection color cotangents, the gamma
      term, and the background-weight terms are local agg-sample means
      feeding linear VJPs (vjp_z, vjp1), while the alpha-product and rast
      tracks are device-identical -> pmean of the final table/scalar
      gradients is exact.

    Folded equivalent: a single-device run with the SAME S_rast and
    S_agg * n_devices aggregation samples (pinned by
    tests/test_sharding.py).
    """
    out, _ = _fcss_fwd(cfg, axis, tab, scal, rows, n, active, seeds)
    return out


def _fcss_fwd(cfg, axis, tab, scal, rows, n, active, seeds):
    out = jax.lax.pmean(
        _pallas_stream_forward(cfg, tab, rows, n, active, scal, seeds),
        axis)
    return out, (tab, scal, rows, n, active, seeds)


def _fcss_bwd(cfg, axis, res, g):
    tab, scal, rows, n, active, seeds = res
    g_tab, g_scal = _pallas_stream_backward(cfg, tab, rows, n, active,
                                            scal, seeds, g)
    return (jax.lax.pmean(g_tab, axis), jax.lax.pmean(g_scal, axis),
            np.zeros(rows.shape, jax.dtypes.float0),
            np.zeros(n.shape, jax.dtypes.float0),
            np.zeros(active.shape, jax.dtypes.float0),
            np.zeros(seeds.shape, jax.dtypes.float0))


_fused_core_stream_sharded.defvjp(_fcss_fwd, _fcss_bwd)


def _pallas_stream_loss_grad(cfg, loss_kind, tab, rows, n, active, scal,
                             seeds, target_cm, lscale):
    nt = _n_tiles(cfg)
    df = _round_up(27 + cfg.tex_d + 1, 128)
    acc = lambda shape: pl.BlockSpec(shape, lambda i, s=len(shape): (0,) * s,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_stream_loss_grad_kernel, cfg=cfg, loss_kind=loss_kind),
        grid=(nt,),
        in_specs=_stream_specs(cfg) + [
            pl.BlockSpec((3, cfg.p_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),      # target tile
            _const_spec((1, 1)),                        # loss scale
            pl.BlockSpec(memory_space=pl.ANY),          # grad-table zeros
        ],
        out_specs=(
            acc((1, 1)),                                # loss accumulator
            pl.BlockSpec(memory_space=pl.ANY),          # grad table (HBM)
            _const_spec((1, _NS)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((cfg.rw, df), jnp.float32),
            jax.ShapeDtypeStruct((1, _NS), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _STREAM_CHUNK, df), jnp.float32),
            pltpu.VMEM((2, _STREAM_CHUNK, df), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={9: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, rows, n, seeds, tab, scal, target_cm, lscale,
      jnp.zeros((cfg.rw, df), jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_stream_loss_core(cfg, loss_kind, tab, scal, rows, n, active,
                            seeds, target_cm, lscale):
    loss, *_ = _pallas_stream_loss_grad(cfg, loss_kind, tab, rows, n,
                                        active, scal, seeds, target_cm,
                                        lscale)
    return loss[0, 0]


def _fslc_fwd(cfg, loss_kind, tab, scal, rows, n, active, seeds, target_cm,
              lscale):
    loss, g_tab, g_scal = _pallas_stream_loss_grad(
        cfg, loss_kind, tab, rows, n, active, scal, seeds, target_cm,
        lscale)
    return loss[0, 0], (g_tab, g_scal, rows, n, active, seeds, target_cm,
                        lscale)


def _fslc_bwd(cfg, loss_kind, res, g):
    g_tab, g_scal, rows, n, active, seeds, target_cm, ls = res
    return (g * g_tab, g * g_scal,
            np.zeros(rows.shape, jax.dtypes.float0),
            np.zeros(n.shape, jax.dtypes.float0),
            np.zeros(active.shape, jax.dtypes.float0),
            np.zeros(seeds.shape, jax.dtypes.float0),
            jnp.zeros_like(target_cm), jnp.zeros_like(ls))


_fused_stream_loss_core.defvjp(_fslc_fwd, _fslc_bwd)


def _stream_tables(cfg: FusedConfig, merged, fv_ndc, valid_col, blur):
    """Streaming-mode table + per-tile chunk lists.

    The face table is sorted by a two-level (y-bucket, x-min) key and kept
    in HBM; the kernels DMA _STREAM_CHUNK-row blocks on demand.  An XLA
    prepass computes each chunk's blur-inflated bbox (segment min/max over
    its rows) and emits, per tile, the EXPLICIT ascending list of chunks
    whose bbox overlaps the tile rect (read in-kernel via dynamic SMEM
    indexing).  The two-level sort makes chunks compact in BOTH axes, so
    bbox culling excises most of the blur-band slop that a pure y-window
    re-reads; correctness never depends on it — chunk bboxes bound every
    face bbox, so every candidate face is processed, and slop rows fail the
    in-kernel coverage test (exact no-ops), at any density or blur.

    Differentiable w.r.t. ``merged`` (permutation-gather VJP — no scalar
    scatters).  Returns (tab (rw, dfp), rows (nt, 1, nch), n (nt, 1, 1))
    with the trailing table column the sort key (doubles as the
    validity/padding sentinel)."""
    nt = _n_tiles(cfg)
    ch = _STREAM_CHUNK
    f = fv_ndc.shape[0]
    h = cfg.image_size
    band = jnp.sqrt(jnp.maximum(blur, 0.0))

    fv_s = jax.lax.stop_gradient(fv_ndc)
    validb = _face_validb(fv_ndc, valid_col)
    ys = fv_s[:, 1::3]
    xs = fv_s[:, 0::3]
    lo = jnp.min(ys, axis=1) - band
    hi = jnp.max(ys, axis=1) + band
    xlo = jnp.min(xs, axis=1) - band
    xhi = jnp.max(xs, axis=1) + band

    # Two-level sort key: y-bucket of the inflated bbox top (NDC y
    # decreases with pixel row), then x-min within the bucket.  The key
    # only shapes chunk LOCALITY (culling efficiency) — any order is
    # exact — so f32 quantization slop is harmless.
    nb = max(1, -(-h // _STREAM_BUCKET_ROWS))
    b = jnp.clip(jnp.floor((1.0 - lo) * (h * 0.5 / _STREAM_BUCKET_ROWS)),
                 0.0, nb - 1.0)
    xn = jnp.clip((xlo + 2.0) * 0.25, 0.0, 1.0)
    key = jnp.where(validb, b * 8.0 + xn * 4.0, _BIG_LO)
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)

    f_rows = cfg.rw                                      # round_up(f, chunk)
    nch = f_rows // ch

    def chunk_reduce(col, sentinel, red):
        colp = jnp.concatenate(
            [col[perm], jnp.full((f_rows - f,), sentinel, jnp.float32)])
        return red(colp.reshape(nch, ch), axis=1)        # (nch,)
    clo = chunk_reduce(lo, _BIG_LO, jnp.min)
    chi = chunk_reduce(hi, -_BIG_LO, jnp.max)
    cxlo = chunk_reduce(xlo, _BIG_LO, jnp.min)
    cxhi = chunk_reduce(xhi, -_BIG_LO, jnp.max)
    # Invalid faces carry real bbox values; exclude them from chunk bboxes
    # so the all-invalid tail chunks never schedule.  (Mixed chunks still
    # schedule — their invalid rows are masked in-kernel.)
    vmask = jnp.concatenate(
        [validb[perm], jnp.zeros((f_rows - f,), bool)]).reshape(nch, ch)
    anyv = jnp.any(vmask, axis=1)
    clo = jnp.where(anyv, clo, _BIG_LO)
    chi = jnp.where(anyv, chi, -_BIG_LO)

    ty_hi, ty_lo, tx_hi, tx_lo = (jnp.asarray(a) for a in _tile_rects(cfg))
    ov = ((clo[None, :] <= ty_hi[:, None]) & (chi[None, :] >= ty_lo[:, None])
          & (cxlo[None, :] <= tx_hi[:, None])
          & (cxhi[None, :] >= tx_lo[:, None]))           # (nt, nch)
    n = jnp.sum(ov.astype(jnp.int32), axis=1)
    # Ascending chunk ids, overlapping first (stable argsort of ~overlap).
    rows = jnp.argsort(~ov, axis=1, stable=True).astype(jnp.int32)

    d = merged.shape[1]
    merged_s = _permute_rows(merged, perm, inv_perm)
    merged_s = jnp.concatenate(
        [merged_s, jnp.zeros((f_rows - f, d), merged.dtype)], axis=0)
    key_pad = jnp.concatenate(
        [jnp.where(validb, key, _BIG_LO)[perm],
         jnp.full((f_rows - f,), _BIG_LO, jnp.float32)])[:, None]
    # Chunk DMA slices must be lane-aligned: pad columns to a multiple of
    # 128 (Mosaic rejects partial-lane slices of an HBM-resident table).
    dfp = _round_up(d + 1, 128)
    tab = jnp.concatenate(
        [merged_s, key_pad,
         jnp.zeros((f_rows, dfp - d - 1), jnp.float32)], axis=1)
    return tab, rows.reshape(nt, 1, nch), n.reshape(nt, 1, 1)


# ---------------------------------------------------------------------------
# Fused value-and-grad: loss + every gradient in ONE kernel pass
# ---------------------------------------------------------------------------

def _loss_cotangent(loss_kind, rgb_rows, target_ref, pvf, lscale):
    """Image-loss partial + RGB cotangent for one tile (pixel-local, so the
    kernel can derive it in place from the target tile)."""
    d = [(rgb_rows[c] - target_ref[c:c + 1]) * pvf for c in range(3)]
    if loss_kind == "l2_rgb":
        loss = (sum(jnp.sum(x * x) for x in d)) * lscale
        g = [2.0 * x * lscale for x in d]
    else:                                  # l1_rgb
        loss = (sum(jnp.sum(jnp.abs(x)) for x in d)) * lscale
        g = [jnp.sign(x) * lscale for x in d]
    return loss, g


def _loss_grad_kernel(tile_ref, active_ref, seeds_ref, fv_ndc_ref,
                      fv_world_ref, fn_ref, tex_ref, valid_ref, scal_ref,
                      target_ref, lscale_ref, *rest, cfg, loss_kind):
    """The backward kernel with the image-loss cotangent derived in place:
    emits (loss partial, table/scalar gradients) — value_and_grad of the
    image loss costs one kernel launch instead of forward + backward."""
    if cfg.pack_m:
        pack_ref, rest = rest[0], rest[1:]
    (loss_ref, g_ndc_ref, g_world_ref, g_fn_ref, g_tex_ref, g_scal_ref,
     *scratch) = rest
    pos, px, py, pixvalid, validb = _tile_setup(cfg, tile_ref, valid_ref,
                                                fv_ndc_ref)
    scal = scal_ref[:]
    rd = _rd(cfg)
    lscale = lscale_ref[0, 0]
    pvf = pixvalid.astype(jnp.float32)
    stash = _agg_stash(cfg)   # scratch allocation keys on the FULL config

    def loss_and_cotangent(rgb_rows):
        return _loss_cotangent(loss_kind, rgb_rows, target_ref, pvf, lscale)

    def run_pipeline(cfgx, fv_ndc_t, fv_world_t, fn_t, tex_t, validbx):
        det1 = _make_det1(cfgx, px, py, pixvalid, validbx)
        (dist, z, c0, c1, c2, maskf), vjp1 = jax.vjp(
            det1, fv_ndc_t, fv_world_t, fn_t, tex_t, scal)

        sigma = scal[0, _S_SIGMA]
        gamma = scal[0, _S_GAMMA]
        if cfgx.rast_kind == "mc":
            prob_raw, coeff = _mc_rast_fwd_coeff(
                cfgx, -dist, sigma, seeds_ref[0, 0], seeds_ref[0, 1], pos)
            vjp_rast = None
        else:
            prob_raw, vjp_rast = jax.vjp(_make_det_rast(cfgx), dist, scal)
        prob = prob_raw * maskf

        zmap_full, vjp2 = jax.vjp(_make_det2(cfgx, maskf), prob, z, scal)
        if cfgx.agg_kind == "soft":
            weights, vjp2b = jax.vjp(_det2b_soft, zmap_full, scal)
        elif cfgx.agg_kind == "hard":
            weights, vjp2b = _hard_onehot_rows(zmap_full), None
        elif stash:
            weights = _mc_agg_forward_stash(
                cfgx, zmap_full, gamma, seeds_ref[0, 2], seeds_ref[0, 3],
                pos, scratch[0])
            vjp2b = None
        else:
            weights = _mc_agg_forward(cfgx, zmap_full, gamma,
                                      seeds_ref[0, 2], seeds_ref[0, 3], pos)
            vjp2b = None

        out3, vjp3 = jax.vjp(_make_det3(cfgx), weights, prob, c0, c1, c2,
                             scal)
        loss_tile, g_rgb = loss_and_cotangent(
            [out3[c:c + 1] for c in range(3)])
        g_rgba = jnp.concatenate(
            g_rgb + [jnp.zeros((1, cfgx.p_tile), jnp.float32)], axis=0)
        g_weights, g_prob3, g_c0, g_c1, g_c2, g_scal3 = vjp3(g_rgba)

        g_scal_extra = jnp.zeros((1, _NS), jnp.float32)
        if cfgx.agg_kind == "soft":
            g_zmap, g_scal2b = vjp2b(g_weights)
            g_scal_extra = g_scal_extra + g_scal2b
        elif cfgx.agg_kind == "hard":
            g_zmap = jnp.zeros_like(zmap_full)
        else:
            if stash:
                g_zmap, gamma_term = _mc_agg_grads_stashed(
                    cfgx, zmap_full, g_weights, gamma, scratch[0])
            else:
                g_zmap, gamma_term = _mc_agg_grads(
                    cfgx, zmap_full, g_weights, gamma, seeds_ref[0, 2],
                    seeds_ref[0, 3], pos)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
            g_scal_extra = g_scal_extra + jnp.where(
                cols == _S_GAMMA, jnp.sum(gamma_term), 0.0)

        g_prob2, g_z, g_scal2 = vjp2(g_zmap)
        g_prob_raw = (g_prob2 + g_prob3) * maskf

        if cfgx.rast_kind == "mc":
            g_d = coeff * g_prob_raw
            g_dist = -g_d
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
            g_scal_extra = g_scal_extra + jnp.where(
                cols == _S_SIGMA, jnp.sum(g_d), 0.0)
        else:
            g_dist, g_scal_r = vjp_rast(g_prob_raw)
            g_scal_extra = g_scal_extra + g_scal_r

        g_ndc, g_world, g_fn, g_tex, g_scal1 = vjp1(
            (g_dist, g_z, g_c0, g_c1, g_c2, jnp.zeros_like(maskf)))
        g_scal = g_scal3 + g_scal_extra + g_scal2 + g_scal1
        return loss_tile, g_ndc, g_world, g_fn, g_tex, g_scal

    def full_pipeline(_):
        return run_pipeline(cfg, rd(fv_ndc_ref), rd(fv_world_ref),
                            rd(fn_ref), rd(tex_ref), validb)

    def packed_pipeline(_):
        cfg2 = _cfg_packed(cfg)
        ohg, ohs = _pack_onehots(cfg, pack_ref)
        fvp, fwp, fnp, txp, vlp = _pack_tables(
            ohg, [fv_ndc_ref[:], fv_world_ref[:], fn_ref[:], tex_ref[:],
                  valid_ref[:]])
        loss_tile, g_ndc_p, g_world_p, g_fn_p, g_tex_p, g_scal = \
            run_pipeline(cfg2, fvp, fwp, fnp, txp,
                         _validb_tables(fvp, vlp))
        sc = lambda gp: jax.lax.dot(ohs, gp,
                                    precision=jax.lax.Precision.HIGHEST)
        return (loss_tile, sc(g_ndc_p), sc(g_world_p), sc(g_fn_p),
                sc(g_tex_p), g_scal)

    def bg_only(_):
        bg_rows = [jnp.full((1, cfg.p_tile), scal[0, _S_BG + c])
                   for c in range(3)]
        loss_tile, g_rgb = loss_and_cotangent(bg_rows)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
        g_scal = jnp.zeros((1, _NS), jnp.float32)
        for c in range(3):
            g_scal = g_scal + jnp.where(cols == _S_BG + c,
                                        jnp.sum(g_rgb[c]), 0.0)
        zf9 = jnp.zeros((cfg.f_pad, 9), jnp.float32)
        return (loss_tile, zf9, zf9, zf9,
                jnp.zeros((cfg.f_pad, cfg.tex_d), jnp.float32), g_scal)

    act = active_ref[0, 0, 0]
    if cfg.pack_m:
        loss_tile, g_ndc, g_world, g_fn, g_tex, g_scal = jax.lax.cond(
            act > 0,
            lambda _: jax.lax.cond(act == 2, packed_pipeline,
                                   full_pipeline, None),
            bg_only, None)
    else:
        loss_tile, g_ndc, g_world, g_fn, g_tex, g_scal = jax.lax.cond(
            act > 0, full_pipeline, bg_only, None)

    first = tile_ref[0, 0, 0] == 0

    if cfg.binned:
        g_ndc_ref[0] = g_ndc
        g_world_ref[0] = g_world
        g_fn_ref[0] = g_fn
        g_tex_ref[0] = g_tex

        @pl.when(first)
        def _init():
            loss_ref[:] = jnp.reshape(loss_tile, (1, 1))
            g_scal_ref[:] = g_scal

        @pl.when(jnp.logical_not(first))
        def _accum():
            loss_ref[:] = loss_ref[:] + jnp.reshape(loss_tile, (1, 1))
            g_scal_ref[:] = g_scal_ref[:] + g_scal
    else:
        @pl.when(first)
        def _init():
            loss_ref[:] = jnp.reshape(loss_tile, (1, 1))
            g_ndc_ref[:] = g_ndc
            g_world_ref[:] = g_world
            g_fn_ref[:] = g_fn
            g_tex_ref[:] = g_tex
            g_scal_ref[:] = g_scal

        @pl.when(jnp.logical_not(first))
        def _accum():
            loss_ref[:] = loss_ref[:] + jnp.reshape(loss_tile, (1, 1))
            g_ndc_ref[:] = g_ndc_ref[:] + g_ndc
            g_world_ref[:] = g_world_ref[:] + g_world
            g_fn_ref[:] = g_fn_ref[:] + g_fn
            g_tex_ref[:] = g_tex_ref[:] + g_tex
            g_scal_ref[:] = g_scal_ref[:] + g_scal


def _pallas_loss_grad(cfg, loss_kind, fv_ndc, fv_world, fn, tex, valid,
                      scal, seeds, target_cm, lscale):
    nt = _n_tiles(cfg)
    f, dt = cfg.f_pad, cfg.tex_d
    acc = lambda shape: pl.BlockSpec(shape, lambda i, s=len(shape): (0,) * s,
                                     memory_space=pltpu.VMEM)
    if cfg.binned:
        tblspec = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda i, s=len(shape): (i,) + (0,) * s,
            memory_space=pltpu.VMEM)
        tblshape = lambda shape: jax.ShapeDtypeStruct((nt,) + shape,
                                                      jnp.float32)
    else:
        tblspec = acc
        tblshape = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    scratch = []
    if _agg_stash(cfg):
        scratch.append(pltpu.VMEM((cfg.s_agg, cfg.c_zpad, cfg.p_tile),
                                  jnp.float32))
    in_specs = _common_specs(cfg) + [
        pl.BlockSpec((3, cfg.p_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),          # target tile
        _const_spec((1, 1)),                            # loss scale
    ]
    if cfg.pack_m:
        active, pack = _pack_tiles(cfg, fv_ndc, valid, scal[0, _S_BLUR])
        in_specs.append(pl.BlockSpec((1, cfg.pack_m, 1),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        extra = (target_cm, lscale, pack)
    else:
        active = _active_tiles(cfg, fv_ndc, valid, scal[0, _S_BLUR])
        extra = (target_cm, lscale)
    return pl.pallas_call(
        partial(_loss_grad_kernel, cfg=cfg, loss_kind=loss_kind),
        grid=(nt,),
        scratch_shapes=scratch,
        in_specs=in_specs,
        out_specs=(acc((1, 1)), tblspec((f, 9)), tblspec((f, 9)),
                   tblspec((f, 9)), tblspec((f, dt)), acc((1, _NS))),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            tblshape((f, 9)), tblshape((f, 9)), tblshape((f, 9)),
            tblshape((f, dt)),
            jax.ShapeDtypeStruct((1, _NS), jnp.float32),
        ),
        # Physical VMEM is far larger than the compiler's default 16M
        # scoped budget (the stream kernels already run at 100M on this
        # chip); the raised budget admits larger pixel tiles (fewer grid
        # steps) for small slot counts.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(_tile_ids(cfg), active, seeds, fv_ndc, fv_world, fn, tex, valid,
      scal, *extra)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_loss_core(cfg, loss_kind, fv_ndc, fv_world, fn, tex, valid, scal,
                     seeds, target_cm, lscale):
    loss, *_ = _pallas_loss_grad(cfg, loss_kind, fv_ndc, fv_world, fn, tex,
                                 valid, scal, seeds, target_cm, lscale)
    return loss[0, 0]


def _flc_fwd(cfg, loss_kind, fv_ndc, fv_world, fn, tex, valid, scal, seeds,
             target_cm, lscale):
    loss, g_ndc, g_world, g_fn, g_tex, g_scal = _pallas_loss_grad(
        cfg, loss_kind, fv_ndc, fv_world, fn, tex, valid, scal, seeds,
        target_cm, lscale)
    res = (g_ndc, g_world, g_fn, g_tex, g_scal, valid, seeds, target_cm,
           lscale)
    return loss[0, 0], res


def _flc_bwd(cfg, loss_kind, res, g):
    g_ndc, g_world, g_fn, g_tex, g_scal, valid, seeds, target_cm, ls = res
    return (g * g_ndc, g * g_world, g * g_fn, g * g_tex,
            jnp.zeros_like(valid), g * g_scal,
            np.zeros(seeds.shape, jax.dtypes.float0),
            jnp.zeros_like(target_cm), jnp.zeros_like(ls))


_fused_loss_core.defvjp(_flc_fwd, _flc_bwd)


# ---------------------------------------------------------------------------
# Eligibility + public entry
# ---------------------------------------------------------------------------

def _fused_mode() -> str:
    """'auto' (TPU only, default), 'off', or 'interpret' (CPU tests)."""
    return os.environ.get("PERTRENDERER_FUSED", "auto")


def fused_available() -> bool:
    mode = _fused_mode()
    if mode == "off":
        return False
    if mode == "interpret":
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


_RAST_MAP = {
    "SoftRast": ("soft", "gaussian", True),
    "GaussianRast": ("mc", "gaussian", True),
    "GaussianRast_wovr": ("mc", "gaussian", False),
    "ArctanRast": ("mc", "cauchy", True),
    "AffineRast": ("affine", "gaussian", True),
    "HardRast": ("hard", "gaussian", True),
}

_AGG_MAP = {
    "SoftAgg": ("soft", "gaussian", True),
    "GaussianAgg": ("mc", "gaussian", True),
    "GaussianAgg_wovr": ("mc", "gaussian", False),
    "CauchyAgg": ("mc", "cauchy", True),
    "HardAgg": ("hard", "gaussian", True),
}


def _plan(meshes, cameras, lights, materials, smoothrast, smoothagg,
          settings, shade: str, why: Optional[list] = None,
          assume_available: bool = False) -> Optional[FusedConfig]:
    from pertrenderer_tpu.lights import DirectionalLights, PointLights
    from pertrenderer_tpu.textures import (TexturesAtlas, TexturesUV,
                                           TexturesVertex)

    def no(msg):
        if why is not None:
            why.append(msg)
        return None

    if not fused_available() and not assume_available:
        return no("fused kernels unavailable on this backend "
                  "(PERTRENDERER_FUSED=%s, backend=%s)"
                  % (_fused_mode(), jax.default_backend()))
    rast_entry = _RAST_MAP.get(type(smoothrast).__name__)
    agg_entry = _AGG_MAP.get(type(smoothagg).__name__)
    if rast_entry is None or agg_entry is None:
        return no("estimator pair (%s, %s) is not a fused menu member"
                  % (type(smoothrast).__name__, type(smoothagg).__name__))
    # Sample-axis sharding (shard_map over the MC sample mesh axis): the
    # sharded fused path covers the flat-mode MC/MC combinations — exactly
    # the stochastic members of the experiment menu (eval.py:145-163).
    # Both estimators must shard the same axis; other combinations fall
    # back to the staged path, whose estimators pmean internally.
    ax_r = getattr(smoothrast, "sample_axis", None)
    ax_a = getattr(smoothagg, "sample_axis", None)
    sample_axis = ax_r or ax_a
    if (sample_axis is not None and ax_r is not None and ax_a is not None
            and ax_r != ax_a):
        return no("sample-axis sharding requires both estimators to shard "
                  "the same mesh axis")
    if sample_axis is not None and agg_entry[0] != "mc":
        return no("sample-axis sharding requires an MC aggregation "
                  "estimator")

    f = int(meshes.max_faces)
    k = int(settings.faces_per_pixel)
    f_pad = _round_up(max(f, 8), 8)
    f_real = f
    binned = False
    stream = False
    rw = 0
    hw = settings.image_size * settings.image_size
    ptile_env = int(os.environ.get("PERTRENDERER_PTILE", "0"))
    p_tile = min(ptile_env, _round_up(hw, 128)) if ptile_env else 0
    # Flat mode is exact when every face can hold a slot (no top-K
    # truncation).  Larger meshes stream their y-sorted candidate windows
    # in chunks (exact at any coverage density, any image size); very
    # large meshes (> _COARSE_THRESHOLD faces) use bin-local face lists —
    # the `max_faces_per_bin` regime of the reference's binned kernel,
    # with runtime overflow detection.
    if f > k or f_pad > MAX_SLOTS:
        stream_env = os.environ.get("PERTRENDERER_STREAM", "on")
        # EXACT-BY-DEFAULT routing (VERDICT r3 #2): every F > K scene
        # streams — the chunked kernels match the reference's untruncated
        # semantics at any coverage density.  The M-slot binned kernel is
        # an approximation whenever a tile's candidates exceed its slots
        # (structurally so at config-5 density: the per-pixel softmax
        # support is ~5x the slot budget — NOTES.md), so it requires the
        # user to accept that explicitly: bin_overflow='allow' (the fast
        # documented approximation, ~7.5 vs ~1.3 renders/s at 82k faces /
        # 512^2), or PERTRENDERER_STREAM=off.  Binned also needs the
        # sub-row x-binned regime (image > tile width); ineligible scenes
        # stream regardless.
        m = min(f_pad, int(settings.max_faces_per_bin or MAX_BIN_SLOTS),
                MAX_BIN_SLOTS)
        bin_ok = (m >= 8 and _BIN_P_TILE < settings.image_size
                  and settings.image_size % _BIN_P_TILE == 0)
        bin_optin = (getattr(settings, "bin_overflow", "warn") == "allow"
                     or stream_env == "off")
        want_stream = stream_env != "off" and (
            stream_env == "force" or not bin_ok or not bin_optin
            or f <= _COARSE_THRESHOLD)
        if sample_axis is not None and not want_stream:
            return no("sharded fused path covers the flat and streaming "
                      "modes (binned is not sharded)")
        if want_stream:
            stream = True
            # The kernels DMA _STREAM_CHUNK-row blocks from the HBM-resident
            # sorted table, so window extent never touches VMEM — rw is just
            # the table's padded row count (and the PRNG background row).
            rw = _round_up(f, _STREAM_CHUNK)
            f_pad = f_real = _STREAM_CHUNK
            # 2-D stream tiles: the blur band (tens of px) dominates the
            # tile's own extent, so a (TH, TW) rectangle's candidate chunk
            # set is nearly TH-invariant — TH rows share every chunk's DMA
            # and geometry/shading detection work.  Strip tiling remains
            # for images the rectangle doesn't divide.
            # (8, 32) measured best at config-5 density (82k faces, 512^2):
            # the blur band dominates both tile extents, so smaller rects
            # carry less band slop per pixel; p_tile must stay a lane
            # multiple.  Config-5 scan (ms/step): (1,128) strip 2289,
            # (8,128) 2091, (8,64) 1425, (8,32) 1205, (16,32) 1257.
            tw = min(int(os.environ.get("PERTRENDERER_STREAM_TW", "32")),
                     settings.image_size)
            th = int(os.environ.get("PERTRENDERER_STREAM_TH", "8"))
            if (th > 1 and (th * tw) % 128 == 0
                    and settings.image_size % tw == 0
                    and settings.image_size % th == 0):
                p_tile = th * tw
                stream_tile_w = tw
            else:
                p_tile = min(_BIN_P_TILE, _round_up(hw, 128))
                stream_tile_w = 0
        elif bin_ok:
            binned = True
            f_pad = _round_up(m, 8)
            f_real = f_pad   # bin-local slots: all rows live
            # Finest tile granularity: keeps the backward working set
            # (~ slots x pixels) inside VMEM and maximizes x-binning +
            # skip resolution.
            p_tile = _BIN_P_TILE
        else:
            return no("PERTRENDERER_STREAM=off and binned mode ineligible "
                      "(needs max_faces_per_bin >= 8 and image size a "
                      "multiple of %d above %d)"
                      % (_BIN_P_TILE, _BIN_P_TILE))
    if settings.image_size > 2048:
        return no("image size above the 2048 fused-kernel limit")
    if sample_axis is not None and not stream:
        # Flat-mode sharding decomposes BOTH estimators' sample means
        # (pmean'd prob before the nonlinear z_map); streaming shards the
        # aggregation samples and replicates the coverage samples (its
        # per-(face, pixel) prob field never materializes, so it cannot be
        # pmean'd — see _fused_core_stream_sharded).
        if ax_r != ax_a:
            return no("flat-mode sharding requires both estimators to "
                      "shard the same mesh axis")
        if rast_entry[0] != "mc":
            return no("flat-mode sharding covers the MC/MC estimator "
                      "pairs only")
    if not binned and not stream and not p_tile:
        # Flat-mode default: 2048 pixels per grid step halves the per-step
        # overhead vs 1024 and still fits the loss kernel's scoped VMEM for
        # small slot counts (measured: f_pad=16 at 4096 OOMs, 2048 fits).
        p_tile = min(2048 if f_pad <= 16 else 1024, _round_up(hw, 128))

    # Flat mode: 2-D (TH, TW) pixel tiles when the image divides evenly —
    # the bbox activity prepass then skips background in both axes (a row
    # strip through the object is mostly background left and right of it).
    tile_w = 0
    if stream:
        tile_w = stream_tile_w
    elif not binned:
        tw = 64
        th = p_tile // tw if p_tile % tw == 0 else 0
        if (th > 1 and settings.image_size > tw
                and settings.image_size % tw == 0
                and settings.image_size % th == 0):
            tile_w = tw

    # Flat-mode per-tile face packing: tiles whose conservative band-overlap
    # count fits in pack_m - 1 faces run the whole pipeline (geometry,
    # shading, both MC estimator loops, vjps) on pack_m slot rows instead of
    # f_pad — exact for everything but the MC noise realization (the packed
    # rows draw the row-indexed streams of their packed positions).  Off for
    # the sharded path (its folded-equivalence pin requires one layout).
    pack_m = 0
    if (not stream and not binned and sample_axis is None and f_pad >= 16
            and os.environ.get("PERTRENDERER_PACK", "on") != "off"):
        pack_m = 8

    tex = meshes.textures
    if tex is None:
        return no("mesh has no textures")  # the XLA path raises too
    if isinstance(tex, TexturesVertex):
        if tex.verts_features.shape[-1] != 3:
            return no("TexturesVertex features must be RGB (3 channels)")
        tex_mode, tex_d, atlas_r = "corner", 9, 0
    elif isinstance(tex, TexturesAtlas):
        r = tex.atlas.shape[2]
        if tex.atlas.shape[-1] != 3 or r > 8:
            return no("TexturesAtlas must be RGB with resolution <= 8")
        tex_mode, tex_d, atlas_r = "atlas", r * r * 3, r
    elif isinstance(tex, TexturesUV):
        r = tex.atlas_size
        if not r or r > 8 or tex.maps.shape[-1] != 3:
            return no("TexturesUV needs atlas_size in 1..8 and RGB maps")
        tex_mode, tex_d, atlas_r = "atlas", r * r * 3, r
    else:
        return no("unsupported texture type %s" % type(tex).__name__)

    if isinstance(lights, PointLights):
        light_kind = "point"
    elif isinstance(lights, DirectionalLights):
        light_kind = "directional"
    else:
        return no("unsupported light type %s" % type(lights).__name__)

    rast_kind, rast_noise, rast_vr = rast_entry
    agg_kind, agg_noise, agg_vr = agg_entry
    return FusedConfig(
        image_size=settings.image_size,
        f_pad=f_pad,
        f_real=f_real,
        k=k,
        p_tile=p_tile,
        blur_radius=float(settings.blur_radius),
        rast_kind=rast_kind, rast_noise=rast_noise, rast_vr=rast_vr,
        s_rast=int(getattr(smoothrast, "nb_samples", 1)),
        agg_kind=agg_kind, agg_noise=agg_noise, agg_vr=agg_vr,
        s_agg=int(getattr(smoothagg, "nb_samples", 1)),
        eps_bg=float(smoothagg.eps),
        shade=shade,
        light_kind=light_kind,
        tex_mode=tex_mode, tex_d=tex_d, atlas_r=atlas_r,
        clip_bary=settings.resolve_clip(),
        perspective_correct=bool(settings.perspective_correct),
        interpret=_fused_mode() == "interpret",
        binned=binned,
        prob_ext=sample_axis is not None,
        stream=stream,
        rw=rw,
        tile_w=tile_w,
        pack_m=pack_m,
    )


@dataclasses.dataclass(frozen=True)
class RenderPlan:
    """Static routing report for a (mesh, settings, estimators) tuple: which
    execution mode the renderer will take and why — makes the fused-kernel
    routing auditable without running a step.

    ``mode``:
      * ``flat``   — slots-are-faces fused kernel (F <= faces_per_pixel);
        exact.
      * ``stream`` — y-sorted chunk-streaming fused kernel; exact at any
        coverage density (no slot caps, reference-equal to the untruncated
        semantics of `/root/reference/experiments/eval.py:135-141`).
      * ``binned`` — per-tile M-slot fused kernel (the `max_faces_per_bin`
        regime); exact only while no tile overflows M (runtime-detected,
        see ``RasterizationSettings.bin_overflow``).
      * ``staged`` — the XLA-composed reference pipeline (also the
        fallback whenever fused kernels are unavailable); ``reason`` says
        why.
    """

    mode: str
    reason: str
    f: int
    k: int
    image_size: int
    p_tile: int = 0
    tile: tuple = ()
    slots: int = 0        # flat/binned live slot rows
    table_rows: int = 0   # streaming sorted-table rows (chunk multiple)
    pack: int = 0         # flat-mode per-tile face packing (0 = off):
                          # tiles with <= pack-1 band-overlapping faces run
                          # the pipeline on pack slot rows


def render_plan(meshes, cameras, lights, materials, smoothrast, smoothagg,
                settings, shade: str = "phong",
                assume_available: bool = True) -> RenderPlan:
    """Inspect the execution route ``try_render`` would take.

    ``assume_available=True`` (default) reports the routing on a
    fused-capable backend (TPU / interpret) even when called from a CPU
    process — the common audit case; pass False to report this process's
    actual route.
    """
    why: list = []
    cfg = _plan(meshes, cameras, lights, materials, smoothrast, smoothagg,
                settings, shade, why=why, assume_available=assume_available)
    f = int(meshes.max_faces)
    k = int(settings.faces_per_pixel)
    if cfg is None:
        return RenderPlan(mode="staged", reason=why[-1] if why else "",
                          f=f, k=k, image_size=settings.image_size)
    tile = ((cfg.p_tile // cfg.tile_w, cfg.tile_w) if cfg.tile_w
            else (1, cfg.p_tile))
    if cfg.stream:
        return RenderPlan(
            mode="stream", f=f, k=k, image_size=cfg.image_size,
            p_tile=cfg.p_tile, tile=tile, table_rows=cfg.rw,
            reason="F > faces_per_pixel; chunk-streamed y-sorted windows "
                   "(exact at any coverage density)")
    if cfg.binned:
        return RenderPlan(
            mode="binned", f=f, k=k, image_size=cfg.image_size,
            p_tile=cfg.p_tile, tile=tile, slots=cfg.f_pad,
            reason="explicitly opted in (bin_overflow='allow' or "
                   "PERTRENDERER_STREAM=off): per-tile nearest-%d slots "
                   "(max_faces_per_bin regime; approximate under detected "
                   "overflow)" % cfg.f_pad)
    return RenderPlan(
        mode="flat", f=f, k=k, image_size=cfg.image_size,
        p_tile=cfg.p_tile, tile=tile, slots=cfg.f_pad, pack=cfg.pack_m,
        reason="every face holds a slot (F <= faces_per_pixel); exact, no "
               "selection")


def _gather_rows(table, faces):
    """(V, C) table, (F, 3) int32 faces -> (F, 3C).  Plain row indexing —
    F is small (<= MAX_SLOTS), so XLA's scalar gather is fine here."""
    return table[faces].reshape(faces.shape[0], -1)


def _key_words(key):
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else jnp.asarray(key)
    data = data.reshape(-1).astype(jnp.uint32)
    return data[0].astype(jnp.int32), data[-1].astype(jnp.int32)


def _pack_scal(cfg, n, cameras, lights, materials, smoothrast, smoothagg,
               blend_params, blur):
    """The packed (N, 1, NS) scalar-parameter row shared by every kernel."""

    def b3(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x, (n, 3))

    def b1(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(jnp.atleast_1d(x), (n,))

    light_vec = (lights.location if cfg.light_kind == "point"
                 else lights.direction)
    return jnp.concatenate([
        b3(light_vec), b3(lights.ambient_color), b3(lights.diffuse_color),
        b3(lights.specular_color), b3(materials.ambient_color),
        b3(materials.diffuse_color), b3(materials.specular_color),
        b1(materials.shininess)[:, None], b3(cameras.camera_center()),
        b3(jnp.asarray(blend_params.background_color, jnp.float32)),
        b1(cameras.znear)[:, None], b1(cameras.zfar)[:, None],
        b1(smoothrast.sigma)[:, None], b1(smoothagg.gamma)[:, None],
        b1(smoothagg.alpha)[:, None], b1(blur)[:, None],
    ], axis=1)[:, None, :]                               # (N, 1, NS)


def _prepare_inputs(cfg, meshes, cameras, lights, materials, smoothrast,
                    smoothagg, blend_params, settings, key, shade,
                    sample_axis=None, blur_override=None):
    """Build the kernel's tensor inputs (face tables, validity, packed
    scalars, seeds) — shared by the render and loss-and-grad entries."""
    from pertrenderer_tpu.textures import TexturesUV, TexturesVertex

    n = meshes.batch_size
    f = meshes.max_faces
    blur = jnp.asarray(settings.blur_radius if blur_override is None
                       else blur_override, jnp.float32)

    if key is None:
        key = jax.random.PRNGKey(0)
    if isinstance(key, tuple):
        key_rast, key_agg = key
    else:
        key_rast, key_agg = jax.random.split(key)
    if getattr(smoothagg, "fixed_noise", False):
        # Deterministic renders reseed to 1 (smoothagg.py:18-19).
        key_agg = jax.random.PRNGKey(1)

    def batch_seeds(k):
        def one(i):
            w0, w1 = _key_words(jax.random.fold_in(k, i))
            return jnp.stack([w0, w1])
        return jax.vmap(one)(jnp.arange(n))
    sr = batch_seeds(key_rast)                          # (N, 2)
    sa = batch_seeds(key_agg)
    if sample_axis is not None:
        # Device d draws global sample indices [d*S, (d+1)*S): the hash
        # enters the sample index as ``seed0 + s * C`` (_hash_words), so an
        # offset of d*S folds into seed0 exactly — the union of device
        # streams is bit-equal to a single-device run with S_total samples.
        # Streaming mode shards the AGG samples only: the rast seeds stay
        # unoffset, so every device draws the identical coverage streams
        # (prob replicates; the folded equivalent keeps the same S_rast).
        c_mul = jnp.int32(-1640531527)
        off = jax.lax.axis_index(sample_axis).astype(jnp.int32)
        if not cfg.stream:
            sr = sr.at[:, 0].add(off * jnp.int32(cfg.s_rast) * c_mul)
        sa = sa.at[:, 0].add(off * jnp.int32(cfg.s_agg) * c_mul)
    seeds = jnp.concatenate(
        [sr, sa, jnp.zeros((n, 4), jnp.int32)], axis=1)[:, None, :]

    verts_ndc = cameras.transform_points_ndc(meshes.verts)   # (N, V, 3)
    faces = jnp.maximum(meshes.faces, 0)

    fv_ndc = jax.vmap(_gather_rows)(verts_ndc, faces)        # (N, F, 9)
    fv_world = jax.vmap(_gather_rows)(meshes.verts, faces)
    if shade == "phong":
        fn_world = jax.vmap(_gather_rows)(meshes.verts_normals(), faces)
    else:
        fn_world = jnp.zeros_like(fv_world)

    tex = meshes.textures
    if cfg.tex_mode == "corner":
        if isinstance(tex, TexturesVertex):
            feats = jnp.broadcast_to(
                tex.verts_features,
                (n,) + tex.verts_features.shape[1:])
            tex_tab = jax.vmap(_gather_rows)(feats, faces)
        else:
            tex_tab = jnp.ones((n, f, 9), jnp.float32)
    else:
        if isinstance(tex, TexturesUV):
            atlas = tex._bake_atlas()                    # (N, F, R, R, 3)
        else:
            atlas = tex.atlas
        atlas = jnp.broadcast_to(atlas, (n,) + atlas.shape[1:])
        tex_tab = atlas.reshape(n, f, -1)

    face_ids = jnp.arange(f, dtype=jnp.int32)
    validf = ((face_ids[None, :] < meshes.num_faces[:, None])
              & jnp.all(meshes.faces >= 0, axis=-1))
    if settings.cull_backfaces:
        area = ((fv_ndc[..., 3] - fv_ndc[..., 0])
                * (fv_ndc[..., 7] - fv_ndc[..., 1])
                - (fv_ndc[..., 4] - fv_ndc[..., 1])
                * (fv_ndc[..., 6] - fv_ndc[..., 0]))
        validf = validf & (area > 0)

    if cfg.stream:
        merged = jnp.concatenate([fv_ndc, fv_world, fn_world, tex_tab],
                                 axis=-1)
        validf_f = validf.astype(jnp.float32)
        tab, rows, nch = jax.vmap(
            partial(_stream_tables, cfg),
            in_axes=(0, 0, 0, None))(merged, fv_ndc, validf_f, blur)
        active = jax.vmap(
            lambda v, va: _active_tiles(cfg, v, va[:, None], blur)
        )(fv_ndc, validf_f)
        scal = _pack_scal(cfg, n, cameras, lights, materials, smoothrast,
                          smoothagg, blend_params, blur)
        return tab, scal, rows, nch, active, seeds

    if cfg.binned:
        from pertrenderer_tpu.ops.gather import take_rows

        # One fused gather over the concatenated tables: the one-hot matmul
        # is O(rows x F), so a single (27+Dt)-wide pass (and its single
        # transposed-matmul scatter in the VJP) beats four narrow ones.
        merged = jnp.concatenate([fv_ndc, fv_world, fn_world, tex_tab],
                                 axis=-1)
        validf_f = validf.astype(jnp.float32)
        if f > _COARSE_THRESHOLD:
            tiles, ids, counts, max_range = jax.vmap(
                partial(_binned_tables_sorted, cfg),
                in_axes=(0, 0, 0, None))(merged, fv_ndc, validf_f, blur)
            max_range = jnp.max(max_range)
        else:
            ids, counts = jax.vmap(
                partial(_bin_face_ids, cfg),
                in_axes=(0, 0, None))(fv_ndc, validf_f, blur)  # (N, nt, M)
            tiles = jax.vmap(take_rows)(merged, ids)       # (N, nt, M, D)
            max_range = None
        _check_bin_overflow(cfg, settings, jnp.max(counts), max_range)
        fv_ndc, fv_world, fn_world, tex_tab = (
            tiles[..., :9], tiles[..., 9:18], tiles[..., 18:27],
            tiles[..., 27:])
        valid = (ids >= 0).astype(jnp.float32)[..., None]  # (N, nt, M, 1)
    else:
        def pad_f(x):
            return jnp.pad(x, ((0, 0), (0, cfg.f_pad - f), (0, 0)))
        fv_ndc, fv_world, fn_world, tex_tab = (
            pad_f(fv_ndc), pad_f(fv_world), pad_f(fn_world),
            pad_f(tex_tab))
        validf = jnp.pad(validf, ((0, 0), (0, cfg.f_pad - f)))
        valid = validf.astype(jnp.float32)[..., None]    # (N, F_pad, 1)

    scal = _pack_scal(cfg, n, cameras, lights, materials, smoothrast,
                      smoothagg, blend_params, blur)
    return fv_ndc, fv_world, fn_world, tex_tab, valid, scal, seeds


def capacity_stats(meshes, cameras, settings, smoothrast=None,
                   smoothagg=None, lights=None, materials=None,
                   shade: str = "phong", blur_override=None, cfg=None):
    """Binned-mode capacity diagnostics as REGULAR jittable outputs — no
    host callbacks, so they work on backends (like the axon dev relay)
    where ``jax.debug.callback`` cannot run and the in-trace check of
    ``_check_bin_overflow`` degrades to a blanket warning.

    Returns None unless the scene routes to the M-slot binned kernel
    (flat and streaming modes have no capacity limits).  Otherwise a dict
    of scalars for the CURRENT pose:

    * ``max_tile_candidates`` — worst per-tile candidate-face count
      (approximation begins when it exceeds ``slots``);
    * ``slots`` — the per-tile slot budget M (static int);
    * ``max_range`` — worst y-sorted group window (f > coarse threshold
      only; exactness of the window clamp needs it <= ``range_limit``);
    * ``range_limit`` — the contiguous-window clamp (static int).

    Fetch these at natural host boundaries (the experiment harness does at
    every scan-segment boundary) and surface warnings/errors per
    ``settings.bin_overflow``.  Reference-semantics anchor: the
    `max_faces_per_bin` overflow of
    `/root/reference/experiments/eval.py:135-141`.
    """
    if cfg is None:
        from pertrenderer_tpu.lights import Materials, PointLights

        lights = lights if lights is not None else PointLights.create()
        materials = materials if materials is not None else \
            Materials.create()
        cfg = _plan(meshes, cameras, lights, materials, smoothrast,
                    smoothagg, settings, shade, assume_available=True)
    if cfg is None or not cfg.binned:
        return None
    _warn_closure_constants(meshes)
    blur = jnp.asarray(settings.blur_radius if blur_override is None
                       else blur_override, jnp.float32)
    f = meshes.max_faces
    verts_ndc = cameras.transform_points_ndc(meshes.verts)
    faces = jnp.maximum(meshes.faces, 0)
    fv_ndc = jax.vmap(_gather_rows)(verts_ndc, faces)
    face_ids = jnp.arange(f, dtype=jnp.int32)
    validf = ((face_ids[None, :] < meshes.num_faces[:, None])
              & jnp.all(meshes.faces >= 0, axis=-1))
    if settings.cull_backfaces:
        area = ((fv_ndc[..., 3] - fv_ndc[..., 0])
                * (fv_ndc[..., 7] - fv_ndc[..., 1])
                - (fv_ndc[..., 4] - fv_ndc[..., 1])
                * (fv_ndc[..., 6] - fv_ndc[..., 0]))
        validf = validf & (area > 0)
    validf_f = validf.astype(jnp.float32)

    def one(fv, vcol):
        validb = _face_validb(fv, vcol)
        overlap = _tile_face_overlap(cfg, fv, validb, blur)
        counts = jnp.sum(overlap.astype(jnp.int32), axis=1)
        if f <= _COARSE_THRESHOLD:
            return jnp.max(counts), jnp.int32(0)
        # y-sorted group-window bound (mirrors _binned_tables_sorted).
        band = jnp.sqrt(jnp.maximum(blur, 0.0))
        fv_s = jax.lax.stop_gradient(fv)
        ys = fv_s[:, 1::3]
        lo = jnp.min(ys, axis=1) - band
        hi = jnp.max(ys, axis=1) + band
        sk = jnp.sort(jnp.where(validb, lo, np.inf))
        maxext = jnp.max(jnp.where(validb, hi - lo, 0.0))
        nt, g = _n_tiles(cfg), _RANGE_GROUP
        ng = -(-nt // g)
        y_hi_t, y_lo_t = _tile_y_ranges(cfg)
        pad_t = ng * g - nt
        y_hi_g = jnp.max(jnp.pad(y_hi_t, (0, pad_t),
                                 constant_values=-np.inf).reshape(ng, g),
                         axis=1)
        y_lo_g = jnp.min(jnp.pad(y_lo_t, (0, pad_t),
                                 constant_values=np.inf).reshape(ng, g),
                         axis=1)
        e_g = jnp.searchsorted(sk, y_hi_g, side="right")
        s_g = jnp.searchsorted(sk, y_lo_g - maxext, side="left")
        return jnp.max(counts), jnp.max(jnp.maximum(e_g - s_g, 0))

    mt, mr = jax.vmap(one)(fv_ndc, validf_f)
    return {
        "max_tile_candidates": jnp.max(mt),
        "slots": cfg.f_pad,
        "max_range": jnp.max(mr),
        "range_limit": _RANGE_MAX,
    }


def check_capacity_host(settings, stats) -> Optional[str]:
    """Host-side companion of :func:`capacity_stats`: ``stats`` with the
    scalars already fetched.  Applies the ``settings.bin_overflow`` policy
    ('warn' default / 'error' / 'allow'); returns the message when capacity
    was exceeded (after warning/raising), else None."""
    if stats is None or getattr(settings, "bin_overflow", "warn") == "allow":
        return None
    msgs = []
    if int(stats["max_tile_candidates"]) > int(stats["slots"]):
        msgs.append("a tile has %d candidate faces > %d bin slots "
                    "(farthest faces dropped)"
                    % (int(stats["max_tile_candidates"]),
                       int(stats["slots"])))
    if int(stats["max_range"]) > int(stats["range_limit"]):
        msgs.append("a y-sorted group range holds %d faces > %d "
                    "(range clamped)"
                    % (int(stats["max_range"]), int(stats["range_limit"])))
    if not msgs:
        return None
    msg = ("binned fused render capacity exceeded: " + "; ".join(msgs)
           + ". Results deviate from the exact top-K semantics; use "
           "streaming mode (the default for large meshes), raise "
           "max_faces_per_bin, or set bin_overflow='allow' to accept.")
    if getattr(settings, "bin_overflow", "warn") == "error":
        raise RuntimeError(msg)
    import warnings

    warnings.warn(msg, stacklevel=2)
    return msg


def _warn_closure_constants(meshes):
    """Footgun guard for this backend: a jitted program whose mesh tables
    are CLOSURE CONSTANTS (rather than traced arguments) zero-fills their
    batched gathers at scale — measured: a closure-captured 81,920-face
    mesh renders ALL-BLACK through the fused path while the argument-passed
    identical program matches the staged oracle to 6.6e-7 (2026-08-20,
    NOTES.md axon quirks).  Detect the hazard at trace time: we are inside
    a trace (some renderer input is a tracer) but a large mesh table is a
    concrete constant."""
    import warnings

    leaves = jax.tree.leaves(meshes)
    if not any(isinstance(x, jax.core.Tracer) for x in leaves):
        return                      # eager call: arguments trace correctly
    big = [x for x in leaves
           if not isinstance(x, jax.core.Tracer)
           and getattr(x, "size", 0) >= 4096 * 3]
    if big:
        warnings.warn(
            "pertrenderer_tpu: a large mesh table (%d elements) is "
            "closure-captured inside jit; this backend zero-fills gathers "
            "of large constant-embedded operands, silently corrupting the "
            "render.  Pass the mesh through the jitted function's "
            "arguments instead." % max(x.size for x in big),
            RuntimeWarning, stacklevel=3)


def try_render(meshes, cameras, lights, materials, smoothrast, smoothagg,
               blend_params, settings, key, shade: str,
               blur_override=None):
    """Render via the fused kernel, or return None if the configuration is
    not fused-eligible (caller falls back to the XLA-composed path)."""
    cfg = _plan(meshes, cameras, lights, materials, smoothrast, smoothagg,
                settings, shade)
    if cfg is None:
        return None
    _warn_closure_constants(meshes)
    sample_axis = (getattr(smoothrast, "sample_axis", None)
                   or getattr(smoothagg, "sample_axis", None))
    inputs = _prepare_inputs(cfg, meshes, cameras, lights, materials,
                             smoothrast, smoothagg, blend_params, settings,
                             key, shade, sample_axis=sample_axis,
                             blur_override=blur_override)
    if cfg.stream:
        # ANY-space (HBM) table blocks cannot be vmapped over; the batch
        # runs as a sequential lax.map (stream meshes are heavy enough that
        # per-element kernel launches dominate anyway).
        core = (partial(_fused_core_stream_sharded, cfg, sample_axis)
                if cfg.prob_ext else partial(_fused_core_stream, cfg))
        if meshes.batch_size == 1:
            out = core(*(x[0] for x in inputs))[None]
        else:
            out = jax.lax.map(lambda xs: core(*xs), tuple(inputs))
    elif cfg.prob_ext:
        out = jax.vmap(partial(_fused_core_sharded, cfg, sample_axis))(
            *inputs)
    else:
        out = jax.vmap(partial(_fused_core, cfg))(*inputs)
    n = meshes.batch_size
    hw = cfg.image_size * cfg.image_size
    out = _from_tilemajor(cfg, out)
    rgba = out[:, :, :hw].reshape(n, 4, cfg.image_size, cfg.image_size)
    return jnp.moveaxis(rgba, 1, -1)


def try_render_loss(meshes, cameras, lights, materials, smoothrast,
                    smoothagg, blend_params, settings, key, shade: str,
                    target, loss_kind: str, blur_override=None):
    """Image loss (mean L2 or L1 over the RGB channels vs ``target``) with
    loss, backward and all gradients computed in ONE fused kernel pass, or
    None if not fused-eligible.

    The image loss is pixel-local, so the kernel derives the output-image
    cotangent from the target in place — value_and_grad of the returned
    scalar costs a single kernel launch (the custom-VJP forward stashes the
    O(F) gradients as residuals; the backward rule only scales them).
    """
    if loss_kind not in ("l2_rgb", "l1_rgb"):
        return None
    cfg = _plan(meshes, cameras, lights, materials, smoothrast, smoothagg,
                settings, shade)
    if cfg is None or cfg.prob_ext:
        # Sharded: render via the forward+backward kernels and reduce the
        # image loss in XLA (the caller falls back to that).
        return None
    _warn_closure_constants(meshes)
    inputs = _prepare_inputs(cfg, meshes, cameras, lights, materials,
                             smoothrast, smoothagg, blend_params, settings,
                             key, shade, blur_override=blur_override)
    n = meshes.batch_size
    hw = cfg.image_size * cfg.image_size
    hwpad = _n_tiles(cfg) * cfg.p_tile
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32),
                              (n, cfg.image_size, cfg.image_size, 3))
    tcm = jnp.moveaxis(target, -1, 1).reshape(n, 3, hw)
    tcm = _to_tilemajor(cfg, tcm)        # scan-invariant: XLA hoists it
    tcm = jnp.pad(tcm, ((0, 0), (0, 0), (0, hwpad - hw)))
    lscale = jnp.full((n, 1, 1), 1.0 / (n * hw * 3), jnp.float32)
    if cfg.stream:
        # Streaming value-and-grad: the two backward chunk sweeps with the
        # loss cotangent derived in place — no separate forward kernel.
        # (ANY-space HBM table blocks cannot be vmapped over; see
        # try_render.)
        core = partial(_fused_stream_loss_core, cfg, loss_kind)
        xs = tuple(inputs) + (tcm, lscale)
        if n == 1:
            return core(*(x[0] for x in xs))
        return jnp.sum(jax.lax.map(lambda e: core(*e), xs))
    losses = jax.vmap(partial(_fused_loss_core, cfg, loss_kind))(
        *inputs, tcm, lscale)
    return jnp.sum(losses)
