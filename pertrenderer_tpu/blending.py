"""Pixel-color blending: hard, softmax (SoftRas), and smooth (perturbed).

``smooth_rgb_blend`` is the reference's own composition
(`/root/reference/randomras/random_rasterizer.py:34-56`); ``hard_rgb_blend``
and ``softmax_rgb_blend`` re-implement the PyTorch3D baselines consumed by
``SimpleShader`` / ``SoftSimpleShader``
(`/root/reference/randomras/random_rasterizer.py:22-23,202,213`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

__all__ = ["BlendParams", "hard_rgb_blend", "softmax_rgb_blend",
           "smooth_rgb_blend", "smooth_rgb_blend_cm"]


class BlendParams(NamedTuple):
    """Blending configuration (PyTorch3D-compatible container used at
    `/root/reference/experiments/eval.py:133,272`)."""

    sigma: float = 1e-4
    gamma: float = 1e-4
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)


def hard_rgb_blend(colors: jnp.ndarray, fragments,
                   blend_params: BlendParams) -> jnp.ndarray:
    """Nearest-fragment color; alpha = foreground mask.  (N, H, W, 4)."""
    background = jnp.asarray(blend_params.background_color, colors.dtype)
    is_fg = (fragments.pix_to_face[..., 0:1] >= 0).astype(colors.dtype)
    rgb = colors[..., 0, :] * is_fg + background * (1.0 - is_fg)
    return jnp.concatenate([rgb, is_fg], axis=-1)


def softmax_rgb_blend(colors: jnp.ndarray, fragments,
                      blend_params: BlendParams, znear=1.0, zfar=100.0,
                      eps: float = 1e-10) -> jnp.ndarray:
    """SoftRas softmax blending (sigmoid coverage + depth-softmax weights),
    matching PyTorch3D's ``softmax_rgb_blend`` semantics."""
    background = jnp.asarray(blend_params.background_color, colors.dtype)
    mask = (fragments.pix_to_face >= 0).astype(colors.dtype)
    prob_map = jnp.where(
        fragments.pix_to_face >= 0,
        1.0 / (1.0 + jnp.exp(fragments.dists / blend_params.sigma)),
        0.0,
    )
    alpha = 1.0 - jnp.prod(1.0 - prob_map, axis=-1, keepdims=True)
    z_inv = (zfar - fragments.zbuf) / (zfar - znear) * mask
    z_inv_max = jnp.maximum(jnp.max(z_inv, axis=-1, keepdims=True), eps)
    weights_num = prob_map * jnp.exp((z_inv - z_inv_max) / blend_params.gamma)
    delta = jnp.exp((eps - z_inv_max) / blend_params.gamma)
    denom = jnp.sum(weights_num, axis=-1, keepdims=True) + delta
    weighted_colors = jnp.sum(weights_num[..., None] * colors, axis=-2)
    rgb = (weighted_colors + delta * background) / denom
    return jnp.concatenate([rgb, alpha], axis=-1)


def smooth_rgb_blend(colors: jnp.ndarray, fragments, smoothrast, smoothagg,
                     blend_params: BlendParams, znear=1.0, zfar=100.0,
                     key=None) -> jnp.ndarray:
    """Perturbed-estimator blending
    (`/root/reference/randomras/random_rasterizer.py:34-56`):

        prob_map = smoothrast.rasterize(dists) * mask          (:47)
        alpha    = 1 - prod_K(1 - prob_map)                    (:48)
        weights  = smoothagg.aggregate(zbuf, ...)              (:49)
        rgb      = sum_K w_k * colors_k + w_bg * background    (:50-53)

    ``key`` seeds both stochastic estimators (split deterministically).
    """
    import jax

    background = jnp.asarray(blend_params.background_color, colors.dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    key_rast, key_agg = jax.random.split(key)

    mask = fragments.pix_to_face >= 0
    prob_map = smoothrast.rasterize(fragments.dists, key_rast) * mask
    alpha_chan = jnp.prod(1.0 - prob_map, axis=-1, keepdims=True)
    weights = smoothagg.aggregate(fragments.zbuf, zfar, znear, prob_map,
                                  mask, key_agg)
    wz, wb = weights[..., :-1], weights[..., -1:]
    weighted_colors = jnp.sum(wz[..., None] * colors, axis=-2)
    weighted_background = wb * background
    rgb = weighted_colors + weighted_background
    return jnp.concatenate([rgb, 1.0 - alpha_chan], axis=-1)


def smooth_rgb_blend_cm(colors_cm: jnp.ndarray, pfrag, smoothrast, smoothagg,
                        blend_params: BlendParams, znear=1.0, zfar=100.0,
                        key=None) -> jnp.ndarray:
    """Channel-major twin of :func:`smooth_rgb_blend` — the hot path.

    colors_cm: (3, N, H, W, K); pfrag: PlanarFragments.  Returns RGBA
    (N, H, W, 4) — the only row-major (small-minor-dim) array produced, at
    the very end of the pipeline.

    ``key`` may be a single PRNG key (split here) or a pre-split
    ``(key_rast, key_agg)`` pair — callers running inside scanned training
    steps pre-split per-iteration keys outside the loop, since a threefry
    split lowers to a scalar while-loop worth ~ms on TPU.
    """
    import jax

    background = jnp.asarray(blend_params.background_color, colors_cm.dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    if isinstance(key, tuple):
        key_rast, key_agg = key
    else:
        key_rast, key_agg = jax.random.split(key)

    mask = pfrag.pix_to_face >= 0
    prob_map = smoothrast.rasterize(pfrag.dists, key_rast) * mask
    alpha = 1.0 - jnp.prod(1.0 - prob_map, axis=-1)         # (N, H, W)
    weights = smoothagg.aggregate(pfrag.zbuf, zfar, znear, prob_map,
                                  mask, key_agg)            # (N, H, W, K+1)
    wz, wb = weights[..., :-1], weights[..., -1]
    rgb = jnp.sum(wz[None] * colors_cm, axis=-1)            # (3, N, H, W)
    rgb = rgb + wb[None] * background.reshape(3, 1, 1, 1)
    return jnp.concatenate(
        [jnp.moveaxis(rgb, 0, -1), alpha[..., None]], axis=-1)
