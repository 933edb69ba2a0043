"""Occlusion/aggregation front-ends: the SmoothAgg family.

Functional pytree re-design of `/root/reference/randomras/smoothagg.py:145-289`.
``gamma`` and ``alpha`` are differentiable JAX scalars (learnable, like the
``requires_grad`` tensors at smoothagg.py:153-154); ``nb_samples``, ``eps``
and ``fixed_noise`` are static fields.

All aggregators share the reference's preamble (smoothagg.py:173-181):

    z_inv      = (zfar - zbuf) / (zfar - znear) * mask      # normalized inverse depth
    z_inv_max  = max_K(z_inv).clamp(min=eps)
    z_map      = prod_corrected(gamma / alpha, log_corrected(prob)) + z_inv - z_inv_max
    z_map      = concat([z_map, eps - z_inv_max], -1)        # background channel

then produce per-pixel weights over K fragments + background: SoftAgg via a
softmax (the SoftRas aggregate), the stochastic members via the perturbed
argmax with their noise family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pertrenderer_tpu.ops.perturbed import (
    hard_argmax_onehot,
    log_corrected,
    perturbed_argmax,
    prod_corrected,
)

__all__ = [
    "SoftAgg", "GaussianAgg", "GaussianAgg_wovr", "CauchyAgg", "UniformAgg",
    "HardAgg",
]


def _scalar(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.float32)


def _z_map(gamma, alpha, eps, zbuf, zfar, znear, prob_map, mask,
           corrected_prod: bool = True, gamma_over_alpha=None):
    """Shared aggregation preamble; returns z_map with background channel
    appended (last axis size K+1)."""
    mask = mask.astype(zbuf.dtype)
    z_inv = (zfar - zbuf) / (zfar - znear) * mask
    z_inv_max = jnp.maximum(jnp.max(z_inv, axis=-1, keepdims=True), eps)
    log_prob = log_corrected(prob_map)
    gal = gamma / alpha if gamma_over_alpha is None else gamma_over_alpha
    if corrected_prod:
        scaled = prod_corrected(gal, log_prob)
    else:
        scaled = gal * log_prob
    z_map = scaled + z_inv - z_inv_max
    bg = jnp.broadcast_to(eps - z_inv_max, z_map.shape[:-1] + (1,))
    return jnp.concatenate([z_map, bg], axis=-1)


@struct.dataclass
class SoftAgg:
    """Softmax aggregation — the SoftRas aggregate
    (`/root/reference/randomras/smoothagg.py:165-182`).  Deterministic."""

    gamma: jnp.ndarray
    alpha: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-10)
    nb_samples: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, gamma=4e-2, alpha=1.0, eps=1e-10, nb_samples=1):
        return cls(gamma=_scalar(gamma), alpha=_scalar(alpha), eps=eps,
                   nb_samples=nb_samples)

    def aggregate(self, zbuf, zfar, znear, prob_map, mask, key=None):
        del key
        z_map = _z_map(self.gamma, self.alpha, self.eps, zbuf, zfar, znear,
                       prob_map, mask)
        return jax.nn.softmax(prod_corrected(1.0 / self.gamma, z_map), axis=-1)

    def update_smoothing(self, gamma=4e-2, alpha=1.0):
        return self.replace(gamma=_scalar(gamma), alpha=_scalar(alpha))

    def update_nb_samples(self, nb_samples):
        return self.replace(nb_samples=int(nb_samples))


def _stochastic_agg(cls_noise: str, variance_reduction: bool):
    """Class factory for the perturbed-argmax aggregators (they differ only in
    noise family / VR flag / which product op scales log-prob)."""

    corrected = cls_noise != "uniform"  # UniformAgg uses a plain product
                                        # (smoothagg.py:267)

    @struct.dataclass
    class _Agg:
        gamma: jnp.ndarray
        alpha: jnp.ndarray
        eps: float = struct.field(pytree_node=False, default=1e-10)
        nb_samples: int = struct.field(pytree_node=False, default=16)
        fixed_noise: bool = struct.field(pytree_node=False, default=False)
        sample_axis: str = struct.field(pytree_node=False, default=None)

        @classmethod
        def create(cls, gamma=4e-2, alpha=1.0, eps=1e-10, nb_samples=16,
                   fixed_noise=False, sample_axis=None):
            return cls(gamma=_scalar(gamma), alpha=_scalar(alpha), eps=eps,
                       nb_samples=nb_samples, fixed_noise=fixed_noise,
                       sample_axis=sample_axis)

        def aggregate(self, zbuf, zfar, znear, prob_map, mask, key=None):
            if self.fixed_noise or key is None:
                # Deterministic renders: the reference reseeds to 1
                # (smoothagg.py:18-19).
                key = jax.random.PRNGKey(1)
            z_map = _z_map(self.gamma, self.alpha, self.eps, zbuf, zfar,
                           znear, prob_map, mask, corrected_prod=corrected)
            return perturbed_argmax(z_map, self.gamma, key, self.nb_samples,
                                    cls_noise, variance_reduction,
                                    self.sample_axis)

        def update_smoothing(self, gamma=4e-2, alpha=1.0):
            return self.replace(gamma=_scalar(gamma), alpha=_scalar(alpha))

        def update_nb_samples(self, nb_samples):
            return self.replace(nb_samples=int(nb_samples))

    return _Agg


# Gaussian perturbed argmax with VR (`smoothagg.py:185-205`).
GaussianAgg = _stochastic_agg("gaussian", True)
GaussianAgg.__name__ = "GaussianAgg"

# Without variance reduction (`smoothagg.py:207-227`).
GaussianAgg_wovr = _stochastic_agg("gaussian", False)
GaussianAgg_wovr.__name__ = "GaussianAgg_wovr"

# Cauchy noise (`smoothagg.py:230-250`).
CauchyAgg = _stochastic_agg("cauchy", True)
CauchyAgg.__name__ = "CauchyAgg"

# Uniform noise — forward-only, like the reference (`smoothagg.py:252-271`).
UniformAgg = _stochastic_agg("uniform", True)
UniformAgg.__name__ = "UniformAgg"


@struct.dataclass
class HardAgg:
    """Hard argmax aggregation — non-differentiable baseline
    (`/root/reference/randomras/smoothagg.py:274-289`); log-prob scaled by
    1e-6 instead of gamma/alpha.  The gamma/alpha fields exist only so the
    shared shader surface (get/update_smoothing) works; they are inert."""

    gamma: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.asarray(1.0))
    alpha: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.asarray(1.0))
    eps: float = struct.field(pytree_node=False, default=1e-10)
    nb_samples: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, eps=1e-10):
        return cls(eps=eps)

    def aggregate(self, zbuf, zfar, znear, prob_map, mask, key=None):
        del key
        z_map = _z_map(jnp.asarray(1.0), jnp.asarray(1.0), self.eps, zbuf,
                       zfar, znear, prob_map, mask, corrected_prod=False,
                       gamma_over_alpha=jnp.asarray(1.0 / 1e6))
        return hard_argmax_onehot(z_map)

    def update_smoothing(self, gamma=4e-2, alpha=1.0):
        return self

    def update_nb_samples(self, nb_samples):
        return self
