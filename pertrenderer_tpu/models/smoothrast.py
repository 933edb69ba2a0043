"""Coverage (edge-smoothing) front-ends: the SmoothRast family.

Functional pytree re-design of `/root/reference/randomras/smoothrast.py:111-194`.
Each class is an immutable flax.struct dataclass whose ``sigma`` field is a
differentiable JAX scalar (the learnable smoothing temperature the reference
stores as a ``requires_grad`` tensor at smoothrast.py:116); ``nb_samples`` is
a static (trace-time) field because it sets the Monte-Carlo scan length.

The PyTorch mutators ``update_smoothing`` / ``update_nb_samples``
(smoothrast.py:119-123) become pure ``replace``-style methods returning new
instances — annealing in the experiment harness re-jits per S tier.

``rasterize`` maps per-fragment signed squared distances to coverage
probabilities in [0, 1]; stochastic variants take an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pertrenderer_tpu.ops.perturbed import heaviside, perturbed_heaviside

__all__ = [
    "SoftRast", "GaussianRast", "GaussianRast_wovr", "ArctanRast",
    "AffineRast", "HardRast",
]


def _scalar(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.float32)


@struct.dataclass
class SoftRast:
    """SoftRas sigmoid coverage: sigmoid(-d / sigma)
    (`/root/reference/randomras/smoothrast.py:126-134`).  Deterministic."""

    sigma: jnp.ndarray
    nb_samples: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, sigma=2e-4, nb_samples=1):
        return cls(sigma=_scalar(sigma), nb_samples=nb_samples)

    def rasterize(self, dists, key=None):
        del key
        return jax.nn.sigmoid(-dists / self.sigma)

    def update_smoothing(self, sigma):
        return self.replace(sigma=_scalar(sigma))

    def update_nb_samples(self, nb_samples):
        return self.replace(nb_samples=int(nb_samples))


@struct.dataclass
class GaussianRast:
    """Gaussian perturbed Heaviside with variance reduction
    (`/root/reference/randomras/smoothrast.py:136-147`)."""

    sigma: jnp.ndarray
    nb_samples: int = struct.field(pytree_node=False, default=16)
    sample_axis: str = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, sigma=2e-4, nb_samples=16, sample_axis=None):
        return cls(sigma=_scalar(sigma), nb_samples=nb_samples,
                   sample_axis=sample_axis)

    def rasterize(self, dists, key):
        return perturbed_heaviside(-dists, self.sigma, key, self.nb_samples,
                                   "gaussian", True, self.sample_axis)

    def update_smoothing(self, sigma):
        return self.replace(sigma=_scalar(sigma))

    def update_nb_samples(self, nb_samples):
        return self.replace(nb_samples=int(nb_samples))


@struct.dataclass
class GaussianRast_wovr:
    """Gaussian perturbed Heaviside WITHOUT variance reduction
    (`/root/reference/randomras/smoothrast.py:149-160`)."""

    sigma: jnp.ndarray
    nb_samples: int = struct.field(pytree_node=False, default=16)
    sample_axis: str = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, sigma=2e-4, nb_samples=16, sample_axis=None):
        return cls(sigma=_scalar(sigma), nb_samples=nb_samples,
                   sample_axis=sample_axis)

    def rasterize(self, dists, key):
        return perturbed_heaviside(-dists, self.sigma, key, self.nb_samples,
                                   "gaussian", False, self.sample_axis)

    def update_smoothing(self, sigma):
        return self.replace(sigma=_scalar(sigma))

    def update_nb_samples(self, nb_samples):
        return self.replace(nb_samples=int(nb_samples))


@struct.dataclass
class ArctanRast:
    """Cauchy-noise perturbed Heaviside (MC analogue of arctan smoothing,
    `/root/reference/randomras/smoothrast.py:162-173`)."""

    sigma: jnp.ndarray
    nb_samples: int = struct.field(pytree_node=False, default=16)
    sample_axis: str = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, sigma=2e-4, nb_samples=16, sample_axis=None):
        return cls(sigma=_scalar(sigma), nb_samples=nb_samples,
                   sample_axis=sample_axis)

    def rasterize(self, dists, key):
        return perturbed_heaviside(-dists, self.sigma, key, self.nb_samples,
                                   "cauchy", True, self.sample_axis)

    def update_smoothing(self, sigma):
        return self.replace(sigma=_scalar(sigma))

    def update_nb_samples(self, nb_samples):
        return self.replace(nb_samples=int(nb_samples))


@struct.dataclass
class AffineRast:
    """Piecewise-linear (clamped affine) coverage — the closed form of
    uniform-noise perturbation (`/root/reference/randomras/smoothrast.py:175-185`).
    Deterministic."""

    sigma: jnp.ndarray
    nb_samples: int = struct.field(pytree_node=False, default=16)

    @classmethod
    def create(cls, sigma=2e-4, nb_samples=16):
        return cls(sigma=_scalar(sigma), nb_samples=nb_samples)

    def rasterize(self, dists, key=None):
        del key
        p = -dists / self.sigma + 0.5
        p = jnp.where(-dists / self.sigma > 0.5, jnp.ones_like(p), p)
        return jnp.maximum(p, 0.0)

    def update_smoothing(self, sigma):
        return self.replace(sigma=_scalar(sigma))

    def update_nb_samples(self, nb_samples):
        return self.replace(nb_samples=int(nb_samples))


@struct.dataclass
class HardRast:
    """Hard Heaviside coverage — non-differentiable baseline
    (`/root/reference/randomras/smoothrast.py:187-194`)."""

    sigma: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.0))
    nb_samples: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls):
        return cls()

    def rasterize(self, dists, key=None):
        del key
        return heaviside(-dists)

    def update_smoothing(self, sigma):
        return self

    def update_nb_samples(self, nb_samples):
        return self
