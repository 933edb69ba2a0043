"""Lights and materials for Phong shading.

TPU-native equivalents of the PyTorch3D ``PointLights`` / ``DirectionalLights``
/ ``Materials`` consumed by the reference
(`/root/reference/randomras/random_rasterizer.py:12-14,77-80`,
`/root/reference/experiments/eval.py:252,443`).  Light locations must be
differentiable — the reference's ``check_differentiability`` experiment
optimizes them (`/root/reference/experiments/eval.py:417,443`).

Defaults mirror PyTorch3D: lights ambient 0.5, diffuse 0.3, specular 0.2;
materials all-ones with shininess 64.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

__all__ = ["PointLights", "DirectionalLights", "Materials"]


def _color(x, n: int) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    return jnp.broadcast_to(x, (n, 3))


@struct.dataclass
class Materials:
    ambient_color: jnp.ndarray   # (N, 3)
    diffuse_color: jnp.ndarray   # (N, 3)
    specular_color: jnp.ndarray  # (N, 3)
    shininess: jnp.ndarray       # (N,)

    @classmethod
    def create(cls, ambient_color=(1.0, 1.0, 1.0), diffuse_color=(1.0, 1.0, 1.0),
               specular_color=(1.0, 1.0, 1.0), shininess=64.0, batch=1) -> "Materials":
        return cls(
            ambient_color=_color(ambient_color, batch),
            diffuse_color=_color(diffuse_color, batch),
            specular_color=_color(specular_color, batch),
            shininess=jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(shininess, jnp.float32)), (batch,)),
        )


@struct.dataclass
class PointLights:
    location: jnp.ndarray        # (N, 3)
    ambient_color: jnp.ndarray   # (N, 3)
    diffuse_color: jnp.ndarray   # (N, 3)
    specular_color: jnp.ndarray  # (N, 3)

    @classmethod
    def create(cls, location=(0.0, 1.0, 0.0), ambient_color=(0.5, 0.5, 0.5),
               diffuse_color=(0.3, 0.3, 0.3), specular_color=(0.2, 0.2, 0.2),
               batch=1) -> "PointLights":
        loc = jnp.asarray(location, jnp.float32)
        if loc.ndim == 1:
            loc = loc[None]
        return cls(
            location=jnp.broadcast_to(loc, (batch, 3)),
            ambient_color=_color(ambient_color, batch),
            diffuse_color=_color(diffuse_color, batch),
            specular_color=_color(specular_color, batch),
        )

    def direction_to_light(self, points: jnp.ndarray) -> jnp.ndarray:
        """Unit vectors from surface points (..., 3) to the light.

        The light location broadcasts over all leading point dims; batch dim 0
        of the light aligns with batch dim 0 of the points.
        """
        loc = self.location.reshape(
            (self.location.shape[0],) + (1,) * (points.ndim - 2) + (3,)
        )
        d = loc - points
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


@struct.dataclass
class DirectionalLights:
    direction: jnp.ndarray       # (N, 3) direction the light travels
    ambient_color: jnp.ndarray
    diffuse_color: jnp.ndarray
    specular_color: jnp.ndarray

    @classmethod
    def create(cls, direction=(0.0, 1.0, 0.0), ambient_color=(0.5, 0.5, 0.5),
               diffuse_color=(0.3, 0.3, 0.3), specular_color=(0.2, 0.2, 0.2),
               batch=1) -> "DirectionalLights":
        d = jnp.asarray(direction, jnp.float32)
        if d.ndim == 1:
            d = d[None]
        return cls(
            direction=jnp.broadcast_to(d, (batch, 3)),
            ambient_color=_color(ambient_color, batch),
            diffuse_color=_color(diffuse_color, batch),
            specular_color=_color(specular_color, batch),
        )

    def direction_to_light(self, points: jnp.ndarray) -> jnp.ndarray:
        d = -self.direction
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return jnp.broadcast_to(
            d.reshape((d.shape[0],) + (1,) * (points.ndim - 2) + (3,)), points.shape
        )


def diffuse_specular(
    lights, normals: jnp.ndarray, points: jnp.ndarray,
    camera_position: jnp.ndarray, shininess: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point diffuse and specular light contributions.

    Args:
      lights: PointLights or DirectionalLights (batch N).
      normals: (N, ..., 3) unit surface normals.
      points: (N, ..., 3) world-space surface points.
      camera_position: (N, 3) world-space camera centers.
      shininess: (N,) specular exponent.

    Returns:
      (diffuse, specular), each (N, ..., 3).
    """
    def _b(x):
        # Reshape (B, 3) per-batch values for broadcasting against
        # (N, ..., 3) points; B may be 1 (broadcast) or N.
        return x.reshape((x.shape[0],) + (1,) * (points.ndim - 2) + (3,))

    to_light = lights.direction_to_light(points)
    cos_angle = jnp.sum(normals * to_light, axis=-1, keepdims=True)
    diffuse = _b(lights.diffuse_color) * jnp.maximum(cos_angle, 0.0)

    view_dir = _b(camera_position) - points
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8
    )
    reflect = 2.0 * cos_angle * normals - to_light
    alpha = jnp.maximum(jnp.sum(view_dir * reflect, axis=-1, keepdims=True), 0.0)
    facing = (cos_angle > 0.0).astype(points.dtype)
    shin = shininess.reshape(
        (shininess.shape[0],) + (1,) * (points.ndim - 1))
    specular = _b(lights.specular_color) * facing * jnp.power(alpha, shin)
    return diffuse, specular
