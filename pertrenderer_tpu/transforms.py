"""SO(3) transforms and rigid rotations.

TPU-native re-implementation of the pose parameterization surface the reference
consumes from PyTorch3D (`/root/reference/experiments/eval.py:47-53`):
``Rotate``, ``random_rotations``, ``so3_exp_map``, ``so3_log_map``,
``so3_relative_angle``.  Everything is pure JAX, differentiable, and follows the
row-vector convention (``x_out = x @ R``) used throughout the framework, which
matches the PyTorch3D ``Transform3d`` convention the reference relies on at
`/root/reference/experiments/eval.py:343-346`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "hat",
    "hat_inv",
    "so3_exp_map",
    "so3_exponential_map",
    "so3_log_map",
    "so3_relative_angle",
    "so3_rotation_angle",
    "random_rotations",
    "quaternion_to_matrix",
    "Rotate",
]

_EPS = 1e-8

# Geometry matmuls are tiny ((..., 3) @ (3, 3)) but precision-critical: the
# TPU MXU's default pass rounds f32 operands to bfloat16 (~2e-3 relative
# vertex error — larger than a sigma=1e-3 smoothing scale, and enough to make
# an identity rotation move every vertex).  HIGHEST keeps them exact f32 at
# negligible cost.
_HI = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HI)


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Map batched 3-vectors to skew-symmetric matrices: hat(v) @ x = v × x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def hat_inv(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat` (extracts the axis vector)."""
    return jnp.stack(
        [m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1
    )


def so3_exp_map(log_rot: jnp.ndarray) -> jnp.ndarray:
    """Exponential map from axis-angle vectors (N, 3) to rotations (N, 3, 3).

    Rodrigues formula with a numerically safe treatment of small angles (the
    sin(t)/t and (1-cos t)/t^2 factors are evaluated with a clamped angle, and
    the limit values are exact at t=0 through the clamp because the matrix
    terms vanish with ||w||).
    """
    theta_sq = jnp.sum(log_rot * log_rot, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    k = hat(log_rot)
    k2 = _mm(k, k)
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    a = (sin_t / theta)[..., None, None]
    b = ((1.0 - cos_t) / (theta * theta))[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), k.shape)
    return eye + a * k + b * k2


# Alias matching the PyTorch3D name used at /root/reference/experiments/eval.py:50.
so3_exponential_map = so3_exp_map


def so3_rotation_angle(r: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Rotation angle of (N, 3, 3) matrices, in radians, safe for autodiff."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_angle = (trace - 1.0) * 0.5
    cos_angle = jnp.clip(cos_angle, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos_angle)


def so3_log_map(r: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Logarithm map from rotations (N, 3, 3) to axis-angle vectors (N, 3)."""
    theta = so3_rotation_angle(r, eps=eps)
    skew = 0.5 * (r - jnp.swapaxes(r, -1, -2))
    vec = hat_inv(skew)  # = sin(theta) * axis
    sin_t = jnp.sin(theta)
    scale = theta / jnp.maximum(sin_t, eps)
    return vec * scale[..., None]


def so3_relative_angle(r1: jnp.ndarray, r2: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Angle of the relative rotation r1^T r2 (radians), as in the reference
    pose metric (`/root/reference/experiments/eval.py:627-629`)."""
    r12 = _mm(jnp.swapaxes(r1, -1, -2), r2)
    return so3_rotation_angle(r12, eps=eps)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions (..., 4) [w, x, y, z] to rotation matrices (..., 3, 3)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    two = 2.0
    m = jnp.stack(
        [
            1 - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
            two * (x * y + z * w), 1 - two * (x * x + z * z), two * (y * z - x * w),
            two * (x * z - y * w), two * (y * z + x * w), 1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def random_rotations(n: int, key: jax.Array) -> jnp.ndarray:
    """Uniformly distributed random rotations (n, 3, 3) via unit quaternions.

    Functional replacement for `random_rotations(1)` used at
    `/root/reference/experiments/eval.py:285`; requires an explicit PRNG key.
    """
    quat = jax.random.normal(key, (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return quaternion_to_matrix(quat)


class Rotate:
    """Rotation transform with the row-vector convention: p_out = p @ R.

    Mirrors the PyTorch3D ``Rotate`` the reference applies to mesh vertices at
    `/root/reference/experiments/eval.py:286-287,344-346`.
    """

    def __init__(self, R: jnp.ndarray):
        self.R = R if R.ndim == 3 else R[None]

    def transform_points(self, points: jnp.ndarray) -> jnp.ndarray:
        """points: (N, P, 3) -> (N, P, 3)."""
        return _mm(points, self.R)

    def inverse(self) -> "Rotate":
        return Rotate(jnp.swapaxes(self.R, -1, -2))
