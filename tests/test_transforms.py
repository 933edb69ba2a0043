import jax
import jax.numpy as jnp
import numpy as np

from pertrenderer_tpu.transforms import (
    Rotate,
    hat,
    random_rotations,
    so3_exp_map,
    so3_log_map,
    so3_relative_angle,
)


def test_hat_cross_product():
    v = jnp.array([[1.0, 2.0, 3.0]])
    x = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(hat(v)[0] @ x, jnp.cross(v[0], x), atol=1e-6)


def test_exp_map_orthonormal():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (16, 3))
    r = so3_exp_map(w)
    eye = jnp.eye(3)[None]
    np.testing.assert_allclose(r @ jnp.swapaxes(r, -1, -2), jnp.broadcast_to(eye, r.shape), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(r), jnp.ones(16), atol=1e-5)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (32, 3)) * 0.8
    w2 = so3_log_map(so3_exp_map(w))
    np.testing.assert_allclose(w, w2, atol=1e-3)


def test_exp_map_small_angle_stable():
    w = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
    r = so3_exp_map(w)
    assert np.all(np.isfinite(np.asarray(r)))
    np.testing.assert_allclose(r[1], jnp.eye(3), atol=1e-6)
    # gradient is finite at zero
    g = jax.grad(lambda w: jnp.sum(so3_exp_map(w)))(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_relative_angle():
    axis = jnp.array([[0.0, 0.0, 1.0]])
    r1 = so3_exp_map(0.3 * axis)
    r2 = so3_exp_map(0.8 * axis)
    ang = so3_relative_angle(r1, r2)
    np.testing.assert_allclose(ang, 0.5, atol=1e-3)


def test_random_rotations_valid():
    r = random_rotations(64, jax.random.PRNGKey(2))
    np.testing.assert_allclose(jnp.linalg.det(r), jnp.ones(64), atol=1e-4)
    # mean rotation angle of uniform random rotations ~ 126.5 degrees
    angles = so3_relative_angle(r, jnp.broadcast_to(jnp.eye(3), r.shape))
    assert 1.6 < float(jnp.mean(angles)) < 2.8


def test_rotate_transform():
    r = so3_exp_map(jnp.array([[0.0, 0.0, jnp.pi / 2]]))
    pts = jnp.array([[[1.0, 0.0, 0.0]]])
    out = Rotate(r).transform_points(pts)
    # row-vector convention: p @ R
    np.testing.assert_allclose(out, pts @ r, atol=1e-6)
    back = Rotate(r).inverse().transform_points(out)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_identity_rotation_bit_exact():
    """Identity rotation must return the input vertices BIT-EXACTLY, under
    jit, on every backend.  On TPU the MXU's default matmul pass rounds f32
    operands to bfloat16 (~2e-3 relative vertex error — larger than a
    sigma=1e-3 blur band); transforms/cameras pin Precision.HIGHEST so this
    holds compiled on-chip too (bench.py's geometry_identity_pin runs the
    same check on the real chip every round)."""
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, 257, 3)),
                      jnp.float32) * 3.0
    out = jax.jit(
        lambda lr: Rotate(so3_exp_map(lr)).transform_points(pts))(
            jnp.zeros((1, 3)))
    assert np.array_equal(np.asarray(out), np.asarray(pts))
