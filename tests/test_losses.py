import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt
from pertrenderer_tpu.io import make_icosphere


def test_laplacian_smoothing_sphere_small():
    verts, faces = make_icosphere(2)
    mesh = pt.Meshes.create(verts, faces)
    loss = float(pt.mesh_laplacian_smoothing(mesh))
    # neighbors of a sphere vertex average to a slightly interior point
    assert 0 < loss < 0.2


def test_laplacian_increases_with_noise():
    verts, faces = make_icosphere(2)
    mesh = pt.Meshes.create(verts, faces)
    noisy = mesh.offset_verts(
        0.1 * jax.random.normal(jax.random.PRNGKey(0), mesh.verts[0].shape))
    assert float(pt.mesh_laplacian_smoothing(noisy)) > float(
        pt.mesh_laplacian_smoothing(mesh))


def test_laplacian_differentiable():
    verts, faces = make_icosphere(1)
    g = jax.grad(
        lambda v: pt.mesh_laplacian_smoothing(pt.Meshes.create(v, faces))
    )(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all()


def test_edge_loss():
    verts, faces = make_icosphere(1)
    mesh = pt.Meshes.create(verts, faces)
    l1 = float(pt.mesh_edge_loss(mesh))
    l2 = float(pt.mesh_edge_loss(mesh.scale_verts(2.0)))
    assert l2 > l1 > 0


def test_normal_consistency_sphere_vs_noisy():
    verts, faces = make_icosphere(2)
    mesh = pt.Meshes.create(verts, faces)
    smooth = float(pt.mesh_normal_consistency(mesh))
    noisy = mesh.offset_verts(
        0.05 * jax.random.normal(jax.random.PRNGKey(1), mesh.verts[0].shape))
    assert float(pt.mesh_normal_consistency(noisy)) > smooth
    assert smooth < 0.05


def test_chamfer_zero_identity():
    pts = jax.random.normal(jax.random.PRNGKey(0), (1, 50, 3))
    loss, _ = pt.chamfer_distance(pts, pts)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_chamfer_positive_and_symmetric():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, (1, 40, 3))
    b = jax.random.normal(k2, (1, 60, 3))
    l1, _ = pt.chamfer_distance(a, b)
    l2, _ = pt.chamfer_distance(b, a)
    assert float(l1) > 0
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_knn_matches_numpy():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    a = jax.random.normal(k1, (1, 20, 3))
    b = jax.random.normal(k2, (1, 30, 3))
    d, idx = pt.knn_points(a, b, K=3)
    an, bn = np.asarray(a)[0], np.asarray(b)[0]
    full = ((an[:, None] - bn[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d)[0], np.sort(full, axis=1)[:, :3],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx)[0],
                                  np.argsort(full, axis=1)[:, :3])
