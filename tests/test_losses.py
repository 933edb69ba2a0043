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


def _cot_laplacian_oracle(verts, faces, method):
    """Dense-matrix transcription of PyTorch3D's cot_laplacian +
    mesh_laplacian_smoothing (pytorch3d/ops/laplacian_matrices.py,
    loss/mesh_laplacian_smoothing.py) as an independent oracle."""
    V = verts.shape[0]
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    A = np.linalg.norm(v1 - v2, axis=1)
    B = np.linalg.norm(v0 - v2, axis=1)
    C = np.linalg.norm(v0 - v1, axis=1)
    s = 0.5 * (A + B + C)
    area = np.sqrt(np.maximum(s * (s - A) * (s - B) * (s - C), 1e-12))
    A2, B2, C2 = A * A, B * B, C * C
    cot = np.stack([(B2 + C2 - A2) / area, (A2 + C2 - B2) / area,
                    (A2 + B2 - C2) / area], axis=1) / 4.0
    L = np.zeros((V, V))
    ii = faces[:, [1, 2, 0]]
    jj = faces[:, [2, 0, 1]]
    for f in range(faces.shape[0]):
        for k in range(3):
            L[ii[f, k], jj[f, k]] += cot[f, k]
    L = L + L.T
    rowsum = L.sum(1)
    lx = L @ verts
    if method == "cot":
        norm_w = np.where(rowsum > 0, 1.0 / np.maximum(rowsum, 1e-30),
                          rowsum)
        lap = lx * norm_w[:, None] - verts
    else:
        varea = np.zeros(V)
        for f in range(faces.shape[0]):
            for k in range(3):
                varea[faces[f, k]] += area[f]
        inv_area = np.where(varea > 0, 1.0 / np.maximum(varea, 1e-30), 0.0)
        lap = (lx - rowsum[:, None] * verts) * (0.25 * inv_area)[:, None]
    return np.linalg.norm(lap, axis=1).mean()


def test_cot_laplacian_matches_dense_oracle():
    verts, faces = make_icosphere(1)
    mesh = pt.Meshes.create(verts, faces)
    for method in ("cot", "cotcurv"):
        ours = float(pt.mesh_laplacian_smoothing(mesh, method=method))
        ref = _cot_laplacian_oracle(np.asarray(verts, np.float64),
                                    np.asarray(faces), method)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_cotcurv_approximates_sphere_mean_curvature():
    # For a radius-r sphere the discrete operator gives
    # |(L x - rowsum x)_v| = |2 A_mixed K| = 4 A_mixed H, and the 0.25 /
    # (3 A_mixed) normalization leaves cotcurv = H/3 = 1/(3 r).
    verts, faces = make_icosphere(3)
    for r in (1.0, 2.0):
        mesh = pt.Meshes.create(verts * r, faces)
        loss = float(pt.mesh_laplacian_smoothing(mesh, method="cotcurv"))
        np.testing.assert_allclose(loss, 1.0 / (3.0 * r), rtol=0.05)


def test_cot_laplacian_invariances_and_grad():
    verts, faces = make_icosphere(1)
    mesh = pt.Meshes.create(verts, faces)
    shifted = mesh.offset_verts(jnp.ones_like(mesh.verts[0]) * 0.7)
    for method in ("cot", "cotcurv"):
        a = float(pt.mesh_laplacian_smoothing(mesh, method=method))
        b = float(pt.mesh_laplacian_smoothing(shifted, method=method))
        np.testing.assert_allclose(a, b, rtol=1e-4)
        g = jax.grad(lambda v: pt.mesh_laplacian_smoothing(
            pt.Meshes.create(v, faces), method=method))(jnp.asarray(verts))
        assert np.isfinite(np.asarray(g)).all()
    # cot scales ~ s, cotcurv ~ 1/s.
    big = mesh.scale_verts(2.0)
    np.testing.assert_allclose(
        float(pt.mesh_laplacian_smoothing(big, method="cot")),
        2.0 * float(pt.mesh_laplacian_smoothing(mesh, method="cot")),
        rtol=1e-4)


def test_vertex_feature_laplacian():
    from pertrenderer_tpu.losses import vertex_feature_laplacian

    verts, faces = make_icosphere(1)
    mesh = pt.Meshes.create(verts, faces)
    # A constant field is exactly smooth; a random one is not.
    const = jnp.ones((mesh.max_verts, 3)) * 0.4
    np.testing.assert_allclose(
        float(vertex_feature_laplacian(mesh, const)), 0.0, atol=1e-6)
    noisy = jax.random.uniform(jax.random.PRNGKey(0),
                               (mesh.max_verts, 3))
    assert float(vertex_feature_laplacian(mesh, noisy)) > 1e-3
    # (1, V, C) accepted; matches geometry laplacian on the verts field.
    a = float(vertex_feature_laplacian(mesh, mesh.verts))
    b = float(pt.mesh_laplacian_smoothing(mesh))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    g = jax.grad(lambda f: vertex_feature_laplacian(mesh, f))(noisy)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # At a binary-exact constant field (the scene loop's WHITE texture
    # init: 1.0) every residual is exactly 0 and sqrt's backward is 0/0 —
    # the gradient must be the exact subgradient 0, not NaN (a NaN here
    # froze the white init: the optimizer's isfinite guard zeroed the
    # WHOLE parameter gradient every step, so the texture never moved).
    white = jnp.ones((mesh.max_verts, 3))
    g0 = jax.grad(lambda f: vertex_feature_laplacian(mesh, f))(white)
    assert np.isfinite(np.asarray(g0)).all()
    np.testing.assert_allclose(np.asarray(g0), 0.0, atol=0.0)
