import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pertrenderer_tpu.cameras import PerspectiveCameras, look_at_view_transform
from pertrenderer_tpu.ops.rasterize import RasterizationSettings, rasterize_meshes
from pertrenderer_tpu.structures import Meshes


def _front_cam(dist=4.0, fov=60.0):
    r, t = look_at_view_transform(dist=dist, elev=0.0, azim=0.0)
    return PerspectiveCameras.create(R=r, T=t, fov=fov)


def _tri_mesh(z=0.0, scale=1.0, flip=False):
    verts = scale * jnp.array(
        [[-1.0, -1.0, z], [1.0, -1.0, z], [0.0, 1.0, z]]
    )
    faces = jnp.array([[0, 2, 1]] if flip else [[0, 1, 2]])
    return Meshes.create(verts, faces)


def test_triangle_coverage_and_fields():
    cams = _front_cam()
    mesh = _tri_mesh()
    frags = rasterize_meshes(
        mesh, cams, RasterizationSettings(image_size=64, faces_per_pixel=1)
    )
    p2f = np.asarray(frags.pix_to_face)[0, :, :, 0]
    assert (p2f >= 0).any()
    # center pixel is inside the triangle
    assert p2f[40, 32] == 0
    # inside fragments: dist < 0, zbuf ~ view depth 4, valid barycentrics
    inside = p2f >= 0
    dists = np.asarray(frags.dists)[0, :, :, 0]
    zbuf = np.asarray(frags.zbuf)[0, :, :, 0]
    bary = np.asarray(frags.bary_coords)[0, :, :, 0]
    assert (dists[inside] <= 0).all()
    np.testing.assert_allclose(zbuf[inside], 4.0, atol=1e-4)
    np.testing.assert_allclose(bary[inside].sum(-1), 1.0, atol=1e-4)
    assert (bary[inside] >= -1e-6).all()
    # empty fragments carry the -1 padding
    assert (dists[~inside] == -1).all()
    assert (zbuf[~inside] == -1).all()


def test_winding_independence():
    cams = _front_cam()
    f1 = rasterize_meshes(
        _tri_mesh(), cams, RasterizationSettings(image_size=32)
    )
    f2 = rasterize_meshes(
        _tri_mesh(flip=True), cams, RasterizationSettings(image_size=32)
    )
    np.testing.assert_array_equal(
        np.asarray(f1.pix_to_face >= 0), np.asarray(f2.pix_to_face >= 0)
    )


def test_blur_radius_widens_coverage():
    cams = _front_cam()
    mesh = _tri_mesh(scale=0.5)
    small = rasterize_meshes(
        mesh, cams, RasterizationSettings(image_size=64, blur_radius=0.0)
    )
    wide = rasterize_meshes(
        mesh, cams, RasterizationSettings(image_size=64, blur_radius=1e-2)
    )
    n_small = int((np.asarray(small.pix_to_face) >= 0).sum())
    n_wide = int((np.asarray(wide.pix_to_face) >= 0).sum())
    assert n_wide > n_small
    # blur-band fragments (outside) have 0 < dist <= blur_radius
    outside_band = (np.asarray(wide.pix_to_face) >= 0) & (
        np.asarray(wide.dists) > 0
    )
    assert outside_band.any()
    assert (np.asarray(wide.dists)[outside_band] <= 1e-2 + 1e-9).all()


def test_topk_depth_ordering():
    # two stacked triangles; nearer one must be fragment 0
    verts = jnp.concatenate(
        [_tri_mesh(z=0.0).verts[0], _tri_mesh(z=-0.5).verts[0]], axis=0
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]])
    mesh = Meshes.create(verts, faces)
    cams = _front_cam()
    frags = rasterize_meshes(
        mesh, cams, RasterizationSettings(image_size=32, faces_per_pixel=2)
    )
    p2f = np.asarray(frags.pix_to_face)[0]
    zbuf = np.asarray(frags.zbuf)[0]
    both = (p2f >= 0).all(-1)
    assert both.any()
    # camera sits at world +Z looking back, so the z=0 triangle (face 0) is
    # nearer than the z=-0.5 one and must sort first
    assert (p2f[both][:, 0] == 0).all()
    assert (zbuf[both][:, 0] < zbuf[both][:, 1]).all()


def test_multi_chunk_matches_single_chunk():
    key = jax.random.PRNGKey(0)
    verts = jax.random.normal(key, (30, 3)) * 0.8
    faces = jnp.arange(30, dtype=jnp.int32).reshape(10, 3)
    mesh = Meshes.create(verts, faces)
    cams = _front_cam()
    f_all = rasterize_meshes(
        mesh, cams,
        RasterizationSettings(image_size=32, faces_per_pixel=4, faces_per_chunk=16),
    )
    f_chunked = rasterize_meshes(
        mesh, cams,
        RasterizationSettings(image_size=32, faces_per_pixel=4, faces_per_chunk=3),
    )
    np.testing.assert_array_equal(
        np.asarray(f_all.pix_to_face), np.asarray(f_chunked.pix_to_face)
    )
    np.testing.assert_allclose(
        np.asarray(f_all.zbuf), np.asarray(f_chunked.zbuf), atol=1e-6
    )


def test_padded_faces_ignored():
    mesh = _tri_mesh()
    padded = Meshes(
        verts=mesh.verts,
        faces=jnp.concatenate([mesh.faces, -jnp.ones((1, 5, 3), jnp.int32)], axis=1),
        num_verts=mesh.num_verts,
        num_faces=mesh.num_faces,
    )
    cams = _front_cam()
    f1 = rasterize_meshes(mesh, cams, RasterizationSettings(image_size=32))
    f2 = rasterize_meshes(padded, cams, RasterizationSettings(image_size=32))
    np.testing.assert_array_equal(
        np.asarray(f1.pix_to_face), np.asarray(f2.pix_to_face)
    )


@pytest.mark.parametrize("field", ["zbuf", "dists"])
def test_fragment_gradients_match_finite_difference(field):
    cams = _front_cam()
    settings = RasterizationSettings(image_size=16, faces_per_pixel=1)
    base = jnp.array([[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    faces = jnp.array([[0, 1, 2]])

    def f(verts):
        mesh = Meshes.create(verts, faces)
        frags = rasterize_meshes(mesh, cams, settings)
        val = getattr(frags, field)
        mask = frags.pix_to_face >= 0
        return jnp.sum(jnp.where(mask, val, 0.0))

    g = jax.grad(f)(base)
    eps = 1e-3
    for i in range(3):
        for j in range(3):
            vp = base.at[i, j].add(eps)
            vm = base.at[i, j].add(-eps)
            fd = (f(vp) - f(vm)) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, atol=2e-2, rtol=5e-2)


def test_perspective_correct_changes_depth_interp():
    # slanted triangle: perspective-correct z differs from affine z
    verts = jnp.array([[-1.0, -1.0, -1.0], [1.0, -1.0, 1.0], [0.0, 1.0, 0.0]])
    faces = jnp.array([[0, 1, 2]])
    mesh = Meshes.create(verts, faces)
    cams = _front_cam()
    fa = rasterize_meshes(
        mesh, cams,
        RasterizationSettings(image_size=32, perspective_correct=False),
    )
    fp = rasterize_meshes(
        mesh, cams,
        RasterizationSettings(image_size=32, perspective_correct=True),
    )
    inside = np.asarray(fa.pix_to_face)[0, :, :, 0] >= 0
    za = np.asarray(fa.zbuf)[0, :, :, 0][inside]
    zp = np.asarray(fp.zbuf)[0, :, :, 0][inside]
    assert np.abs(za - zp).max() > 1e-4


def test_rasterize_planar_rows_matches_full_strips():
    """The strip oracle path (rasterize_planar_rows) reproduces the full
    staged pass row-for-row, bit-exactly — selection, depth, dists and
    barycentrics — including across face-chunk boundaries."""
    from pertrenderer_tpu.io import make_icosphere
    from pertrenderer_tpu.ops.rasterize import (rasterize_planar,
                                                rasterize_planar_rows)

    verts, faces = make_icosphere(2)
    mesh = Meshes.create(verts, faces)
    r, t = look_at_view_transform(dist=3.0, elev=20.0, azim=40.0)
    cams = PerspectiveCameras.create(R=r, T=t, fov=60.0)
    settings = RasterizationSettings(image_size=32, faces_per_pixel=6,
                                     blur_radius=2e-3, faces_per_chunk=128)
    full = rasterize_planar(mesh, cams, settings)
    for r0, rc in ((0, 8), (8, 16), (24, 8)):
        strip = rasterize_planar_rows(mesh, cams, settings, r0, rc)
        for name in ("pix_to_face", "zbuf", "dists", "w0", "w1", "w2"):
            a = np.asarray(getattr(full, name))[:, r0:r0 + rc]
            b = np.asarray(getattr(strip, name))
            np.testing.assert_array_equal(a, b, err_msg=name)
