"""Binned rasterization: parity with the flat path + high-poly capability."""

import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt
from pertrenderer_tpu.io import make_icosphere


def _scene(level=3):
    verts, faces = make_icosphere(level)
    mesh = pt.Meshes.create(verts, faces)
    r, t = pt.look_at_view_transform(dist=2.7, elev=20.0, azim=40.0)
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    return mesh, cams


def test_binned_matches_flat():
    mesh, cams = _scene(3)  # 1280 faces
    blur = 1e-4
    flat = pt.rasterize_meshes(
        mesh, cams,
        pt.RasterizationSettings(image_size=128, blur_radius=blur,
                                 faces_per_pixel=8, bin_size=0))
    binned = pt.rasterize_meshes(
        mesh, cams,
        pt.RasterizationSettings(image_size=128, blur_radius=blur,
                                 faces_per_pixel=8, bin_size=32,
                                 max_faces_per_bin=1280))
    np.testing.assert_array_equal(np.asarray(flat.pix_to_face),
                                  np.asarray(binned.pix_to_face))
    np.testing.assert_allclose(np.asarray(flat.zbuf),
                               np.asarray(binned.zbuf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(flat.dists),
                               np.asarray(binned.dists), atol=1e-6)


def test_binned_default_heuristic_on_highpoly():
    mesh, cams = _scene(4)  # 5120 faces -> binning auto-enables
    settings = pt.RasterizationSettings(image_size=128, blur_radius=0.0,
                                        faces_per_pixel=4)
    assert settings.resolve_binning(mesh.max_faces)[0] > 0
    frags = pt.rasterize_meshes(mesh, cams, settings)
    p2f = np.asarray(frags.pix_to_face)
    assert (p2f >= 0).any()
    # silhouette should be a filled disc-ish region
    assert 0.1 < (p2f[..., 0] >= 0).mean() < 0.9


def test_binned_gradients_flow():
    mesh, cams = _scene(3)
    settings = pt.RasterizationSettings(image_size=64, blur_radius=1e-4,
                                        faces_per_pixel=4, bin_size=32,
                                        max_faces_per_bin=1280)

    def f(verts):
        frags = pt.rasterize_meshes(mesh.update_padded(verts), cams, settings)
        return jnp.sum(jnp.where(frags.pix_to_face >= 0, frags.zbuf, 0.0))

    g = jax.grad(f)(mesh.verts)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_max_faces_per_bin_truncates_gracefully():
    mesh, cams = _scene(3)
    frags = pt.rasterize_meshes(
        mesh, cams,
        pt.RasterizationSettings(image_size=64, faces_per_pixel=4,
                                 bin_size=32, max_faces_per_bin=64))
    assert np.isfinite(np.asarray(frags.zbuf)).all()
