import jax
import jax.numpy as jnp
import numpy as np

from pertrenderer_tpu.cameras import (
    PerspectiveCameras,
    look_at_view_transform,
)


def test_look_at_camera_center():
    r, t = look_at_view_transform(dist=5.0, elev=30.0, azim=60.0)
    cams = PerspectiveCameras.create(R=r, T=t)
    c = np.asarray(cams.camera_center())[0]
    elev, azim = np.deg2rad(30.0), np.deg2rad(60.0)
    expected = 5.0 * np.array(
        [np.cos(elev) * np.sin(azim), np.sin(elev), np.cos(elev) * np.cos(azim)]
    )
    np.testing.assert_allclose(c, expected, atol=1e-5)


def test_look_at_origin_projects_to_center():
    r, t = look_at_view_transform(dist=4.0, elev=20.0, azim=130.0)
    cams = PerspectiveCameras.create(R=r, T=t, fov=60.0)
    ndc = cams.transform_points_ndc(jnp.zeros((1, 1, 3)))
    np.testing.assert_allclose(ndc[0, 0, :2], jnp.zeros(2), atol=1e-5)
    np.testing.assert_allclose(ndc[0, 0, 2], 4.0, atol=1e-5)


def test_view_space_depth_increases_away():
    r, t = look_at_view_transform(dist=4.0, elev=0.0, azim=0.0)
    cams = PerspectiveCameras.create(R=r, T=t)
    pts = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, -1.0]]])  # second farther
    view = cams.transform_points_view(pts)
    assert float(view[0, 1, 2]) > float(view[0, 0, 2])


def test_ndc_x_points_left_y_up():
    """+X world (on the left of a camera at +Z looking back) has positive
    x_ndc; +Y world has positive y_ndc — the PyTorch3D screen convention."""
    r, t = look_at_view_transform(dist=4.0, elev=0.0, azim=0.0)
    cams = PerspectiveCameras.create(R=r, T=t, fov=60.0)
    ndc = cams.transform_points_ndc(
        jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    )
    assert float(ndc[0, 0, 0]) < 0  # world +x is to the camera's right => -x_ndc
    assert float(ndc[0, 1, 1]) > 0  # world +y up => +y_ndc


def test_fov_scaling():
    r, t = look_at_view_transform(dist=4.0)
    pt3 = jnp.array([[[0.5, 0.0, 0.0]]])
    narrow = PerspectiveCameras.create(R=r, T=t, fov=30.0).transform_points_ndc(pt3)
    wide = PerspectiveCameras.create(R=r, T=t, fov=90.0).transform_points_ndc(pt3)
    assert abs(float(narrow[0, 0, 0])) > abs(float(wide[0, 0, 0]))


def test_look_at_differentiable():
    def f(params):
        dist, elev, azim = params
        r, t = look_at_view_transform(dist=dist, elev=elev, azim=azim)
        return jnp.sum(r) + jnp.sum(t)

    g = jax.grad(f)(jnp.array([4.0, 20.0, 120.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
