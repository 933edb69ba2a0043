"""Batched multi-view rendering (BASELINE config 4: 16 cameras, joint
pose+deform optimization)."""

import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt
from pertrenderer_tpu.transforms import Rotate, so3_exp_map


def _multiview_scene(n_views=8, imsize=32):
    mesh = pt.load_cube().scale_verts(2.0).extend(n_views)
    elev = jnp.linspace(10.0, 60.0, n_views)
    azim = jnp.linspace(0.0, 315.0, n_views)
    r, t = pt.look_at_view_transform(dist=6.7, elev=elev, azim=azim)
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0), batch=n_views)
    settings = pt.RasterizationSettings(image_size=imsize, blur_radius=1e-4,
                                        faces_per_pixel=8)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cams,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cams, lights=lights,
            blend_params=pt.BlendParams(sigma=1e-4, gamma=1e-3,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.GaussianRast.create(sigma=1e-4, nb_samples=4),
            smoothagg=pt.GaussianAgg.create(gamma=1e-3, nb_samples=4)))
    return mesh, cams, lights, renderer


def test_multiview_batch_renders():
    n = 8
    mesh, cams, lights, renderer = _multiview_scene(n)
    imgs = renderer(mesh, key=jax.random.PRNGKey(0), cameras=cams,
                    lights=lights)
    assert imgs.shape == (n, 32, 32, 4)
    a = np.asarray(imgs)
    assert np.isfinite(a).all()
    # every view sees the cube, and views differ
    assert all((a[i, ..., 3] > 0.5).sum() > 10 for i in range(n))
    assert np.abs(a[0] - a[4]).max() > 0.05


def test_multiview_joint_pose_deform_gradients():
    """Joint pose + vertex-offset optimization across all views at once
    (the 16-camera BASELINE config, shrunk for CI)."""
    n = 4
    mesh, cams, lights, renderer = _multiview_scene(n)
    key = jax.random.PRNGKey(1)
    r_true = pt.random_rotations(1, key)
    target_mesh = mesh.update_padded(
        Rotate(jnp.repeat(r_true, n, 0)).transform_points(mesh.verts))
    targets = renderer(target_mesh, key=key, cameras=cams,
                       lights=lights)[..., :3]

    def loss_fn(params):
        rot = so3_exp_map(params["log_rot"])
        verts = mesh.verts + params["deform"][None]
        pred = mesh.update_padded(
            Rotate(jnp.repeat(rot, n, 0)).transform_points(verts))
        imgs = renderer(pred, key=jax.random.PRNGKey(2), cameras=cams,
                        lights=lights)
        return jnp.mean((imgs[..., :3] - targets) ** 2)

    params = {"log_rot": jnp.zeros((1, 3)),
              "deform": jnp.zeros_like(mesh.verts[0])}
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
        assert float(jnp.abs(g).sum()) > 0, k
