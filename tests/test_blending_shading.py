import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt


def _scene(image_size=48, sigma=1e-3, gamma=1e-2, K=8):
    mesh = pt.load_cube().scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    blur = float(np.log(1 / 1e-4 - 1) * sigma)
    settings = pt.RasterizationSettings(
        image_size=image_size, blur_radius=blur, faces_per_pixel=K
    )
    rast = pt.MeshRasterizer.create(cameras=cams, raster_settings=settings)
    return mesh, cams, lights, rast


def test_softras_path_matches_softmax_blend():
    """SoftRast+SoftAgg through smooth_rgb_blend reproduces PyTorch3D's
    softmax_rgb_blend (SURVEY.md §4 golden-image strategy: the deterministic
    SoftRas path is the analytic anchor)."""
    sigma, gamma = 1e-3, 1e-2
    mesh, cams, lights, rast = _scene(sigma=sigma, gamma=gamma)
    bp = pt.BlendParams(sigma=sigma, gamma=gamma, background_color=(0.0, 0.0, 0.0))
    soft_shader = pt.RandomSimpleShader.create(
        cameras=cams,
        smoothrast=pt.SoftRast.create(sigma=sigma),
        smoothagg=pt.SoftAgg.create(gamma=gamma, alpha=1.0),
        blend_params=bp,
    )
    baseline_shader = pt.SoftSimpleShader.create(blend_params=bp)
    frags = rast(mesh, cameras=cams)
    img_soft = np.asarray(soft_shader(frags, mesh, cameras=cams))
    img_base = np.asarray(baseline_shader(frags, mesh, cameras=cams))
    np.testing.assert_allclose(img_soft, img_base, atol=2e-3)


def test_gaussian_large_s_approaches_softras():
    """With many samples and matched scales the MC estimators approach the
    smooth deterministic blend (coarse statistical check)."""
    sigma, gamma = 2e-3, 2e-2
    mesh, cams, lights, rast = _scene(sigma=sigma, gamma=gamma)
    bp = pt.BlendParams(sigma=sigma, gamma=gamma, background_color=(0.0, 0.0, 0.0))
    frags = rast(mesh, cameras=cams)
    g_shader = pt.RandomSimpleShader.create(
        cameras=cams,
        smoothrast=pt.GaussianRast.create(sigma=sigma, nb_samples=256),
        smoothagg=pt.GaussianAgg.create(gamma=gamma, nb_samples=256),
        blend_params=bp,
    )
    s_shader = pt.RandomSimpleShader.create(
        cameras=cams,
        smoothrast=pt.SoftRast.create(sigma=sigma),
        smoothagg=pt.SoftAgg.create(gamma=gamma),
        blend_params=bp,
    )
    img_g = np.asarray(g_shader(frags, mesh, key=jax.random.PRNGKey(0), cameras=cams))
    img_s = np.asarray(s_shader(frags, mesh, cameras=cams))
    # same structure: small mean abs difference (the families differ —
    # perturbed argmax is not the softmax — so this is a coarse check)
    assert np.abs(img_g[..., :3] - img_s[..., :3]).mean() < 0.05


def test_hard_rgb_blend_background():
    mesh, cams, lights, rast = _scene()
    frags = rast(mesh, cameras=cams)
    shader = pt.SimpleShader.create(
        blend_params=pt.BlendParams(background_color=(0.25, 0.5, 0.75)))
    img = np.asarray(shader(frags, mesh, cameras=cams))
    bg = np.asarray(frags.pix_to_face)[..., 0] < 0
    np.testing.assert_allclose(img[bg][:, :3],
                               np.broadcast_to([0.25, 0.5, 0.75],
                                               (bg.sum(), 3)), atol=1e-6)
    np.testing.assert_allclose(img[bg][:, 3], 0.0, atol=1e-6)
    assert (img[~bg][:, 3] == 1.0).all()


def test_phong_shading_lights_scale_brightness():
    mesh, cams, _, rast = _scene()
    frags = rast(mesh, cameras=cams)
    dim = pt.PointLights.create(location=(0.0, 2.0, -2.0),
                                diffuse_color=(0.0, 0.0, 0.0),
                                ambient_color=(0.2, 0.2, 0.2),
                                specular_color=(0.0, 0.0, 0.0))
    bright = pt.PointLights.create(location=(0.0, 2.0, -2.0),
                                   diffuse_color=(0.6, 0.6, 0.6),
                                   ambient_color=(0.5, 0.5, 0.5),
                                   specular_color=(0.0, 0.0, 0.0))
    sh_dim = pt.HardPhongShader.create(cameras=cams, lights=dim)
    sh_bright = pt.HardPhongShader.create(cameras=cams, lights=bright)
    fg = np.asarray(frags.pix_to_face)[..., 0] >= 0
    img_dim = np.asarray(sh_dim(frags, mesh, cameras=cams))[fg]
    img_bright = np.asarray(sh_bright(frags, mesh, cameras=cams))[fg]
    assert img_bright[:, :3].mean() > img_dim[:, :3].mean()


def test_light_position_gradient_flows():
    """Light location must be differentiable
    (`/root/reference/experiments/eval.py:693-725` check_differentiability)."""
    mesh, cams, _, rast = _scene()
    frags = rast(mesh, cameras=cams)

    def f(loc):
        lights = pt.PointLights.create(location=loc)
        shader = pt.HardPhongShader.create(cameras=cams, lights=lights)
        return jnp.sum(shader(frags, mesh, cameras=cams)[..., :3])

    g = jax.grad(f)(jnp.array([[0.0, 2.0, -2.0]]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_texture_types_render():
    """All three texture representations produce sensible texels
    (`/root/reference/experiments/eval.py:233-238,450,746-756`)."""
    mesh, cams, _, rast = _scene()
    frags = rast(mesh, cameras=cams)
    # UV (cube default)
    tex_uv = np.asarray(mesh.sample_textures(frags))
    fg = np.asarray(frags.pix_to_face) >= 0
    assert tex_uv[fg].max() > 0.9
    # vertex textures
    vt = pt.TexturesVertex(jnp.ones_like(mesh.verts) * 0.5)
    tex_v = np.asarray(mesh.with_textures(vt).sample_textures(frags))
    np.testing.assert_allclose(tex_v[fg], 0.5, atol=1e-5)
    # atlas: constant red per face
    atlas = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]),
                             (1, mesh.max_faces, 4, 4, 3))
    tex_a = np.asarray(mesh.with_textures(pt.TexturesAtlas(atlas)).sample_textures(frags))
    np.testing.assert_allclose(tex_a[fg], np.broadcast_to([1.0, 0.0, 0.0],
                                                          (fg.sum(), 3)), atol=1e-5)


def test_smooth_blend_alpha_is_silhouette():
    sigma = 1e-3
    mesh, cams, _, rast = _scene(sigma=sigma)
    frags = rast(mesh, cameras=cams)
    shader = pt.RandomSimpleShader.create(
        cameras=cams,
        smoothrast=pt.SoftRast.create(sigma=sigma),
        smoothagg=pt.SoftAgg.create(),
        blend_params=pt.BlendParams(sigma=sigma, background_color=(0.0, 0.0, 0.0)),
    )
    img = np.asarray(shader(frags, mesh, cameras=cams))
    # dists are squared NDC distances: require pixels well inside the face so
    # sigmoid(-d/sigma) saturates (empty slots carry the -1 padding, so gate
    # on pix_to_face too)
    interior = (np.asarray(frags.pix_to_face)[..., 0] >= 0) & (
        np.asarray(frags.dists)[..., 0] < -1e-2)
    assert interior.any()
    assert (img[..., 3][interior] > 0.99).all()
    empty = (np.asarray(frags.pix_to_face) < 0).all(-1)
    np.testing.assert_allclose(img[..., 3][empty], 0.0, atol=1e-5)
