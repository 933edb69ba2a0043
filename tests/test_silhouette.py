"""Silhouette fitting + gradient-variance sweep (BASELINE config 2:
icosphere silhouette, Gaussian vs Gumbel noise, nb_samples sweep)."""

import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt
from pertrenderer_tpu.io import make_icosphere
from pertrenderer_tpu.ops.perturbed import perturbed_heaviside


def _silhouette_scene(imsize=48):
    verts, faces = make_icosphere(2)
    mesh = pt.Meshes.create(verts, faces,
                            textures=pt.TexturesVertex(
                                jnp.ones((1, verts.shape[0], 3))))
    r, t = pt.look_at_view_transform(dist=2.7, elev=10.0, azim=30.0)
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    return mesh, cams


def _alpha(mesh, cams, scale, sigma=1e-3, nb_samples=8, imsize=48,
           key=None):
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=float(np.log(1 / 1e-4 - 1) * sigma),
        faces_per_pixel=8)
    frags = pt.rasterize_meshes(mesh.scale_verts(scale), cams, settings)
    rast = pt.GaussianRast.create(sigma=sigma, nb_samples=nb_samples)
    mask = frags.pix_to_face >= 0
    if key is None:
        key = jax.random.PRNGKey(0)
    prob = rast.rasterize(frags.dists, key) * mask
    return 1.0 - jnp.prod(1.0 - prob, axis=-1)


def test_silhouette_scale_fitting():
    """Optimize a scale parameter to match a target silhouette — pure
    coverage-gradient flow through the perturbed Heaviside."""
    mesh, cams = _silhouette_scene()
    target = _alpha(mesh, cams, 1.0, key=jax.random.PRNGKey(42))

    def loss(s, key):
        return jnp.mean((_alpha(mesh, cams, s, key=key) - target) ** 2)

    s = jnp.asarray(0.7)
    step = jax.jit(jax.value_and_grad(loss))
    key = jax.random.PRNGKey(0)
    # Decaying step size: a constant lr of 0.4 orbits the optimum (the MC
    # gradient stays O(1) inside the blur band), making the final iterate a
    # coin flip.  1/t decay converges it properly.
    for i in range(60):
        key, sub = jax.random.split(key)
        val, g = step(s, sub)
        s = jnp.clip(s - 0.4 / (1.0 + i / 10.0) * g, 0.2, 3.0)
    assert abs(float(s) - 1.0) < 0.08, float(s)


def test_gradient_variance_decreases_with_samples():
    """The BASELINE config-2 sweep: estimator gradient variance shrinks
    roughly as 1/S for S in {4, 16, 64}."""
    d = jnp.linspace(-0.5, 0.5, 256).reshape(1, 16, 16, 1)
    sigma = jnp.asarray(0.3)

    def grad_for(s_count, key):
        f = lambda d: jnp.sum(perturbed_heaviside(
            d, sigma, key, s_count, "gaussian", True))
        return np.asarray(jax.grad(f)(d)).ravel()

    variances = []
    for s_count in (4, 16, 64):
        grads = np.stack([grad_for(s_count, jax.random.PRNGKey(i))
                          for i in range(24)])
        variances.append(grads.var(axis=0).mean())
    assert variances[0] > variances[1] > variances[2]
    # ~1/S scaling within a generous factor
    assert variances[0] / variances[2] > 4.0


def test_gumbel_forward_silhouette_weights():
    """Gumbel-noise aggregation (forward-only in the reference) produces
    valid normalized weights on a real scene."""
    mesh, cams = _silhouette_scene()
    settings = pt.RasterizationSettings(image_size=32, blur_radius=1e-4,
                                        faces_per_pixel=8)
    frags = pt.rasterize_meshes(mesh, cams, settings)
    from pertrenderer_tpu.models.smoothagg import _stochastic_agg

    GumbelAgg = _stochastic_agg("gumbel", True)
    agg = GumbelAgg.create(gamma=1e-2, nb_samples=16)
    mask = frags.pix_to_face >= 0
    prob = pt.SoftRast.create(sigma=1e-3).rasterize(frags.dists) * mask
    w = agg.aggregate(frags.zbuf, 100.0, 1.0, prob, mask,
                      jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
