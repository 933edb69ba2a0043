"""Parity tests for the monolithic fused Pallas renderer (interpret mode).

The fused kernel must reproduce the staged XLA pipeline:
  * exactly (~1e-5) for the deterministic menu entries (softras / hard /
    uniform), forward AND gradients — including the learnable sigma / gamma /
    alpha and scene parameters;
  * in expectation for the stochastic families (their PRNG streams differ by
    construction), which the estimator-level statistical tests cover
    (`test_fused_estimator_stats`).

On CPU the fused kernel runs through the Pallas interpreter; the counter-based
hash PRNG is bit-identical between interpreter and compiled TPU (verified on
hardware), so these tests exercise the same numerics the chip runs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pertrenderer_tpu as pt
from pertrenderer_tpu.ops import fused_render as fr
from pertrenderer_tpu.transforms import Rotate, so3_exp_map

KEY = jax.random.PRNGKey(3)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    yield


def _build(noise="softras", imsize=16, k=16, s=4, shade="phong",
           textures="uv", lights_kind="point", perspective_correct=False,
           cull=False, n_views=1):
    from pertrenderer_tpu.experiments.harness import make_smoothers

    mesh = pt.load_cube().scale_verts(2.0)
    if textures == "vertex":
        mesh = mesh.with_textures(pt.TexturesVertex(
            jnp.linspace(0.1, 1.0, mesh.max_verts * 3).reshape(
                1, mesh.max_verts, 3)))
    if n_views > 1:
        mesh = mesh.extend(n_views)
    r, t = pt.look_at_view_transform(
        dist=6.7, elev=jnp.linspace(20.0, 40.0, n_views),
        azim=jnp.linspace(100.0, 140.0, n_views))
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    if lights_kind == "point":
        lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    else:
        lights = pt.DirectionalLights.create(direction=(0.3, -1.0, 0.2))
    sigma, gamma = 1e-2, 5e-1
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=blur, faces_per_pixel=k,
        perspective_correct=perspective_correct, cull_backfaces=cull)
    sr, sa = make_smoothers(noise, sigma, gamma, 1.0, s)
    cls = pt.RandomPhongShader if shade == "phong" else pt.RandomSimpleShader
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=cls.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.1, 0.2)),
            smoothrast=sr, smoothagg=sa))
    return mesh, cameras, lights, renderer


def _render(renderer, mesh, cameras, lights, key, fused):
    os.environ["PERTRENDERER_FUSED"] = "interpret" if fused else "off"
    try:
        return np.asarray(renderer(mesh, key=key, cameras=cameras,
                                   lights=lights))
    finally:
        os.environ["PERTRENDERER_FUSED"] = "interpret"


@pytest.mark.parametrize("noise", ["softras", "hard", "uniform"])
def test_deterministic_forward_parity(noise):
    mesh, cameras, lights, renderer = _build(noise)
    a = _render(renderer, mesh, cameras, lights, KEY, True)
    b = _render(renderer, mesh, cameras, lights, KEY, False)
    assert (b[..., 3] > 0.5).sum() > 20          # scene actually visible
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.parametrize("kw", [
    dict(shade="simple"),
    dict(textures="vertex"),
    dict(lights_kind="directional"),
    dict(perspective_correct=True),
    dict(cull=True),
    dict(n_views=2),
    dict(imsize=12),                  # p_tile padding path (144 px)
])
def test_variant_forward_parity(kw):
    mesh, cameras, lights, renderer = _build("softras", **kw)
    a = _render(renderer, mesh, cameras, lights, KEY, True)
    b = _render(renderer, mesh, cameras, lights, KEY, False)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_deterministic_gradient_parity():
    """Full-chain gradients through the fused kernel == XLA path, for every
    leaf the experiments differentiate: pose, sigma/gamma/alpha, light
    location and camera pose scalars."""
    mesh, cameras, lights, renderer = _build("softras")

    def loss(log_rot, sigma, gamma, alpha, light_loc, elev, fused):
        os.environ["PERTRENDERER_FUSED"] = "interpret" if fused else "off"
        r, t = pt.look_at_view_transform(dist=6.7, elev=elev, azim=120.0)
        cam = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
        rr = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sigma, gamma=gamma, alpha=alpha))
        lg = pt.PointLights.create(location=light_loc)
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(Rotate(rot).transform_points(
            mesh.verts_padded()))
        img = rr(pred, key=KEY, cameras=cam, lights=lg)
        tgt = jnp.linspace(0, 1, img.size).reshape(img.shape)
        return jnp.mean((img - tgt) ** 2)      # includes the alpha channel

    args = (jnp.array([[0.1, -0.2, 0.3]]), jnp.asarray(1e-2),
            jnp.asarray(5e-1), jnp.asarray(1.0),
            jnp.array([[0.0, 2.0, -2.0]]), jnp.asarray(30.0))
    gf = jax.grad(loss, argnums=tuple(range(6)))(*args, True)
    gx = jax.grad(loss, argnums=tuple(range(6)))(*args, False)
    names = ["log_rot", "sigma", "gamma", "alpha", "light", "elev"]
    for n, a, b in zip(names, gf, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-10)
        assert np.abs(a - b).max() / scale < 1e-3, (n, a, b)


def test_texture_gradient_parity():
    mesh, cameras, lights, renderer = _build("softras", textures="vertex")

    def loss(feats, fused):
        os.environ["PERTRENDERER_FUSED"] = "interpret" if fused else "off"
        m = mesh.with_textures(pt.TexturesVertex(feats))
        img = renderer(m, key=KEY, cameras=cameras, lights=lights)
        return jnp.mean(img[..., :3] ** 2)

    feats = jnp.linspace(0.1, 1.0, mesh.max_verts * 3).reshape(
        1, mesh.max_verts, 3)
    a = np.asarray(jax.grad(loss)(feats, True))
    b = np.asarray(jax.grad(loss)(feats, False))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6 * max(
        1.0, np.abs(b).max()))


def test_fused_estimator_stats():
    """The in-kernel MC replay functions are unbiased: perturbed-Heaviside
    forward/backward match the Gaussian closed forms, and the perturbed-
    argmax gradients (incl. the channel-count-compensated gamma term) match
    the XLA custom-VJP estimator in expectation."""
    from scipy.stats import norm

    cfg = fr.FusedConfig(
        image_size=16, f_pad=8, f_real=8, k=12, p_tile=256, blur_radius=0.0,
        rast_kind="mc", rast_noise="gaussian", rast_vr=True, s_rast=64,
        agg_kind="mc", agg_noise="gaussian", agg_vr=True, s_agg=64,
        eps_bg=1e-10, shade="phong", light_kind="point", tex_mode="corner",
        tex_d=9, atlas_r=0, clip_bary=False, perspective_correct=False,
        interpret=True)
    p = 256
    pos = jnp.arange(p, dtype=jnp.int32).reshape(1, p)
    d = jnp.linspace(-0.03, 0.03, 8 * p).reshape(8, p)
    sigma = 0.01
    nk = 24
    fwd = sum(fr._mc_rast_forward(cfg, d, sigma, jnp.int32(100 + i),
                                  jnp.int32(7), pos) for i in range(nk)) / nk
    np.testing.assert_allclose(np.asarray(fwd),
                               norm.cdf(np.asarray(d) / sigma), atol=0.05)
    coeff = sum(fr._mc_rast_coeff(cfg, d, sigma, jnp.int32(100 + i),
                                  jnp.int32(7), pos) for i in range(nk)) / nk
    ref = norm.pdf(np.asarray(d) / sigma) / sigma
    assert np.abs(np.asarray(coeff) - ref).max() / ref.max() < 0.15

    # argmax gamma-gradient vs the XLA estimator (channel compensation)
    from pertrenderer_tpu.ops.perturbed import perturbed_argmax
    c = cfg.c_zpad
    z = jnp.concatenate([jnp.linspace(-1, 1, 9 * p).reshape(9, p),
                         jnp.full((c - 9, p), -jnp.inf)], 0)
    g = jnp.concatenate([jnp.linspace(0.5, 1.5, 9 * p).reshape(9, p),
                         jnp.zeros((c - 9, p))], 0)
    zx = jnp.moveaxis(jnp.concatenate(
        [z[:9], jnp.full((cfg.k + 1 - 9, p), -jnp.inf)], 0), 0, -1)
    gx_ = jnp.moveaxis(jnp.concatenate(
        [g[:9], jnp.zeros((cfg.k + 1 - 9, p))], 0), 0, -1)
    nk = 16
    acc_f = acc_x = 0.0
    for i in range(nk):
        _, gg = fr._mc_agg_grads(cfg, z, g, 0.3, jnp.int32(10 + i),
                                 jnp.int32(3), pos)
        acc_f += float(jnp.sum(gg)) / nk

        def f(gam):
            w = perturbed_argmax(zx, gam, jax.random.PRNGKey(i), 64,
                                 "gaussian", True)
            return jnp.sum(w * gx_)
        acc_x += float(jax.grad(f)(jnp.asarray(0.3))) / nk
    assert abs(acc_f - acc_x) / abs(acc_x) < 0.05, (acc_f, acc_x)


def test_eligibility_fallbacks():
    """Configurations outside the fused envelope return None (XLA path)."""
    mesh, cameras, lights, renderer = _build("softras")
    sh = renderer.shader
    settings = renderer.rasterizer.raster_settings
    mats = pt.Materials.create()

    plan = fr._plan(mesh, cameras, lights, mats, sh.smoothrast, sh.smoothagg,
                    settings, "phong")
    assert plan is not None

    # F > faces_per_pixel: streaming mode (exact, K-free); with streaming
    # disabled this size has no binned fallback and returns to XLA
    import dataclasses
    small_k = dataclasses.replace(settings, faces_per_pixel=4)
    plan_k = fr._plan(mesh, cameras, lights, mats, sh.smoothrast,
                      sh.smoothagg, small_k, "phong")
    assert plan_k is not None and plan_k.stream
    import os
    os.environ["PERTRENDERER_STREAM"] = "off"
    try:
        assert fr._plan(mesh, cameras, lights, mats, sh.smoothrast,
                        sh.smoothagg, small_k, "phong") is None
    finally:
        os.environ.pop("PERTRENDERER_STREAM", None)

    # UV texture without the baked-atlas fast path
    tex = mesh.textures
    mesh_uv = mesh.with_textures(dataclasses.replace(tex, atlas_size=0))
    assert fr._plan(mesh_uv, cameras, lights, mats, sh.smoothrast,
                    sh.smoothagg, settings, "phong") is None

    # sharded MC-sample axis (pmean inside the estimator) stays on XLA
    sr = pt.GaussianRast.create(sigma=1e-2, nb_samples=4, sample_axis="s")
    assert fr._plan(mesh, cameras, lights, mats, sr, sh.smoothagg, settings,
                    "phong") is None

    # textureless meshes raise in the XLA path too
    assert fr._plan(mesh.replace(textures=None), cameras, lights, mats,
                    sh.smoothrast, sh.smoothagg, settings, "phong") is None


def _build_sphere(imsize=128, k=64, subdiv=2):
    verts, faces = pt.make_icosphere(subdiv)          # subdiv 2 -> 320 faces
    mesh = pt.Meshes.create(verts, faces, textures=pt.TexturesVertex(
        jnp.linspace(0.2, 1.0, verts.shape[0] * 3).reshape(1, -1, 3)))
    r, t = pt.look_at_view_transform(dist=2.7, elev=20.0, azim=50.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=blur, faces_per_pixel=k, bin_size=0,
        max_faces_per_bin=50000)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.SoftRast.create(sigma=sigma),
            smoothagg=pt.SoftAgg.create(gamma=gamma)))
    return mesh, cameras, lights, renderer


def test_binned_forward_and_gradient_parity(monkeypatch):
    """Binned mode (slots = bin-local face lists) matches the staged path on
    a mesh too large for flat slots, forward and backward — including the
    take_rows scatter of per-tile table gradients back to faces.

    Streaming handles this size by default; PERTRENDERER_STREAM=off keeps
    the M-binned path under test (config-5-scale meshes still use it).
    Semantics are p_tile-independent (position-keyed PRNG), so the tile
    width is shrunk to keep the interpreter run fast.
    """
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    monkeypatch.setattr(fr, "_BIN_P_TILE", 32)
    mesh, cameras, lights, renderer = _build_sphere(imsize=64)
    cfg = fr._plan(mesh, cameras, lights, pt.Materials.create(),
                   renderer.shader.smoothrast, renderer.shader.smoothagg,
                   renderer.rasterizer.raster_settings, "phong")
    assert cfg is not None and cfg.binned

    a = _render(renderer, mesh, cameras, lights, KEY, True)
    b = _render(renderer, mesh, cameras, lights, KEY, False)
    assert (b[..., 3] > 0.5).sum() > 100
    np.testing.assert_allclose(a, b, atol=2e-5)

    def loss(v, sig, gam, fused):
        os.environ["PERTRENDERER_FUSED"] = "interpret" if fused else "off"
        rr = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sig, gamma=gam))
        img = rr(mesh.update_padded(v), key=KEY, cameras=cameras,
                 lights=lights)
        return jnp.mean(img ** 2)

    args = (mesh.verts, jnp.asarray(1e-3), jnp.asarray(1e-2))
    gf = jax.grad(loss, argnums=(0, 1, 2))(*args, True)
    gx = jax.grad(loss, argnums=(0, 1, 2))(*args, False)
    for n, x, y in zip(["verts", "sigma", "gamma"], gf, gx):
        x, y = np.asarray(x), np.asarray(y)
        assert np.abs(x - y).max() / max(np.abs(y).max(), 1e-12) < 1e-3, n


def test_binned_capacity_gate(monkeypatch):
    """Configurations where the M-slot budget could silently drop faces now
    run the streaming mode (exact at any density); with streaming disabled
    they fall back to the staged XLA path as before."""
    mesh, cameras, lights, renderer = _build_sphere(imsize=64)
    cfg = fr._plan(mesh, cameras, lights, pt.Materials.create(),
                   renderer.shader.smoothrast, renderer.shader.smoothagg,
                   renderer.rasterizer.raster_settings, "phong")
    assert cfg is not None and cfg.stream
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    cfg = fr._plan(mesh, cameras, lights, pt.Materials.create(),
                   renderer.shader.smoothrast, renderer.shader.smoothagg,
                   renderer.rasterizer.raster_settings, "phong")
    assert cfg is None   # 64^2 with 128-wide tiles: no sub-row binning


@pytest.mark.parametrize("noise,loss_kind", [
    ("softras", "l2_rgb"), ("softras", "l1_rgb"), ("gaussian", "l2_rgb"),
])
def test_render_loss_single_kernel_parity(noise, loss_kind):
    """value_and_grad of renderer.render_loss (ONE fused kernel computing
    loss + gradients with the image-loss cotangent derived in-kernel) ==
    value_and_grad of the manual mean-over-rendered-image composition.

    For the stochastic menu both sides run the same fused forward with the
    same position-keyed noise, so the match is exact, not statistical."""
    mesh, cameras, lights, renderer = _build(noise, s=4)
    tgt = jnp.linspace(0.0, 1.0, 16 * 16 * 3).reshape(1, 16, 16, 3)

    def manual(log_rot, sigma, gamma, alpha):
        rr = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sigma, gamma=gamma, alpha=alpha))
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(Rotate(rot).transform_points(
            mesh.verts_padded()))
        img = rr(pred, key=KEY, cameras=cameras, lights=lights)
        d = img[..., :3] - tgt
        return (jnp.mean(jnp.abs(d)) if loss_kind == "l1_rgb"
                else jnp.mean(d ** 2))

    def fused_loss(log_rot, sigma, gamma, alpha):
        rr = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sigma, gamma=gamma, alpha=alpha))
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(Rotate(rot).transform_points(
            mesh.verts_padded()))
        return rr.render_loss(pred, tgt, key=KEY, loss_kind=loss_kind,
                              cameras=cameras, lights=lights)

    args = (jnp.array([[0.1, -0.2, 0.3]]), jnp.asarray(1e-2),
            jnp.asarray(5e-1), jnp.asarray(1.0))
    la, ga = jax.value_and_grad(manual, argnums=(0, 1, 2, 3))(*args)
    lb, gb = jax.value_and_grad(fused_loss, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for n, x, y in zip(["log_rot", "sigma", "gamma", "alpha"], ga, gb):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1e-10)
        assert np.abs(x - y).max() / scale < 1e-4, (n, x, y)


@pytest.mark.parametrize("noise,loss_kind", [
    ("softras", "l2_rgb"), ("softras", "l1_rgb"), ("gaussian", "l2_rgb"),
    ("hard", "l2_rgb"),
])
def test_render_loss_stream_kernel_parity(noise, loss_kind):
    """Streaming-mode render_loss (the two-sweep loss+grad kernel deriving
    the image-loss cotangent in place after the replay sweep) must match
    value_and_grad through the separate stream forward+backward kernels.
    Both sides replay identical position-keyed noise, so the match is
    exact."""
    # k < F routes to streaming mode (cube F=12 > k=4).
    mesh, cameras, lights, renderer = _build(noise, k=4, s=4)
    sh = renderer.shader
    cfg = fr._plan(mesh, cameras, lights, sh.materials, sh.smoothrast,
                   sh.smoothagg, renderer.rasterizer.raster_settings,
                   "phong")
    assert cfg is not None and cfg.stream
    tgt = jnp.linspace(0.0, 1.0, 16 * 16 * 3).reshape(1, 16, 16, 3)

    def step(log_rot, sigma, gamma, alpha, fused_loss):
        rr = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sigma, gamma=gamma, alpha=alpha))
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(Rotate(rot).transform_points(
            mesh.verts_padded()))
        if fused_loss:
            return rr.render_loss(pred, tgt, key=KEY, loss_kind=loss_kind,
                                  cameras=cameras, lights=lights)
        img = rr(pred, key=KEY, cameras=cameras, lights=lights)
        d = img[..., :3] - tgt
        return (jnp.mean(jnp.abs(d)) if loss_kind == "l1_rgb"
                else jnp.mean(d ** 2))

    args = (jnp.array([[0.1, -0.2, 0.3]]), jnp.asarray(1e-2),
            jnp.asarray(5e-1), jnp.asarray(1.0))
    la, ga = jax.value_and_grad(step, argnums=(0, 1, 2, 3))(*args, False)
    lb, gb = jax.value_and_grad(step, argnums=(0, 1, 2, 3))(*args, True)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for n, x, y in zip(["log_rot", "sigma", "gamma", "alpha"], ga, gb):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1e-10)
        assert np.abs(x - y).max() / scale < 1e-4, (n, x, y)


def test_render_loss_fallback_matches():
    """On ineligible configs render_loss reduces the rendered image exactly
    like the reference's manual loss."""
    os.environ["PERTRENDERER_FUSED"] = "off"
    mesh, cameras, lights, renderer = _build("softras")
    tgt = jnp.linspace(0.0, 1.0, 16 * 16 * 3).reshape(1, 16, 16, 3)
    img = renderer(mesh, key=KEY, cameras=cameras, lights=lights)
    want = jnp.mean((img[..., :3] - tgt) ** 2)
    got = renderer.render_loss(mesh, tgt, key=KEY, cameras=cameras,
                               lights=lights)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_fixed_noise_is_key_independent():
    """fixed_noise aggregators reseed deterministically
    (`/root/reference/randomras/smoothagg.py:18-19`): the fused render must
    produce identical aggregation noise for different caller keys."""
    from pertrenderer_tpu.experiments.harness import make_smoothers

    mesh, cameras, lights, renderer = _build("softras")
    sr, _ = make_smoothers("gaussian", 1e-2, 5e-1, 1.0, 4)
    agg = pt.GaussianAgg.create(gamma=5e-1, nb_samples=4, fixed_noise=True)
    # Deterministic coverage (SoftRast) isolates the aggregation noise.
    renderer = renderer.replace(shader=renderer.shader.replace(
        smoothrast=pt.SoftRast.create(sigma=1e-2), smoothagg=agg))
    a = _render(renderer, mesh, cameras, lights, jax.random.PRNGKey(7), True)
    b = _render(renderer, mesh, cameras, lights, jax.random.PRNGKey(99),
                True)
    np.testing.assert_array_equal(a, b)


def test_render_loss_simple_shader():
    """The texel-only shader (shade='none') goes through the single-kernel
    loss path too."""
    mesh, cameras, lights, renderer = _build("softras", shade="simple")
    tgt = jnp.linspace(0.0, 1.0, 16 * 16 * 3).reshape(1, 16, 16, 3)
    got = renderer.render_loss(mesh, tgt, key=KEY, cameras=cameras,
                               lights=lights)
    os.environ["PERTRENDERER_FUSED"] = "off"
    img = renderer(mesh, key=KEY, cameras=cameras, lights=lights)
    want = jnp.mean((img[..., :3] - tgt) ** 2)
    os.environ["PERTRENDERER_FUSED"] = "interpret"
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_gaussian_forward_expectation():
    """Stochastic menu: fused and XLA forwards agree in expectation."""
    mesh, cameras, lights, renderer = _build("gaussian", imsize=12, k=16,
                                             s=16)
    nk = 4
    acc_f = acc_x = 0.0
    for i in range(nk):
        kk = jax.random.PRNGKey(100 + i)
        acc_f = acc_f + _render(renderer, mesh, cameras, lights, kk, True)
        acc_x = acc_x + _render(renderer, mesh, cameras, lights, kk, False)
    diff = np.abs(acc_f / nk - acc_x / nk)
    # 64 samples/pixel of (bounded) one-hot weights: ~4 sigma tolerance
    assert diff.max() < 0.25, diff.max()
    assert diff.mean() < 0.02


def test_prng_probe_matches_committed_goldens():
    """The CPU interpreter-mode hash-PRNG stream is pinned to the committed
    goldens bit-exactly (all three probe modes); bench.py closes the loop on
    the chip with the three-level pin (uniform stage bit-exact everywhere;
    compiled==interpreter on-chip; gaussian/cauchy within tolerance of these
    CPU values — TPU transcendentals round differently than CPU libm, so
    cross-platform bit-identity holds only for the integer/uniform stage)."""
    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "prng_goldens.npz")
    ref = np.load(path)
    for nt in ("uniform", "gaussian", "cauchy"):
        got = np.asarray(fr.prng_probe(nt, interpret=True))
        np.testing.assert_array_equal(got, ref[nt])


# ---------------------------------------------------------------------------
# Flat-mode per-tile face packing (cfg.pack_m)
# ---------------------------------------------------------------------------

def _build_tiled(noise, monkeypatch, imsize=32, s=4):
    """A scene whose tiling produces genuinely packed (code 2) tiles:
    forcing 128-pixel strips at 32^2 gives 8 tiles, several holding <= 7
    of the cube's 12 faces in band."""
    monkeypatch.setenv("PERTRENDERER_PTILE", "128")
    return _build(noise, imsize=imsize, k=50, s=s)


def _pack_codes(mesh, cameras, lights, renderer):
    from pertrenderer_tpu.lights import Materials

    cfg = fr._plan(mesh, cameras, lights, Materials.create(),
                   renderer.shader.smoothrast, renderer.shader.smoothagg,
                   renderer.rasterizer.raster_settings, "phong",
                   assume_available=True)
    assert cfg is not None and cfg.pack_m == 8
    verts_ndc = cameras.transform_points_ndc(mesh.verts)
    fv = jax.vmap(fr._gather_rows)(verts_ndc,
                                   jnp.maximum(mesh.faces, 0))[0]
    fv = jnp.pad(fv, ((0, cfg.f_pad - mesh.max_faces), (0, 0)))
    valid = jnp.pad(jnp.ones((mesh.max_faces, 1)),
                    ((0, cfg.f_pad - mesh.max_faces), (0, 0)))
    codes, ids = fr._pack_tiles(cfg, fv, valid,
                                jnp.float32(cfg.blur_radius))
    return cfg, np.asarray(codes).ravel(), np.asarray(ids)[..., 0]


def test_pack_tiles_prepass(monkeypatch):
    """_pack_tiles codes/ids vs the overlap matrix: code 2 exactly when
    0 < count <= pack_m - 1; its id list holds exactly the overlapping
    faces (ascending) padded with the f_pad sentinel, background row last."""
    mesh, cameras, lights, renderer = _build_tiled("softras", monkeypatch)
    cfg, codes, ids = _pack_codes(mesh, cameras, lights, renderer)
    verts_ndc = cameras.transform_points_ndc(mesh.verts)
    fv = jax.vmap(fr._gather_rows)(verts_ndc,
                                   jnp.maximum(mesh.faces, 0))[0]
    fv = jnp.pad(fv, ((0, cfg.f_pad - mesh.max_faces), (0, 0)))
    validb = jnp.pad(jnp.ones((mesh.max_faces,), bool),
                     (0, cfg.f_pad - mesh.max_faces))
    ov = np.asarray(fr._tile_face_overlap(cfg, fv, validb,
                                          jnp.float32(cfg.blur_radius)))
    counts = ov.sum(1)
    assert (codes == np.where(counts == 0, 0,
                              np.where(counts <= 7, 2, 1))).all()
    assert 2 in codes and 1 in codes and 0 in codes
    for t in np.nonzero(codes == 2)[0]:
        want = list(np.nonzero(ov[t])[0])
        want = want + [cfg.f_pad] * (cfg.pack_m - len(want))
        assert ids[t].tolist() == want, (t, ids[t], want)


@pytest.mark.parametrize("noise", ["softras", "hard"])
def test_packed_deterministic_parity(noise, monkeypatch):
    """Deterministic members: packed tiles are EXACT — forward image and
    every render_loss gradient match the pack-disabled run (the excluded
    faces are provably out-of-band for every pixel of a packed tile, and
    the one-hot gather/scatter matmuls run at HIGHEST precision)."""
    mesh, cameras, lights, renderer = _build_tiled(noise, monkeypatch)
    cfg, codes, _ = _pack_codes(mesh, cameras, lights, renderer)
    assert 2 in codes   # the scene genuinely exercises the packed branch
    tgt = jnp.linspace(0.0, 1.0, 32 * 32 * 3).reshape(1, 32, 32, 3)

    def run():
        img = np.asarray(renderer(mesh, key=KEY, cameras=cameras,
                                  lights=lights))

        def loss(log_rot):
            rot = so3_exp_map(log_rot)
            pred = mesh.update_padded(Rotate(rot).transform_points(
                mesh.verts_padded()))
            return renderer.render_loss(pred, tgt, key=KEY,
                                        cameras=cameras, lights=lights)
        l, g = jax.value_and_grad(loss)(jnp.array([[0.1, -0.2, 0.3]]))
        return img, float(l), np.asarray(g)

    img1, l1, g1 = run()
    monkeypatch.setenv("PERTRENDERER_PACK", "off")
    img0, l0, g0 = run()
    np.testing.assert_allclose(img1, img0, atol=1e-6)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-9)


def test_packed_mc_statistics(monkeypatch):
    """MC members: packed tiles draw the row-indexed noise streams of their
    packed positions (fresh-but-valid realizations), so packed and unpacked
    runs agree in EXPECTATION, not bitwise.  Key-averaged forward images
    must match within MC error; replay consistency within one key is pinned
    by test_render_loss_single_kernel_parity (both sides pack)."""
    mesh, cameras, lights, renderer = _build_tiled("gaussian", monkeypatch,
                                                   s=8)
    cfg, codes, _ = _pack_codes(mesh, cameras, lights, renderer)
    assert 2 in codes
    nk = 12

    def mean_img():
        acc = 0.0
        for i in range(nk):
            acc = acc + np.asarray(renderer(
                mesh, key=jax.random.PRNGKey(50 + i), cameras=cameras,
                lights=lights))
        return acc / nk

    m1 = mean_img()
    monkeypatch.setenv("PERTRENDERER_PACK", "off")
    m0 = mean_img()
    diff = np.abs(m1 - m0)
    # 96 one-hot samples/pixel: ~4 sigma
    assert diff.max() < 0.3, diff.max()
    assert diff.mean() < 0.02


def test_sat_overlap_conservative(monkeypatch):
    """The separating-axis tile/face overlap refinement is conservative:
    every (tile, face) pair it prunes has zero candidate pixels (the
    in-band test of _make_det1) — brute-forced per pixel over random
    poses.  A false prune would silently blank coverage."""
    from pertrenderer_tpu.ops.rasterize import _face_pixel_geometry

    monkeypatch.setenv("PERTRENDERER_PTILE", "128")
    mesh0, cameras, lights, renderer = _build("softras", imsize=32, k=50)
    from pertrenderer_tpu.lights import Materials

    cfg = fr._plan(mesh0, cameras, lights, Materials.create(),
                   renderer.shader.smoothrast, renderer.shader.smoothagg,
                   renderer.rasterizer.raster_settings, "phong",
                   assume_available=True)
    h = w = cfg.image_size
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(((w - 1.0 - 2.0 * xs) / w).ravel()[None])
    py = jnp.asarray(((h - 1.0 - 2.0 * ys) / h).ravel()[None])
    rng = np.random.RandomState(7)
    for _ in range(3):
        wv = rng.randn(3)
        wv = wv / np.linalg.norm(wv) * np.deg2rad(rng.uniform(0, 180))
        rot = so3_exp_map(jnp.asarray(wv)[None])
        mesh = mesh0.update_padded(Rotate(rot).transform_points(
            mesh0.verts_padded()))
        fv = jax.vmap(fr._gather_rows)(
            cameras.transform_points_ndc(mesh.verts),
            jnp.maximum(mesh.faces, 0))[0]
        f = mesh.max_faces
        fv_pad = jnp.pad(fv, ((0, cfg.f_pad - f), (0, 0)))
        validb = jnp.pad(jnp.ones((f,), bool), (0, cfg.f_pad - f))
        ov = np.asarray(fr._tile_face_overlap(
            cfg, fv_pad, validb, jnp.float32(cfg.blur_radius)))
        coords = [fv_pad[:, i:i + 1] for i in range(9)]
        w0, w1, w2, z, dist, inside, degen = _face_pixel_geometry(
            px, py, *coords, cfg.clip_bary, cfg.perspective_correct)
        cand = np.asarray((inside | (dist <= cfg.blur_radius))
                          & ~degen).reshape(cfg.f_pad, h, w)
        p = cfg.p_tile
        for t in range(ov.shape[0]):
            pruned = np.nonzero(~ov[t, :f])[0]
            if not len(pruned):
                continue
            r0, r1 = (t * p) // w, min(((t + 1) * p - 1) // w + 1, h)
            assert not cand[pruned, r0:r1].any(), (t, pruned)
