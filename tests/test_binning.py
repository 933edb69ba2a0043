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


# ---------------------------------------------------------------------------
# Y-sorted contiguous-range binning (fused kernel, high-poly table delivery)
# ---------------------------------------------------------------------------

def _fused_cfg(**kw):
    from pertrenderer_tpu.ops import fused_render as fr

    base = dict(image_size=256, f_pad=176, f_real=176, k=50, p_tile=128,
                blur_radius=1e-4, rast_kind="mc", rast_noise="gaussian",
                rast_vr=True, s_rast=2, agg_kind="mc", agg_noise="gaussian",
                agg_vr=True, s_agg=2, eps_bg=1e-10, shade="phong",
                light_kind="point", tex_mode="corner", tex_d=9, atlas_r=0,
                clip_bary=False, perspective_correct=False, interpret=True,
                binned=True)
    base.update(kw)
    return fr.FusedConfig(**base)


def _face_tables(mesh, cams):
    from pertrenderer_tpu.ops import fused_render as fr

    verts_ndc = cams.transform_points_ndc(mesh.verts)
    fv_ndc = jax.vmap(fr._gather_rows)(verts_ndc,
                                       jnp.maximum(mesh.faces, 0))[0]
    return fv_ndc, jnp.ones((fv_ndc.shape[0],), jnp.float32)


def test_sorted_range_selection_matches_direct():
    """The y-sorted contiguous-range table path selects EXACTLY the same
    per-tile face sets (and tables) as the direct per-tile nearest-M top_k,
    whenever no group range overflows; slot order may differ only on exact
    min-depth ties (the blend is slot-permutation-invariant)."""
    from pertrenderer_tpu.ops import fused_render as fr
    from pertrenderer_tpu.ops.gather import take_rows

    mesh, cams = _scene(3)
    fv_ndc, validf = _face_tables(mesh, cams)
    cfg = _fused_cfg()
    merged = jnp.concatenate([fv_ndc, fv_ndc * 2.0, fv_ndc * 3.0], axis=-1)

    ids_d, counts_d = fr._bin_face_ids(cfg, fv_ndc, validf,
                                       cfg.blur_radius)
    tiles_d = take_rows(merged, ids_d)
    tiles_s, ids_s, counts_s, max_range = fr._binned_tables_sorted(
        cfg, merged, fv_ndc, validf, cfg.blur_radius)

    assert int(max_range) <= fr._RANGE_MAX
    np.testing.assert_array_equal(np.asarray(counts_d), np.asarray(counts_s))
    np.testing.assert_array_equal(np.asarray(ids_d >= 0),
                                  np.asarray(ids_s >= 0))
    # Same face sets per tile: compare row-sorted tables (rows unique per
    # face since the fake merged table is injective in the face).
    a = np.sort(np.asarray(tiles_d), axis=1)
    b = np.sort(np.asarray(tiles_s), axis=1)
    np.testing.assert_allclose(a, b, atol=0)


def test_sorted_range_render_parity(monkeypatch):
    """End-to-end fused binned render through the y-sorted path == the
    direct-top_k path exactly for a deterministic (softras) config."""
    from pertrenderer_tpu.ops import fused_render as fr

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    mesh, cams = _scene(3)
    mesh = mesh.with_textures(pt.TexturesVertex(
        jnp.linspace(0.2, 1.0, mesh.max_verts * 3).reshape(
            1, mesh.max_verts, 3)))
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    settings = pt.RasterizationSettings(image_size=256, blur_radius=1e-4,
                                        faces_per_pixel=50)
    ren = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cams,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cams, lights=lights,
            blend_params=pt.BlendParams(sigma=1e-3, gamma=1e-2,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.SoftRast.create(sigma=1e-3),
            smoothagg=pt.SoftAgg.create(gamma=1e-2)))
    key = jax.random.PRNGKey(0)
    img_direct = np.asarray(ren(mesh, key=key))
    monkeypatch.setattr(fr, "_COARSE_THRESHOLD", 512)  # force sorted path
    img_sorted = np.asarray(ren(mesh, key=key))
    assert (np.asarray(img_direct[..., 3]) > 0).any()
    np.testing.assert_allclose(img_sorted, img_direct, atol=2e-6)


def test_bin_overflow_detection():
    """An over-capacity scene triggers the runtime overflow warning (and
    error mode raises); 'allow' is silent."""
    import warnings

    from pertrenderer_tpu.ops import fused_render as fr

    mesh, cams = _scene(3)
    fv_ndc, validf = _face_tables(mesh, cams)
    cfg = _fused_cfg(f_pad=16, f_real=16)   # tiny M -> guaranteed overflow
    _, counts = fr._bin_face_ids(cfg, fv_ndc, validf, cfg.blur_radius)
    assert int(jnp.max(counts)) > cfg.f_pad

    settings = pt.RasterizationSettings(image_size=256, bin_overflow="warn")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fr._check_bin_overflow(cfg, settings, jnp.max(counts), None)
        jax.effects_barrier()
    assert any("capacity exceeded" in str(w.message) for w in rec)

    settings_err = pt.RasterizationSettings(image_size=256,
                                            bin_overflow="error")
    raised = False
    try:
        fr._check_bin_overflow(cfg, settings_err, jnp.max(counts), None)
        jax.effects_barrier()
    except Exception:
        raised = True
    assert raised

    settings_allow = pt.RasterizationSettings(image_size=256,
                                              bin_overflow="allow")
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        fr._check_bin_overflow(cfg, settings_allow, jnp.max(counts), None)
        jax.effects_barrier()
    assert not rec2


# ---------------------------------------------------------------------------
# Streaming chunked mode (mid/high coverage, no slot caps)
# ---------------------------------------------------------------------------

def _stream_scene(imsize=64, k=50, perturb=False):
    verts, faces = make_icosphere(3)
    if perturb:                      # break the sphere's exact-depth ties
        rng = np.random.RandomState(0)
        verts = verts * (1.0 + 0.03 * rng.rand(*verts.shape).astype(
            np.float32))
    mesh = pt.Meshes.create(verts, faces, textures=pt.TexturesVertex(
        jnp.linspace(0.2, 1.0, verts.shape[0] * 3).reshape(
            1, verts.shape[0], 3)))
    r, t = pt.look_at_view_transform(dist=2.7, elev=20.0, azim=40.0)
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(image_size=imsize, blur_radius=blur,
                                        faces_per_pixel=k)
    return mesh, cams, lights, settings, sigma, gamma


def _stream_renderer(cams, lights, settings, sr, sa, sigma, gamma):
    return pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cams,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cams, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.1, 0.2)),
            smoothrast=sr, smoothagg=sa))


def test_stream_mode_selected_and_matches_untruncated(monkeypatch):
    """Mid-poly meshes (F > K) take the streaming path at ANY image size,
    and reproduce the staged pipeline *without* top-K truncation exactly
    for the deterministic menu entries (streaming processes every candidate
    face — flat-mode slots-are-faces semantics at any density)."""
    import os

    from pertrenderer_tpu.ops import fused_render as fr
    from pertrenderer_tpu.lights import Materials

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    mesh, cams, lights, settings, sigma, gamma = _stream_scene()
    key = jax.random.PRNGKey(0)
    big_k = pt.RasterizationSettings(
        image_size=settings.image_size, blur_radius=settings.blur_radius,
        faces_per_pixel=300)

    for name, (sr, sa) in {
        "softras": (pt.SoftRast.create(sigma=sigma),
                    pt.SoftAgg.create(gamma=gamma)),
        "uniform": (pt.AffineRast.create(sigma=sigma), pt.HardAgg.create()),
    }.items():
        cfg = fr._plan(mesh, cams, lights, Materials.create(), sr, sa,
                       settings, "phong")
        assert cfg is not None and cfg.stream, name
        ren = _stream_renderer(cams, lights, settings, sr, sa, sigma, gamma)
        a = np.asarray(ren(mesh, key=key))
        os.environ["PERTRENDERER_FUSED"] = "off"
        ren_big = _stream_renderer(cams, lights, big_k, sr, sa, sigma,
                                   gamma)
        b = np.asarray(ren_big(mesh, key=key))
        os.environ["PERTRENDERER_FUSED"] = "interpret"
        assert (b[..., 3] > 0.5).mean() > 0.2
        # atol: the streamed online softmax accumulates in (y-bucket, x)
        # table order, not the staged path's face order — pure f32
        # reassociation drift, worst-case ~1e-5 on this scene.
        np.testing.assert_allclose(a, b, atol=3e-5, err_msg=name)


def test_stream_gradients_match_staged(monkeypatch):
    """Streaming backward == staged autodiff (untruncated) for every
    differentiated leaf, on a tie-free mesh."""
    import os

    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    mesh, cams, lights, _, sigma, gamma = _stream_scene(imsize=32,
                                                        perturb=True)
    key = jax.random.PRNGKey(0)
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)

    def loss(log_rot, sig, gam, alp, feats, k, fused):
        os.environ["PERTRENDERER_FUSED"] = "interpret" if fused else "off"
        settings = pt.RasterizationSettings(image_size=32, blur_radius=blur,
                                            faces_per_pixel=k)
        ren = _stream_renderer(
            cams, lights, settings, pt.SoftRast.create(sigma=sig),
            pt.SoftAgg.create(gamma=gam, alpha=alp), sigma, gamma)
        m = mesh.with_textures(pt.TexturesVertex(feats))
        rot = so3_exp_map(log_rot)
        pred = m.update_padded(Rotate(rot).transform_points(
            m.verts_padded()))
        img = ren(pred, key=key, cameras=cams, lights=lights)
        tgt = jnp.linspace(0, 1, img.size).reshape(img.shape)
        out = jnp.mean((img - tgt) ** 2)
        os.environ["PERTRENDERER_FUSED"] = "interpret"
        return out

    feats0 = jnp.linspace(0.2, 1.0, mesh.max_verts * 3).reshape(
        1, mesh.max_verts, 3)
    args = (jnp.array([[0.1, -0.2, 0.3]]), jnp.asarray(sigma),
            jnp.asarray(gamma), jnp.asarray(1.0), feats0)
    gf = jax.grad(loss, argnums=tuple(range(5)))(*args, 50, True)
    gx = jax.grad(loss, argnums=tuple(range(5)))(*args, 300, False)
    for n, a, b in zip(["log_rot", "sigma", "gamma", "alpha", "feats"],
                       gf, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-10)
        # 5e-4: scalar grads accumulate per-chunk in (y-bucket, x) table
        # order vs the staged path's face order — f32 reassociation only.
        assert np.abs(a - b).max() / scale < 5e-4, (n, a, b)


def test_stream_cow_and_sphere128(monkeypatch):
    """The two capability gaps streaming closes: the icosphere at 128^2
    (full-row tiles — the M-binned mode cannot hold the candidate load)
    and the cow-class mesh (few-k faces, far over M per tile).  MC render
    + gradients must run fused-streamed and stay finite."""
    from pertrenderer_tpu.ops import fused_render as fr
    from pertrenderer_tpu.lights import Materials
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    key = jax.random.PRNGKey(1)

    for scene, imsize in (("sphere", 128), ("cow", 48)):
        if scene == "sphere":
            verts, faces = make_icosphere(3)
            mesh = pt.Meshes.create(verts, faces,
                                    textures=pt.TexturesVertex(
                                        jnp.ones((1, verts.shape[0], 3))))
            dist = 2.7
        else:
            mesh = pt.make_cow()
            dist = 2.4
        r, t = pt.look_at_view_transform(dist=dist, elev=20.0, azim=40.0)
        cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
        lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
        sigma, gamma = 1e-3, 1e-2
        blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
        settings = pt.RasterizationSettings(image_size=imsize,
                                            blur_radius=blur,
                                            faces_per_pixel=50)
        sr = pt.GaussianRast.create(sigma=sigma, nb_samples=2)
        sa = pt.GaussianAgg.create(gamma=gamma, nb_samples=2)
        cfg = fr._plan(mesh, cams, lights, Materials.create(), sr, sa,
                       settings, "phong")
        assert cfg is not None and cfg.stream, scene
        ren = _stream_renderer(cams, lights, settings, sr, sa, sigma, gamma)

        def loss(log_rot):
            rot = so3_exp_map(log_rot)
            pred = mesh.update_padded(Rotate(rot).transform_points(
                mesh.verts_padded()))
            img = ren(pred, key=key, cameras=cams, lights=lights)
            return jnp.mean(img[..., :3] ** 2), img

        (val, img), g = jax.value_and_grad(loss, has_aux=True)(
            jnp.array([[0.05, -0.1, 0.2]]))
        assert np.isfinite(np.asarray(img)).all()
        assert (np.asarray(img)[..., 3] > 0.5).mean() > 0.02, scene
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0, scene


def test_stream_rolled_sample_loops_match_unrolled(monkeypatch):
    """Rolled (fori_loop) sample loops — the S > _UNROLL regime the harness
    reaches once annealing doubles nb_samples past 16 — must reproduce the
    unrolled straight-line loops.  Exercises the traced-index `_row_at` /
    `_row_set` lowering (iota-masked select; Mosaic has no value-level
    dynamic_slice) inside the streaming kernels."""
    import os

    from pertrenderer_tpu.ops import fused_render as fr
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    mesh, cams, lights, settings, sigma, gamma = _stream_scene(imsize=32,
                                                               perturb=True)
    key = jax.random.PRNGKey(2)
    sr = pt.GaussianRast.create(sigma=sigma, nb_samples=4)
    sa = pt.GaussianAgg.create(gamma=gamma, nb_samples=4)
    ren = _stream_renderer(cams, lights, settings, sr, sa, sigma, gamma)

    def loss(log_rot):
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(Rotate(rot).transform_points(
            mesh.verts_padded()))
        img = ren(pred, key=key, cameras=cams, lights=lights)
        return jnp.mean(img[..., :3] ** 2), img

    lr = jnp.array([[0.05, -0.1, 0.2]])
    (v_un, img_un), g_un = jax.value_and_grad(loss, has_aux=True)(lr)
    monkeypatch.setattr(fr, "_UNROLL", 0)       # force fori_loop everywhere
    (v_ro, img_ro), g_ro = jax.value_and_grad(loss, has_aux=True)(lr)

    np.testing.assert_array_equal(np.asarray(img_un), np.asarray(img_ro))
    np.testing.assert_allclose(np.asarray(g_un), np.asarray(g_ro),
                               rtol=0, atol=1e-6)
    assert float(jnp.abs(g_ro).sum()) > 0


def test_stream_cow_window_covers_mesh(monkeypatch):
    """Regression: the y-sorted window must hold every candidate face.
    With the old fixed 2048-row cap the cow-class mesh overflowed at every
    image size (the searchsorted start bound subtracts the global max face
    extent, pulling ~4100-5120 rows into each group's range), silently
    truncating ~27%% of covered pixels.  Hard-mode streaming must now match
    the staged path exactly."""
    import os

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    mesh = pt.make_cow()
    verts = mesh.verts[0]
    center = verts.mean(0)
    scale = jnp.max(jnp.abs(verts - center))
    mesh = mesh.offset_verts(
        -jnp.broadcast_to(center, verts.shape)).scale_verts(3.0 / scale)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    settings = pt.RasterizationSettings(image_size=48, blur_radius=0.0,
                                        faces_per_pixel=50)
    sr, sa = pt.HardRast.create(), pt.HardAgg.create()
    ren = _stream_renderer(cams, lights, settings, sr, sa, 1e-5, 1e-5)
    key = jax.random.PRNGKey(0)
    a = np.asarray(ren(mesh, key=key, cameras=cams, lights=lights))
    os.environ["PERTRENDERER_FUSED"] = "off"
    b = np.asarray(ren(mesh, key=key, cameras=cams, lights=lights))
    os.environ["PERTRENDERER_FUSED"] = "interpret"
    assert (b[..., 3] > 0.5).mean() > 0.1
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_stream_batch_multiview(monkeypatch):
    """Streaming mode with a BATCHED mesh (the multi-view config-3 path:
    try_render lax.map's ANY-space stream kernels over the batch).  Each
    batch element must equal the corresponding single-view render of the
    same scene batch (deterministic softras member, 2 distinct cameras)."""
    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    from pertrenderer_tpu.lights import Materials
    from pertrenderer_tpu.ops import fused_render as fr

    mesh, _, _, settings, sigma, gamma = _stream_scene(imsize=32, k=50)
    n = 2
    mesh_n = mesh.extend(n)
    r, t = pt.look_at_view_transform(dist=2.7, elev=jnp.array([20.0, 20.0]),
                                     azim=jnp.array([40.0, 220.0]))
    cams = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0), batch=n)
    sr, sa = pt.SoftRast.create(sigma=sigma), pt.SoftAgg.create(gamma=gamma)
    cfg = fr._plan(mesh_n, cams, lights, Materials.create(), sr, sa,
                   settings, "phong")
    assert cfg is not None and cfg.stream
    ren = _stream_renderer(cams, lights, settings, sr, sa, sigma, gamma)
    key = jax.random.PRNGKey(3)
    imgs = np.asarray(ren(mesh_n, key=key, cameras=cams, lights=lights))
    assert imgs.shape == (n, 32, 32, 4)
    assert np.isfinite(imgs).all()
    # views genuinely differ, and both see the object
    assert np.abs(imgs[0] - imgs[1]).max() > 0.05
    assert all((imgs[i][..., 3] > 0.5).mean() > 0.2 for i in range(n))
    # staged-path parity per element (untruncated K so top-K is not binding)
    monkeypatch.setenv("PERTRENDERER_FUSED", "off")
    big_k = pt.RasterizationSettings(
        image_size=settings.image_size, blur_radius=settings.blur_radius,
        faces_per_pixel=300)
    ren_big = _stream_renderer(cams, lights, big_k, sr, sa, sigma, gamma)
    ref = np.asarray(ren_big(mesh_n, key=key, cameras=cams, lights=lights))
    np.testing.assert_allclose(imgs, ref, atol=1e-5)
