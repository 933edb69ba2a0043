"""End-to-end experiment harness tests (small configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt
from pertrenderer_tpu.experiments import harness


def _setup(imsize=40, noise=("gaussian",)):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    meshes, cameras, lights, target_rgb, r_true, elev, azim = \
        harness.init_target(k1, imsize=imsize)
    log_rot_init, renderers = harness.init_renderers(
        cameras[0], lights, r_true, k2, pert_init_intensity=20.0,
        sigma=1e-3, gamma=1e-2, nb_samples=4, noise_type=noise,
        imsize=imsize, faces_per_pixel=20)
    return meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers


def test_pose_opt_reduces_angle_error():
    meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers = \
        _setup()
    res = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                renderers[0], target_rgb, Niter=120,
                                lr_init=3e-2, adapt_reg=False)
    ang0 = float(pt.so3_relative_angle(pt.so3_exp_map(log_rot_init),
                                       r_true)[0]) * 180 / np.pi
    ang1 = float(pt.so3_relative_angle(pt.so3_exp_map(res.best_log_rot),
                                       r_true)[0]) * 180 / np.pi
    assert ang1 < ang0 * 0.75, (ang0, ang1)
    assert res.losses.shape == (120,)
    assert np.isfinite(res.losses).all()
    # MC trajectories oscillate; the meaningful check is that optimization
    # found a better iterate than where it started (best-iterate tracking
    # mirrors the reference, eval.py:371-373).
    assert res.losses.min() < res.losses[:5].mean() * 0.8


def test_pose_opt_annealing_runs():
    meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers = \
        _setup()
    res = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                renderers[0], target_rgb, Niter=160,
                                lr_init=3e-2, adapt_reg=True,
                                adapt_params=(1.1, 1.1))
    assert res.losses.shape == (160,)
    assert np.isfinite(res.losses).all()


def test_pose_opt_annealing_at_sample_cap_reuses_compiled_scan():
    """Annealing with nb_samples already at the cap must not change the
    carry pytree under the compiled-scan cache.

    update_blur swaps blur_override None -> traced leaf; when the sample
    count stays fixed the (length, S) cache key is unchanged, so the
    AOT-compiled segment is reused with the post-anneal carry — a pytree
    structure mismatch (TypeError) unless the structure was pinned at
    entry.  This is exactly the config-5 tool's configuration
    (anneal_sample_cap == S), which crashed on chip before the pin."""
    meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers = \
        _setup()
    res = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                renderers[0], target_rgb, Niter=200,
                                lr_init=3e-2, adapt_reg=True,
                                adapt_params=(1.2, 1.2),
                                anneal_sample_cap=4)
    assert res.losses.shape == (200,)
    assert np.isfinite(res.losses).all()


def test_renderer_bank_all_noise_types():
    noise = ("cauchy", "gaussian", "gaussian_wovr", "uniform", "hard",
             "softras")
    meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers = \
        _setup(noise=noise)
    assert len(renderers) == len(noise)
    for nt, renderer in zip(noise, renderers):
        img = renderer(meshes, key=jax.random.PRNGKey(0),
                       cameras=cameras[0], lights=lights)
        assert np.isfinite(np.asarray(img)).all(), nt
        assert img.shape[-1] == 4


def test_scene_params_light_gradients():
    """The de-facto integration test of the reference
    (`/root/reference/experiments/eval.py:693-725`): light position receives
    gradients and the loss decreases."""
    key = jax.random.PRNGKey(2)
    param_to_check = {"camera": False, "vertices": False, "textures": False,
                      "light": True}
    (src_mesh, deform_init, verts_rgb_init, camera_elev, camera_azim,
     lights_location) = harness.init_base_mesh_cameras_lights(
        "sphere", param_to_check)
    src_mesh = src_mesh.with_textures(
        pt.TexturesVertex(jnp.ones_like(src_mesh.verts)))
    _, _, _, target_rgb, _, _, _ = harness.init_target(key, imsize=32)
    _, renderers = harness.init_renderers(
        None, None, jnp.eye(3)[None], key, sigma=1e-4, gamma=1e-3,
        nb_samples=4, noise_type=("gaussian",), imsize=32,
        faces_per_pixel=10)
    best, final, losses = harness.optimize_scene_params(
        src_mesh, camera_elev, camera_azim, lights_location, deform_init,
        verts_rgb_init, renderers[0], [target_rgb[0][None]], key=key,
        lr_init=5e-2, Niter=40, param_to_check=param_to_check)
    assert np.isfinite(losses).all()
    # the light actually moved
    assert float(jnp.abs(best["lights_location"] - lights_location).sum()) > 1e-3
    # frozen params did not move
    np.testing.assert_allclose(np.asarray(final["deform"]),
                               np.asarray(deform_init))
    np.testing.assert_allclose(np.asarray(final["camera_elev"]),
                               np.asarray(camera_elev))


def test_cli_pose_opt(tmp_path):
    from pertrenderer_tpu.experiments.eval import main

    main(["-et", "pose_opt", "-np", "1", "-ni", "20", "-is", "32",
          "-sn", "softras", "-eid", "7", "-ar", "0",
          "--results-dir", str(tmp_path)])
    import os

    for f in ["angle_error.txt", "solved_percentage.txt", "params.txt",
              "exp_setup.txt"]:
        assert os.path.exists(str(tmp_path / "7" / f)), f


def test_pose_opt_kill_and_resume_reproduces_trajectory(tmp_path):
    """Checkpoint at a segment boundary + resume == the uninterrupted run,
    exactly (pose, best iterate, loss history) — including the annealing
    decision at the boundary."""
    meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers = \
        _setup(imsize=24)
    kw = dict(Niter=170, lr_init=3e-2, adapt_reg=True,
              adapt_params=(1.1, 1.1), key=jax.random.PRNGKey(5))
    full = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                 renderers[0], target_rgb, **kw)
    ckpt = str(tmp_path / "ckpt")
    # Segments are uniform (50 iters); kill after the third so the resume
    # crosses the first annealing decision (fires at iter 150).
    killed = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                   renderers[0], target_rgb,
                                   checkpoint_dir=ckpt, max_segments=3, **kw)
    assert killed.losses.shape == (150,)
    resumed = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                    renderers[0], target_rgb,
                                    checkpoint_dir=ckpt, resume=True, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.log_rot),
                                  np.asarray(full.log_rot))
    np.testing.assert_array_equal(np.asarray(resumed.best_log_rot),
                                  np.asarray(full.best_log_rot))
    np.testing.assert_array_equal(resumed.losses, full.losses)


def test_pose_opt_dispatch_split_is_trajectory_exact():
    """``max_dispatch_steps`` splits each segment scan into bounded XLA
    dispatches (the coarse-sigma config-5 crash fix) without changing the
    trajectory: per-iteration keys are pre-split per segment, so scanning
    50 steps in one execution or as 7-step sub-dispatches is the same
    computation."""
    meshes, cameras, lights, target_rgb, r_true, log_rot_init, renderers = \
        _setup(imsize=24)
    kw = dict(Niter=120, lr_init=3e-2, adapt_reg=True,
              adapt_params=(1.1, 1.1), key=jax.random.PRNGKey(5))
    full = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                 renderers[0], target_rgb, **kw)
    split = harness.optimize_pose(meshes, cameras, lights, log_rot_init,
                                  renderers[0], target_rgb,
                                  max_dispatch_steps=7, **kw)
    np.testing.assert_array_equal(np.asarray(split.log_rot),
                                  np.asarray(full.log_rot))
    np.testing.assert_array_equal(np.asarray(split.best_log_rot),
                                  np.asarray(full.best_log_rot))
    np.testing.assert_array_equal(split.losses, full.losses)
    assert split.losses.shape == (120,)


def test_scene_params_checkpoint_roundtrip(tmp_path):
    key = jax.random.PRNGKey(2)
    param_to_check = {"camera": False, "vertices": False, "textures": False,
                      "light": True}
    (src_mesh, deform_init, verts_rgb_init, camera_elev, camera_azim,
     lights_location) = harness.init_base_mesh_cameras_lights(
        "sphere", param_to_check)
    src_mesh = src_mesh.with_textures(
        pt.TexturesVertex(jnp.ones_like(src_mesh.verts)))
    _, _, _, target_rgb, _, _, _ = harness.init_target(key, imsize=24)
    _, renderers = harness.init_renderers(
        None, None, jnp.eye(3)[None], key, sigma=1e-4, gamma=1e-3,
        nb_samples=2, noise_type=("gaussian",), imsize=24, faces_per_pixel=8)
    ckpt = str(tmp_path / "ckpt_scene")
    kw = dict(key=key, lr_init=5e-2, Niter=20, param_to_check=param_to_check)
    best, final, losses = harness.optimize_scene_params(
        src_mesh, camera_elev, camera_azim, lights_location, deform_init,
        verts_rgb_init, renderers[0], [target_rgb[0][None]],
        checkpoint_dir=ckpt, **kw)
    # Resume after completion: restores the terminal state, nothing to run.
    best2, final2, losses2 = harness.optimize_scene_params(
        src_mesh, camera_elev, camera_azim, lights_location, deform_init,
        verts_rgb_init, renderers[0], [target_rgb[0][None]],
        checkpoint_dir=ckpt, resume=True, **kw)
    np.testing.assert_array_equal(np.asarray(final2["lights_location"]),
                                  np.asarray(final["lights_location"]))
    np.testing.assert_array_equal(losses2, losses)


def test_config3_joint_camera_texture_lr_scales():
    """CI-scale BASELINE config 3: joint camera-pose + vertex-texture
    optimization with per-group lr scales (camera scalars live in degrees,
    the texture in 0-1 — one shared Adam step size cannot serve both;
    reference loop: `/root/reference/experiments/eval.py:411-503`)."""
    mesh = pt.load_cube().scale_verts(2.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cam = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    target = harness.get_hard_rendering(mesh, cam, lights, 32)[..., :3]
    sigma, gamma = 1e-3, 1e-2
    sr, sa = harness.make_smoothers("gaussian", sigma, gamma, 1.0, 2)
    settings = pt.RasterizationSettings(
        image_size=32, blur_radius=harness._BLUR_CONST * sigma,
        faces_per_pixel=8)
    ren = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=sr, smoothagg=sa))
    nv = mesh.max_verts
    best, final, losses = harness.optimize_scene_params(
        mesh, jnp.ones(1) * 20.0, jnp.ones(1) * 110.0,
        jnp.array([[0.0, 2.0, -2.0]]), jnp.zeros((nv, 3)),
        jnp.ones((1, nv, 3)), ren, [target], key=jax.random.PRNGKey(0),
        lr_init=5e-2, Niter=6, segment_size=3,
        param_to_check={"camera": True, "textures": True,
                        "vertices": False, "light": False},
        lr_scales={"camera_elev": 20.0, "camera_azim": 20.0})
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # both groups actually moved, and the camera group moved at the
    # degree scale the lr multiplier provides (>0.1 deg in 6 steps)
    assert abs(float(best["camera_elev"][0]) - 20.0) > 0.1
    assert float(jnp.abs(best["verts_rgb"] - 1.0).max()) > 1e-3
    # frozen groups did not move
    np.testing.assert_allclose(np.asarray(final["deform"]), 0.0)


def test_config3_multiview_shared_texture():
    """Multi-view scene-params: per-view cameras + ONE shared texture
    (config 3 runs 2 views — single-view joint camera+texture is ill-posed
    on this scene; the shared texture across views removes the gauge)."""
    n = 2
    mesh = pt.load_cube().scale_verts(2.0)
    mesh_n = mesh.extend(n)
    true_elev = jnp.full((n,), 30.0)
    true_azim = jnp.array([120.0, 210.0])
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0), batch=n)
    r, t = pt.look_at_view_transform(dist=6.7, elev=true_elev,
                                     azim=true_azim)
    cam = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    target = harness.get_hard_rendering(mesh_n, cam, lights, 32)[..., :3]
    assert target.shape[0] == n
    assert float(jnp.abs(target[0] - target[1]).max()) > 0.1  # distinct views
    sigma, gamma = 1e-3, 1e-2
    sr, sa = harness.make_smoothers("gaussian", sigma, gamma, 1.0, 2)
    settings = pt.RasterizationSettings(
        image_size=32, blur_radius=harness._BLUR_CONST * sigma,
        faces_per_pixel=8)
    ren = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=sr, smoothagg=sa))
    nv = mesh.max_verts
    best, final, losses = harness.optimize_scene_params(
        mesh_n, true_elev - 10.0, true_azim - 10.0,
        jnp.array([[0.0, 2.0, -2.0]]), jnp.zeros((nv, 3)),
        jnp.ones((1, nv, 3)), ren, [target], key=jax.random.PRNGKey(0),
        lr_init=5e-2, Niter=6, segment_size=3,
        param_to_check={"camera": True, "textures": True,
                        "vertices": False, "light": False},
        lr_scales={"camera_elev": 20.0, "camera_azim": 20.0})
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # per-view cameras moved (and independently — the two updates differ);
    # the shared texture is a single (1, V, 3) leaf
    assert best["camera_elev"].shape == (n,)
    moved = np.asarray(best["camera_elev"]) - np.asarray(true_elev - 10.0)
    assert np.abs(moved).max() > 0.1
    assert abs(float(moved[0] - moved[1])) > 1e-4
    assert best["verts_rgb"].shape == (1, nv, 3)
    assert float(jnp.abs(best["verts_rgb"] - 1.0).max()) > 1e-3
