"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pertrenderer_tpu.parallel import sharding


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    sharding.dryrun_multichip(8, image_size=16, faces_per_pixel=4, steps=2)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_dryrun_multichip_2():
    sharding.dryrun_multichip(2, image_size=16, faces_per_pixel=4, steps=1)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sample_sharding_exact_equivalence():
    """Sharded (samples-axis) estimator fwd+bwd == a single-device run that
    folds the same device indices into the key — exact, not statistical.

    The sharded estimator gives device i the stream fold_in(key, i) and
    pmeans the per-device sample means (ops/perturbed.py _device_key); a
    host-side loop reproducing exactly those streams must match to float
    reassociation (<=1e-6)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from pertrenderer_tpu.ops.perturbed import (perturbed_argmax,
                                                perturbed_heaviside)

    n_dev, n_per_dev = 4, 8
    devices = np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev)
    mesh = Mesh(devices, (sharding.DATA_AXIS, sharding.SAMPLE_AXIS))
    key = jax.random.PRNGKey(3)
    d = jnp.linspace(-1, 1, 64).reshape(1, 4, 4, 4)
    w = jnp.cos(jnp.arange(64.0)).reshape(1, 4, 4, 4)
    sigma = jnp.asarray(0.5)

    def sharded_local(d, sigma):
        def loss(d, sigma):
            out = perturbed_heaviside(d, sigma, key, n_per_dev, "gaussian",
                                      True, sharding.SAMPLE_AXIS)
            return jnp.sum(out * w), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(d, sigma)
        return l, out, grads

    l_sh, out_sh, (gd_sh, gs_sh) = jax.jit(jax.shard_map(
        sharded_local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(), P(), (P(), P())), check_vma=False))(d, sigma)

    def single(d, sigma):
        def loss(d, sigma):
            outs = [perturbed_heaviside(d, sigma, jax.random.fold_in(key, i),
                                        n_per_dev, "gaussian", True)
                    for i in range(n_dev)]
            out = sum(outs) / n_dev
            return jnp.sum(out * w), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(d, sigma)
        return l, out, grads

    l_1, out_1, (gd_1, gs_1) = jax.jit(single)(d, sigma)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_1),
                               atol=1e-6)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gd_sh), np.asarray(gd_1), atol=1e-6)
    np.testing.assert_allclose(float(gs_sh), float(gs_1), rtol=1e-5)

    # Same exactness for the perturbed argmax (fwd + VR Jacobian bwd).
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 5))
    wz = jnp.sin(jnp.arange(80.0)).reshape(1, 4, 4, 5)
    gamma = jnp.asarray(0.3)

    def sharded_arg(z, gamma):
        def loss(z, gamma):
            out = perturbed_argmax(z, gamma, key, n_per_dev, "gaussian",
                                   True, sharding.SAMPLE_AXIS)
            return jnp.sum(out * wz)
        return jax.value_and_grad(loss, argnums=(0, 1))(z, gamma)

    l_sh, (gz_sh, gg_sh) = jax.jit(jax.shard_map(
        sharded_arg, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(), (P(), P())), check_vma=False))(z, gamma)

    def single_arg(z, gamma):
        def loss(z, gamma):
            outs = [perturbed_argmax(z, gamma, jax.random.fold_in(key, i),
                                     n_per_dev, "gaussian", True)
                    for i in range(n_dev)]
            return jnp.sum(sum(outs) / n_dev * wz)
        return jax.value_and_grad(loss, argnums=(0, 1))(z, gamma)

    l_1, (gz_1, gg_1) = jax.jit(single_arg)(z, gamma)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gz_sh), np.asarray(gz_1), atol=1e-6)
    np.testing.assert_allclose(float(gg_sh), float(gg_1), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_fused_sample_sharding_exact_equivalence(monkeypatch):
    """The FULL fused render under sample-axis sharding == a single-device
    folded run with S_total = n_dev * S_local samples — exact (<=1e-6), for
    the image AND the pose/sigma/gamma/alpha gradients.

    The sharded fused path offsets each device's hash-PRNG sample indices so
    the union of device streams is bit-equal to the folded run, pmeans the
    coverage probabilities before the (nonlinear) z_map, and pmeans the
    blend/backward terms at their linear composition points
    (ops/fused_render.py `_fused_core_sharded`)."""
    from jax.sharding import Mesh, PartitionSpec as P

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    n_dev, s_local = 4, 2
    devices = np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev)
    mesh = Mesh(devices, (sharding.DATA_AXIS, sharding.SAMPLE_AXIS))

    scene_mesh = pt.load_cube().scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-2, 5e-1
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    # faces_per_pixel >= max_faces so the fused path runs in flat mode (the
    # sharded fused path is flat-only; smaller K would fall back to staged).
    settings = pt.RasterizationSettings(image_size=16, blur_radius=blur,
                                        faces_per_pixel=16)
    key = jax.random.PRNGKey(7)
    target = jnp.linspace(0.0, 1.0, 16 * 16 * 3).reshape(1, 16, 16, 3)

    def build(nb, axis):
        return pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                                raster_settings=settings),
            shader=pt.RandomPhongShader.create(
                cameras=cameras, lights=lights,
                blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                            background_color=(0., 0., 0.)),
                smoothrast=pt.GaussianRast.create(sigma=sigma, nb_samples=nb,
                                                  sample_axis=axis),
                smoothagg=pt.GaussianAgg.create(gamma=gamma, nb_samples=nb,
                                                sample_axis=axis)))

    def make_loss(renderer):
        def loss(log_rot, sig, gam, alp):
            rr = renderer.replace(shader=renderer.shader.update_smoothing(
                sigma=sig, gamma=gam, alpha=alp))
            rot = so3_exp_map(log_rot)
            pred = scene_mesh.update_padded(
                Rotate(rot).transform_points(scene_mesh.verts_padded()))
            images = rr(pred, key=key, cameras=cameras, lights=lights)
            return jnp.mean((images[..., :3] - target) ** 2), images
        return loss

    args = (0.1 * jnp.ones((1, 3)), jnp.asarray(sigma), jnp.asarray(gamma),
            jnp.asarray(1.0))

    sharded = build(s_local, sharding.SAMPLE_AXIS)

    # Guard against a silent fall-back to the staged path: the plan must be
    # fused flat-mode for the folded run and prob_ext for the sharded one.
    from pertrenderer_tpu.ops import fused_render as fr
    from pertrenderer_tpu.lights import Materials
    sh = sharded.shader
    cfg_sh = fr._plan(scene_mesh, cameras, lights, Materials.create(),
                      sh.smoothrast, sh.smoothagg, settings, "phong")
    assert cfg_sh is not None and cfg_sh.prob_ext and not cfg_sh.binned
    fo = build(n_dev * s_local, None).shader
    cfg_fo = fr._plan(scene_mesh, cameras, lights, Materials.create(),
                      fo.smoothrast, fo.smoothagg, settings, "phong")
    assert cfg_fo is not None and not cfg_fo.prob_ext and not cfg_fo.binned

    def run_sharded(*a):
        return jax.value_and_grad(make_loss(sharded), argnums=(0, 1, 2, 3),
                                  has_aux=True)(*a)

    (l_sh, img_sh), g_sh = jax.jit(jax.shard_map(
        run_sharded, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=((P(), P()), (P(), P(), P(), P())),
        check_vma=False))(*args)

    # Folded single-device reference on the flat fused path.
    folded = build(n_dev * s_local, None)
    (l_1, img_1), g_1 = jax.jit(jax.value_and_grad(
        make_loss(folded), argnums=(0, 1, 2, 3), has_aux=True))(*args)

    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_1),
                               atol=1e-6)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh[0]), np.asarray(g_1[0]),
                               atol=1e-6 * max(1.0,
                                               np.abs(g_1[0]).max()))
    for a, b in zip(g_sh[1:], g_1[1:]):
        np.testing.assert_allclose(float(a), float(b),
                                   rtol=1e-5, atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_fused_stream_sample_sharding_exact_equivalence(monkeypatch):
    """The STREAMING fused render under sample-axis sharding (VERDICT r3
    #5: the realistic multi-chip scene is mid-poly) == a single-device
    folded run — exact, image and every gradient leaf.

    Streaming shards the AGG samples only (rast seeds replicate; the
    per-(face, pixel) coverage field never materializes so it cannot be
    pmean'd): the folded equivalent keeps the same S_rast and folds
    S_agg_total = n_dev * S_agg_local (ops/fused_render.py
    `_fused_core_stream_sharded`)."""
    from jax.sharding import Mesh, PartitionSpec as P

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    n_dev, s_agg_local, s_rast = 4, 2, 3
    devices = np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev)
    mesh = Mesh(devices, (sharding.DATA_AXIS, sharding.SAMPLE_AXIS))

    verts, faces = pt.make_icosphere(2)          # 320 faces > K -> stream
    scene_mesh = pt.Meshes.create(
        verts, faces,
        textures=pt.TexturesVertex(
            jnp.linspace(0.1, 0.9, verts.shape[0] * 3).reshape(
                1, verts.shape[0], 3))).scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-2, 5e-1
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(image_size=16, blur_radius=blur,
                                        faces_per_pixel=50)
    key = jax.random.PRNGKey(11)
    target = jnp.linspace(0.0, 1.0, 16 * 16 * 3).reshape(1, 16, 16, 3)

    def build(nb_agg, axis):
        return pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                                raster_settings=settings),
            shader=pt.RandomPhongShader.create(
                cameras=cameras, lights=lights,
                blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                            background_color=(0., 0., 0.)),
                smoothrast=pt.GaussianRast.create(
                    sigma=sigma, nb_samples=s_rast, sample_axis=axis),
                smoothagg=pt.GaussianAgg.create(
                    gamma=gamma, nb_samples=nb_agg, sample_axis=axis)))

    def make_loss(renderer):
        def loss(log_rot, sig, gam, alp):
            rr = renderer.replace(shader=renderer.shader.update_smoothing(
                sigma=sig, gamma=gam, alpha=alp))
            rot = so3_exp_map(log_rot)
            pred = scene_mesh.update_padded(
                Rotate(rot).transform_points(scene_mesh.verts_padded()))
            images = rr(pred, key=key, cameras=cameras, lights=lights)
            return jnp.mean((images[..., :3] - target) ** 2), images
        return loss

    args = (0.1 * jnp.ones((1, 3)), jnp.asarray(sigma), jnp.asarray(gamma),
            jnp.asarray(1.0))

    sharded = build(s_agg_local, sharding.SAMPLE_AXIS)
    from pertrenderer_tpu.lights import Materials
    from pertrenderer_tpu.ops import fused_render as fr
    sh = sharded.shader
    cfg_sh = fr._plan(scene_mesh, cameras, lights, Materials.create(),
                      sh.smoothrast, sh.smoothagg, settings, "phong")
    assert cfg_sh is not None and cfg_sh.prob_ext and cfg_sh.stream

    def run_sharded(*a):
        return jax.value_and_grad(make_loss(sharded), argnums=(0, 1, 2, 3),
                                  has_aux=True)(*a)

    (l_sh, img_sh), g_sh = jax.jit(jax.shard_map(
        run_sharded, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=((P(), P()), (P(), P(), P(), P())),
        check_vma=False))(*args)

    folded = build(n_dev * s_agg_local, None)
    fo = folded.shader
    cfg_fo = fr._plan(scene_mesh, cameras, lights, Materials.create(),
                      fo.smoothrast, fo.smoothagg, settings, "phong")
    assert cfg_fo is not None and cfg_fo.stream and not cfg_fo.prob_ext
    (l_1, img_1), g_1 = jax.jit(jax.value_and_grad(
        make_loss(folded), argnums=(0, 1, 2, 3), has_aux=True))(*args)

    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_1),
                               atol=1e-6)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh[0]), np.asarray(g_1[0]),
                               atol=1e-6 * max(1.0, np.abs(g_1[0]).max()))
    for a, b in zip(g_sh[1:], g_1[1:]):
        # pmean-of-partial-sums vs one folded sum: float reassociation
        # only (measured ~2e-5 relative on near-zero scalars).
        np.testing.assert_allclose(float(a), float(b),
                                   rtol=5e-5, atol=5e-7)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sample_sharding_matches_single_device():
    """pmean of per-device sample means == single-device mean over all
    samples, given matching noise streams: check the sharded estimator is
    finite, in-range and deterministic."""
    from jax.sharding import Mesh, PartitionSpec as P

    from pertrenderer_tpu.ops.perturbed import perturbed_heaviside

    devices = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, (sharding.DATA_AXIS, sharding.SAMPLE_AXIS))
    d = jnp.linspace(-1, 1, 64).reshape(1, 4, 4, 4)
    key = jax.random.PRNGKey(0)

    def f(d):
        return perturbed_heaviside(d, jnp.asarray(0.5), key, 64, "gaussian",
                                   True, sharding.SAMPLE_AXIS)

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False))(d)
    ref = perturbed_heaviside(d, jnp.asarray(0.5), key, 256, "gaussian", True)
    assert np.isfinite(np.asarray(out)).all()
    # Both estimate Phi(d/sigma); with 256 total samples each, they agree
    # statistically.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15)
    # different per-device fold_in streams -> not all-equal to a single
    # device's 64-sample estimate
    one = perturbed_heaviside(d, jnp.asarray(0.5), key, 64, "gaussian", True)
    assert np.abs(np.asarray(out) - np.asarray(one)).max() > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multislice_mesh_pose_step():
    """The (slice, data, samples) hybrid mesh runs the full sharded pose
    step with the batch sharded jointly over slice x data — the multi-slice
    deployment layout (only the smoothing-grad pmean crosses the DCN axis).
    """
    import optax

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.parallel import distributed
    from pertrenderer_tpu.transforms import Rotate

    assert distributed.initialize() is False     # single-process: no-op

    mesh = distributed.build_multislice_mesh(num_slices=2,
                                             samples_parallel=2)
    assert dict(mesh.shape) == {"slice": 2, "data": 2, "samples": 2}

    scene_mesh = pt.load_cube().scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    settings = pt.RasterizationSettings(image_size=16, faces_per_pixel=4,
                                        blur_radius=9e-3 * sigma / 1e-3)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.GaussianRast.create(
                sigma=sigma, nb_samples=2,
                sample_axis=sharding.SAMPLE_AXIS),
            smoothagg=pt.GaussianAgg.create(
                gamma=gamma, nb_samples=2,
                sample_axis=sharding.SAMPLE_AXIS)))

    batch = 4                                    # slice x data
    key = jax.random.PRNGKey(0)
    r_true = pt.random_rotations(batch, key)
    tmesh = scene_mesh.extend(batch).update_padded(
        Rotate(r_true).transform_points(
            jnp.repeat(scene_mesh.verts, batch, axis=0)))
    cams_b = pt.PerspectiveCameras.create(
        R=jnp.repeat(r, batch, 0), T=jnp.repeat(t, batch, 0), fov=60.0)
    lights_b = pt.PointLights.create(location=(0.0, 2.0, -2.0), batch=batch)
    hard = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(
            cameras=cameras,
            raster_settings=pt.RasterizationSettings(image_size=16,
                                                     faces_per_pixel=1)),
        shader=pt.HardPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(background_color=(0.0, 0.0, 0.0))))
    targets = hard(tmesh, cameras=cams_b, lights=lights_b)[..., :3]

    log_rot = 0.1 * jax.random.normal(key, (batch, 3))
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(batch))
    opt = optax.adam(3e-2)
    opt_state = opt.init(log_rot)
    axes = (distributed.SLICE_AXIS, sharding.DATA_AXIS)
    step = sharding.make_sharded_pose_step(
        mesh, scene_mesh, cameras, lights, opt, opt_state,
        smoothing_lr=1e-4, data_axes=axes)

    from jax.sharding import NamedSharding, PartitionSpec as P
    bs = NamedSharding(mesh, P(axes))
    log_rot = jax.device_put(log_rot, bs)
    targets = jax.device_put(targets, bs)
    keys = jax.device_put(keys, bs)
    opt_state = jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        opt_state, sharding._data_specs(opt_state, axes))
    log_rot, opt_state, losses, renderer = step(log_rot, opt_state, targets,
                                                keys, renderer)
    losses = np.asarray(jax.block_until_ready(losses))
    assert losses.shape == (batch,) and np.isfinite(losses).all()


def test_two_process_distributed_pose_step():
    """`jax.distributed` exercised for REAL: two coordinated processes (the
    coordinator bootstrap via distributed.initialize's env path), a hybrid
    (slice, data, samples) mesh whose slice axis crosses the process
    boundary, one full sharded pose step, and a cross-process mean
    reduction — both ranks must report the identical finite loss.

    VERDICT round-2 item 8: initialize() had only ever run as a
    single-process no-op.
    """
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_multiproc_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"
        for line in out.splitlines():
            if line.startswith(f"RANK {pid} MEANLOSS "):
                losses[pid] = float(line.split()[-1])
    assert set(losses) == {0, 1}, f"missing loss lines:\n{outs}"
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1]
