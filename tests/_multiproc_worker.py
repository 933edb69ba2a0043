"""Worker for the 2-process `jax.distributed` test (test_sharding.py).

Each process owns 2 virtual CPU devices; process boundaries stand in for
slice boundaries (DCN).  The worker bootstraps the coordinator through
``pertrenderer_tpu.parallel.distributed.initialize`` (env-var path), builds
the (slice, data, samples) hybrid mesh over the 4 GLOBAL devices with the
slice axis aligned to processes, runs one full sharded pose step, and
prints the globally-reduced loss — the parent asserts both ranks print the
same finite value.

Run as: python tests/_multiproc_worker.py <coordinator_port> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# The env var alone is overridden by this image's sitecustomize; update the
# config before any backend initializes (tests/conftest.py note).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> None:
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    from pertrenderer_tpu.parallel import distributed

    assert distributed.initialize() is True
    assert distributed.initialize() is True        # idempotent
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    assert len(jax.local_devices()) == 2

    import numpy as np

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.parallel import sharding
    from pertrenderer_tpu.transforms import Rotate

    # CPU Pallas path runs through the interpreter (as in dryrun_multichip).
    os.environ.setdefault("PERTRENDERER_FUSED", "interpret")

    # Device ids enumerate process-major, so slices == processes here and
    # every reduction over SLICE_AXIS crosses the process boundary (the
    # stand-in for DCN).
    mesh = distributed.build_multislice_mesh(num_slices=2,
                                             samples_parallel=2)
    assert dict(mesh.shape) == {"slice": 2, "data": 1, "samples": 2}

    scene_mesh = pt.load_cube().scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    settings = pt.RasterizationSettings(image_size=16, faces_per_pixel=12,
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

    batch = 2                                      # slice x data
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
    targets = np.asarray(hard(tmesh, cameras=cams_b, lights=lights_b)
                         [..., :3])

    log_rot = np.asarray(0.1 * jax.random.normal(key, (batch, 3)))
    keys = np.asarray(jax.vmap(
        lambda i: jax.random.fold_in(key, i))(jnp.arange(batch)))
    opt = optax.adam(3e-2)
    opt_state = opt.init(jnp.asarray(log_rot))
    axes = (distributed.SLICE_AXIS, sharding.DATA_AXIS)
    step = sharding.make_sharded_pose_step(
        mesh, scene_mesh, cameras, lights, opt, opt_state,
        smoothing_lr=1e-4, data_axes=axes)

    bs = NamedSharding(mesh, P(axes))
    log_rot = jax.device_put(log_rot, bs)
    targets = jax.device_put(targets, bs)
    keys = jax.device_put(keys, bs)
    opt_state = jax.tree.map(
        lambda leaf, spec: jax.device_put(
            np.asarray(leaf), NamedSharding(mesh, spec)),
        opt_state, sharding._data_specs(opt_state, axes))

    log_rot, opt_state, losses, renderer = step(log_rot, opt_state,
                                                targets, keys, renderer)
    # Reduce to a replicated scalar across processes — the reduction over
    # the slice axis is the cross-process (DCN stand-in) collective.
    mean_loss = jax.jit(
        lambda x: jnp.mean(x),
        out_shardings=NamedSharding(mesh, P()))(losses)
    val = float(jax.block_until_ready(mean_loss))
    assert np.isfinite(val)
    print(f"RANK {pid} MEANLOSS {val:.9e}", flush=True)


if __name__ == "__main__":
    main()
