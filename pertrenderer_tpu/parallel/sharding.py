"""Multi-chip scale-out: device meshes + shard_map'd training steps.

The reference is single-process/single-GPU (SURVEY.md §2.5 — zero hits for any
distributed backend); this module is the TPU-native scale-out it lacks:

  * **data axis**: a batch of pose problems (or camera views) sharded across
    chips; per-problem pose parameters and optimizer state live sharded, the
    shared smoothing parameters (sigma/gamma/alpha) are replicated with
    ``pmean``'d gradients riding ICI.
  * **samples axis**: the Monte-Carlo sample dimension of both perturbed
    estimators sharded across chips; the estimators ``pmean`` their sample
    means *inside* the forward and custom-VJP backward (see
    ops/perturbed.py) — mathematically exact because both are sample means
    (`/root/reference/randomras/smoothrast.py:36`, `smoothagg.py:41`).

Only ``psum``/``pmean`` collectives are needed at this model scale; XLA
schedules them on ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import pertrenderer_tpu as pt
from pertrenderer_tpu.transforms import Rotate, so3_exp_map

__all__ = ["build_mesh", "make_sharded_pose_step", "dryrun_multichip"]

DATA_AXIS = "data"
SAMPLE_AXIS = "samples"


def build_mesh(n_devices: Optional[int] = None,
               samples_parallel: Optional[int] = None) -> Mesh:
    """A (data, samples) mesh over the first ``n_devices`` devices.

    ``samples_parallel`` chips shard the MC-sample axis (default: 2 when the
    device count allows, else 1); the rest shard the problem batch.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = devices[:n]
    if samples_parallel is None:
        samples_parallel = 2 if n % 2 == 0 and n >= 2 else 1
    assert n % samples_parallel == 0
    shape = (n // samples_parallel, samples_parallel)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, SAMPLE_AXIS))


def _data_specs(tree, axes=(DATA_AXIS,)):
    """Per-leaf PartitionSpecs: shard rank>=1 leaves on the data axes,
    replicate scalars (e.g. Adam's step count)."""
    return jax.tree.map(
        lambda leaf: P(axes) if jnp.ndim(leaf) >= 1 else P(), tree)


def make_sharded_pose_step(mesh: Mesh, scene_mesh, cameras, lights,
                           optimizer, opt_state_example,
                           smoothing_lr: float = 0.0,
                           data_axes: Tuple[str, ...] = (DATA_AXIS,),
                           batch_via: str = "vmap"):
    """Build a jitted multi-chip pose training step.

    The returned step maps (log_rot (B, 3), opt_state, targets (B, H, W, 3),
    keys (B, 2) uint32, renderer) -> (new log_rot, new opt_state, loss (B,),
    renderer) with B sharded over the data axis and the MC sample axis of the
    renderer's estimators sharded over the samples axis (the renderer must be
    built with ``sample_axis=SAMPLE_AXIS`` smoothers).

    ``smoothing_lr`` > 0 also applies a plain SGD update to the shared
    sigma/gamma/alpha leaves from their ``pmean``'d gradients — the adaptive
    regularization signal of `/root/reference/experiments/eval.py:382-394`
    computed collectively.
    """
    # scene_mesh is threaded through the jitted step's ARGUMENTS (replicated
    # spec), never closure-captured: this backend zero-fills batched gathers
    # of large constant-embedded tables (NOTES.md round-5 quirk), so a
    # closure-constant mesh silently corrupts the render at scale.
    def per_problem_loss(scene_mesh, log_rot, renderer, target, key):
        rot = so3_exp_map(log_rot[None])
        pred = scene_mesh.update_padded(
            Rotate(rot).transform_points(scene_mesh.verts_padded()))
        images = renderer(pred, key=key, cameras=cameras, lights=lights)
        return jnp.mean((images[..., :3] - target[None]) ** 2)

    def local_step(scene_mesh, log_rot, opt_state, targets, keys, renderer):
        # log_rot: (B_local, 3); targets: (B_local, H, W, 3); keys (B_local, 2)
        def batch_loss(log_rot, renderer):
            if batch_via == "map":
                # Streaming-mode fused kernels hold HBM-resident (ANY
                # memory space) tables that cannot be vmapped over; the
                # local batch runs sequentially instead.
                losses = jax.lax.map(
                    lambda e: per_problem_loss(scene_mesh, e[0], renderer,
                                               e[1], e[2]),
                    (log_rot, targets, keys))
            else:
                losses = jax.vmap(
                    per_problem_loss, in_axes=(None, 0, None, 0, 0)
                )(scene_mesh, log_rot, renderer, targets, keys)
            return jnp.mean(losses), losses

        (mean_loss, losses), grads = jax.value_and_grad(
            batch_loss, argnums=(0, 1), has_aux=True)(log_rot, renderer)
        g_pose, g_renderer = grads
        # Shared smoothing parameters: average gradients across every
        # batch-sharding axis (for multi-slice meshes this pmean of three
        # scalars is the only cross-DCN collective).
        g_renderer = jax.lax.pmean(g_renderer, data_axes)
        updates, opt_state = optimizer.update(g_pose, opt_state, log_rot)
        log_rot = optax.apply_updates(log_rot, updates)
        if smoothing_lr > 0.0:
            shader = renderer.shader
            g_shader = g_renderer.shader
            shader = shader.replace(
                smoothrast=shader.smoothrast.replace(
                    sigma=shader.smoothrast.sigma
                    - smoothing_lr * g_shader.smoothrast.sigma),
                smoothagg=shader.smoothagg.replace(
                    gamma=shader.smoothagg.gamma
                    - smoothing_lr * g_shader.smoothagg.gamma,
                    alpha=shader.smoothagg.alpha
                    - smoothing_lr * g_shader.smoothagg.alpha),
            )
            renderer = renderer.replace(shader=shader)
        return log_rot, opt_state, losses, renderer

    opt_specs = _data_specs(opt_state_example, data_axes)
    batch_spec = P(data_axes)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, opt_specs, batch_spec, batch_spec, P()),
        out_specs=(batch_spec, opt_specs, batch_spec, P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(log_rot, opt_state, targets, keys, renderer):
        return jitted(scene_mesh, log_rot, opt_state, targets, keys,
                      renderer)

    return step


def dryrun_multichip(n_devices: int, image_size: int = 16,
                     faces_per_pixel: int = 12, steps: int = 1) -> None:
    """Compile and run the FULL multi-chip training step on tiny shapes.

    Creates an ``n_devices`` mesh with real data/sample shardings, builds the
    flagship renderer (GaussianRast + GaussianAgg with the sample axis mapped
    onto the mesh), jits the sharded train step, and executes ``steps`` steps.

    Two phases: the cube (with ``faces_per_pixel >= 12`` it takes the
    flat-mode fused sharded path, ops/fused_render.py `_fused_core_sharded`;
    smaller K streams) and a mid-poly sphere that exercises the STREAMING
    fused sharded path (`_fused_core_stream_sharded`, agg samples sharded /
    rast replicated, batch via lax.map).  On a CPU host the Pallas kernels
    run through the interpreter so the driver's virtual-device dryrun
    exercises the same code paths a TPU slice would.
    """
    import os

    restore = object()
    prev = os.environ.get("PERTRENDERER_FUSED", restore)
    if jax.default_backend() == "cpu" and prev is restore:
        os.environ["PERTRENDERER_FUSED"] = "interpret"
    try:
        _dryrun_multichip(n_devices, image_size, faces_per_pixel, steps)
    finally:
        if prev is restore:
            os.environ.pop("PERTRENDERER_FUSED", None)
        else:
            os.environ["PERTRENDERER_FUSED"] = prev


def _dryrun_multichip(n_devices: int, image_size: int,
                      faces_per_pixel: int, steps: int) -> None:
    mesh = build_mesh(n_devices)
    # Phase 1 — flat-mode fused sharding on the cube (F <= K).
    scene_mesh = pt.load_cube().scale_verts(2.0)
    _dryrun_scene(mesh, scene_mesh, image_size, faces_per_pixel, steps,
                  batch_via="vmap", tag="cube")
    # Phase 2 — STREAMING-mode fused sharding on a mid-poly sphere
    # (F > K routes to the chunk-streaming kernels; agg samples shard,
    # rast samples replicate — _fused_core_stream_sharded).
    verts, faces = pt.make_icosphere(1)           # 80 faces
    sphere = pt.Meshes.create(
        verts, faces,
        textures=pt.TexturesVertex(
            jnp.ones((1, verts.shape[0], 3)) * 0.7)).scale_verts(2.0)
    _dryrun_scene(mesh, sphere, image_size, min(faces_per_pixel, 12),
                  steps, batch_via="map", tag="stream/sphere")


def _dryrun_scene(mesh, scene_mesh, image_size: int, faces_per_pixel: int,
                  steps: int, batch_via: str, tag: str) -> None:
    n_data = mesh.shape[DATA_AXIS]
    batch = n_data  # one problem per data-axis slice

    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=image_size, blur_radius=blur,
        faces_per_pixel=faces_per_pixel)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.GaussianRast.create(sigma=sigma, nb_samples=2,
                                              sample_axis=SAMPLE_AXIS),
            smoothagg=pt.GaussianAgg.create(gamma=gamma, nb_samples=2,
                                            sample_axis=SAMPLE_AXIS)),
    )

    key = jax.random.PRNGKey(0)
    k_rot, k_keys = jax.random.split(key)
    r_true = pt.random_rotations(batch, k_rot)
    target_mesh = scene_mesh.extend(batch).update_padded(
        Rotate(r_true).transform_points(
            jnp.repeat(scene_mesh.verts, batch, axis=0)))
    hard = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(
            cameras=cameras,
            raster_settings=pt.RasterizationSettings(
                image_size=image_size, faces_per_pixel=1)),
        shader=pt.HardPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(background_color=(0.0, 0.0, 0.0))),
    )
    cams_b = pt.PerspectiveCameras.create(
        R=jnp.repeat(r, batch, 0), T=jnp.repeat(t, batch, 0), fov=60.0)
    lights_b = pt.PointLights.create(location=(0.0, 2.0, -2.0), batch=batch)
    targets = hard(target_mesh, cameras=cams_b, lights=lights_b)[..., :3]

    log_rot = 0.1 * jax.random.normal(k_rot, (batch, 3))
    keys = jax.vmap(lambda i: jax.random.fold_in(k_keys, i))(
        jnp.arange(batch))
    opt = optax.adam(3e-2)
    opt_state = opt.init(log_rot)

    step = make_sharded_pose_step(mesh, scene_mesh, cameras, lights, opt,
                                  opt_state, smoothing_lr=1e-4,
                                  batch_via=batch_via)

    # Place sharded inputs explicitly so collectives ride the mesh.
    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    log_rot = jax.device_put(log_rot, data_sharding)
    targets = jax.device_put(targets, data_sharding)
    keys = jax.device_put(keys, data_sharding)
    opt_state = jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        opt_state, _data_specs(opt_state))

    for _ in range(steps):
        log_rot, opt_state, losses, renderer = step(
            log_rot, opt_state, targets, keys, renderer)
    losses = jax.block_until_ready(losses)
    assert np.isfinite(np.asarray(losses)).all(), \
        f"non-finite sharded loss ({tag})"
    print(f"dryrun_multichip ok [{tag}]: mesh={dict(mesh.shape)} "
          f"losses={np.asarray(losses).round(5).tolist()}")
