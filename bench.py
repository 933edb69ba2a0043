"""Headline benchmark: fused fwd+bwd perturbed renders/sec on one chip.

Config per BASELINE.json: 256^2 image, faces_per_pixel=50, cube scene,
GaussianRast + GaussianAgg (S=8 MC samples), gradients w.r.t. pose AND the
smoothing parameters — one fused jitted step, matching the reference's
per-iteration work (`/root/reference/experiments/eval.py:349-369`) with zero
host round-trips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 5000 renders/sec north star.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_step(image_size=256, faces_per_pixel=50, nb_samples=8):
    import pertrenderer_tpu as pt
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    mesh = pt.load_cube().scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=image_size, blur_radius=blur,
        faces_per_pixel=faces_per_pixel, max_faces_per_bin=50000,
        perspective_correct=False)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.GaussianRast.create(sigma=sigma,
                                              nb_samples=nb_samples),
            smoothagg=pt.GaussianAgg.create(gamma=gamma,
                                            nb_samples=nb_samples)),
    )
    target = jnp.zeros((1, image_size, image_size, 3))

    def loss_fn(log_rot, renderer, key):
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(
            Rotate(rot).transform_points(mesh.verts_padded()))
        images = renderer(pred, key=key, cameras=cameras, lights=lights)
        return jnp.mean((images[..., :3] - target) ** 2)

    @jax.jit
    def step(log_rot, renderer, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            log_rot, renderer, sub)
        return loss, grads[0], key

    return step, renderer


def main():
    step, renderer = build_step()
    log_rot = jnp.zeros((1, 3))
    key = jax.random.PRNGKey(0)

    # compile
    t0 = time.time()
    loss, g, key = step(log_rot, renderer, key)
    jax.block_until_ready(loss)
    compile_time = time.time() - t0
    print(f"compile: {compile_time:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)

    # calibrate iteration count to ~5s
    t0 = time.time()
    for _ in range(5):
        loss, g, key = step(log_rot, renderer, key)
    jax.block_until_ready(loss)
    per = (time.time() - t0) / 5
    n = max(10, min(2000, int(5.0 / max(per, 1e-6))))

    t0 = time.time()
    for _ in range(n):
        loss, g, key = step(log_rot, renderer, key)
    jax.block_until_ready(loss)
    elapsed = time.time() - t0
    renders_per_sec = n / elapsed

    print(json.dumps({
        "metric": "fwd+bwd perturbed renders/sec/chip @256^2 K=50 S=8",
        "value": round(renders_per_sec, 2),
        "unit": "renders/sec",
        "vs_baseline": round(renders_per_sec / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
