"""Fast on-chip step timer for the headline fused loss+grad config.

Measures ms/step of the jitted pose-step (render_loss value_and_grad inside a
lax.scan) with the scan-slope method (NOTES.md: this backend resolves
block_until_ready lazily, so naive dispatch loops under-measure).

Usage:  python tools/bench_step.py [--image 256] [--k 50] [--s 8]
                                   [--scene cube|sphere] [--n1 5] [--n2 55]

Prints ms/step and renders/s; much faster to iterate with than bench.py
(smaller scan lengths, one variant).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp


def build(image_size, k, s, scene, s_rast=None, s_agg=None):
    import pertrenderer_tpu as pt
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    if scene == "cube":
        mesh = pt.load_cube().scale_verts(2.0)
    elif scene == "cow":
        mesh = pt.make_cow()
        verts = mesh.verts[0]
        center = verts.mean(0)
        scale = jnp.max(jnp.abs(verts - center))
        mesh = mesh.offset_verts(
            -jnp.broadcast_to(center, verts.shape)).scale_verts(3.0 / scale)
    else:
        level = int(scene[6:]) if scene.startswith("sphere") and \
            scene[6:].isdigit() else 3
        verts, faces = pt.make_icosphere(level)
        mesh = pt.Meshes.create(verts, faces,
                                textures=pt.TexturesVertex(
                                    jnp.ones((1, verts.shape[0], 3))))
        mesh = mesh.scale_verts(3.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=image_size, blur_radius=blur, faces_per_pixel=k,
        max_faces_per_bin=50000, perspective_correct=False)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=pt.GaussianRast.create(
                sigma=sigma, nb_samples=s_rast if s_rast else s),
            smoothagg=pt.GaussianAgg.create(
                gamma=gamma, nb_samples=s_agg if s_agg else s)),
    )
    target = jnp.zeros((1, image_size, image_size, 3))

    def loss_fn(log_rot, sigma_, gamma_, alpha_, keys):
        rr = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sigma_, gamma=gamma_, alpha=alpha_))
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(
            Rotate(rot).transform_points(mesh.verts_padded()))
        return rr.render_loss(pred, target, key=(keys[0], keys[1]),
                              cameras=cameras, lights=lights)

    def make(n):
        @jax.jit
        def run(log_rot, key):
            sig0, gam0, alp0 = renderer.shader.get_smoothing()
            all_keys = jax.random.split(key, n * 2).reshape(n, 2, 2)

            def body(log_rot, keys):
                loss, grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2, 3))(
                    log_rot, sig0, gam0, alp0, keys)
                log_rot = log_rot - 1e-6 * grads[0]
                return log_rot, loss + grads[1] * 0 + grads[2] * 0
            log_rot, losses = jax.lax.scan(body, log_rot, all_keys)
            return jnp.sum(losses) + jnp.sum(log_rot)
        return run

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--s-rast", type=int, default=0)
    ap.add_argument("--s-agg", type=int, default=0)
    ap.add_argument("--scene", default="cube")
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=55)
    args = ap.parse_args()

    make = build(args.image, args.k, args.s, args.scene,
                 s_rast=args.s_rast, s_agg=args.s_agg)
    x0 = jnp.zeros((1, 3))
    k0 = jax.random.PRNGKey(0)
    times = {}
    for n in (args.n1, args.n2):
        run = make(n)
        t0 = time.time()
        _ = float(run(x0, k0))
        print(f"compile+run n={n}: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time(); _ = float(run(x0, k0)); t1 = time.time()
        _ = float(run(x0, k0)); t2 = time.time()
        times[n] = min(t1 - t0, t2 - t1)
    per_iter = (times[args.n2] - times[args.n1]) / (args.n2 - args.n1)
    print(f"ms/step: {per_iter * 1e3:.3f}   "
          f"renders/s: {1.0 / max(per_iter, 1e-9):.1f}")


if __name__ == "__main__":
    main()
