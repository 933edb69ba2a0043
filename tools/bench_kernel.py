"""Kernel-only timing for the headline config: scan directly over the
fused loss+grad kernel with prepared inputs (per-iteration seed variation
only), isolating the Pallas kernel from the XLA glue of the full pose step
(input prep, rotation, optimizer, scan plumbing).

    python tools/bench_kernel.py [--n1 5] [--n2 105]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=105)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--s", type=int, default=8)
    args = ap.parse_args()

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.lights import Materials
    from pertrenderer_tpu.ops import fused_render as fr

    mesh = pt.load_cube().scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=args.image, blur_radius=blur, faces_per_pixel=args.k,
        perspective_correct=False)
    sr = pt.GaussianRast.create(sigma=sigma, nb_samples=args.s)
    sa = pt.GaussianAgg.create(gamma=gamma, nb_samples=args.s)
    bp = pt.BlendParams(sigma=sigma, gamma=gamma,
                        background_color=(0.0, 0.0, 0.0))
    mats = Materials.create()
    cfg = fr._plan(mesh, cameras, lights, mats, sr, sa, settings, "phong")
    assert cfg is not None and not cfg.binned and not cfg.stream
    inputs = fr._prepare_inputs(cfg, mesh, cameras, lights, mats, sr, sa,
                                bp, settings, jax.random.PRNGKey(0),
                                "phong")
    fv_ndc, fv_world, fn_w, tex, valid, scal, seeds = [x[0] for x in inputs]
    hw = cfg.image_size * cfg.image_size
    hwpad = fr._n_tiles(cfg) * cfg.p_tile
    tcm = jnp.zeros((3, hwpad), jnp.float32)
    lscale = jnp.full((1, 1), 1.0 / (hw * 3), jnp.float32)

    def make(n):
        @jax.jit
        def run(x):
            def body(acc, i):
                sd = seeds + i            # fresh streams per iteration
                loss = fr._fused_loss_core(
                    cfg, "l2_rgb", fv_ndc + x, fv_world, fn_w, tex, valid,
                    scal, sd, tcm, lscale)
                return acc + loss, loss
            acc, losses = jax.lax.scan(body, x * 0.0, jnp.arange(n))
            return acc + jnp.sum(losses)
        return run

    times = {}
    for n in (args.n1, args.n2):
        run = make(n)
        t0 = time.time()
        _ = float(run(jnp.zeros(())))
        print(f"compile+run n={n}: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time(); _ = float(run(jnp.zeros(()))); t1 = time.time()
        _ = float(run(jnp.zeros(()))); t2 = time.time()
        times[n] = min(t1 - t0, t2 - t1)
    per = (times[args.n2] - times[args.n1]) / (args.n2 - args.n1)
    print(f"kernel-only ms/step: {per * 1e3:.3f}  "
          f"({1.0 / max(per, 1e-9):.0f}/s)")


if __name__ == "__main__":
    main()
