"""BASELINE config 3: textured cow-class mesh, joint pose+texture
optimization at 256^2 with sigma/gamma annealing, on-chip.

"Pose" here is the camera pose (elev/azim scalars, differentiable through
look_at_view_transform) and "texture" the per-vertex colors — the two
jointly-optimized parameter groups of the reference's scene-parameter loop
(`/root/reference/experiments/eval.py:411-503`, flags at :413-422).  The
target is a hard Phong render of the true camera + the cow's spotted UV
texture; the optimizer recovers both from a white-textured start at a
perturbed camera.

Writes artifacts/config3.json with convergence + throughput numbers.

    python tools/run_config3.py [--iters 400] [--image 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--elev0", type=float, default=20.0)
    ap.add_argument("--azim0", type=float, default=100.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), os.pardir, "artifacts", "config3.json"))
    args = ap.parse_args()

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.experiments import harness

    imsize = args.image
    cow = pt.make_cow()
    verts = cow.verts[0]
    center = verts.mean(0)
    scale = jnp.max(jnp.abs(verts - center))
    cow = cow.offset_verts(
        -jnp.broadcast_to(center, verts.shape)).scale_verts(3.0 / scale)

    # True scene: reference-style camera at dist 6.7 + the UV texture.
    true_elev, true_azim = 30.0, 120.0
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    r, t = pt.look_at_view_transform(dist=6.7, elev=true_elev,
                                     azim=true_azim)
    cam_true = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    target = harness.get_hard_rendering(cow, cam_true, lights,
                                        imsize)[..., :3]

    # Perturbed start: white texture, offset camera (eval.py:233-236).
    elev0, azim0 = jnp.ones(1) * args.elev0, jnp.ones(1) * args.azim0
    n_verts = cow.max_verts
    # Reference-default smoothing (eval.py:69: (sigma, gamma)=(1e-3, 1e-2)).
    # Larger smoothing (1e-2/5e-1) measurably tilts the L1 landscape: the
    # blur halo dominates the loss and its minimum sits ~10 degrees off the
    # true camera, so the joint optimization walks away from the target.
    sigma, gamma = 1e-3, 1e-2
    sr, sa = harness.make_smoothers("gaussian", sigma, gamma, 1.0, 8)
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=harness._BLUR_CONST * sigma,
        faces_per_pixel=50, perspective_correct=False)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            lights=lights,
            blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                        background_color=(0.0, 0.0, 0.0)),
            smoothrast=sr, smoothagg=sa))

    t0 = time.time()
    best, final, losses = harness.optimize_scene_params(
        cow, elev0, azim0, jnp.array([[0.0, 2.0, -2.0]]),
        jnp.zeros((n_verts, 3)), jnp.ones((1, n_verts, 3)),
        renderer, [target], key=jax.random.PRNGKey(0), lr_init=args.lr,
        Niter=args.iters, adapt_reg=True,
        param_to_check={"camera": True, "textures": True,
                        "vertices": False, "light": False},
        # elev/azim are in degrees; the texture is 0-1.  One Adam step
        # size cannot serve both units — give the camera group ~1 deg/step.
        lr_scales={"camera_elev": 20.0, "camera_azim": 20.0})
    wall = time.time() - t0

    elev_err = abs(float(best["camera_elev"][0]) - true_elev)
    azim_err = abs(float(best["camera_azim"][0]) - true_azim)
    rec = {
        "config": "BASELINE config 3: cow-class mesh (5120 faces, UV "
                  "target), joint camera-pose + vertex-texture, "
                  f"{imsize}^2, sigma/gamma annealing",
        "iters": args.iters,
        "loss_first": float(losses[0]) if len(losses) else None,
        "loss_last": float(losses[-1]) if len(losses) else None,
        "loss_best": float(np.min(losses)) if len(losses) else None,
        "camera_err_deg_init": [abs(args.elev0 - true_elev),
                                abs(args.azim0 - true_azim)],
        "camera_err_deg_final": [elev_err, azim_err],
        "wall_seconds_total": round(wall, 1),
        "renders_per_sec_incl_compile": round(args.iters / wall, 2),
        "backend": jax.default_backend(),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
