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
    # Coarse-to-fine smoothing schedule (sigma/gamma annealing): start at
    # (sigma0, gamma0), divide by (adapt_sigma, adapt_gamma) every segment
    # after anneal_start iters.  Defaults reproduce the reference's
    # fine-smoothing run; the committed artifact uses the coarse-to-fine
    # recipe (see artifacts/config3.json "recipe").
    ap.add_argument("--sigma0", type=float, default=1e-3)
    ap.add_argument("--gamma0", type=float, default=1e-2)
    ap.add_argument("--adapt-sigma", type=float, default=1.1)
    ap.add_argument("--adapt-gamma", type=float, default=1.5)
    ap.add_argument("--anneal-start", type=int, default=200)
    ap.add_argument("--segment", type=int, default=50)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--cam-lr-scale", type=float, default=20.0)
    ap.add_argument("--tex-lr-scale", type=float, default=1.0)
    ap.add_argument("--lr-decay", type=float, default=1.5)
    ap.add_argument("--seed", type=int, default=0)
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
    # Reference-default fine smoothing is (sigma, gamma)=(1e-3, 1e-2)
    # (eval.py:69).  At fine smoothing the blur band is ~3 px, so camera
    # errors past a few degrees sit outside the capture basin; larger
    # smoothing widens the basin but biases the L1 minimum (the blur halo
    # tilts it ~degrees off-true).  The coarse-to-fine anneal resolves
    # both: start coarse, divide sigma/gamma per segment.
    sigma, gamma = args.sigma0, args.gamma0
    sr, sa = harness.make_smoothers("gaussian", sigma, gamma, 1.0,
                                    args.samples)
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
        renderer, [target], key=jax.random.PRNGKey(args.seed),
        lr_init=args.lr, Niter=args.iters, adapt_reg=True,
        adapt_params=(args.adapt_sigma, args.adapt_gamma),
        anneal_start=args.anneal_start, segment_size=args.segment,
        lr_decay=args.lr_decay,
        param_to_check={"camera": True, "textures": True,
                        "vertices": False, "light": False},
        # elev/azim are in degrees; the texture is 0-1.  One Adam step
        # size cannot serve both units — give the camera group ~1 deg/step.
        lr_scales={"camera_elev": args.cam_lr_scale,
                   "camera_azim": args.cam_lr_scale,
                   "verts_rgb": args.tex_lr_scale})
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
        "recipe": {"sigma0": args.sigma0, "gamma0": args.gamma0,
                   "adapt": [args.adapt_sigma, args.adapt_gamma],
                   "anneal_start": args.anneal_start,
                   "segment": args.segment, "samples": args.samples,
                   "lr": args.lr, "lr_decay": args.lr_decay,
                   "cam_lr_scale": args.cam_lr_scale,
                   "tex_lr_scale": args.tex_lr_scale, "seed": args.seed},
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
