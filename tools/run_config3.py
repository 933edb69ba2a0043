"""BASELINE config 3: textured cow-class mesh, joint pose+texture
optimization at 256^2 with sigma/gamma annealing, on-chip.

"Pose" here is the camera pose (per-view elev/azim scalars, differentiable
through look_at_view_transform) and "texture" the per-vertex colors — the
two jointly-optimized parameter groups of the reference's scene-parameter
loop (`/root/reference/experiments/eval.py:411-503`, flags at :413-422).
The target is a hard Phong render of the true cameras + the cow's spotted
UV texture; the optimizer recovers both from a white-textured start at
perturbed cameras.

Default is 2 views with one shared texture and a two-timescale schedule.
Single-view joint camera+texture fitting on this scene is measurably
ill-posed: the texture can repaint the cow to explain a wrong camera (a
7x7 loss-value grid over camera offsets puts the global minimum ~20
degrees off-true once the texture soaks the residual), so no optimizer
can recover both from one view.  Two views of the same texture remove
that gauge: the PROFILED loss L*(camera) = min_texture L is measured
monotone toward the true cameras (0.0108 / 0.0114 / 0.0129 / 0.0166 at
0/5/10/20 deg shared offset, 64^2).  The schedule exploits it:

  phase 1 (``--warmup-iters``): texture-only fit at frozen init cameras —
     brings the texture to its profile optimum;
  phase 2 (``--alternate`` blocks, the default): coordinate descent —
     each block refits the texture at frozen cameras, then moves the
     cameras at frozen texture (the camera gradient then IS the profiled
     gradient — envelope theorem — with no fast/slow tracking lag),
     annealing sigma/gamma per block; a final texture refit follows.
     ``--alternate 0`` instead runs one joint phase with a slow camera
     group and a fast texture (two-timescale; measured less robust).

  Measured end point: the profiled landscape's minimum sits within ~5 deg
  of the true cameras (vertex-resolution texture ambiguity floor), so a
  20 deg init recovers to a few degrees, not to zero.

Writes artifacts/config3.json with convergence + throughput numbers.

    python tools/run_config3.py [--iters 400] [--image 256] [--views 2]
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
    ap.add_argument("--sigma0", type=float, default=3e-3)
    ap.add_argument("--gamma0", type=float, default=3e-2)
    ap.add_argument("--adapt-sigma", type=float, default=1.35)
    ap.add_argument("--adapt-gamma", type=float, default=1.35)
    ap.add_argument("--anneal-start", type=int, default=100)
    ap.add_argument("--segment", type=int, default=50)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--warmup-iters", type=int, default=60)
    ap.add_argument("--alternate", type=int, default=4,
                    help="number of texture/camera alternation blocks "
                         "(0 = single joint phase 2); each block runs "
                         "--tex-iters texture-only then --cam-iters "
                         "camera-only, annealing sigma/gamma per block")
    ap.add_argument("--tex-iters", type=int, default=50)
    ap.add_argument("--cam-iters", type=int, default=50)
    ap.add_argument("--tex-smooth", type=float, default=0.0,
                    help="vertex-color Laplacian smoothness weight; "
                         "opt-in — cleans speckle on rarely-covered "
                         "vertices but also fights sharp spot edges")
    ap.add_argument("--cam-lr-scale", type=float, default=5.0)
    ap.add_argument("--tex-lr-scale", type=float, default=1.0)
    ap.add_argument("--lr-decay", type=float, default=1.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--schedule", default="",
                    help="comma list of image sizes for coarse-to-fine, "
                         "e.g. '64,128,256': the full alternation runs at "
                         "the first size (where the 4-view profiled "
                         "landscape is measured convergent), then "
                         "--refine-blocks camera/texture blocks per finer "
                         "size starting from the coarse solution (cameras "
                         "and per-vertex texture are resolution-"
                         "independent).  Empty = single stage at --image.")
    ap.add_argument("--refine-blocks", type=int, default=3)
    ap.add_argument("--final-tex-iters", type=int, default=0,
                    help="final texture-refit iterations at the finest "
                         "stage (0 = use --tex-iters)")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "is overridden by this image's sitecustomize)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), os.pardir, "artifacts", "config3.json"))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.experiments import harness

    imsize = args.image
    cow = pt.make_cow()
    verts = cow.verts[0]
    center = verts.mean(0)
    scale = jnp.max(jnp.abs(verts - center))
    cow = cow.offset_verts(
        -jnp.broadcast_to(center, verts.shape)).scale_verts(3.0 / scale)

    # True scene: reference-style cameras at dist 6.7 + the UV texture.
    # N views of the SAME textured cow, azims spread around it.
    nv_ = max(1, args.views)
    true_elev = jnp.full((nv_,), 30.0)
    true_azim = 120.0 + (360.0 / nv_) * jnp.arange(nv_) if nv_ > 1 \
        else jnp.full((1,), 120.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0), batch=nv_)
    r, t = pt.look_at_view_transform(dist=6.7, elev=true_elev,
                                     azim=true_azim)
    cam_true = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    cow_n = cow.extend(nv_)
    stages = [int(s) for s in args.schedule.split(",") if s] or [imsize]
    imsize = stages[-1]
    target = harness.get_hard_rendering(cow_n, cam_true, lights,
                                        stages[0])[..., :3]     # (nv, H, W, 3)

    # Perturbed start: white texture, every view's camera offset by the
    # same (delta_elev, delta_azim) (eval.py:233-236).
    d_elev = args.elev0 - 30.0
    d_azim = args.azim0 - 120.0
    elev0 = true_elev + d_elev
    azim0 = true_azim + d_azim
    n_verts = cow.max_verts
    # Reference-default fine smoothing is (sigma, gamma)=(1e-3, 1e-2)
    # (eval.py:69).  At fine smoothing the blur band is ~3 px, so camera
    # errors past a few degrees sit outside the capture basin; larger
    # smoothing widens the basin but biases the L1 minimum (the blur halo
    # tilts it ~degrees off-true).  The coarse-to-fine anneal resolves
    # both: start coarse, divide sigma/gamma per segment.
    sigma, gamma = args.sigma0, args.gamma0

    def build_renderer(ims, sig, gam):
        sr, sa = harness.make_smoothers("gaussian", sig, gam, 1.0,
                                        args.samples)
        settings = pt.RasterizationSettings(
            image_size=ims, blur_radius=harness._BLUR_CONST * sig,
            faces_per_pixel=args.k, perspective_correct=False)
        return pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(raster_settings=settings),
            shader=pt.RandomPhongShader.create(
                lights=lights,
                blend_params=pt.BlendParams(sigma=sig, gamma=gam,
                                            background_color=(0., 0., 0.)),
                smoothrast=sr, smoothagg=sa))

    renderer = build_renderer(stages[0], sigma, gamma)

    t0 = time.time()
    vrgb0 = jnp.ones((1, n_verts, 3))
    lloc = jnp.array([[0.0, 2.0, -2.0]])
    zdef = jnp.zeros((n_verts, 3))
    warmup_losses = np.zeros(0)
    total_iters = args.iters + args.warmup_iters
    if args.warmup_iters > 0:
        # Phase 1: texture-only at the (wrong) init cameras — the texture
        # reaches its profile optimum, so later camera partials are the
        # profiled-loss gradient (envelope theorem).
        _, ph1, warmup_losses = harness.optimize_scene_params(
            cow_n, elev0, azim0, lloc, zdef, vrgb0,
            renderer, [target], key=jax.random.PRNGKey(args.seed + 1),
            lr_init=args.lr, Niter=args.warmup_iters, adapt_reg=False,
            segment_size=min(args.segment, args.warmup_iters),
            texture_smoothing_weight=args.tex_smooth,
            param_to_check={"camera": False, "textures": True,
                            "vertices": False, "light": False})
        vrgb0 = ph1["verts_rgb"]

    if args.alternate > 0:
        # Block alternation (coordinate descent on the profiled loss):
        # each block refits the texture at frozen cameras, then moves the
        # cameras with the texture frozen — clean envelope gradients, no
        # fast/slow tracking lag — annealing sigma/gamma per block.
        # With a --schedule, the full alternation runs at the COARSEST
        # size (where the 4-view profiled landscape is measured
        # convergent), then each finer size runs --refine-blocks blocks
        # from the coarse solution: the cameras arrive inside the
        # matched-texture basin, so the fine-scale landscape's spurious
        # structure (which diverged a cold 256^2 start to ~90 deg,
        # r3 queue log) is never visited.
        tex_kw = {"camera": False, "textures": True,
                  "vertices": False, "light": False}
        cam_kw = {"camera": True, "textures": False,
                  "vertices": False, "light": False}
        losses_acc = []
        best, final = None, None
        sig_b, gam_b = sigma, gamma
        elev_b, azim_b = elev0, azim0
        total_iters = args.warmup_iters
        first_block = True
        for si, ims in enumerate(stages):
            n_blocks = args.alternate if si == 0 else args.refine_blocks
            if si > 0:
                target = harness.get_hard_rendering(
                    cow_n, cam_true, lights, ims)[..., :3]
            for b in range(n_blocks):
                if not first_block:
                    sig_b /= args.adapt_sigma
                    gam_b /= args.adapt_gamma
                first_block = False
                renderer = build_renderer(ims, sig_b, gam_b)
                _, ph_t, ls_t = harness.optimize_scene_params(
                    cow_n, elev_b, azim_b, lloc, zdef, vrgb0,
                    renderer, [target],
                    key=jax.random.PRNGKey(args.seed + 101 + 50 * si + b),
                    lr_init=args.lr, Niter=args.tex_iters, adapt_reg=False,
                    segment_size=args.tex_iters, param_to_check=tex_kw,
                    texture_smoothing_weight=args.tex_smooth)
                vrgb0 = ph_t["verts_rgb"]
                best_c, ph_c, ls_c = harness.optimize_scene_params(
                    cow_n, elev_b, azim_b, lloc, zdef, vrgb0,
                    renderer, [target],
                    key=jax.random.PRNGKey(args.seed + 201 + 50 * si + b),
                    lr_init=args.lr, Niter=args.cam_iters, adapt_reg=False,
                    segment_size=args.cam_iters, param_to_check=cam_kw,
                    lr_scales={"camera_elev": args.cam_lr_scale,
                               "camera_azim": args.cam_lr_scale})
                # Carry the camera-phase BEST iterate (its loss is
                # evaluated at the frozen profile texture — the profiled
                # objective).
                elev_b, azim_b = (best_c["camera_elev"],
                                  best_c["camera_azim"])
                losses_acc.extend([ls_t, ls_c])
                total_iters += args.tex_iters + args.cam_iters
                print(f"stage {ims} block {b}: sigma={sig_b:.2e} "
                      f"elev_err={np.abs(np.asarray(elev_b) - np.asarray(true_elev)).max():.2f} "
                      f"azim_err={np.abs(np.asarray(azim_b) - np.asarray(true_azim)).max():.2f} "
                      f"loss={float(ls_c[-1]):.5f}", flush=True)
        # Final texture refit at the converged cameras (finest stage).
        n_final = args.final_tex_iters or args.tex_iters
        best, final, ls_f = harness.optimize_scene_params(
            cow_n, elev_b, azim_b, lloc, zdef, vrgb0,
            renderer, [target], key=jax.random.PRNGKey(args.seed + 999),
            lr_init=args.lr, Niter=n_final, adapt_reg=False,
            segment_size=n_final, param_to_check=tex_kw,
            texture_smoothing_weight=args.tex_smooth)
        losses_acc.append(ls_f)
        total_iters += n_final
        losses = np.concatenate(losses_acc)
        best = dict(best, camera_elev=elev_b, camera_azim=azim_b)
    else:
        assert len(stages) == 1, "--schedule requires --alternate > 0"
        # Phase 2: joint, slow camera / fast texture, annealed.
        best, final, losses = harness.optimize_scene_params(
            cow_n, elev0, azim0, lloc, zdef, vrgb0,
            renderer, [target], key=jax.random.PRNGKey(args.seed),
            lr_init=args.lr, Niter=args.iters, adapt_reg=True,
            adapt_params=(args.adapt_sigma, args.adapt_gamma),
            anneal_start=args.anneal_start, segment_size=args.segment,
            lr_decay=args.lr_decay,
            param_to_check={"camera": True, "textures": True,
                            "vertices": False, "light": False},
            # elev/azim are in degrees; the texture is 0-1.  One Adam step
            # size cannot serve both units — and the camera must move
            # SLOWLY relative to the texture's tracking of its optimum.
            texture_smoothing_weight=args.tex_smooth,
            lr_scales={"camera_elev": args.cam_lr_scale,
                       "camera_azim": args.cam_lr_scale,
                       "verts_rgb": args.tex_lr_scale})
    wall = time.time() - t0

    elev_err = np.abs(np.asarray(best["camera_elev"]) - np.asarray(true_elev))
    azim_err = np.abs(np.asarray(best["camera_azim"]) - np.asarray(true_azim))

    # Texture recovery: best per-vertex colors vs the UV map sampled at
    # each vertex (the vertex-resolution projection of the true texture).
    tex = pt.make_cow().textures
    maps = np.asarray(tex.maps[0])
    uvs = np.asarray(tex.verts_uvs[0])
    hh, ww = maps.shape[:2]
    px = np.clip((uvs[:, 0] * (ww - 1)), 0, ww - 1)
    py = np.clip(((1.0 - uvs[:, 1]) * (hh - 1)), 0, hh - 1)
    true_vrgb = maps[py.astype(int), px.astype(int)]       # nearest is fine
    best_vrgb = np.clip(np.asarray(best["verts_rgb"][0]), 0.0, 1.0)
    tex_mae_init = float(np.abs(1.0 - true_vrgb).mean())
    tex_mae_best = float(np.abs(best_vrgb - true_vrgb).mean())

    rec = {
        "config": "BASELINE config 3: cow-class mesh (5120 faces, UV "
                  "target), joint camera-pose + vertex-texture, "
                  f"{imsize}^2, sigma/gamma annealing, "
                  f"{nv_} view(s), shared texture",
        "iters_total": int(total_iters),
        "warmup_iters": args.warmup_iters,
        "alternate_blocks": args.alternate,
        "views": nv_,
        "warmup_loss_first": (float(warmup_losses[0])
                              if len(warmup_losses) else None),
        "loss_first": float(losses[0]) if len(losses) else None,
        "loss_last": float(losses[-1]) if len(losses) else None,
        "loss_best": float(np.min(losses)) if len(losses) else None,
        "camera_err_deg_init": [abs(d_elev), abs(d_azim)],
        "camera_err_deg_final": {
            "elev_per_view": [round(float(x), 3) for x in elev_err],
            "azim_per_view": [round(float(x), 3) for x in azim_err],
            "max": round(float(max(elev_err.max(), azim_err.max())), 3)},
        "texture_mae_vs_true_init": round(tex_mae_init, 4),
        "texture_mae_vs_true_best": round(tex_mae_best, 4),
        "recipe": {"sigma0": args.sigma0, "gamma0": args.gamma0,
                   "adapt": [args.adapt_sigma, args.adapt_gamma],
                   "anneal_start": args.anneal_start,
                   "segment": args.segment, "samples": args.samples,
                   "lr": args.lr, "lr_decay": args.lr_decay,
                   "cam_lr_scale": args.cam_lr_scale,
                   "tex_lr_scale": args.tex_lr_scale, "seed": args.seed,
                   "warmup_iters": args.warmup_iters,
                   "alternate": args.alternate,
                   "tex_iters": args.tex_iters,
                   "cam_iters": args.cam_iters},
        "wall_seconds_total": round(wall, 1),
        "renders_per_sec_incl_compile": round(total_iters * nv_ / wall, 2),
        "backend": jax.default_backend(),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))

    # Visual evidence: target | final render per view.
    try:
        from pertrenderer_tpu.utils import artifacts as _art

        r2, t2 = pt.look_at_view_transform(
            dist=6.7, elev=jnp.asarray(best["camera_elev"]),
            azim=jnp.asarray(best["camera_azim"]))
        cam_f = pt.PerspectiveCameras.create(R=r2, T=t2)
        mesh_f = cow_n.with_textures(pt.TexturesVertex(jnp.broadcast_to(
            jnp.clip(best["verts_rgb"], 0.0, 1.0),
            (nv_, n_verts, 3))))
        final_imgs = renderer(mesh_f, key=jax.random.PRNGKey(7),
                              cameras=cam_f, lights=lights)[..., :3]
        grid = np.concatenate([np.asarray(target), np.asarray(final_imgs)],
                              axis=0)
        outdir = os.path.dirname(os.path.abspath(args.out))
        path = _art.image_grid(grid, outdir, rows=2, cols=nv_)
        if path:
            final_path = os.path.join(outdir, "config3_views.png")
            os.replace(path, final_path)
            print(f"saved {final_path} (top row targets, bottom row final "
                  "renders)")
    except Exception as e:   # pragma: no cover - visualization only
        print(f"grid render skipped: {e!r}")


if __name__ == "__main__":
    main()
