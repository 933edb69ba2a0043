"""Does config-5-scale pose optimization converge through each fused route?

VERDICT r3 #4: decide the fate of the approximate binned mode WITH DATA.
Runs the same pose-recovery problem (82k-face icosphere, 512^2, K=150,
GaussianRast+GaussianAgg, S=8 — BASELINE config 5) through:

  * ``stream`` — the default exact streaming route;
  * ``binned`` — the opt-in M-slot approximation (bin_overflow='allow'),
    whose committed oracle shows O(1) forward error and ~2.5 relative
    pose-gradient error at this density.

and records the SO(3) angle-error trajectory, wall time, and per-step rate
for each.  (The staged XLA path cannot run this config at all: lane-padded
fragment tensors exceed HBM — NOTES.md.)

    python tools/compare_config5_opt.py [--iters 200] [--image 512]
        [--level 6] [--pert 20] [--out artifacts/config5_opt_compare.json]
"""

import argparse
import dataclasses
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
    ap.add_argument("--adapt", action="store_true", default=True)
    ap.add_argument("--no-adapt", dest="adapt", action="store_false")
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--k", type=int, default=150)
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--level", type=int, default=6)
    ap.add_argument("--pert", type=float, default=20.0)  # degrees
    ap.add_argument("--lr", type=float, default=3e-2)
    # Coarse-to-fine smoothing: at 512^2 the sharp target's sub-band detail
    # creates spurious minima for the fine-sigma objective (measured: a
    # 15 deg start diverges to ~29 deg at sigma=1e-3 while the same problem
    # at 64^2 converges).  Start coarse; annealing divides back down to the
    # config's (1e-3, 1e-2) by the end of the run.
    ap.add_argument("--sigma0", type=float, default=6e-3)
    ap.add_argument("--gamma0", type=float, default=6e-2)
    ap.add_argument("--adapt-params", type=float, nargs=2,
                    default=(1.35, 1.35))
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--dispatch", type=int, default=10,
                    help="max optimization steps per XLA dispatch (0 = one "
                         "dispatch per segment).  At coarse sigma a config-5 "
                         "stream step costs ~1-2 s; a 50-step segment in ONE "
                         "execution exceeds the relay's device-execution "
                         "window (reproducible UNAVAILABLE) while the same "
                         "segment as 10-step dispatches runs fine")
    ap.add_argument("--modes", nargs="+", default=["stream", "binned"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), os.pardir, "artifacts",
        "config5_opt_compare.json"))
    args = ap.parse_args()

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.experiments.harness import optimize_pose
    from pertrenderer_tpu.transforms import (Rotate, so3_exp_map,
                                             so3_relative_angle)

    imsize = args.image
    verts, faces = pt.make_icosphere(args.level)
    # Low-frequency ASYMMETRIC texture: the previous 0.5+0.5|v| pattern has
    # octahedral symmetry, making the pose nearly unidentifiable (a 20-deg
    # rotation barely changes the image; measured: loss flat at 0.058 for
    # both modes over 200 iters).  Distinct incommensurate phases per
    # channel give every rotation a unique appearance.
    v = jnp.asarray(verts)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    tex = jnp.stack([0.5 + 0.5 * jnp.sin(2.3 * x + 1.3 * y + 0.7),
                     0.5 + 0.5 * jnp.sin(1.7 * y + 2.9 * z + 1.1),
                     0.5 + 0.5 * jnp.sin(3.1 * z + 1.9 * x + 2.3)], axis=-1)
    mesh = pt.Meshes.create(verts, faces, textures=pt.TexturesVertex(
        tex[None]))
    mesh = mesh.scale_verts(3.0)

    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))

    # Ground truth: a random true rotation; target is its HARD render
    # (blur 0, hard winner-take-all — the reference's target recipe,
    # eval.py:265-283).  Rendered through the fused HardRast+HardAgg member
    # (same nearest-covering-face image as the staged K=1 HardPhongShader,
    # ~0.4 s vs ~690 s for the staged path at this face count) and cached
    # on disk keyed by the scene config.
    key = jax.random.PRNGKey(args.seed)
    k_axis, key = jax.random.split(key)
    axis = jax.random.normal(k_axis, (1, 3))
    axis = axis / jnp.linalg.norm(axis)
    log_rot_true = axis * jnp.deg2rad(args.pert)
    r_true = so3_exp_map(log_rot_true)
    target_mesh = mesh.update_padded(
        Rotate(r_true).transform_points(mesh.verts_padded()))
    cache = os.path.join("/tmp", f"c5target_{args.level}_{imsize}_"
                         f"{args.seed}_{args.pert:g}.npy")
    if os.path.exists(cache):
        target = np.load(cache)
        print(f"hard target: cached ({cache})", file=sys.stderr)
    else:
        hard = pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(
                cameras=cameras,
                raster_settings=pt.RasterizationSettings(
                    image_size=imsize, blur_radius=0.0,
                    faces_per_pixel=args.k, perspective_correct=False)),
            shader=pt.RandomPhongShader.create(
                cameras=cameras, lights=lights,
                blend_params=pt.BlendParams(
                    background_color=(0.0, 0.0, 0.0)),
                smoothrast=pt.HardRast.create(),
                smoothagg=pt.HardAgg.create()))
        t0 = time.time()
        target = np.asarray(hard(target_mesh, cameras=cameras,
                                 lights=lights))[..., :3]
        print(f"hard target: {time.time() - t0:.1f}s, "
              f"coverage={(target.sum(-1) > 0).mean():.3f}",
              file=sys.stderr)
        np.save(cache, target)

    sigma, gamma = args.sigma0, args.gamma0
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=blur, faces_per_pixel=args.k,
        max_faces_per_bin=50000, perspective_correct=False)

    def build(settings_):
        return pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                                raster_settings=settings_),
            shader=pt.RandomPhongShader.create(
                cameras=cameras, lights=lights,
                blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                            background_color=(0., 0., 0.)),
                smoothrast=pt.GaussianRast.create(sigma=sigma,
                                                  nb_samples=args.s),
                smoothagg=pt.GaussianAgg.create(gamma=gamma,
                                                nb_samples=args.s)))

    def angle_deg(log_rot):
        return float(jnp.rad2deg(so3_relative_angle(
            so3_exp_map(jnp.asarray(log_rot)), r_true)[0]))

    rec = {
        "config": f"config-5 pose-opt comparison: icosphere level "
                  f"{args.level} ({int(mesh.num_faces[0])} faces), "
                  f"{imsize}^2, K={args.k}, S={args.s}, gaussian member, "
                  f"{args.iters} iters Adam lr={args.lr}, "
                  f"{args.pert} deg true rotation",
        "backend": jax.default_backend(),
        "sigma0": args.sigma0,
        "gamma0": args.gamma0,
        "adapt_params": list(args.adapt_params),
        "max_dispatch_steps": args.dispatch,
        "modes": {},
    }

    init_angle = angle_deg(jnp.zeros((1, 3)))
    for mode in args.modes:
        st = settings if mode == "stream" else dataclasses.replace(
            settings, bin_overflow="allow")
        rr = build(st)
        plan = rr.plan(mesh)
        assert plan.mode == mode, (mode, plan)
        capacity = None
        if mode == "binned":
            # Record the binned route's real capacity pressure at this
            # scale (VERDICT r3 #6 / r4 #7): the overflow scalars come back
            # as jittable prepass outputs; the 'warn'-policy check fires
            # the user-facing warning the opt-in ('allow') run suppresses.
            from pertrenderer_tpu.ops.fused_render import (
                capacity_stats, check_capacity_host)

            # mesh/cameras as jit ARGUMENTS — this backend zero-fills the
            # vmapped gather of large constant-embedded operands (NOTES.md
            # axon quirks), so a nullary closure reports zero candidates.
            stats = jax.device_get(jax.jit(
                lambda m, c: capacity_stats(
                    m, c, st, rr.shader.smoothrast, rr.shader.smoothagg,
                    lights, rr.shader.materials))(mesh, cameras))
            msg = check_capacity_host(settings, stats)  # 'warn' policy
            print(f"[binned] capacity: {msg}", file=sys.stderr)
            capacity = {k: int(v) for k, v in stats.items()}
            capacity["warning"] = msg
        t0 = time.time()
        res = optimize_pose(mesh, cameras, lights, jnp.zeros((1, 3)), rr,
                            (jnp.asarray(target),), key=key,
                            lr_init=args.lr, Niter=args.iters,
                            adapt_reg=args.adapt,
                            adapt_params=tuple(args.adapt_params),
                            anneal_sample_cap=args.s, segment_size=50,
                            max_dispatch_steps=args.dispatch or None)
        wall = time.time() - t0
        final = angle_deg(res.log_rot)
        best = angle_deg(res.best_log_rot)
        # Trajectory at segment boundaries is not stored; losses are.
        rec["modes"][mode] = {
            "init_angle_deg": init_angle,
            "final_angle_deg": final,
            "best_iterate_angle_deg": best,
            "loss_first": float(res.losses[0]),
            "loss_last": float(res.losses[-1]),
            "loss_min": float(res.losses.min()),
            "wall_s": wall,
            "per_iter_s": res.runtimes["per_iter"][0],
            "renders_per_s": 1.0 / max(res.runtimes["per_iter"][0], 1e-9),
            "capacity": capacity,
        }
        m = rec["modes"][mode]
        print(f"[{mode}] {init_angle:.2f} deg -> final {final:.2f} deg "
              f"(best {best:.2f}), loss {m['loss_first']:.4f} -> "
              f"{m['loss_last']:.4f}, {wall:.0f}s wall", file=sys.stderr)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
