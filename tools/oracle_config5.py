"""At-scale correctness oracle for BASELINE config 5 (81,920 faces, 512²,
K=150): parity of the fused binned Pallas renderer against the staged XLA
path run strip-by-strip.

The full-image staged pass cannot run this config (lane-padded fragment
tensors exceed HBM), so it has never served as an oracle at scale.  The
strip path (ops/rasterize.rasterize_planar_rows) bounds residency by the
strip's pixel count and uses FLAT chunked selection — every face tested
for every pixel, no binning anywhere — making it an independent oracle for
both the fused kernel's hierarchical bin selection and its in-kernel math.

Checks (deterministic softras member — SoftRast+SoftAgg — so parity is
exact math, not distribution):
  1. forward RGBA parity on several 32-row strips, against BOTH the
     K=`--k` oracle (the reference's truncated semantics) and a high-K
     effectively-untruncated oracle (`--k-exact`, default 800 — above the
     worst per-pixel candidate count at this density).  The binned fused
     path is an M-per-tile approximation: its error should sit at the
     K-truncation scale (~3e-2 here), not O(1);
  2. pose-gradient parity on one strip (fused loss restricted to the strip
     by a target equal to the fused render elsewhere; zero L2 diff pixels
     contribute zero gradient).

Writes artifacts/oracle_config5.json.

    python tools/oracle_config5.py [--image 512] [--k 150] [--strips 3]
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
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--k", type=int, default=150)
    ap.add_argument("--k-exact", type=int, default=800)
    ap.add_argument("--level", type=int, default=6)   # 81,920 faces
    ap.add_argument("--rc", type=int, default=32)     # strip rows
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), os.pardir, "artifacts",
        "oracle_config5.json"))
    args = ap.parse_args()

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.ops.rasterize import rasterize_planar_rows
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    imsize, k = args.image, args.k
    verts, faces = pt.make_icosphere(args.level)
    mesh = pt.Meshes.create(
        verts, faces,
        textures=pt.TexturesVertex(
            0.5 + 0.5 * jnp.abs(jnp.asarray(verts))[None]))
    mesh = mesh.scale_verts(3.0)

    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=blur, faces_per_pixel=k,
        max_faces_per_bin=50000, perspective_correct=False)
    shader = pt.RandomPhongShader.create(
        cameras=cameras, lights=lights,
        blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                    background_color=(0.0, 0.0, 0.0)),
        smoothrast=pt.SoftRast.create(sigma=sigma),
        smoothagg=pt.SoftAgg.create(gamma=gamma))

    def build(settings_):
        return pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                                raster_settings=settings_),
            shader=shader)

    # Both fused routes: streaming (the DEFAULT — exact at any coverage
    # density) and M-slot binned (the documented fast approximation,
    # explicit opt-in via bin_overflow='allow').
    renderers = {"stream": build(settings)}
    settings_binned = dataclasses.replace(settings, bin_overflow="allow")
    if imsize > 128:
        renderers["binned"] = build(settings_binned)
    for name, rr in renderers.items():
        plan = rr.plan(mesh)
        assert plan.mode == name, (name, plan)
    key = jax.random.PRNGKey(0)

    # Strip oracles, computed once (mode-independent targets).
    h = imsize
    strip_starts = [h // 4, h // 2 - args.rc // 2, 5 * h // 8]
    settings_exact = dataclasses.replace(settings,
                                         faces_per_pixel=args.k_exact)
    oracle_imgs, oracle_imgs_exact = {}, {}
    for r0 in strip_starts:
        frag = rasterize_planar_rows(mesh, cameras, settings, r0, args.rc)
        oracle_imgs[r0] = np.asarray(
            shader(frag, mesh, key=key, cameras=cameras))
        frag_x = rasterize_planar_rows(mesh, cameras, settings_exact,
                                       r0, args.rc)
        oracle_imgs_exact[r0] = np.asarray(
            shader(frag_x, mesh, key=key, cameras=cameras))

    base_verts = mesh.verts_padded()

    def rotated(log_rot):
        rot = so3_exp_map(log_rot)
        return mesh.update_padded(Rotate(rot).transform_points(base_verts))

    rec = {
        "config": f"BASELINE config 5 oracle: icosphere level {args.level} "
                  f"({int(mesh.num_faces[0])} faces), {imsize}^2, K={k}, "
                  "softras member, fused modes vs flat strip oracle "
                  "(stream = default exact route; binned = bin_overflow="
                  "'allow' opt-in approximation)",
        "k_exact": args.k_exact,
        "backend": jax.default_backend(),
        "modes": {},
    }

    r0_mid = strip_starts[1]
    for name, rr in renderers.items():
        t0 = time.time()
        img_fused = np.asarray(jax.jit(lambda m: rr(m, key=key))(mesh))
        t_fused = time.time() - t0
        print(f"[{name}] render: {t_fused:.1f}s (incl compile), coverage="
              f"{float((img_fused[..., 3] > 0).mean()):.3f}")

        fwd_errs, fwd_errs_exact = {}, {}
        for r0 in strip_starts:
            err = float(np.abs(img_fused[:, r0:r0 + args.rc]
                               - oracle_imgs[r0]).max())
            err_x = float(np.abs(img_fused[:, r0:r0 + args.rc]
                                 - oracle_imgs_exact[r0]).max())
            fwd_errs[str(r0)] = err
            fwd_errs_exact[str(r0)] = err_x
            print(f"[{name}] strip rows [{r0}, {r0 + args.rc}): max "
                  f"|fused - oracle| = {err:.3e} (K={k}), {err_x:.3e} "
                  f"(K={args.k_exact})")

        # Pose-gradient parity on the middle strip: the fused loss sees a
        # target equal to its own render outside the strip (zero L2
        # residual pixels contribute zero gradient), zeros inside it.
        target_full = img_fused[..., :3].copy()
        target_full[:, r0_mid:r0_mid + args.rc] = 0.0
        target_full = jnp.asarray(target_full)

        def loss_fused(log_rot, rr=rr):
            return rr.render_loss(rotated(log_rot), target_full, key=key,
                                  cameras=cameras, lights=lights)

        def loss_strip(log_rot):
            frag = rasterize_planar_rows(rotated(log_rot), cameras,
                                         settings, r0_mid, args.rc)
            img = shader(frag, rotated(log_rot), key=key, cameras=cameras)
            return jnp.mean(img[..., :3] ** 2)

        log_rot = jnp.zeros((1, 3))
        g_fused = np.asarray(jax.jit(jax.grad(loss_fused))(log_rot))
        g_strip = np.asarray(jax.jit(jax.grad(loss_strip))(log_rot))
        # mean over H rows vs mean over rc rows
        g_fused_scaled = g_fused * (imsize / args.rc)
        rel = float(np.abs(g_fused_scaled - g_strip).max() /
                    max(np.abs(g_strip).max(), 1e-12))
        print(f"[{name}] pose grad (strip-restricted): fused*H/rc="
              f"{g_fused_scaled}, oracle={g_strip}, rel err={rel:.3e}")

        # Full loss+grad step rate (scan slope, NOTES.md methodology).
        def make(n, rr=rr):
            zero_t = jnp.zeros((1, imsize, imsize, 3))

            @jax.jit
            def run(log_rot):
                def body(lr, _):
                    loss, g = jax.value_and_grad(
                        lambda a: rr.render_loss(rotated(a), zero_t,
                                                 key=key, cameras=cameras,
                                                 lights=lights))(lr)
                    return lr - 1e-6 * g, loss
                lr, losses = jax.lax.scan(body, log_rot, None, length=n)
                return jnp.sum(losses) + jnp.sum(lr)
            return run

        times = {}
        for n in (2, 6):
            run = make(n)
            _ = float(run(log_rot))
            t0 = time.time()
            _ = float(run(log_rot))
            times[n] = time.time() - t0
        ms = (times[6] - times[2]) / 4 * 1e3
        print(f"[{name}] loss+grad step: {ms:.1f} ms ({1e3 / ms:.2f} "
              "renders/s)")

        rec["modes"][name] = {
            "forward_max_abs_err_by_strip": fwd_errs,
            "forward_max_abs_err_by_strip_untruncated": fwd_errs_exact,
            "pose_grad_rel_err": rel,
            "step_ms": ms,
            "renders_per_s": 1e3 / ms,
        }

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
