"""Headline benchmark: fused fwd+bwd perturbed renders/sec on one chip.

Config per BASELINE.json: 256^2 image, faces_per_pixel=50, cube scene,
GaussianRast + GaussianAgg (S=8 MC samples), gradients w.r.t. pose AND the
smoothing parameters — matching the reference's per-iteration work
(`/root/reference/experiments/eval.py:349-369`) with zero host round-trips.

Measurement: iterations run inside a jitted ``lax.scan`` (exactly how the
pose optimizer runs) and per-iteration time is the slope between two scan
lengths with the final loss fetched to host — this backend resolves
``block_until_ready`` lazily, so naive dispatch loops under-measure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 5000 renders/sec north star.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_scan(image_size=256, faces_per_pixel=50, nb_samples=8):
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

    def loss_fn(log_rot, sigma_, gamma_, alpha_, keys):
        # Gradients to exactly the reference's learnable leaves: pose +
        # sigma/gamma/alpha (eval.py:331,383) — textures/cameras/lights stay
        # constants, as in the reference pose loop.
        r = renderer.replace(shader=renderer.shader.update_smoothing(
            sigma=sigma_, gamma=gamma_, alpha=alpha_))
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(
            Rotate(rot).transform_points(mesh.verts_padded()))
        # One fused loss+grad kernel per step on TPU (renderer.render_loss).
        return r.render_loss(pred, target, key=(keys[0], keys[1]),
                             cameras=cameras, lights=lights)

    def make(n):
        @jax.jit
        def run(log_rot, key):
            sig0, gam0, alp0 = renderer.shader.get_smoothing()
            # Pre-split per-iteration keys: an in-loop threefry split lowers
            # to a scalar while-loop worth ~ms per iteration on TPU.
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


def check_prng_identity():
    """Three-level PRNG identity pin against the committed CPU goldens
    (tests/goldens/prng_goldens.npz; see fused_render.prng_probe):

    1. The 'uniform' stage (integer hash + power-of-two scale) must be
       BIT-EXACT compiled on this chip vs the CPU-recorded goldens.
    2. gaussian/cauchy compiled vs Pallas-interpreter ON THIS CHIP must be
       bit-exact — a Mosaic toolchain update that split the numerics the
       kernels compile to from the numerics jnp traces fails here.
    3. gaussian/cauchy compiled vs the CPU goldens must agree to a tight
       tolerance (TPU fast transcendentals — log is ~1e-4 relative off CPU
       libm — make cross-platform bit-identity unattainable; measured
       2026-08-18, NOTES.md)."""
    import os

    from pertrenderer_tpu.ops import fused_render as fr

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "goldens", "prng_goldens.npz")
    try:
        ref = np.load(path)
        u = np.asarray(fr.prng_probe("uniform", interpret=False))
        if not np.array_equal(u, ref["uniform"]):
            print("PRNG uniform stage NOT bit-exact vs CPU goldens: max "
                  f"diff {np.abs(u - ref['uniform']).max()}",
                  file=sys.stderr)
            return False
        for nt, tol, rel in (("gaussian", 5e-4, False),
                             ("cauchy", 1e-5, True)):
            got = np.asarray(fr.prng_probe(nt, interpret=False))
            interp = np.asarray(fr.prng_probe(nt, interpret=True))
            if not np.array_equal(got, interp):
                print(f"PRNG {nt}: compiled != interpreter on-chip, max "
                      f"diff {np.abs(got - interp).max()}", file=sys.stderr)
                return False
            d = np.abs(got - ref[nt])
            if rel:
                d = d / np.maximum(np.abs(ref[nt]), 1e-6)
            if d.max() > tol:
                print(f"PRNG {nt}: vs CPU goldens diff {d.max()} > {tol}",
                      file=sys.stderr)
                return False
        print("PRNG identity pin: OK (uniform bit-exact; compiled=="
              "interpreter on-chip; draws within tolerance of CPU goldens)",
              file=sys.stderr)
        return True
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"PRNG identity check errored: {e!r}", file=sys.stderr)
        return False


def check_geometry_identity():
    """Geometry transforms must be EXACT f32 on this backend: the MXU's
    default matmul pass rounds f32 operands to bfloat16 (~2e-3 relative),
    which moves every vertex under an identity rotation by more than a
    sigma=1e-3 blur band (measured 2026-08-19: 6.2e-3 absolute on a
    radius-3 mesh).  transforms/cameras pin Precision.HIGHEST; this check
    fails if a regression (or a new unannotated matmul) reintroduces it."""
    import pertrenderer_tpu as pt
    from pertrenderer_tpu.transforms import Rotate, so3_exp_map

    try:
        verts, _ = pt.make_icosphere(2)
        base = jnp.asarray(verts, jnp.float32)[None] * 3.0
        out = jax.jit(lambda lr: Rotate(so3_exp_map(lr)).transform_points(
            base))(jnp.zeros((1, 3)))
        if not np.array_equal(np.asarray(out), np.asarray(base)):
            print("geometry identity pin FAILED: identity rotation moved "
                  f"vertices by {np.abs(np.asarray(out - base)).max()}",
                  file=sys.stderr)
            return False
        print("geometry identity pin: OK (identity rotation bit-exact "
              "compiled)", file=sys.stderr)
        return True
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"geometry identity check errored: {e!r}", file=sys.stderr)
        return False


def check_camera_projection():
    """Camera pipeline precision pin (the round-4 bug class, extended per
    VERDICT r4 #6): ``look_at_view_transform`` + NDC projection compiled on
    this chip vs a float64 NumPy mirror of the same formulas, values AND
    elev/azim gradients.  The MXU bf16 default pass perturbs these by
    ~2e-3 relative; exact-f32 evaluation sits at ~1e-6.  Central f64 FD of
    the NumPy mirror is the gradient ground truth (immune to on-chip
    rounding, unlike on-chip FD which inherits it)."""
    import pertrenderer_tpu as pt

    def np_pipeline(elev_deg, azim_deg, pts):
        # float64 mirror of look_at_view_transform + transform_points_ndc
        # (cameras.py:157-184,98-115) for dist=6.7, fov=60, aspect=1.
        dist, el, az = 6.7, np.deg2rad(elev_deg), np.deg2rad(azim_deg)
        c = np.array([dist * np.cos(el) * np.sin(az), dist * np.sin(el),
                      dist * np.cos(el) * np.cos(az)])
        z_axis = -c / np.linalg.norm(c)
        x_axis = np.cross(np.array([0.0, 1.0, 0.0]), z_axis)
        x_axis = x_axis / np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        y_axis = y_axis / np.linalg.norm(y_axis)
        r = np.stack([x_axis, y_axis, z_axis], axis=-1)
        t = -c @ r
        view = pts @ r + t
        s = 1.0 / np.tan(0.5 * np.deg2rad(60.0))
        return np.stack([s * view[:, 0] / view[:, 2],
                         s * view[:, 1] / view[:, 2], view[:, 2]], axis=-1)

    def jx_pipeline(elev, azim, pts):
        r, t = pt.look_at_view_transform(dist=6.7, elev=elev, azim=azim)
        cam = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
        return cam.transform_points_ndc(pts[None])[0]

    try:
        rng = np.random.RandomState(0)
        pts64 = rng.uniform(-1.5, 1.5, size=(64, 3))
        pts = jnp.asarray(pts64, jnp.float32)
        elev, azim = 30.0, 120.0

        ndc = np.asarray(jax.jit(jx_pipeline)(elev, azim, pts), np.float64)
        ref = np_pipeline(elev, azim, pts64)
        rel = np.abs(ndc - ref).max() / np.abs(ref).max()
        if rel > 3e-5:
            print("camera projection pin FAILED: compiled NDC vs float64 "
                  f"mirror rel err {rel:.2e} > 3e-5 (bf16 MXU pass "
                  "suspected)", file=sys.stderr)
            return False

        # elev/azim gradients of a fixed functional of the projection.
        w64 = rng.uniform(-1.0, 1.0, size=(64, 3))
        w = jnp.asarray(w64, jnp.float32)
        g = jax.jit(jax.grad(
            lambda ea: jnp.sum(w * jx_pipeline(ea[0], ea[1], pts)),
            argnums=0))(jnp.asarray([elev, azim]))
        h = 1e-4
        fd = np.array([
            ((w64 * np_pipeline(elev + h, azim, pts64)).sum()
             - (w64 * np_pipeline(elev - h, azim, pts64)).sum()) / (2 * h),
            ((w64 * np_pipeline(elev, azim + h, pts64)).sum()
             - (w64 * np_pipeline(elev, azim - h, pts64)).sum()) / (2 * h)])
        grel = np.abs(np.asarray(g, np.float64) - fd).max() / np.abs(fd).max()
        if grel > 1e-3:
            print("camera gradient pin FAILED: compiled elev/azim grads vs "
                  f"float64 FD rel err {grel:.2e} > 1e-3", file=sys.stderr)
            return False
        print(f"camera projection pin: OK (NDC rel {rel:.1e}, "
              f"look_at grads rel {grel:.1e} vs float64 mirror)",
              file=sys.stderr)
        return True
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"camera projection check errored: {e!r}", file=sys.stderr)
        return False


def main():
    prng_ok = check_prng_identity()
    geom_ok = check_geometry_identity()
    cam_ok = check_camera_projection()
    make = build_scan()
    x0 = jnp.zeros((1, 3))
    k0 = jax.random.PRNGKey(0)
    # 400-step slope: the relay's per-dispatch round-trip jitters by a few
    # ms, so short scans (the old 5/105) put ±8% of noise on the slope;
    # 55/455 keeps the delta ~100 ms of device time (measured 2026-08-21:
    # back-to-back 400-step slopes on identical code agree to ~±7%, the
    # residual being real chip-session drift, not measurement noise).
    n1, n2 = 55, 455
    times = {}
    for n in (n1, n2):
        run = make(n)
        t0 = time.time()
        _ = float(run(x0, k0))  # compile + first run
        print(f"compile+run n={n}: {time.time() - t0:.1f}s", file=sys.stderr)
        ts = []
        for _ in range(3):
            t0 = time.time(); _ = float(run(x0, k0)); ts.append(time.time() - t0)
        times[n] = min(ts)
    per_iter = (times[n2] - times[n1]) / (n2 - n1)
    renders_per_sec = 1.0 / max(per_iter, 1e-9)

    print(json.dumps({
        "metric": "fwd+bwd perturbed renders/sec/chip @256^2 K=50 S=8",
        "value": round(renders_per_sec, 2),
        "unit": "renders/sec",
        "vs_baseline": round(renders_per_sec / 5000.0, 4),
        "prng_identity_pin": prng_ok,
        "geometry_identity_pin": geom_ok,
        "camera_projection_pin": cam_ok,
    }))


if __name__ == "__main__":
    main()
