"""Experiment harness: scene setup, renderer bank, jitted optimization loops.

TPU-first rebuild of the reference's experiment layer
(`/root/reference/experiments/eval.py`).  The key structural change (the
BASELINE.md north star): the reference crosses the host<->device boundary
every iteration (loss.item() at eval.py:358, .detach().cpu() at :371-374,
optimizer rebuild at :394); here the entire
render -> loss -> grad -> guard -> Adam update step is one jitted function,
and iterations run in ``lax.scan`` segments with zero host round-trips.
Annealing (eval.py:382-394) happens at segment boundaries on the host, since
it changes trace-time constants (MC sample count).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pertrenderer_tpu as pt
from pertrenderer_tpu.transforms import Rotate, so3_exp_map, so3_log_map

__all__ = [
    "NOISE_MENU", "init_renderers", "init_target",
    "init_base_mesh_cameras_lights", "optimize_pose",
    "optimize_scene_params", "get_hard_rendering", "PoseOptResult",
]

_BLUR_CONST = float(np.log(1.0 / 1e-4 - 1.0))


def make_smoothers(noise_type: str, sigma: float, gamma: float,
                   alpha: float = 1.0, nb_samples: int = 16):
    """The reference's noise-type menu
    (`/root/reference/experiments/eval.py:145-163`)."""
    if noise_type == "cauchy":
        return (pt.ArctanRast.create(sigma=sigma, nb_samples=nb_samples),
                pt.CauchyAgg.create(gamma=gamma, alpha=alpha,
                                    nb_samples=nb_samples))
    if noise_type == "gaussian":
        return (pt.GaussianRast.create(sigma=sigma, nb_samples=nb_samples),
                pt.GaussianAgg.create(gamma=gamma, alpha=alpha,
                                      nb_samples=nb_samples))
    if noise_type == "gaussian_wovr":
        return (pt.GaussianRast_wovr.create(sigma=sigma, nb_samples=nb_samples),
                pt.GaussianAgg_wovr.create(gamma=gamma, alpha=alpha,
                                           nb_samples=nb_samples))
    if noise_type == "uniform":
        return (pt.AffineRast.create(sigma=sigma, nb_samples=nb_samples),
                pt.HardAgg.create())
    if noise_type == "hard":
        return (pt.HardRast.create(), pt.HardAgg.create())
    if noise_type == "softras":
        return (pt.SoftRast.create(sigma=sigma),
                pt.SoftAgg.create(gamma=gamma, alpha=alpha))
    raise ValueError(f"unknown noise type {noise_type!r}")


NOISE_MENU = ("cauchy", "gaussian", "gaussian_wovr", "uniform", "hard",
              "softras")


def init_renderers(camera, lights, R_true, key, pert_init_intensity=30.0,
                   sigma=1e-2, gamma=5e-1, alpha=1.0, nb_samples=16,
                   noise_type=("cauchy",), imsize=128, faces_per_pixel=50):
    """Build the perturbed renderer bank + perturbed initial pose
    (`/root/reference/experiments/eval.py:124-180`)."""
    if pert_init_intensity == 0.0:
        R_init = pt.random_rotations(1, key)
    else:
        r_pert = jax.random.normal(key, (1, 3))
        r_pert = so3_exp_map(
            (pert_init_intensity * np.pi / 180.0)
            * r_pert / jnp.linalg.norm(r_pert, axis=1, keepdims=True))
        R_init = jnp.matmul(R_true, r_pert,
                            precision=jax.lax.Precision.HIGHEST)
    log_rot_init = so3_log_map(R_init)

    blend = pt.BlendParams(sigma=sigma, gamma=gamma,
                           background_color=(0.0, 0.0, 0.0))
    settings = pt.RasterizationSettings(
        image_size=imsize,
        blur_radius=_BLUR_CONST * sigma,
        faces_per_pixel=faces_per_pixel,
        max_faces_per_bin=50000,
        perspective_correct=False,
    )
    alpha = 1.0  # fixed, as at eval.py:142
    renderers = []
    for nt in noise_type:
        smoothrast, smoothagg = make_smoothers(nt, sigma, gamma, alpha,
                                               nb_samples)
        renderer = pt.MeshRenderer.create(
            rasterizer=pt.MeshRasterizer.create(cameras=camera,
                                                raster_settings=settings),
            shader=pt.RandomPhongShader.create(
                cameras=camera, lights=lights, blend_params=blend,
                smoothrast=smoothrast, smoothagg=smoothagg),
        )
        renderers.append(renderer)
    return log_rot_init, renderers


def _normalize_mesh(mesh):
    """Center and scale to the unit box
    (`/root/reference/experiments/eval.py:239-244`)."""
    verts = mesh.verts[0]
    center = verts.mean(0)
    scale = jnp.max(jnp.abs(verts - center))
    return mesh.offset_verts(-center[None, None, :].repeat(verts.shape[0], 1)
                             ).scale_verts(1.0 / scale)


def get_hard_rendering(mesh, camera, lights, imsize):
    """Hard Phong reference render
    (`/root/reference/experiments/eval.py:760-785`)."""
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=0.0, faces_per_pixel=1,
        max_faces_per_bin=100000)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=camera,
                                            raster_settings=settings),
        shader=pt.HardPhongShader.create(
            cameras=camera, lights=lights,
            blend_params=pt.BlendParams(background_color=(0.0, 0.0, 0.0))),
    )
    return renderer(mesh, cameras=camera, lights=lights)


def init_target(key, category="cube", shapenet_path=None, imsize=128):
    """Ground-truth scene + target render
    (`/root/reference/experiments/eval.py:183-292`).

    ShapeNet categories require ``shapenet_path`` with the extracted dataset
    (same layout as the reference's loader at eval.py:220-231).
    """
    if category == "cube":
        mesh = pt.load_cube()
    elif category == "sphere":
        verts, faces = pt.make_icosphere(3)
        mesh = pt.Meshes.create(verts, faces,
                                textures=pt.TexturesVertex(
                                    jnp.ones((1, verts.shape[0], 3))))
    else:
        mesh = _load_shapenet(category, shapenet_path)
    mesh = _normalize_mesh(mesh)

    num_views = 1
    elev = jnp.linspace(30.0, 240.0, num_views)
    azim = jnp.linspace(120.0, 150.0, num_views)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    if category not in ("cube",):
        mesh = mesh.scale_verts(3.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=elev, azim=azim)
    cameras = [pt.PerspectiveCameras.create(R=r[i:i + 1], T=t[i:i + 1],
                                            fov=60.0)
               for i in range(num_views)]
    camera = cameras[0]

    meshes = mesh.extend(num_views)
    R_true = pt.random_rotations(1, key)
    rotated = meshes.update_padded(
        Rotate(R_true).transform_points(meshes.verts_padded()))
    target_images = get_hard_rendering(rotated, cameras[0], lights, imsize)
    target_rgb = [target_images[i, ..., :3] for i in range(num_views)]
    return meshes, cameras, lights, target_rgb, R_true, elev, azim


def _load_shapenet(category, shapenet_path):
    """ShapeNet category loader (`eval.py:183-238`): id tables + atlas load."""
    import os

    dic_categories = {
        "table": "04379243", "car": "02958343", "chair": "03001627",
        "airplane": "02691156", "sofa": "04256520", "rifle": "04090263",
        "mug": "03797390", "microwave": "03761084", "mailbox": "03710193",
        "bus": "02924116", "speaker": "03691459", "display": "03211117",
        "dishwasher": "03207941", "bag": "02773838", "lamp": "03636649",
        "birdhouse": "02843684",
    }
    model_per_category = {
        "mug": "bea77759a3e5f9037ae0031c221d81a4",
        "airplane": "ffccda82ecc0d0f71740529c616cd4c7",
        "microwave": "c1851c910969d154df78375e5c76ea3d",
        "mailbox": "10e1051cbe10626e30a706157956b491",
        "bus": "7ad09b362de71bfaadcb6d6a1ff60276",
        "speaker": "1d4bb07ac73996182339c28050e32573",
        "display": "2e6204b4aa7ba83fbd28395acf9af65e",
        "dishwasher": "fb15942e4096d8f0263a7f81856f9708",
        "bag": "a55b721ea5a29d7f639ff561fa3f5bac",
        "lamp": "4a868756ae6404a5c0bc57897eddf6f",
        "birdhouse": "7f53db3b31fe08283c2748dd7bf1793a",
    }
    if shapenet_path is None or not os.path.isdir(shapenet_path):
        raise FileNotFoundError(
            f"ShapeNet category {category!r} requires --dataset-directory "
            f"pointing at ShapeNetCore (got {shapenet_path!r})")
    obj = os.path.join(shapenet_path, dic_categories[category],
                       model_per_category[category], "models",
                       "model_normalized.obj")
    verts, faces, aux = pt.load_obj(obj, load_textures=True,
                                    create_texture_atlas=True,
                                    texture_atlas_size=4,
                                    texture_wrap="repeat")
    textures = (pt.TexturesAtlas(aux.texture_atlas[None])
                if aux.texture_atlas is not None
                else pt.TexturesVertex(jnp.ones((1, verts.shape[0], 3))))
    return pt.Meshes.create(verts, faces.verts_idx, textures=textures)


def init_base_mesh_cameras_lights(category="sphere", params_to_check=None):
    """Source mesh + initial scene scalars for scene-parameter optimization
    (`/root/reference/experiments/eval.py:294-318`)."""
    params_to_check = params_to_check or {}
    if category == "sphere" or params_to_check.get("vertices"):
        verts, faces = pt.make_icosphere(3)
        src_mesh = pt.Meshes.create(verts, faces)
    else:
        src_mesh = pt.load_cube()
    verts = src_mesh.verts[0]
    n = verts.shape[0]
    if category == "sphere":
        center = verts.mean(0)
        scale = jnp.max(jnp.abs(verts - center)) * 2.0
        src_mesh = src_mesh.offset_verts(
            -jnp.broadcast_to(center, (n, 3))).scale_verts(1.0 / scale)
    deform_init = jnp.zeros((n, 3))
    verts_rgb_init = jnp.ones((1, n, 3))
    if params_to_check.get("camera"):
        camera_elev, camera_azim = jnp.ones(1) * 20.0, jnp.ones(1) * 100.0
    else:
        camera_elev, camera_azim = jnp.ones(1) * 30.0, jnp.ones(1) * 120.0
    if params_to_check.get("light"):
        lights_location = jnp.array([[0.0, 6.0, -1.0]])
    else:
        lights_location = jnp.array([[0.0, 2.0, -2.0]])
    return (src_mesh, deform_init, verts_rgb_init, camera_elev, camera_azim,
            lights_location)


# ---------------------------------------------------------------------------
# Pose optimization (jitted, scanned)
# ---------------------------------------------------------------------------

@dataclass
class PoseOptResult:
    best_log_rot: jnp.ndarray
    log_rot: jnp.ndarray
    losses: np.ndarray
    grad_norms: np.ndarray
    runtimes: Dict[str, List[float]] = field(default_factory=dict)
    images: List[np.ndarray] = field(default_factory=list)


def _make_pose_step(cameras, lights, optimizer):
    """One fused train step: render -> L2 loss -> grads (pose + smoothing) ->
    explosion guard (`eval.py:374-378`) -> Adam -> best-iterate tracking
    (`eval.py:371-373`).

    Gradients flow to exactly the leaves the reference differentiates in its
    pose loop: log_rot (`eval.py:331-332`) and the learnable sigma/gamma/alpha
    (`smoothrast.py:116`, `smoothagg.py:153-154`) — NOT textures/cameras/
    lights, so their backward chains are pruned from the compiled step.

    The mesh and target are ARGUMENTS of the returned step, not closure
    constants: this backend zero-fills the batched gather of large
    constant-embedded operands (measured at the 81,920-face scale — a
    closure-captured face table renders black while the argument-passed
    identical program is correct; NOTES.md axon quirks), so every jitted
    program that touches the mesh must receive it as a traced input.
    """

    def loss_fn(mesh, target, log_rot, sigma, gamma, alpha, renderer, keys):
        renderer = renderer.replace(
            shader=renderer.shader.update_smoothing(sigma=sigma, gamma=gamma,
                                                    alpha=alpha))
        rot = so3_exp_map(log_rot)
        pred = mesh.update_padded(
            Rotate(rot).transform_points(mesh.verts_padded()))
        # mean((render - target)^2); on TPU-fused configs, loss AND grads
        # come from one kernel pass (renderer.render_loss).
        return renderer.render_loss(pred, target, key=(keys[0], keys[1]),
                                    cameras=cameras, lights=lights)

    def step(mesh, target, carry, keys):
        # keys: (3, 2) pre-split per-iteration keys (estimator rast/agg +
        # guard noise) — split OUTSIDE the scan; an in-loop threefry split
        # lowers to a scalar while-loop worth ~ms per iteration on TPU.
        (log_rot, opt_state, key, best_loss, best_log_rot, renderer,
         ema) = carry
        sigma, gamma, alpha = renderer.shader.get_smoothing()
        loss, grads = jax.value_and_grad(loss_fn, argnums=(2, 3, 4, 5))(
            mesh, target, log_rot, jnp.asarray(sigma), jnp.asarray(gamma),
            jnp.asarray(alpha), renderer, keys)
        g_pose, g_sigma, g_gamma, g_alpha = grads
        gnorm = jnp.linalg.norm(g_pose)
        # Gradient-explosion guard: replace exploded grads with tiny noise
        # (`eval.py:374-378`).
        g_pose = jnp.where(gnorm > 1000.0,
                           1e-5 * jax.random.normal(keys[2], g_pose.shape),
                           g_pose)
        updates, opt_state = optimizer.update(g_pose, opt_state, log_rot)
        new_log_rot = optax.apply_updates(log_rot, updates)
        improved = loss < best_loss
        best_loss = jnp.where(improved, loss, best_loss)
        best_log_rot = jnp.where(improved, log_rot, best_log_rot)
        # EMA of smoothing-parameter gradients drives annealing
        # (`eval.py:384-389`).
        ema = jax.tree.map(
            lambda v, g: 0.9 * v + 0.1 * g, ema,
            (g_sigma, g_gamma, g_alpha))
        carry = (new_log_rot, opt_state, key, best_loss, best_log_rot,
                 renderer, ema)
        return carry, (loss, gnorm)

    return step


def optimize_pose(mesh, cameras, lights, init_pose, diff_renderer, target_rgb,
                  key=None, lr_init=5e-2, Niter=100, optimizer="adam",
                  adapt_reg=False, adapt_params=(1.1, 1.5),
                  segment_size=50, collect_images=False, imsize=None,
                  artifacts_dir=None, checkpoint_dir=None, resume=False,
                  max_segments=None, anneal_sample_cap=128,
                  max_dispatch_steps=None):
    """Pose optimization with the reference's schedule
    (`/root/reference/experiments/eval.py:320-409`), restructured as jitted
    ``lax.scan`` segments.

    Returns a :class:`PoseOptResult`.  ``runtimes`` reports per-segment wall
    time and derived per-iteration time (the reference's per-iter fwd/bwd
    timers are meaningless for a fused jitted step).  With ``artifacts_dir``
    set, dumps loss/gradient ``.npy`` histories and a training image grid
    like the reference (`eval.py:395-405`).

    With ``checkpoint_dir`` set, the complete run state (pose, optimizer
    state, PRNG key, best iterate, smoothing/annealing state, histories) is
    saved at every segment boundary — a capability the reference lacks
    (SURVEY.md §5).  ``resume=True`` restores the latest checkpoint and
    continues the exact trajectory of the uninterrupted run.
    ``max_segments`` stops after that many segments (kill simulation for
    resume tests; the checkpoint is already on disk).

    ``max_dispatch_steps`` bounds how many iterations run in ONE XLA
    execution: each ``segment_size`` scan is split into sub-dispatches of
    at most that many steps, with the carry threaded through (trajectory
    is identical — the per-iteration keys are pre-split per segment).
    Needed at coarse-sigma x high-poly scale: a single 50-step dispatch at
    ~1-2 s/step exceeds the device-execution window of relay-attached
    chips (``UNAVAILABLE: TPU device error`` after ~1 min in one
    execution), while the same 50 steps as five 10-step dispatches run
    fine.  Annealing cadence stays ``segment_size`` — the split is purely
    a dispatch-granularity knob.
    """
    if artifacts_dir is not None:
        collect_images = True
    if key is None:
        key = jax.random.PRNGKey(0)
    target = target_rgb[0][None] if target_rgb[0].ndim == 3 else target_rgb[0]
    # The reference renders through cameras[0] (`eval.py:350`).
    cameras = cameras[0] if isinstance(cameras, (list, tuple)) else cameras

    lr = lr_init
    # Pin the carry's pytree STRUCTURE before the first compile: annealing
    # swaps blur_override None -> traced leaf (update_blur), and the
    # compiled-scan cache keys only on (length, S) — a structure change
    # mid-run would miss the AOT-compiled signature (pytree TypeError).
    renderer = diff_renderer.replace(
        rasterizer=diff_renderer.rasterizer.update_blur(
            diff_renderer.rasterizer.blur))

    # The learning rate lives in the optimizer *state* (inject_hyperparams)
    # so annealing's lr decay (`eval.py:393`) re-inits state without
    # invalidating the jitted scan.
    if optimizer == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(learning_rate=lr,
                                                  momentum=0.9)
    else:
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)

    def init_opt_state(lr):
        state = opt.init(log_rot)
        state.hyperparams["learning_rate"] = jnp.asarray(lr)
        return state

    log_rot = jnp.asarray(init_pose)
    opt_state = init_opt_state(lr)
    best_loss = jnp.asarray(np.inf)
    best_log_rot = log_rot
    ema = (jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))

    losses: List[np.ndarray] = []
    gnorms: List[np.ndarray] = []
    seg_times: List[float] = []
    images: List[np.ndarray] = []

    # Segment layout: uniform segment_size chunks.  Annealing fires only at
    # boundaries past iter 100 (`eval.py:382,389` — first possible anneal is
    # iter 150 with the default segment_size=50), and uniform lengths mean a
    # run compiles exactly one scan program per (length, S-tier) pair.
    boundaries = [min(Niter, segment_size)]
    while boundaries[-1] < Niter:
        boundaries.append(min(Niter, boundaries[-1] + segment_size))

    resumed_from = 0
    if resume and checkpoint_dir is not None:
        from pertrenderer_tpu.utils import checkpoint as _ckpt

        last = _ckpt.latest_step(checkpoint_dir)
        if last is not None:
            st = _ckpt.restore_checkpoint(checkpoint_dir, last)
            lr = float(st["lr"])
            renderer = renderer.replace(
                rasterizer=renderer.rasterizer.update_blur(float(st["blur"])),
                shader=renderer.shader.update_smoothing(
                    sigma=jnp.asarray(st["sigma"]),
                    gamma=jnp.asarray(st["gamma"]),
                    alpha=jnp.asarray(st.get(
                        "alpha", renderer.shader.smoothagg.alpha)))
                .update_nb_samples(int(st["nb_samples"])))
            opt_state = jax.tree.unflatten(
                jax.tree.structure(init_opt_state(lr)),
                [jnp.asarray(x) for x in st["opt_leaves"]])
            log_rot = jnp.asarray(st["log_rot"])
            key = jnp.asarray(st["key"])
            best_loss = jnp.asarray(st["best_loss"])
            best_log_rot = jnp.asarray(st["best_log_rot"])
            ema = tuple(jnp.asarray(x) for x in st["ema"])
            if np.size(st["losses"]):
                losses.append(np.asarray(st["losses"]))
                gnorms.append(np.asarray(st["gnorms"]))
            resumed_from = int(st["step"])

    def save_ckpt(step_idx):
        if checkpoint_dir is None:
            return
        from pertrenderer_tpu.utils import checkpoint as _ckpt

        sig, gam, alp = renderer.shader.get_smoothing()
        _ckpt.save_checkpoint(checkpoint_dir, {
            "log_rot": log_rot, "opt_leaves": list(jax.tree.leaves(opt_state)),
            "key": key, "best_loss": best_loss, "best_log_rot": best_log_rot,
            "ema": list(ema), "sigma": jnp.asarray(sig),
            "gamma": jnp.asarray(gam), "alpha": jnp.asarray(alp),
            "nb_samples": np.int64(renderer.shader.get_nb_samples()),
            "blur": np.float64(float(renderer.rasterizer.blur)),
            "lr": np.float64(lr), "step": np.int64(step_idx),
            "losses": np.concatenate(losses) if losses else np.zeros(0),
            "gnorms": np.concatenate(gnorms) if gnorms else np.zeros(0),
        }, step_idx)

    scan_fn_cache: Dict[Tuple[int, int], Any] = {}
    peak_memory_mb = [None]  # max XLA-reported footprint across segments

    # Capacity surveillance (VERDICT r3 #6): when the scene routes to the
    # M-slot binned kernel, its overflow counts come back as REGULAR
    # jittable prepass outputs, fetched and checked host-side at every
    # segment boundary — real per-run detection on backends without host
    # callbacks (the axon relay).
    cap_probe = None
    settings = diff_renderer.rasterizer.raster_settings
    if getattr(settings, "bin_overflow", "warn") != "allow":
        from pertrenderer_tpu.ops import fused_render as _fr

        plan0 = diff_renderer.plan(mesh, cameras=cameras,
                                   assume_available=False)
        if plan0.mode == "binned":
            _sh = diff_renderer.shader

            # The mesh/cameras MUST be jit ARGUMENTS, not closure
            # constants: this backend zero-fills the batched (vmapped)
            # gather of large constant-embedded operands (measured: a
            # nullary jit of vmap(_gather_rows) over an 81,920-face
            # constant table returns all-zero z columns while the
            # argument-passed identical program is correct — NOTES.md
            # axon quirks).
            @jax.jit
            def cap_probe(mesh_, cameras_, log_rot, blur):
                rot = so3_exp_map(log_rot)
                pred = mesh_.update_padded(
                    Rotate(rot).transform_points(mesh_.verts_padded()))
                return _fr.capacity_stats(
                    pred, cameras_, settings, _sh.smoothrast, _sh.smoothagg,
                    lights, _sh.materials, blur_override=blur)

    def run_dispatch(n_steps, carry, seg_keys):
        # Annealing changes the MC sample count (a trace-time constant:
        # the sample loops unroll over S) and blur_radius (a *traced*
        # rasterizer leaf since the blur-override change — no recompile).
        # Only (length, S) key the compiled-scan cache.
        sig = (n_steps, carry[5].shader.get_nb_samples())
        if sig not in scan_fn_cache:
            from pertrenderer_tpu.utils.artifacts import (
                compiled_peak_memory_mb)

            step = _make_pose_step(cameras, lights, opt)
            # mesh/target are runtime ARGUMENTS of the compiled scan (the
            # closure-constant form zero-fills large gathers on this
            # backend — see _make_pose_step).
            jitted = jax.jit(
                lambda c, xs, m, tgt: jax.lax.scan(
                    lambda cc, kk: step(m, tgt, cc, kk), c, xs,
                    length=n_steps))
            compiled = jitted.lower(carry, seg_keys, mesh, target).compile()
            scan_fn_cache[sig] = (compiled,
                                  compiled_peak_memory_mb(compiled))
        compiled, mem = scan_fn_cache[sig]
        if mem is not None:
            peak_memory_mb[0] = max(peak_memory_mb[0] or 0.0, mem)
        return compiled(carry, seg_keys, mesh, target)

    def run_segment(n_steps, carry, seg_keys):
        d = max_dispatch_steps or n_steps
        if d >= n_steps:
            return run_dispatch(n_steps, carry, seg_keys)
        outs, off = [], 0
        while off < n_steps:
            n = min(d, n_steps - off)
            carry, out = run_dispatch(n, carry, seg_keys[off:off + n])
            outs.append(out)
            off += n
        return carry, tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(2))

    start = resumed_from
    segments_run = 0
    for end in boundaries:
        n_steps = end - start
        if n_steps <= 0:
            continue
        if max_segments is not None and segments_run >= max_segments:
            break
        segments_run += 1
        key, seg_key = jax.random.split(key)
        seg_keys = jax.random.split(seg_key, n_steps * 3).reshape(
            n_steps, 3, 2)
        carry = (log_rot, opt_state, key, best_loss, best_log_rot, renderer,
                 ema)
        t0 = time.time()
        carry, (seg_losses, seg_gnorms) = run_segment(n_steps, carry,
                                                      seg_keys)
        seg_losses = jax.block_until_ready(seg_losses)
        seg_times.append(time.time() - t0)
        (log_rot, opt_state, key, best_loss, best_log_rot, renderer,
         ema) = carry
        losses.append(np.asarray(seg_losses))
        gnorms.append(np.asarray(seg_gnorms))
        if cap_probe is not None:
            from pertrenderer_tpu.ops import fused_render as _fr

            stats = jax.device_get(cap_probe(
                mesh, cameras, log_rot,
                jnp.asarray(renderer.rasterizer.blur, jnp.float32)))
            _fr.check_capacity_host(settings, stats)
        if collect_images:
            rot = so3_exp_map(log_rot)
            pred = mesh.update_padded(
                Rotate(rot).transform_points(mesh.verts_padded()))
            img = renderer(pred, key=key, cameras=cameras, lights=lights)
            images.append(np.asarray(img[..., :3]))
        start = end

        # Host-side annealing at the segment boundary (`eval.py:382-394`).
        v_sigma, v_gamma, v_alpha = (float(x) for x in ema)
        if adapt_reg and end > 100 and end < Niter and v_gamma > 0:
            sigma, gamma, _ = renderer.shader.get_smoothing()
            new_sigma = max(float(sigma) / adapt_params[0], 5e-5)
            new_gamma = max(float(gamma) / adapt_params[1], 5e-4)
            nb = renderer.shader.get_nb_samples()
            renderer = renderer.replace(
                rasterizer=renderer.rasterizer.update_blur(
                    _BLUR_CONST * new_sigma),
                shader=renderer.shader.update_smoothing(
                    sigma=new_sigma, gamma=new_gamma)
                .update_nb_samples(min(2 * nb, anneal_sample_cap)),
            )
            lr = max(lr / 1.5, 1e-4)
            opt_state = init_opt_state(lr)
            ema = (jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
        save_ckpt(end)

    all_losses = np.concatenate(losses) if losses else np.zeros(0)
    all_gnorms = np.concatenate(gnorms) if gnorms else np.zeros(0)
    total = float(sum(seg_times))
    runtimes = {
        "segment": seg_times,
        "per_iter": [total / max(Niter, 1)],
        "total": [total],
        "memory_mb": [peak_memory_mb[0]],
    }
    if artifacts_dir is not None:
        from pertrenderer_tpu.utils import artifacts as _art

        _art.save_histories(artifacts_dir, all_losses, all_gnorms)
        if images:
            grid = np.concatenate(
                [np.asarray(target_rgb[0])[None]] + images, axis=0)
            n = grid.shape[0]
            _art.image_grid(grid, artifacts_dir, rows=max(1, (n + 3) // 4),
                            cols=min(n, 4))
    return PoseOptResult(
        best_log_rot=best_log_rot, log_rot=log_rot, losses=all_losses,
        grad_norms=all_gnorms, runtimes=runtimes, images=images)


# ---------------------------------------------------------------------------
# Scene-parameter optimization
# ---------------------------------------------------------------------------

def optimize_scene_params(base_mesh, camera_elev_init, camera_azim_init,
                          lights_location_init, deform_init, verts_rgb_init,
                          diff_renderer, target_rgb, key=None, lr_init=5e-2,
                          Niter=100, optimizer="adam", adapt_reg=False,
                          adapt_params=(1.1, 1.5), param_to_check=None,
                          laplacian_weight=5e-3, segment_size=50,
                          checkpoint_dir=None, resume=False,
                          max_segments=None, lr_scales=None,
                          anneal_start=200, lr_decay=1.5,
                          texture_smoothing_weight=0.0):
    """Joint optimization of {vertex colors, deform, camera elev/azim, light
    location} (`/root/reference/experiments/eval.py:411-503`).

    The camera and lights are rebuilt *inside* the jitted step from the
    optimized scalars — differentiable through ``look_at_view_transform``
    (`eval.py:443-447`), which is the capability ``check_differentiability``
    verifies.

    ``lr_scales`` maps a param name to a multiplier on ``lr`` for that
    group (e.g. camera elev/azim live in DEGREES, so joint camera+texture
    runs need the camera group ~20x the 0-1-scaled texture lr; a shared
    Adam step size cannot serve both units).

    Multi-view: pass ``camera_elev_init``/``camera_azim_init`` of shape
    (n_views,), ``base_mesh`` extended to n_views (``mesh.extend(n)``) and
    a batched target (n_views, H, W, 3).  Each view's camera scalars are
    optimized per view; the texture/deform/light params are shared across
    views — the multi-view constraint that makes joint camera+texture
    optimization well-posed (single-view appearance can compensate a pose
    error; n >= 2 views of one shared texture cannot).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    param_to_check = param_to_check or {"camera": False, "vertices": True,
                                        "textures": True, "light": False}
    target = target_rgb[0] if target_rgb[0].ndim == 4 else target_rgb[0][None]

    params = {
        "verts_rgb": jnp.asarray(verts_rgb_init),
        "deform": jnp.asarray(deform_init),
        "camera_elev": jnp.asarray(camera_elev_init),
        "camera_azim": jnp.asarray(camera_azim_init),
        "lights_location": jnp.asarray(lights_location_init),
    }
    trainable = {
        "verts_rgb": param_to_check.get("textures", False),
        "deform": param_to_check.get("vertices", False),
        "camera_elev": param_to_check.get("camera", False),
        "camera_azim": param_to_check.get("camera", False),
        "lights_location": param_to_check.get("light", False),
    }

    n_views = int(np.size(np.asarray(camera_elev_init)))

    # base_mesh/target are ARGUMENTS of the jitted step, not closure
    # constants (the closure form zero-fills large gathers on this
    # backend — see _make_pose_step).
    def loss_fn(base_mesh, target, params, renderer, key):
        lights = pt.PointLights.create(location=params["lights_location"],
                                       batch=n_views)
        r, t = pt.look_at_view_transform(dist=6.7, elev=params["camera_elev"],
                                         azim=params["camera_azim"])
        camera = pt.PerspectiveCameras.create(R=r, T=t)
        mesh = base_mesh.offset_verts(params["deform"])
        if param_to_check.get("textures"):
            # One shared texture across all views (its cotangent sums over
            # the broadcast — the multi-view consistency constraint).
            rgb = jnp.clip(params["verts_rgb"], 0.0, 1.0)
            mesh = mesh.with_textures(pt.TexturesVertex(jnp.broadcast_to(
                rgb, (base_mesh.batch_size,) + rgb.shape[1:])))
        loss_rgb = renderer.render_loss(mesh, target, key=key,
                                        loss_kind="l1_rgb", cameras=camera,
                                        lights=lights)
        loss_lap = pt.mesh_laplacian_smoothing(mesh)
        total = loss_rgb + laplacian_weight * loss_lap
        if texture_smoothing_weight and param_to_check.get("textures"):
            from pertrenderer_tpu.losses import vertex_feature_laplacian
            total = total + texture_smoothing_weight * \
                vertex_feature_laplacian(base_mesh, params["verts_rgb"])
        return total, (loss_rgb, loss_lap)

    lr = lr_init
    lr_scales = lr_scales or {}

    def mk_opt(lr_val):
        if optimizer == "sgd":
            return optax.inject_hyperparams(optax.sgd)(learning_rate=lr_val,
                                                       momentum=0.9)
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr_val)

    # Frozen params get zero updates (requires_grad=False equivalent,
    # `eval.py:413-422`); scaled params get their own transform group.
    scaled = sorted(k for k in lr_scales if trainable.get(k, False))
    labels = {k: (k if k in scaled else "train" if v else "freeze")
              for k, v in trainable.items()}
    transforms = {"train": mk_opt(lr), "freeze": optax.set_to_zero()}
    transforms.update({k: mk_opt(lr * lr_scales[k]) for k in scaled})
    opt = optax.multi_transform(transforms, labels)

    def init_opt_state(lr):
        state = opt.init(params)
        for k in ["train"] + scaled:
            state.inner_states[k].inner_state.hyperparams[
                "learning_rate"] = jnp.asarray(lr * lr_scales.get(k, 1.0))
        return state

    opt_state = init_opt_state(lr)
    # Same structure pin as optimize_pose: annealing's update_blur must not
    # change the carry pytree (None -> leaf) under a cached compiled scan.
    renderer = diff_renderer.replace(
        rasterizer=diff_renderer.rasterizer.update_blur(
            diff_renderer.rasterizer.blur))

    def make_step(opt):
        def step(base_mesh, target, carry, _):
            params, opt_state, key, best_loss, best_params, renderer = carry
            key, sub = jax.random.split(key)
            (total, (loss_rgb, loss_lap)), grads = jax.value_and_grad(
                loss_fn, argnums=2, has_aux=True)(base_mesh, target, params,
                                                  renderer, sub)
            grads = {k: jnp.where(jnp.isfinite(g), g, 0.0)
                     for k, g in grads.items()}
            updates, opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            improved = total < best_loss
            best_loss = jnp.where(improved, total, best_loss)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(improved, p, b), best_params, params)
            return ((new_params, opt_state, key, best_loss, best_params,
                     renderer), (total, loss_rgb, loss_lap))
        return step

    best_loss = jnp.asarray(np.inf)
    best_params = params
    losses: List[np.ndarray] = []

    # Uniform segments (annealing only fires at boundaries past iter 200,
    # `eval.py:483` — same schedule, one compiled program per length/S-tier).
    boundaries = [min(Niter, segment_size)]
    while boundaries[-1] < Niter:
        boundaries.append(min(Niter, boundaries[-1] + segment_size))

    resumed_from = 0
    if resume and checkpoint_dir is not None:
        from pertrenderer_tpu.utils import checkpoint as _ckpt

        last = _ckpt.latest_step(checkpoint_dir)
        if last is not None:
            st = _ckpt.restore_checkpoint(checkpoint_dir, last)
            lr = float(st["lr"])
            renderer = renderer.replace(
                rasterizer=renderer.rasterizer.update_blur(float(st["blur"])),
                shader=renderer.shader.update_smoothing(
                    sigma=jnp.asarray(st["sigma"]),
                    gamma=jnp.asarray(st["gamma"]),
                    alpha=jnp.asarray(st.get(
                        "alpha", renderer.shader.smoothagg.alpha)))
                .update_nb_samples(int(st["nb_samples"])))
            opt_state = jax.tree.unflatten(
                jax.tree.structure(init_opt_state(lr)),
                [jnp.asarray(x) for x in st["opt_leaves"]])
            params = {k: jnp.asarray(st[f"param_{k}"]) for k in params}
            best_params = {k: jnp.asarray(st[f"best_{k}"]) for k in params}
            key = jnp.asarray(st["key"])
            best_loss = jnp.asarray(st["best_loss"])
            if np.size(st["losses"]):
                losses.append(np.asarray(st["losses"]))
            resumed_from = int(st["step"])

    def save_ckpt(step_idx):
        if checkpoint_dir is None:
            return
        from pertrenderer_tpu.utils import checkpoint as _ckpt

        sig_, gam_, alp_ = renderer.shader.get_smoothing()
        state = {"key": key, "best_loss": best_loss,
                 "opt_leaves": list(jax.tree.leaves(opt_state)),
                 "sigma": jnp.asarray(sig_), "gamma": jnp.asarray(gam_),
                 "alpha": jnp.asarray(alp_),
                 "nb_samples": np.int64(renderer.shader.get_nb_samples()),
                 "blur": np.float64(float(renderer.rasterizer.blur)),
                 "lr": np.float64(lr), "step": np.int64(step_idx),
                 "losses": np.concatenate(losses) if losses else np.zeros(0)}
        state.update({f"param_{k}": v for k, v in params.items()})
        state.update({f"best_{k}": v for k, v in best_params.items()})
        _ckpt.save_checkpoint(checkpoint_dir, state, step_idx)

    start = resumed_from
    segments_run = 0
    scan_cache: Dict[Tuple[int, int], Any] = {}
    for end in boundaries:
        n_steps = end - start
        if n_steps <= 0:
            continue
        if max_segments is not None and segments_run >= max_segments:
            break
        segments_run += 1
        sig = (n_steps, renderer.shader.get_nb_samples())
        if sig not in scan_cache:
            step = make_step(opt)
            scan_cache[sig] = jax.jit(
                lambda c, m, tgt, s=step, n=n_steps: jax.lax.scan(
                    lambda cc, xx: s(m, tgt, cc, xx), c, None, length=n))
        carry = (params, opt_state, key, best_loss, best_params, renderer)
        carry, (seg_total, seg_rgb, seg_lap) = scan_cache[sig](
            carry, base_mesh, target)
        params, opt_state, key, best_loss, best_params, renderer = carry
        losses.append(np.asarray(seg_total))
        start = end
        # Annealing after iter 200 by default (`eval.py:483-491`) —
        # unconditional on the gamma-grad sign, unlike the pose loop.
        # ``anneal_start`` tunes the coarse-phase length for coarse-to-fine
        # schedules (the reference hardcodes 200).
        if adapt_reg and end > anneal_start and end < Niter:
            sigma, gamma, _ = renderer.shader.get_smoothing()
            new_sigma = float(sigma) / adapt_params[0]
            new_gamma = float(gamma) / adapt_params[1]
            nb = renderer.shader.get_nb_samples()
            renderer = renderer.replace(
                rasterizer=renderer.rasterizer.update_blur(
                    _BLUR_CONST * new_sigma),
                shader=renderer.shader.update_smoothing(
                    sigma=new_sigma, gamma=new_gamma)
                .update_nb_samples(min(2 * nb, 128)),
            )
            lr = lr / lr_decay
            opt_state = init_opt_state(lr)
            scan_cache.clear()
        save_ckpt(end)

    all_losses = np.concatenate(losses) if losses else np.zeros(0)
    return best_params, params, all_losses
