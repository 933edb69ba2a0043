"""Experiment CLI: pose optimization, runtime benchmark, differentiability check.

Command-line parity with `/root/reference/experiments/eval.py:90-108` (same
flags, same three ``--experiment-type`` modes at eval.py:823-828, same JSON
artifact names at eval.py:568-573,646-661), rebuilt on the jitted harness.

Differences from the reference, by design:
  * explicit PRNG keys derived from ``--seed`` (no global RNG),
  * ``--adaptive-regularization`` takes 0/1 (the reference's ``type=bool``
    treats any non-empty string as truthy — SURVEY.md §5 flags it as a
    footgun not to replicate),
  * per-iteration fwd/bwd wall-times are replaced by per-segment /
    per-iteration fused-step times (there is no separate backward dispatch in
    a fused jitted step).

Run e.g.:
    python -m pertrenderer_tpu.experiments.eval -et pose_opt -np 4 -ni 200
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import pertrenderer_tpu as pt
from pertrenderer_tpu.experiments import harness
from pertrenderer_tpu.utils import artifacts

DATASET_DIRECTORY = os.environ.get("SHAPENET_DIR", "")
NUM_ITERATIONS = 800
OPTIMIZER = "adam"
LR_VALUES = [3e-2]
SMOOTHING_VALUES = [(1e-3, 1e-2)]
SMOOTHING_NOISE = ["softras", "gaussian"]
MC_SAMPLES = [8]
ADAPTIVE_REGULARIZATION = 1
ADAPTIVE_PARAMS = [(1.1, 1.1)]
INITIAL_PERTURBATION = 20.0
CATEGORIES = ["cube"]
TASK = "pose_opt"
EXP_ID = 10
IMAGE_SIZE = 128
NUM_PROB = 100
RANDOM_SEED = 1
EXP_TYPE = "pose_opt"

SOLVED_THRESHOLDS = (1, 2, 5, 10, 15, 20, 25, 35, 45)


def parse_tuples(s):
    try:
        x, y = map(float, s.split(","))
        return x, y
    except Exception:
        raise argparse.ArgumentTypeError("Tuple must be x,y")


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-et", "--experiment-type", type=str, default=EXP_TYPE)
    parser.add_argument("-eid", "--experiment-id", type=int, default=EXP_ID)
    parser.add_argument("-dd", "--dataset-directory", type=str,
                        default=DATASET_DIRECTORY)
    parser.add_argument("-ni", "--num-iterations", type=int,
                        default=NUM_ITERATIONS)
    parser.add_argument("-opt", "--optimizer", type=str, default=OPTIMIZER)
    parser.add_argument("-lr", "--lr-values", nargs="+", type=float,
                        default=LR_VALUES)
    parser.add_argument("-sv", "--smoothing-values", nargs="+",
                        type=parse_tuples, default=SMOOTHING_VALUES)
    parser.add_argument("-sn", "--smoothing-noise", nargs="+", type=str,
                        default=SMOOTHING_NOISE)
    parser.add_argument("-mc", "--mc-samples", nargs="+", type=int,
                        default=MC_SAMPLES)
    parser.add_argument("-ar", "--adaptive-regularization", type=int,
                        default=ADAPTIVE_REGULARIZATION)
    parser.add_argument("-ap", "--adaptive-params", nargs="+",
                        type=parse_tuples, default=ADAPTIVE_PARAMS)
    parser.add_argument("-ip", "--initial-perturbation", type=float,
                        default=INITIAL_PERTURBATION)
    parser.add_argument("-cat", "--categories", nargs="+", type=str,
                        default=CATEGORIES)
    parser.add_argument("-tsk", "--task", type=str, default=TASK)
    parser.add_argument("-np", "--num-prob", type=int, default=NUM_PROB)
    parser.add_argument("-is", "--image-size", type=int, default=IMAGE_SIZE)
    parser.add_argument("-s", "--seed", type=int, default=RANDOM_SEED)
    parser.add_argument("--results-dir", type=str, default="results")
    parser.add_argument("--plot-results", type=int, default=1,
                        help="save the solved-percentage summary plot "
                             "(reference eval.py:662-690)")
    parser.add_argument("-sra", "--save-run-artifacts", type=int, default=1,
                        help="dump per-run loss/grad .npy + image grid "
                             "(reference eval.py:395-405)")
    parser.add_argument("--checkpoint-dir", type=str, default="",
                        help="save full run state at segment boundaries "
                             "under this directory (per run subdirs); "
                             "a capability the reference lacks")
    parser.add_argument("--resume", type=int, default=0,
                        help="with --checkpoint-dir: restore the latest "
                             "checkpoint of each run and continue its exact "
                             "trajectory")
    return parser


def _ckpt_dir(args, tag):
    if not args.checkpoint_dir:
        return None
    return os.path.join(args.checkpoint_dir, str(args.experiment_id), tag)


def _make_test_problems(args, master_key):
    """Shared target/initial-pose generation
    (`/root/reference/experiments/eval.py:604-609`)."""
    imsize = args.image_size
    cat = args.categories[0]
    sp = args.dataset_directory or None
    scene_key, *prob_keys = jax.random.split(master_key, args.num_prob + 1)
    meshes, cameras, lights, _, _, _, _ = harness.init_target(
        scene_key, category=cat, shapenet_path=sp, imsize=imsize)
    problems = []
    for k in prob_keys:
        k1, k2 = jax.random.split(k)
        _, _, _, target_rgb, R_true, _, _ = harness.init_target(
            k1, category=cat, shapenet_path=sp, imsize=imsize)
        log_rot_init, _ = harness.init_renderers(
            cameras[0], lights, R_true, k2,
            pert_init_intensity=args.initial_perturbation, sigma=0.1,
            gamma=0.1, nb_samples=1, noise_type=args.smoothing_noise,
            imsize=imsize)
        problems.append((target_rgb, R_true, log_rot_init, k2))
    return meshes, cameras, lights, problems


def _grid(args):
    adapt_reg = bool(args.adaptive_regularization)
    adapt_params = args.adaptive_params if adapt_reg else [(1.0, 1.0)]
    mc_samples = args.mc_samples if not adapt_reg else [8]
    for lr in args.lr_values:
        for sigma, gamma in args.smoothing_values:
            for nb_mc in mc_samples:
                for ap in adapt_params:
                    yield lr, sigma, gamma, nb_mc, ap


def compare_pose_opt(args):
    """Pose-optimization quality benchmark
    (`/root/reference/experiments/eval.py:576-690`)."""
    master_key = jax.random.PRNGKey(args.seed)
    noise_type = args.smoothing_noise
    adapt_reg = bool(args.adaptive_regularization)
    meshes, cameras, lights, problems = _make_test_problems(args, master_key)

    mean_errors = {x: [] for x in noise_type}
    var_errors = {x: [] for x in noise_type}
    init_errors = {x: [] for x in noise_type}
    final_errors = {x: [] for x in noise_type}
    mean_solved = {x: {t: [] for t in SOLVED_THRESHOLDS} for x in noise_type}
    params = {"lr-smoothing-MC": [], "lr": [], "sigma": [], "gamma": [],
              "MC": [], "adapt_params": []}
    exp_setup = {
        "perturbation": args.initial_perturbation,
        "Niter": args.num_iterations, "optimizer": args.optimizer,
        "N_benchmark": args.num_prob, "adaptive_regularization": adapt_reg,
        "category": args.categories,
    }

    for g_idx, (lr, sigma, gamma, nb_mc, adapt_param) in enumerate(
            _grid(args)):
        angle_errors = {x: [] for x in noise_type}
        angle_errors_init = {x: [] for x in noise_type}
        for i, (target_rgb, R_true, log_rot_init, pkey) in enumerate(problems):
            print(f"{i + 1}/{len(problems)} test problem", flush=True)
            _, renderers = harness.init_renderers(
                cameras[0], lights, R_true, pkey,
                pert_init_intensity=args.initial_perturbation, sigma=sigma,
                gamma=gamma, nb_samples=nb_mc, noise_type=noise_type,
                imsize=args.image_size)
            for l, nt in enumerate(noise_type):
                ang_init = float(pt.so3_relative_angle(
                    pt.so3_exp_map(log_rot_init), R_true)[0]) * 180.0 / np.pi
                angle_errors_init[nt].append(ang_init)
                run_dir = (artifacts.run_dir(args.results_dir,
                                             args.experiment_id)
                           if args.save_run_artifacts else None)
                res = harness.optimize_pose(
                    meshes, cameras, lights, log_rot_init, renderers[l],
                    target_rgb, key=jax.random.fold_in(pkey, l),
                    lr_init=lr, Niter=args.num_iterations,
                    optimizer=args.optimizer, adapt_reg=adapt_reg,
                    adapt_params=adapt_param, artifacts_dir=run_dir,
                    # The tag must identify the grid point too — otherwise
                    # every (lr, sigma, gamma, MC, adapt) config shares one
                    # checkpoint dir and --resume restores the wrong run.
                    checkpoint_dir=_ckpt_dir(args, f"pose_g{g_idx}_p{i}_{nt}"),
                    resume=bool(args.resume))
                ang = float(pt.so3_relative_angle(
                    pt.so3_exp_map(res.best_log_rot), R_true)[0]) * 180.0 / np.pi
                angle_errors[nt].append(ang)
                print(f"  {nt}: {ang_init:.2f} deg -> {ang:.2f} deg", flush=True)
        for nt in noise_type:
            errs = angle_errors[nt]
            mean_errors[nt].append(sum(errs) / len(errs))
            var_errors[nt].append(float(np.std(errs)))
            init_errors[nt].append(angle_errors_init[nt])
            final_errors[nt].append(errs)
            for t in SOLVED_THRESHOLDS:
                mean_solved[nt][t].append(
                    sum(1 if a < t else 0 for a in errs) / len(errs))
        params["lr-smoothing-MC"].append((lr, sigma, gamma, nb_mc))
        params["lr"].append(lr)
        params["sigma"].append(sigma)
        params["gamma"].append(gamma)
        params["MC"].append(nb_mc)
        params["adapt_params"].append(adapt_param)

    root, eid = args.results_dir, args.experiment_id
    artifacts.dump_json(root, eid, "angle_error.txt", mean_errors)
    artifacts.dump_json(root, eid, "angle_error_final.txt", final_errors)
    artifacts.dump_json(root, eid, "angle_error_init.txt", init_errors)
    artifacts.dump_json(root, eid, "angle_std.txt", var_errors)
    artifacts.dump_json(root, eid, "solved_percentage.txt", mean_solved)
    artifacts.dump_json(root, eid, "params.txt", params)
    artifacts.dump_json(root, eid, "exp_setup.txt", exp_setup)
    if args.plot_results:
        path = artifacts.plot_solved_percentage(root, eid, SOLVED_THRESHOLDS)
        if path:
            print("results plot:", path)
    print("mean angle errors:", mean_errors)
    return mean_errors


def compare_runtime(args):
    """Runtime/memory benchmark (`/root/reference/experiments/eval.py:506-574`)."""
    master_key = jax.random.PRNGKey(args.seed)
    noise_type = args.smoothing_noise
    adapt_reg = bool(args.adaptive_regularization)
    meshes, cameras, lights, problems = _make_test_problems(args, master_key)

    mean_runtimes = {x: [] for x in noise_type}
    mean_memory = {x: [] for x in noise_type}
    params = {"lr-smoothing-MC": [], "lr": [], "sigma": [], "gamma": [],
              "MC": [], "adapt_params": []}

    for lr, sigma, gamma, nb_mc, adapt_param in _grid(args):
        runtimes = {x: [] for x in noise_type}
        memory_cons = {x: [] for x in noise_type}
        for i, (target_rgb, R_true, log_rot_init, pkey) in enumerate(problems):
            print(f"{i + 1}/{len(problems)} test problem", flush=True)
            _, renderers = harness.init_renderers(
                cameras[0], lights, R_true, pkey,
                pert_init_intensity=args.initial_perturbation, sigma=sigma,
                gamma=gamma, nb_samples=nb_mc, noise_type=noise_type,
                imsize=args.image_size)
            for l, nt in enumerate(noise_type):
                t_start = time.time()
                res = harness.optimize_pose(
                    meshes, cameras, lights, log_rot_init, renderers[l],
                    target_rgb, key=jax.random.fold_in(pkey, l),
                    lr_init=lr, Niter=args.num_iterations,
                    optimizer=args.optimizer, adapt_reg=adapt_reg,
                    adapt_params=adapt_param)
                timing = time.time() - t_start
                # Allocator stats where the backend exposes them, else the
                # XLA memory analysis of the compiled step (always works).
                mem = artifacts.device_peak_memory_mb()
                if mem is None:
                    mem = res.runtimes["memory_mb"][0]
                runtimes[nt].append(timing)
                memory_cons[nt].append(mem)
                print(f"  {nt}: {timing:.2f}s peak memory: {mem} Mb",
                      flush=True)
        for nt in noise_type:
            mean_runtimes[nt].append(runtimes[nt])
            mean_memory[nt].append(memory_cons[nt])
        params["lr-smoothing-MC"].append((lr, sigma, gamma, nb_mc))
        params["lr"].append(lr)
        params["sigma"].append(sigma)
        params["gamma"].append(gamma)
        params["MC"].append(nb_mc)
        params["adapt_params"].append(adapt_param)

    root, eid = args.results_dir, args.experiment_id
    artifacts.dump_json(root, eid, "runtimes.txt", mean_runtimes)
    artifacts.dump_json(root, eid, "memory.txt", mean_memory)
    print("runtimes:", mean_runtimes)
    return mean_runtimes


def check_differentiability(args):
    """Scene-parameter gradient check
    (`/root/reference/experiments/eval.py:693-725`): optimizes the light
    position (by default) on the icosphere against a rotated-cube target."""
    param_to_check = {"camera": False, "vertices": False, "textures": False,
                      "light": True}
    smoothing_list = [(1e-4, 1e-3)]
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)

    (src_mesh, deform_init, verts_rgb_init, camera_elev, camera_azim,
     lights_location) = harness.init_base_mesh_cameras_lights(
        args.categories[0], param_to_check)
    verts = src_mesh.verts[0]
    center = verts.mean(0)
    scale = float(jnp.max(jnp.abs(verts - center)))
    src_mesh = src_mesh.offset_verts(
        -jnp.broadcast_to(center, verts.shape)).scale_verts(1.0 / scale)

    _, _, _, target_rgb, R_true, _, _ = harness.init_target(
        k1, imsize=args.image_size)
    target_rgb = target_rgb[0][None]
    src_mesh = src_mesh.update_padded(
        pt.Rotate(R_true).transform_points(src_mesh.verts_padded()))
    if src_mesh.textures is None:
        src_mesh = src_mesh.with_textures(
            pt.TexturesVertex(jnp.ones_like(src_mesh.verts)))

    sigma, gamma = smoothing_list[0]
    nb_mc = args.mc_samples[0]
    R_true2 = pt.random_rotations(1, k2)
    _, renderers = harness.init_renderers(
        None, None, R_true2, k3,
        pert_init_intensity=args.initial_perturbation, sigma=sigma,
        gamma=gamma, nb_samples=nb_mc, noise_type=args.smoothing_noise,
        imsize=args.image_size)
    best_params, final_params, losses = harness.optimize_scene_params(
        src_mesh, camera_elev, camera_azim, lights_location, deform_init,
        verts_rgb_init, renderers[min(1, len(renderers) - 1)], [target_rgb],
        key=k3, lr_init=args.lr_values[0], Niter=args.num_iterations,
        optimizer=args.optimizer, param_to_check=param_to_check,
        checkpoint_dir=_ckpt_dir(args, "check_diff"),
        resume=bool(args.resume))
    print("loss first/last:", losses[0], losses[-1])
    print("best light location:", best_params["lights_location"])
    return best_params, losses


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.results_dir, exist_ok=True)
    print("devices:", jax.devices(), flush=True)
    if args.experiment_type == "pose_opt":
        compare_pose_opt(args)
    elif args.experiment_type == "runtime":
        compare_runtime(args)
    elif args.experiment_type == "check_diff":
        check_differentiability(args)
    else:
        raise SystemExit(f"unknown experiment type {args.experiment_type!r}")


if __name__ == "__main__":
    main()
