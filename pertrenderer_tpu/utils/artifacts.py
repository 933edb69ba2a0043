"""Run artifacts: JSON metric dumps, npy histories, training image grids.

Matches the reference's observability surface (SURVEY.md §5): per-run
``loss_values.npy`` / ``gradient_values.npy`` + image grid under
``results/<exp_id>/optimization_details/<datetime>/``
(`/root/reference/experiments/eval.py:395-405`), JSON metric files
(`eval.py:568-573,646-661`).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Optional

import numpy as np

__all__ = ["run_dir", "dump_json", "save_histories", "image_grid",
           "device_peak_memory_mb"]


def run_dir(results_root: str, exp_id) -> str:
    stamp = datetime.now().strftime("%Y-%m-%d-%H:%M:%S")
    path = os.path.join(results_root, str(exp_id), "optimization_details",
                        stamp)
    os.makedirs(path, exist_ok=True)
    return path


def dump_json(results_root: str, exp_id, name: str, obj) -> str:
    path = os.path.join(results_root, str(exp_id))
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, name)
    with open(fname, "w") as f:
        json.dump(obj, f)
    return fname


def save_histories(path: str, losses, grad_norms) -> None:
    np.save(os.path.join(path, "loss_values.npy"), np.asarray(losses))
    np.save(os.path.join(path, "gradient_values.npy"),
            np.asarray(grad_norms))


def image_grid(images, title: str, rows: Optional[int] = None,
               cols: Optional[int] = None, fill: bool = True,
               show_axes: bool = False, rgb: bool = True) -> Optional[str]:
    """Training-progress montage (`/root/reference/experiments/eval.py:787-821`).
    Returns the saved path, or None if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    images = np.asarray(images)
    if (rows is None) != (cols is None):
        raise ValueError("Specify either both rows and cols or neither.")
    if rows is None:
        rows = len(images)
        cols = 1
    gridspec_kw = {"wspace": 0.0, "hspace": 0.0} if fill else {}
    fig, axarr = plt.subplots(rows, cols, gridspec_kw=gridspec_kw,
                              figsize=(15, 9))
    for ax, im in zip(np.ravel(axarr), images):
        if rgb:
            ax.imshow(np.clip(im[..., :3], 0.0, 1.0))
        else:
            ax.imshow(im[..., 3])
        if not show_axes:
            ax.set_axis_off()
    out = os.path.join(str(title), "grid_cube.png")
    plt.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_solved_percentage(results_root: str, exp_id,
                           thresholds=(1, 2, 5, 10, 15, 20, 25, 35, 45)
                           ) -> Optional[str]:
    """Solved-percentage summary plot from the dumped JSON metrics
    (`/root/reference/experiments/eval.py:662-690`).  Returns the saved path
    or None if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    base = os.path.join(results_root, str(exp_id))
    solved = json.load(open(os.path.join(base, "solved_percentage.txt")))
    mean_err = json.load(open(os.path.join(base, "angle_error.txt")))
    try:
        setup = json.load(open(os.path.join(base, "exp_setup.txt")))
    except Exception:
        setup = {}

    fig = plt.figure(dpi=200)
    for noise, per_thresh in solved.items():
        # best config = lowest mean angle error (reference sorts by it)
        best = int(np.argmin(mean_err[noise]))
        ys = [per_thresh[str(t) if str(t) in per_thresh else t][best]
              for t in thresholds]
        plt.plot(list(thresholds), ys, label=noise)
    title = setup.get("perturbation")
    if title is not None:
        plt.title(f"{title}\N{DEGREE SIGN} initial perturbation")
    plt.xlabel("Threshold (\N{DEGREE SIGN})")
    plt.ylabel("% of task solved")
    plt.ylim((0.0, 1.0))
    plt.legend()
    out = os.path.join(base, "results_plot.png")
    plt.savefig(out)
    plt.close(fig)
    return out


def device_peak_memory_mb() -> Optional[float]:
    """Peak device memory in MB (the torch.cuda.max_memory_allocated analog,
    `/root/reference/experiments/eval.py:550,554`).  None if the backend does
    not expose memory stats (CPU, and TPU relays that hide allocator stats —
    use :func:`compiled_peak_memory_mb` there)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return None if peak is None else peak * 1e-6


def compiled_peak_memory_mb(compiled) -> Optional[float]:
    """Device memory footprint in MB of an AOT-compiled XLA executable:
    arguments + outputs + XLA temporaries (minus donated aliases), from the
    compiler's own memory analysis.  Deterministic per program and available
    on backends whose runtime allocator stats are hidden."""
    try:
        ma = compiled.memory_analysis()
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    except Exception:
        return None
    return total * 1e-6
