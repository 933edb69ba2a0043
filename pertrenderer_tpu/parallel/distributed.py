"""Multi-process / multi-slice scale-out: `jax.distributed` bootstrap and
hybrid ICI+DCN device meshes.

The reference is single-process (SURVEY.md §2.5); `sharding.py` provides the
single-process multi-chip (data x samples) mesh.  This module adds the two
pieces a multi-host / multi-slice deployment needs:

  * :func:`initialize` — idempotent `jax.distributed.initialize` bootstrap,
    auto-detecting the standard TPU environment (it is a no-op for
    single-process runs, so all entry points can call it unconditionally);
  * :func:`build_multislice_mesh` — a ``(slice, data, samples)`` mesh whose
    leading axis follows slice boundaries, so the only collectives that
    cross DCN are the tiny ``pmean`` of the shared smoothing-parameter
    gradients (3 scalars); per-problem batches and the MC sample axis stay
    on ICI.

Layout doctrine (jax-ml.github.io/scaling-book): pick the mesh so the fat
axes (here: the problem batch and the sample axis, whose collectives move
per-pixel losses and estimator means) ride intra-slice ICI, and only
replicated-parameter gradient averaging — bytes, not megabytes — crosses
the slower DCN between slices.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

from pertrenderer_tpu.parallel.sharding import DATA_AXIS, SAMPLE_AXIS

__all__ = ["initialize", "build_multislice_mesh", "SLICE_AXIS"]

SLICE_AXIS = "slice"

_initialized = False


# Environment markers of a multi-host TPU deployment where bare
# `jax.distributed.initialize()` can autodetect the cluster.
_POD_ENV_MARKERS = ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                    "CLOUD_TPU_TASK_ID", "MEGASCALE_COORDINATOR_ADDRESS")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bootstrap `jax.distributed` for multi-host runs; no-op otherwise.

    Arguments default to the standard environment (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).  When none are given but the
    process looks like part of a TPU pod (worker-hostname metadata in the
    environment), the bare `jax.distributed.initialize()` autodetection is
    attempted.  Returns True iff a multi-process runtime was initialized.
    Safe to call more than once; must run before any backend use.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes in (None, 1):
        if not any(m in os.environ for m in _POD_ENV_MARKERS):
            return False        # single-process: nothing to do
        # TPU pod without explicit coordination env: let jax autodetect.
        try:
            jax.distributed.initialize()
        except Exception as e:  # metadata incomplete — stay single-process
            import warnings

            warnings.warn(
                "jax.distributed.initialize() autodetection failed "
                f"({e!r}); continuing single-process. On a real pod this "
                "means N uncoordinated runs — set JAX_COORDINATOR_ADDRESS "
                "/ JAX_NUM_PROCESSES / JAX_PROCESS_ID explicitly.",
                stacklevel=2)
            return False
        _initialized = True
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def _infer_num_slices(devices) -> int:
    idx = {getattr(d, "slice_index", 0) or 0 for d in devices}
    return len(idx)


def build_multislice_mesh(num_slices: Optional[int] = None,
                          samples_parallel: int = 1,
                          devices=None) -> Mesh:
    """A ``(slice, data, samples)`` mesh with slice-major device order.

    ``num_slices`` defaults to the device topology's slice count (1 on a
    single slice — the mesh then has a size-1 DCN axis and behaves exactly
    like `sharding.build_mesh`).  Devices within a slice are contiguous on
    the trailing axes, so `psum`/`pmean` over ``data``/``samples`` lower to
    ICI collectives and only reductions over ``slice`` touch DCN.

    Use with `sharding.make_sharded_pose_step(..., data_axes=(SLICE_AXIS,
    DATA_AXIS))`: problems shard over slice x data jointly; the smoothing-
    gradient ``pmean`` is the only cross-slice traffic.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if num_slices is None:
        num_slices = _infer_num_slices(devices)
    n = len(devices)
    if n % num_slices:
        raise ValueError(f"{n} devices do not split into {num_slices} slices")
    per_slice = n // num_slices
    if per_slice % samples_parallel:
        raise ValueError(
            f"{per_slice} devices/slice not divisible by samples_parallel="
            f"{samples_parallel}")
    # Slice-major ordering: group by slice_index when the attribute exists,
    # else keep enumeration order (virtual meshes, CPU tests).
    devices.sort(key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    arr = np.asarray(devices).reshape(
        num_slices, per_slice // samples_parallel, samples_parallel)
    return Mesh(arr, (SLICE_AXIS, DATA_AXIS, SAMPLE_AXIS))
