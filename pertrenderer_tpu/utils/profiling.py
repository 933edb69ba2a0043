"""Device-honest timing and tracing helpers.

The reference instruments with host wall-clocks under CUDA_LAUNCH_BLOCKING
(`/root/reference/experiments/eval.py:4,349,355`); on this TPU stack the
analogue needs care: the runtime resolves ``block_until_ready`` lazily, so
dispatch-loop timing under-measures.  :func:`per_iteration_time` runs the
step inside a jitted ``lax.scan`` at two lengths and fetches a scalar — the
slope is true device time per iteration.  :func:`trace` wraps
``jax.profiler`` for kernel-level breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["per_iteration_time", "trace", "summarize_trace"]


def per_iteration_time(step_fn: Callable, init_carry, n1: int = 3,
                       n2: int = 23) -> float:
    """Seconds per iteration of ``carry -> carry`` ``step_fn`` (jitted scan
    slope between two lengths; the carry must be a pytree of arrays)."""
    def make(n):
        @jax.jit
        def run(carry):
            out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), carry,
                                  None, length=n)
            return jax.tree.reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), out,
                jnp.float32(0))
        return run

    times = {}
    for n in (n1, n2):
        run = make(n)
        _ = float(run(init_carry))
        t0 = time.time(); _ = float(run(init_carry)); t1 = time.time()
        _ = float(run(init_carry)); t2 = time.time()
        times[n] = min(t1 - t0, t2 - t1)
    return max((times[n2] - times[n1]) / (n2 - n1), 0.0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pertrenderer_trace"):
    """Context manager around jax.profiler tracing."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 20):
    """Aggregate device-op durations from the newest trace under log_dir.
    Returns [(name, total_ms, count)] sorted by total time."""
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    data = json.load(gzip.open(paths[-1]))
    device_pids = {
        e["pid"] for e in data.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device" in str(e.get("args", {}).get("name", "")).lower()
    }
    durs = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids:
            durs[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return [(name, d / 1000.0, cnt[name]) for name, d in durs.most_common(top)]
