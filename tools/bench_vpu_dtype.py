"""Micro-benchmark: VPU elementwise throughput f32 vs bf16 on this chip.

Decides whether bf16 shading/texel math is worth a parity story: if Mosaic
packs bf16 2-per-lane, elementwise FLOPs double; if it silently widens to
f32, there is nothing to gain.  Measured with the scan-slope method
(NOTES.md: naive dispatch loops under-measure on this backend).

    python tools/bench_vpu_dtype.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 256, 1024
INNER = 64          # fma chains per kernel invocation


def make_kernel(dtype):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        acc = x
        for _ in range(INNER):
            acc = acc * y + x
        o_ref[:] = acc

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(x, y, n):
        def body(c, _):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            )(c, y)
            return out, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.float32(out[0, 0])
    return run


def slope(run, x, y, n1=50, n2=400):
    ts = {}
    for n in (n1, n2):
        _ = float(run(x, y, n))
        t0 = time.time(); _ = float(run(x, y, n)); t1 = time.time()
        _ = float(run(x, y, n)); t2 = time.time()
        ts[n] = min(t1 - t0, t2 - t1)
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.ones((R, C), dtype) * 1.0001
        y = jnp.ones((R, C), dtype) * 0.9999
        run = make_kernel(dtype)
        s = slope(run, x, y)
        flops = R * C * INNER * 2
        print(f"{jnp.dtype(dtype).name}: {s*1e6:.1f} us/call  "
              f"{flops / s / 1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
