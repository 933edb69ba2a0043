"""Mosaic capability probe: per-tile SMEM chunk-row lists, dynamically
indexed inside the kernel's chunk loop, driving HBM->VMEM DMAs.

This is the mechanism the bucketed-streaming design needs: an XLA prepass
emits, per tile, the explicit list of table chunks to process (any window
structure — y-buckets, x-cuts, chunk-bbox culling), and the kernel loop
reads rows_ref[0, q] (q traced) to place each DMA.

    python tools/probe_smem_rows.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 8
CMAX = 16


def kernel(rows_ref, n_ref, tab_hbm, out_ref, scratch, sem):
    def body(q, acc):
        r = rows_ref[0, 0, q]                    # dynamic SMEM scalar read
        cp = pltpu.make_async_copy(
            tab_hbm.at[pl.ds(r * CH, CH), :], scratch, sem)
        cp.start()
        cp.wait()
        return acc + jnp.sum(scratch[:]) + r.astype(jnp.float32)
    acc = jax.lax.fori_loop(0, n_ref[0, 0, 0], body, jnp.float32(0.0))
    out_ref[:] = jnp.full((8, 128), acc)


@jax.jit
def run(tab, rows, n):
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, 1, CMAX), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(rows, n, tab)


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(CH * 32, 128)).astype(np.float32))
    rows = jnp.asarray(
        np.stack([rng.permutation(32)[:CMAX],
                  rng.permutation(32)[:CMAX]]).astype(np.int32))[:, None, :]
    n = jnp.asarray([[[5]], [[9]]], jnp.int32)
    out = np.asarray(run(tab, rows, n))
    tabn = np.asarray(tab)
    exp = []
    for t in range(2):
        s = 0.0
        for q in range(int(n[t, 0, 0])):
            r = int(rows[t, 0, q])
            s += tabn[r * CH:(r + 1) * CH].sum() + r
        exp.append(s)
    got = [out[0, 0], out[0, 128]]
    print("expected:", exp)
    print("got:     ", got)
    ok = np.allclose(exp, got, rtol=1e-5)
    print("SMEM dynamic row-list indexing:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
