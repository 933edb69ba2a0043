"""Trace the headline pose step and print the device-op breakdown.

    python tools/profile_step.py [--image 256] [--k 50] [--s 8] [--n 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--scene", default="cube")
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from bench_step import build
    from pertrenderer_tpu.utils.profiling import summarize_trace, trace

    make = build(args.image, args.k, args.s, args.scene)
    run = make(args.n)
    x0 = jnp.zeros((1, 3))
    k0 = jax.random.PRNGKey(0)
    _ = float(run(x0, k0))  # compile
    _ = float(run(x0, k0))
    with trace("/tmp/pert_prof") as d:
        _ = float(run(x0, k0))
    rows = summarize_trace(d, top=args.top)
    total = sum(ms for _, ms, _ in rows)
    print(f"{'op':60s} {'total_ms':>9s} {'count':>6s} {'us/iter':>8s}")
    for name, ms, c in rows:
        print(f"{name[:60]:60s} {ms:9.3f} {c:6d} {ms / args.n * 1e3:8.1f}")
    print(f"sum of listed: {total:.3f} ms over {args.n} iters "
          f"-> {total / args.n * 1e3:.1f} us/iter")


if __name__ == "__main__":
    main()
