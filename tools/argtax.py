"""Probe the axon per-argument / per-output dispatch tax.

docs/PERF.md attributes the pool's ~57 ms per-call FIXED cost to the
per-buffer dispatch overhead of the axon tunnel (each argument/output of
a jitted call costs host-side marshalling). This measures it directly:
time a trivial jitted program (sum of N small device-resident arrays)
as N grows, plus the same with one packed array, so the slope IS the
per-argument tax and the intercept the RPC floor.

Run on the real TPU (quiet machine):  python tools/argtax.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rows", type=int, default=256,
                    help="rows per [rows, 128] f32 argument")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    def timed(fn, *a):
        fn(*a)  # compile + warm
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            # full-buffer host transfer = the only honest axon barrier
            float(jnp.asarray(out).sum()) if hasattr(out, "sum") else out
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(f"# per-call wall (best of {args.reps}), [rows={args.rows}] f32 args")
    results = {}
    for n in (1, 4, 8, 16, 32, 48):
        xs = [jnp.full((args.rows, 128), float(i)) for i in range(n)]

        @jax.jit
        def many(*arrs):
            s = arrs[0]
            for a in arrs[1:]:
                s = s + a
            return s[:1, :1].sum()

        ms = timed(many, *xs)
        results[n] = ms
        print(f"args={n:3d}: {ms:7.2f} ms")

    # same adds, ONE packed argument
    for n in (16, 48):
        packed = jnp.stack([jnp.full((args.rows, 128), float(i))
                            for i in range(n)])

        @jax.jit
        def one(p):
            return p.sum(axis=0)[:1, :1].sum()

        ms = timed(one, packed)
        print(f"packed {n} into 1: {ms:7.2f} ms")

    ns = sorted(results)
    slope = (results[ns[-1]] - results[ns[0]]) / (ns[-1] - ns[0])
    print(f"=> per-argument tax ~{slope:.3f} ms, floor ~{results[ns[0]]:.2f} ms")


if __name__ == "__main__":
    main()
