"""Probe: in-kernel dynamic row gathers on TPU (megakernel GO/NO-GO).

A whole-render Pallas megakernel (the reference's one-launch
render_pixel, PathTrace.cu:1725) needs per-lane dynamic ROW fetches
inside the kernel: tri/mat rows for the winning hit, SSS area-CDF rows,
env texels. This measures the candidate mechanisms on a [T, 32] f32
table with per-lane random indices, [128]-lane tiles:

  a. take    — jnp.take(table, idx, axis=0) (Mosaic dynamic gather, if
               it lowers)
  b. loop    — per-lane fori with dynamic sublane indexing (table[i, :])
  c. onehot  — one-hot bf16 matmul [TM, T] @ [T, 32]
  d. xla     — the current XLA-side gather (baseline, same shapes)

Run each at T in {2k, 20k}; prints us/tile-gather. Interpret mode
(--cpu) validates semantics only.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TM = 128
REPS = 64  # gathers per kernel call (amortize launch tax)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--t", type=int, default=20_000)
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--coherent", action="store_true",
                    help="cluster-local ids (the megakernel's actual row "
                         "distribution) instead of uniform-random")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = args.cpu
    T = args.t
    M = args.m
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((T, 32), dtype=np.float32))
    if args.coherent:
        base = rng.integers(0, max(T - 256, 1), size=(M // TM, 1))
        idx = jnp.asarray(
            (base + rng.integers(0, 256, size=(M // TM, TM))).reshape(1, M),
            jnp.int32)
    else:
        idx = jnp.asarray(rng.integers(0, T, size=(1, M)), jnp.int32)

    def mk(kern_body, name):
        def kernel(idx_ref, tab_ref, out_ref):
            acc = jnp.zeros((TM, 32), jnp.float32)
            for r in range(REPS):  # static unroll: REPS gathers
                rows = kern_body(tab_ref, (idx_ref[0] + r) % T)
                acc = acc + rows
            out_ref[:] = jnp.transpose(acc, (1, 0))

        @jax.jit
        def run(idx, table):
            return pl.pallas_call(
                kernel,
                grid=(M // TM,),
                in_specs=[
                    pl.BlockSpec((1, TM), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((32, TM), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((32, M), jnp.float32),
                interpret=interp,
            )(idx, table)

        return name, run

    def take_body(tab_ref, ids):
        return jnp.take(tab_ref[:], ids, axis=0)

    def loop_body(tab_ref, ids):
        import jax.lax as lax

        def one(l, acc):
            row = lax.dynamic_slice(tab_ref[:], (ids[l], 0), (1, 32))
            return lax.dynamic_update_slice(acc, row, (l, 0))

        return jax.lax.fori_loop(0, TM, one,
                                 jnp.zeros((TM, 32), jnp.float32))

    def onehot_body(tab_ref, ids):
        io = jax.lax.broadcasted_iota(jnp.int32, (TM, T), 1)
        oh = (io == ids[:, None]).astype(jnp.bfloat16)
        return jnp.dot(oh, tab_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def block_body(tab_ref, ids):
        # coherent-block gather (ops/pallas/mega._take_rows 'block'):
        # per-128-row block dynamic_gather + compare-select. The probe's
        # random ids are the WORST case (range spans the whole table);
        # production ids are cluster-local (1-3 blocks).
        nrow = tab_ref.shape[0]
        ids_t = ids[:, None]
        blk_t = ids_t // 128
        bmin = jnp.min(blk_t)
        bmax = jnp.max(blk_t)

        def body(b_, out):
            import jax.lax as lax

            base = jnp.minimum(b_ * 128, nrow - 128)
            block = lax.dynamic_slice(tab_ref[:], (base, 0), (128, 32))
            pos = jnp.clip(ids_t - base, 0, 127)
            rows_b = jnp.take_along_axis(
                block, jnp.broadcast_to(pos, (TM, 32)), axis=0)
            return jnp.where(blk_t == b_, rows_b, out)

        return jax.lax.fori_loop(bmin, bmax + 1, body,
                                 jnp.zeros((TM, 32), jnp.float32))

    candidates = [mk(take_body, "take"), mk(loop_body, "loop"),
                  mk(block_body, "block"), mk(onehot_body, "onehot")]

    @jax.jit
    def xla_gather(idx, table):
        acc = jnp.zeros((M, 32), jnp.float32)
        for r in range(REPS):
            acc = acc + table[(idx[0] + r) % T]
        return jnp.transpose(acc, (1, 0))

    ref = None
    for name, run in candidates + [("xla", xla_gather)]:
        try:
            out = np.asarray(run(idx, table))
            if ref is None:
                ref = out
            ok = np.allclose(out, ref, rtol=1e-2, atol=1e-2)  # bf16 loose
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(run(idx, table))
            dt = (time.perf_counter() - t0) / 3
            per_tile_us = dt * 1e6 / (M // TM) / REPS
            print(f"{name:7s} T={T}: {dt*1e3:8.2f} ms/call "
                  f"({per_tile_us:7.3f} us/tile-gather)  match={ok}")
        except Exception as e:
            print(f"{name:7s} T={T}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
