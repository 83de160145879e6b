"""Sublane-packing microprobe: VPU elementwise throughput vs row shape.

The mega kernel does all its bounce math on [1, TM] rows. If Mosaic
lays a single-row f32 array at one sublane per vreg, a [1, 128] op
wastes 7/8 of the VPU and raising TM (with (1, 128)-packed tiling) or
blocking rows recovers it. This probe times a fixed count of
dependent-chain FMAs per lane at several shapes and prints effective
lane-ops/s. 8 independent chains per shape keep the VPU pipeline fed.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, iters: int, chains: int):
    rows = [x_ref[:] + jnp.float32(i) for i in range(chains)]

    def body(i, rs):
        f = jnp.float32(1.0000001)
        return tuple(r * f + jnp.float32(1e-7) for r in rs)

    rows = jax.lax.fori_loop(0, iters, body, tuple(rows))
    acc = rows[0]
    for r in rows[1:]:
        acc = acc + r
    o_ref[:] = acc


def run(shape, iters, chains):
    x = jnp.zeros(shape, jnp.float32)
    f = pl.pallas_call(
        functools.partial(_kernel, iters=iters, chains=chains),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    g = jax.jit(f)
    r = g(x)
    np.asarray(r)  # warm + barrier
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        r = g(x)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    lane_ops = shape[0] * shape[1] * iters * chains * 2  # fma = 2 flop
    print(f"{str(shape):>12}  wall={dt*1e3:8.3f} ms  "
          f"{lane_ops/dt/1e9:8.2f} Gflop/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100_000)
    ap.add_argument("--chains", type=int, default=8)
    args = ap.parse_args()
    for shape in [(1, 128), (1, 256), (1, 512), (1, 1024), (8, 128),
                  (8, 256), (8, 512), (16, 128), (32, 128), (8, 1024)]:
        run(shape, args.iters, args.chains)


if __name__ == "__main__":
    main()
