"""Perf probe: marginal per-iteration cost of the pool loop + HLO census.

Methodology per docs/PERF.md: run the jitted pool with two max_iters
values and take (wall_b - wall_a) / (iters_b - iters_a) — per-call fixed
overhead (dispatch, compile cache lookup, host transfer) cancels out.
Host transfers of the returned counters are the completion barrier
(block_until_ready under-synchronizes on axon).

--census additionally prints an opcode census of the compiled module's
while-body (fusions / copies / gathers / scatters / custom-calls) and
the padded-buffer bytes each copy moves.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=20_000)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--iters-a", type=int, default=40)
    ap.add_argument("--iters-b", type=int, default=140)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--census", action="store_true")
    ap.add_argument("--bench", action="store_true",
                    help="time the bench-identical call (max_iters=1e6)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pool-m", type=int, default=1 << 14)
    ap.add_argument("--traversal", default="sweep")
    ap.add_argument("--variant", default="full",
                    help="fused-kernel _debug_variant ablation: full | "
                         "slab_only | capN (see cluster_sweep_fused)")
    ap.add_argument("--spawn-rounds", type=int, default=1)
    ap.add_argument("--no-fused-tail", action="store_true")
    ap.add_argument("--no-spawn-kernel", action="store_true")
    ap.add_argument("--trace-tile", type=int, default=0,
                    help="override the fused trace kernel tile_m")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    from jaderaytracerendering_tpu.integrator import pool
    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.scene.scene import assemble
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    if args.variant != "full" or args.trace_tile:
        import functools as _ft

        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused

        over = {}
        if args.variant != "full":
            over["_debug_variant"] = args.variant
        if args.trace_tile:
            over["tile_m"] = args.trace_tile
        _orig = cluster_sweep_fused.nearest_hit_sweep_fused_feats_jnp
        cluster_sweep_fused.nearest_hit_sweep_fused_feats_jnp = _ft.partial(
            _orig, **over)
        _orig_s = cluster_sweep_fused.nearest_hit_sweep_fused_stacked_jnp
        cluster_sweep_fused.nearest_hit_sweep_fused_stacked_jnp = _ft.partial(
            _orig_s, **over)

    ds = demo.jade_scene(n_buddha_tris=args.tris, env_shape=(128, 256))
    ds.camera.r = 2.2
    ds.camera.up_angle = 10.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = RenderConfig(width=256, height=256, spp=16, spp_batch=4,
                       max_depth=args.depth, traversal=args.traversal,
                       engine="pool", rays_per_launch=args.pool_m,
                       spawn_rounds=args.spawn_rounds,
                       fused_tail=not args.no_fused_tail,
                       spawn_kernel=not args.no_spawn_kernel)
    eye = jnp.asarray(ds.camera.eye, jnp.float32)
    rot = jnp.asarray(ds.camera.camera_rotate, jnp.float32)
    npix = cfg.width * cfg.height
    total = npix * cfg.spp
    pool_m = int(min(cfg.rays_per_launch, total))

    if args.census:
        lowered = jax.jit(
            pool._pool_render_impl,
            static_argnames=("cfg", "pool_m", "max_iters"),
        ).lower(sd, eye, rot, total, cfg, pool_m, 0, None, 10**6)
        txt = lowered.compile().as_text()
        census(txt)
        return

    if args.bench:
        import numpy as np

        for _ in range(2):  # compile + warm
            accum, done, n_rays, iters = pool._pool_render(
                sd, eye, rot, total, cfg, pool_m, 0)
            int(done)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            accum, done, n_rays, iters = pool._pool_render(
                sd, eye, rot, total, cfg, pool_m, 0)
            rays = int(n_rays)
            _ = float(np.asarray(accum).sum())
            dt = time.perf_counter() - t0
            if best is None or dt < best[0]:
                best = (dt, rays, int(iters), int(done))
        dt, rays, iters, done = best
        print(f"wall {dt*1e3:.1f} ms  iters {iters}  n_rays {rays}  "
              f"done {done}  -> {rays/dt/1e6:.2f} Mrays/s  "
              f"({dt*1e3/iters:.3f} ms/iter incl fixed)")
        # warmup trace: per-call walls (counter barrier) over many reps
        walls = []
        for _ in range(24):
            t0 = time.perf_counter()
            accum, done, n_rays, iters = pool._pool_render(
                sd, eye, rot, total, cfg, pool_m, 0)
            int(done), int(iters)
            walls.append((time.perf_counter() - t0) * 1e3)
        print("walls:", " ".join(f"{w:.0f}" for w in walls))
        return

    def run(mi):
        accum, done, n_rays, iters = pool._pool_render(
            sd, eye, rot, total, cfg, pool_m, 0, max_iters=mi)
        return float(done), int(iters)  # host transfer barrier

    # warmup both compilations
    for mi in (args.iters_a, args.iters_b):
        for _ in range(3):
            run(mi)

    best = {}
    for _ in range(args.reps):
        for mi in (args.iters_a, args.iters_b):
            t0 = time.perf_counter()
            _, iters = run(mi)
            dt = time.perf_counter() - t0
            if mi not in best or dt < best[mi][0]:
                best[mi] = (dt, iters)
    (ta, ia), (tb, ib) = best[args.iters_a], best[args.iters_b]
    print(f"A: {ia} iters {ta*1e3:.1f} ms   B: {ib} iters {tb*1e3:.1f} ms")
    if ib > ia:
        print(f"marginal per-iteration: {(tb - ta) / (ib - ia) * 1e3:.3f} ms")


def census(txt: str):
    """Opcode census of the while-loop body computation(s) of an
    optimized HLO dump (kernel-count proxy: each top-level fusion /
    copy / gather / scatter / custom-call in the scheduled body is
    roughly one launch on the axon runtime)."""
    comps = {}
    cur = None
    for line in txt.splitlines():
        if not line.startswith(" ") and "{" in line and "->" in line:
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
            cur = m.group(1) if m else None
            if cur:
                comps[cur] = []
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        if not re.match(r"\s+(?:ROOT\s+)?%[\w.\-]+ = ", line):
            continue
        # opcode = the known-HLO token directly before a '(' — tuple
        # types also contain parens, so filter against an opcode list
        known = ("fusion", "copy", "gather", "scatter", "custom-call",
                 "transpose", "dot", "convert", "while", "conditional",
                 "dynamic-slice", "dynamic-update-slice", "reduce",
                 "concatenate", "broadcast", "iota", "bitcast", "reshape",
                 "slice", "all-reduce", "select", "add", "pad", "parameter",
                 "constant", "get-tuple-element", "tuple", "after-all",
                 "rng-bit-generator", "compare", "multiply", "subtract",
                 "divide", "maximum", "minimum", "exponential", "sqrt",
                 "rsqrt", "log", "sort", "clamp", "and", "or", "not",
                 "xor", "shift-left", "shift-right-logical", "power",
                 "abs", "floor", "negate", "sign", "atan2", "cosine",
                 "sine", "is-finite", "reduce-window", "map", "call")
        for tok in re.findall(r"([a-z][a-z0-9\-]*)\(", line):
            if tok in known:
                comps[cur].append((tok, line))
                break
    body_names = set()
    for name, instrs in comps.items():
        for op, line in instrs:
            if op == "while":
                bm = re.search(r"body=%?([\w.\-]+)", line)
                if bm:
                    body_names.add(bm.group(1))
    if not body_names:
        print("no while body found; computations:", list(comps)[:10])
        return
    skip = {"parameter", "constant", "get-tuple-element", "tuple",
            "bitcast", "after-all"}
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
                "f16": 2, "s8": 1, "u8": 1}
    shape_re = re.compile(r"= \(?(f32|s32|u32|pred|bf16|f16|s8|u8)"
                          r"\[([0-9,]*)\]")
    for bn in sorted(body_names):
        ops = collections.Counter()
        copy_bytes = 0
        total = 0
        for op, line in comps.get(bn, []):
            if op in skip:
                continue
            ops[op] += 1
            total += 1
            if op in ("copy", "transpose"):
                sm = shape_re.search(line)
                if sm:
                    n = 1
                    for d in (int(x) for x in sm.group(2).split(",") if x):
                        n *= d
                    copy_bytes += n * dt_bytes[sm.group(1)]
        print(f"--- while body {bn}: {total} instructions ---")
        for op, n in ops.most_common():
            print(f"  {op:24s} {n}")
        print(f"  copy/transpose payload (pre-pad): {copy_bytes/1e6:.1f} MB")


if __name__ == "__main__":
    main()
