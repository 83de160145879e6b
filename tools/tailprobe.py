"""Decompose the pool loop's XLA tail by subtractive ablation.

Runs the marginal-slope probe (docs/PERF.md methodology) with individual
subsystems stubbed to constants via monkeypatching, on top of the
in-kernel 'stub' trace variant (cluster_sweep_fused), so each delta
isolates one fusion chain's per-iteration cost. Stubs change semantics
(NOT for correctness runs) but keep shapes/dtypes so the loop structure
is identical.

  python tools/tailprobe.py --ablate none|trace|env|rng|rows|sampling|all
"""

from __future__ import annotations

import argparse
import functools as ft
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", default="none",
                    help="comma list: trace,env,rng,rows,sampling,spawncam")
    ap.add_argument("--iters-a", type=int, default=40)
    ap.add_argument("--iters-b", type=int, default=140)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--pool-m", type=int, default=1 << 14)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    ab = set(args.ablate.split(","))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    from jaderaytracerendering_tpu.core import camera as camera_mod, rng
    from jaderaytracerendering_tpu.core.vecmath import V3
    from jaderaytracerendering_tpu.integrator import pool, wavefront
    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused as csf
    from jaderaytracerendering_tpu.scene import envmap, scene as scene_mod
    from jaderaytracerendering_tpu.scene.scene import assemble
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    if "trace" in ab or "all" in ab:
        orig = csf.nearest_hit_sweep_fused_feats_jnp
        csf.nearest_hit_sweep_fused_feats_jnp = ft.partial(
            orig, _debug_variant="stub")
    # stubs keep a live data dependency (* 1e-20) so XLA cannot
    # constant-fold the downstream chains the ablation is NOT measuring
    if "env" in ab or "all" in ab:
        def env_stub(sd, d, xp, clamp=10.0):
            return V3(d.x * 1e-20 + 0.5, d.y * 1e-20 + 0.5,
                      d.z * 1e-20 + 0.5)
        envmap.sample_env_sd_p = env_stub
    if "rng" in ab or "all" in ab:
        def rng_stub(xp, pixel, sample, bounce, site, seed):
            h = (jnp.asarray(pixel).astype(jnp.float32)
                 + jnp.asarray(sample).astype(jnp.float32)
                 + jnp.asarray(bounce).astype(jnp.float32)
                 + jnp.asarray(site).astype(jnp.float32))
            return h * 1e-20 + 0.5
        rng.uniform = rng_stub
    if "rows" in ab or "all" in ab:
        def rows_stub(sd, idx, xp):
            return jnp.zeros((16, idx.shape[0]), jnp.float32) + \
                idx.astype(jnp.float32) * 1e-9
        def both_stub(sd, idx, xp):
            r = rows_stub(sd, idx, xp)
            return r, r
        wavefront._tri_rows_t = rows_stub
        wavefront._tri_mat_rows_t = both_stub
        pool._tri_mat_rows_t = both_stub

    ds = demo.jade_scene(n_buddha_tris=20_000, env_shape=(128, 256))
    ds.camera.r = 2.2
    ds.camera.up_angle = 10.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = RenderConfig(width=256, height=256, spp=16, spp_batch=4,
                       max_depth=6, traversal="sweep", engine="pool",
                       rays_per_launch=args.pool_m)
    eye = jnp.asarray(ds.camera.eye, jnp.float32)
    rot = jnp.asarray(ds.camera.camera_rotate, jnp.float32)
    total = 256 * 256 * cfg.spp
    pool_m = int(min(cfg.rays_per_launch, total))

    def run(mi):
        accum, done, n_rays, iters = pool._pool_render(
            sd, eye, rot, total, cfg, pool_m, 0, max_iters=mi)
        return float(done), int(iters)

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
    print(f"ablate={args.ablate}  A: {ia} iters {ta*1e3:.1f} ms   "
          f"B: {ib} iters {tb*1e3:.1f} ms")
    if ib > ia:
        print(f"marginal per-iteration: {(tb - ta) / (ib - ia) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
