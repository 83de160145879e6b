"""Megakernel decomposition probe: time render_mega under the _debug
ablations (full | nogather | notrace) and gather modes, same protocol as
bench.py's mega path (one jitted call, film-checksum barrier).

The deltas attribute the mega engine's wall time: full-nogather = the
in-kernel row/env/CDF gather cost, full-notrace = the cluster-sweep
visit cost, remainder = bounce math + spawn + launch fixed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=20_000)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--gather", default="loop")
    ap.add_argument("--debug", default="full",
                    help="comma list of _debug variants to time")
    ap.add_argument("--spawn-rounds", type=int, default=0,
                    help="0 = cfg default")
    ap.add_argument("--l-cap", type=int, default=0,
                    help="0 = the engine's size-scaled default")
    ap.add_argument("--stream", action="store_true",
                    help="force the HBM-streaming coefficient path")
    ap.add_argument("--chunked", action="store_true",
                    help="force the chunked compaction with resident "
                    "coefficients (cfg.mega_chunked='on')")
    ap.add_argument("--redist", action="store_true",
                    help="intra-tile work redistribution "
                    "(cfg.mega_redistribute=True)")
    ap.add_argument("--no-redist", action="store_true",
                    help="force cfg.mega_redistribute=False")
    ap.add_argument("--prologue", action="store_true",
                    help="primary prologue + pre-traced work list "
                    "(cfg.mega_prologue=True)")
    ap.add_argument("--sweep-tile", type=int, default=0,
                    help="cfg.mega_sweep_tile: sub-tile width per "
                    "sweep call (0 = no split)")
    ap.add_argument("--mega-tile", type=int, default=0,
                    help="0 = cfg default")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    import numpy as np

    from jaderaytracerendering_tpu.integrator import mega as mega_mod
    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.ops.pallas import mega as megak
    from jaderaytracerendering_tpu.scene.scene import assemble
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    ds = demo.jade_scene(n_buddha_tris=args.tris, env_shape=(128, 256))
    ds.camera.r = 2.2
    ds.camera.up_angle = 10.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, engine="mega",
                       mega_gather=args.gather)
    if args.spawn_rounds:
        cfg = cfg.replace(spawn_rounds=args.spawn_rounds)
    if args.mega_tile:
        cfg = cfg.replace(mega_tile=args.mega_tile)
    if args.sweep_tile:
        cfg = cfg.replace(mega_sweep_tile=args.sweep_tile)
    if args.stream:
        cfg = cfg.replace(mega_force_stream=True)
    if args.chunked:
        cfg = cfg.replace(mega_chunked="on")
    if args.redist:
        cfg = cfg.replace(mega_redistribute=True)
    if args.no_redist:
        cfg = cfg.replace(mega_redistribute=False)
    if args.prologue:
        cfg = cfg.replace(mega_prologue=True)
    assert mega_mod.eligible(sd, cfg), "scene exceeds the mega budget"
    mopts = mega_mod.kernel_opts(sd, cfg)
    mtriu = mopts.pop("triu")
    if args.l_cap:
        mopts["l_cap"] = args.l_cap
    print("mode:", "stream" if mopts["stream"] else "resident", mopts)
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega_mod._tables(
        sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(ds.camera.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    npix = cfg.width * cfg.height

    def mk(dbg):
        @jax.jit
        def bench_call(ints_):
            out = megak.render_mega(
                sd.n_clusters, ints_, cam24, ltab, lights2,
                sd.cluster_planes, sd.cluster_begin_col, mtriu,
                sd.cluster_coef, tri8, mat16, envp, buk, win, ota,
                sd.cluster_sub16_planes,
                cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd.n_emit,
                has_sss=sd.has_sss,
                env_shape=(int(sd.env_map.shape[0]),
                           int(sd.env_map.shape[1])),
                cdf_window=16, spp=int(cfg.spp),
                has_refract=sd.has_refract, gather=cfg.mega_gather,
                interpret=jax.default_backend() == "cpu", _debug=dbg,
                **mopts)
            tmq = int(getattr(cfg, "mega_tile", 256) or 256)
            pt = out[4:10].reshape(6, -1, tmq)[:, :, 0]  # per-tile stats
            return jnp.stack([jnp.max(out[4]), jnp.float32(0),
                              jnp.sum(out[3]), jnp.sum(out[0:3]),
                              jnp.max(pt[1]),       # max n_act any tile
                              jnp.sum(pt[2]),       # active chunks
                              jnp.sum(pt[3]),       # total visits
                              jnp.sum(pt[0]),       # total tile iters
                              jnp.sum(pt[4]),       # active lane-iters
                              jnp.sum(pt[5])])      # pending lane-iters

        return bench_call

    for dbg in args.debug.split(","):
        call = mk(dbg)
        ints0 = jnp.zeros((1, 8), jnp.int32)
        try:
            np.asarray(call(ints0))  # compile + warm
        except Exception as e:
            print(f"{dbg:9s} FAILED — {type(e).__name__}: {str(e)[:160]}")
            continue
        best = None
        for rep in range(3):
            base = jnp.zeros((8,), jnp.int32).at[2].set(
                (rep + 1) * cfg.spp).reshape(1, 8)
            t0 = time.perf_counter()
            stats = np.asarray(call(base))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        iters, _, total_rays, checksum = stats[:4]
        print(f"{dbg:9s} gather={args.gather:5s} wall={best*1e3:8.2f} ms  "
              f"iters={iters:6.0f}  rays={total_rays/1e6:7.2f}M  "
              f"-> {total_rays/best/1e6:6.2f} Mrays/s  (chk {checksum:.3e})")
        tmq = int(getattr(cfg, "mega_tile", 256) or 256)
        lane_iters = max(stats[7] * tmq, 1.0)
        print(f"          sweep stats: max_n_act={stats[4]:.0f}  "
              f"active_chunks={stats[5]/1e3:.1f}k  "
              f"visits={stats[6]/1e3:.1f}k")
        print(f"          lanes: util={stats[8]/lane_iters:5.1%} "
              f"pending={stats[9]/lane_iters:5.1%} "
              f"(divergence-idle={1 - stats[9]/lane_iters:5.1%}; "
              f"{stats[7]:.0f} tile-iters)")


if __name__ == "__main__":
    main()
