"""Preview frame decomposition probe: where do the ~275 ms of a
1024^2 progressive preview frame go?

Times, per engine ('pool' = the XLA chunked integrator frame,
'mega' = the one-launch preview megakernel):
  - kernel-only marginal: N dependent frames inside one jit dispatch
    (scalar barrier), so the per-frame device cost is isolated from
    the ~30 ms axon roundtrip;
  - single-frame end-to-end: one dispatch + the full u8 display
    transfer (the honest interactive-loop cost bench.py measures);
  - the display/tonemap marginal: end-to-end minus a no-display
    dispatch of the same frame.

Usage: python tools/prevprobe.py [--width 1024] [--engine mega|pool]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--tris", type=int, default=20_000)
    ap.add_argument("--engine", default="mega", choices=["mega", "pool"])
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--spp", type=int, default=1)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    import numpy as np

    from jaderaytracerendering_tpu.core.film import Film
    from jaderaytracerendering_tpu.integrator import render as R
    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.scene.scene import assemble
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    h = args.height or args.width
    ds = demo.jade_scene(n_buddha_tris=args.tris, env_shape=(128, 256))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = RenderConfig(width=args.width, height=h, spp=args.spp,
                       spp_batch=args.spp, max_depth=2,
                       rays_per_launch=1 << 18, integrator="preview",
                       engine=args.engine)
    film = Film.create(cfg.height, cfg.width)

    # --- end-to-end (bench.py protocol): dispatch + u8 transfer ---
    film1, disp = R.render_film_preview(sd, ds.camera, cfg, film=film,
                                        display=True, frame_idx=0)
    np.asarray(disp)                                  # compile + warm
    t0 = time.perf_counter()
    fi = 1
    for _ in range(args.frames):
        film1, disp = R.render_film_preview(sd, ds.camera, cfg,
                                            film=film1, display=True,
                                            frame_idx=fi)
        np.asarray(disp)
        fi += 1
    e2e = (time.perf_counter() - t0) / args.frames

    # --- no-display dispatch: same frame, film stays on device, a
    # scalar that depends on the film is the completion barrier ---
    film2 = Film.create(cfg.height, cfg.width)
    film2, _ = R.render_film_preview(sd, ds.camera, cfg, film=film2,
                                     display=True, frame_idx=0)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        film2, disp2 = R.render_film_preview(sd, ds.camera, cfg,
                                             film=film2, display=True,
                                             frame_idx=fi)
        fi += 1
    float(jnp.sum(disp2[::128, ::128]))  # partial barrier: last frame
    nod = (time.perf_counter() - t0) / args.frames
    # NOTE: a partial transfer under-synchronizes on axon (PERF.md);
    # nod is a LOWER bound on the pipelined dispatch cost, printed for
    # the pipelining headroom estimate, not as a standalone number.

    # --- full transfer cost alone: transfer the last disp again ---
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(disp2)
    xfer = (time.perf_counter() - t0) / 3

    print(f"engine={args.engine} {args.width}x{h} spp={args.spp} "
          f"frames={args.frames}")
    print(f"end-to-end per frame: {e2e * 1e3:8.1f} ms  "
          f"({1.0 / e2e:.2f} fps)")
    print(f"pipelined dispatches: {nod * 1e3:8.1f} ms/frame (lower bound)")
    print(f"u8 frame re-transfer: {xfer * 1e3:8.1f} ms")
    print(f"=> roundtrip+sync tax ~ {max(e2e - nod - xfer, 0.0) * 1e3:.1f}"
          " ms/frame")


if __name__ == "__main__":
    main()
