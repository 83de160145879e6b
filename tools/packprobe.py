"""A/B the scene-arg packing win on the real pool bench call.

Times the identical pool render dispatched (a) with SceneData's 49
arrays as jit arguments, (b) with the 3 packed dtype blobs
(scene/packing.py). The delta is the axon per-argument dispatch tax
recovered. Run on the real TPU, quiet machine.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tris", type=int, default=20_000)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.scene import scene as S
    from jaderaytracerendering_tpu.scene.packing import pack_scene, unpack_scene
    from jaderaytracerendering_tpu.integrator import pool
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    ds = demo.jade_scene(n_buddha_tris=args.tris)
    sd = S.assemble(ds.objects, ds.env_map)
    cfg = RenderConfig(width=args.width, height=args.width, spp=args.spp,
                       max_depth=6, traversal="sweep", engine="pool")
    eye = jnp.asarray(ds.camera.eye, jnp.float32)
    rot = jnp.asarray(ds.camera.camera_rotate, jnp.float32)
    npix = cfg.width * cfg.height
    pool_m = int(min(cfg.rays_per_launch, npix * cfg.spp))
    total = npix * cfg.spp

    @functools.partial(jax.jit, static_argnames=("cfg_", "pool_m"))
    def call_sd(sd_, eye_, rot_, total_, cfg_, pool_m, base):
        film, done, n_rays, iters = pool._pool_render_impl(
            sd_, eye_, rot_, total_, cfg_, pool_m, base)
        return jnp.stack([done.astype(jnp.float32), iters.astype(jnp.float32),
                          n_rays, jnp.sum(film)])

    blobs, meta = pack_scene(sd)

    @functools.partial(jax.jit, static_argnames=("meta", "cfg_", "pool_m"))
    def call_packed(blobs_, eye_, rot_, total_, cfg_, pool_m, base, meta):
        sd_ = unpack_scene(blobs_, meta)
        film, done, n_rays, iters = pool._pool_render_impl(
            sd_, eye_, rot_, total_, cfg_, pool_m, base)
        return jnp.stack([done.astype(jnp.float32), iters.astype(jnp.float32),
                          n_rays, jnp.sum(film)])

    def timed(fn, *a, **kw):
        s0 = np.asarray(fn(*a, **kw))  # compile + warm
        best = 1e9
        stats = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            stats = np.asarray(fn(*a, **kw))
            dt = time.perf_counter() - t0
            best = min(best, dt)
        return best, stats

    t_sd, s1 = timed(call_sd, sd, eye, rot, total, cfg, pool_m, cfg.spp)
    t_pk, s2 = timed(call_packed, blobs, eye, rot, total, cfg, pool_m,
                     cfg.spp, meta=meta)
    assert np.allclose(s1, s2), (s1, s2)
    mr1 = s1[2] / t_sd / 1e6
    mr2 = s2[2] / t_pk / 1e6
    print(f"sd-args : {t_sd*1e3:8.2f} ms  {mr1:6.2f} Mrays/s  iters={s1[1]:.0f}")
    print(f"packed  : {t_pk*1e3:8.2f} ms  {mr2:6.2f} Mrays/s  iters={s2[1]:.0f}")
    print(f"delta   : {(t_sd-t_pk)*1e3:8.2f} ms/call recovered")


if __name__ == "__main__":
    main()
