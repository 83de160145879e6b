"""CPU census: predicted coefficient-DMA volume for the STREAMED
megakernel at large scene scale (no chip needed).

The pool's 400k-tri row is coefficient-DMA-bound: respawn-shuffled
16k-lane batches union ~390 clusters per 128-lane tile, ~1.6 GB of
32 KB block DMAs per launch (docs/PERF.md speed-of-light check). The
streamed mega keeps lane = pixel, so every tile's rays share one image
patch. This census slab-tests the three ray populations one mega tile
actually traces each iteration against the cluster AABBs and reports
the per-tile UNION — each union member is one 32 KB coefficient DMA:

  primary  — camera rays of TM consecutive pixels (spawn sweep)
  nee      — hit-point origins of those pixels -> one light point
             (the light + HDR-visibility segments; HDR dirs are
             cosine-random, bounded below by 'bounce')
  bounce   — same coherent origins x uniform-sphere directions (the
             continuation segment, the widest union)

Compare 'bounce' (the mega worst case) against the pool's shuffled
row (sortprobe census: ~390 at tile 128): the ratio bounds the DMA
saving of pixel-coherent tiles for >VMEM scenes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=400_000)
    ap.add_argument("--tiles", type=int, default=48,
                    help="number of pixel tiles to sample")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    import numpy as np

    from jaderaytracerendering_tpu.core import camera as camera_mod
    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.ops import bruteforce
    from jaderaytracerendering_tpu.scene.scene import assemble

    ds = demo.jade_scene(n_buddha_tris=args.tris, env_shape=(16, 32))
    ds.camera.r = 2.2
    ds.camera.up_angle = 10.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    C = sd.n_clusters
    print(f"clusters={C} coef={sd.cluster_coef.nbytes / 2**20:.1f} MB")

    cpl = np.asarray(sd.cluster_planes)
    aa, bb = cpl[0:3, :C].T, cpl[3:6, :C].T          # [C, 3]

    def union(o, d):
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t0s = (aa[None] - o[:, None]) * inv[:, None]  # [T, C, 3]
        t1s = (bb[None] - o[:, None]) * inv[:, None]
        tn = np.minimum(t0s, t1s).max(axis=2)
        tf = np.maximum(t0s, t1s).min(axis=2)
        # match the kernel's predicate exactly: dist = where(tn>0, tn, tf)
        # must be STRICTLY positive (not tf >= max(tn, 0), which is
        # optimistic-high at boundary cases)
        hit = (tf >= tn) & (np.where(tn > 0, tn, tf) > 0)
        return int(hit.any(axis=0).sum()), float(hit.sum(1).mean())

    rng = np.random.default_rng(0)
    w, h = args.width, args.height
    cam = ds.camera
    eye = np.asarray(cam.eye, np.float64)
    rot = np.asarray(cam.camera_rotate)

    # one light point (the demo light's first vertex region)
    lp = np.asarray(sd.light_p1)[0] if sd.n_emit else eye

    for tm in (128, 256):
        stats = {"primary": [], "nee": [], "bounce": []}
        visits = {"primary": [], "nee": [], "bounce": []}
        for _ in range(args.tiles):
            base = int(rng.integers(0, h * w - tm))
            pix = np.arange(base, base + tm)
            px = (pix % w + rng.random(tm)) / w * 2 - 1
            py = (pix // w + rng.random(tm)) / h * 2 - 1
            dcam = np.stack([px, py, np.full(tm, camera_mod.FOCAL_Z)], 1)
            d = dcam @ rot[:3, :3].T
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            o = np.broadcast_to(eye, (tm, 3)).copy()
            u, pr = union(o, d)
            stats["primary"].append(u)
            visits["primary"].append(pr)

            # hit points: march each primary ray to its brute nearest
            hitm, _, t = map(np.asarray, bruteforce.nearest_hit_jnp(
                jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                jnp.full((tm,), -1, jnp.int32), sd.tri_p1, sd.tri_p2,
                sd.tri_p3))
            hp = o + d * np.where(hitm, t, 0.0)[:, None]
            hp = hp[hitm]
            if hp.shape[0] < 8:
                continue
            dn = lp[None] - hp
            dn /= np.linalg.norm(dn, axis=1, keepdims=True) + 1e-12
            u, pr = union(hp, dn)
            stats["nee"].append(u)
            visits["nee"].append(pr)

            db = rng.normal(size=hp.shape)
            db /= np.linalg.norm(db, axis=1, keepdims=True)
            u, pr = union(hp, db)
            stats["bounce"].append(u)
            visits["bounce"].append(pr)

        for k in ("primary", "nee", "bounce"):
            s = np.array(stats[k], np.float64)
            v = np.array(visits[k], np.float64)
            print(f"tile={tm:4d} {k:>8}: union mean={s.mean():6.1f} "
                  f"p90={np.percentile(s, 90):6.1f} max={s.max():5.0f}  "
                  f"per-ray {v.mean():4.2f}  "
                  f"DMA/tile={s.mean() * 32 / 1024:5.2f} MB")


if __name__ == "__main__":
    main()
