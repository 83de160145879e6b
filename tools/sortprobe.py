"""Does lane sorting make the 400k-tri streaming sweep cheaper?

The PERF census showed the large-scene pool cost is tile INCOHERENCE:
128 respawn-shuffled lanes union O(lanes x per-ray) cluster visits
(vs ~12 for pixel-coherent tiles), each visit a streamed 32 KB
coefficient DMA. This probe times nearest_hit_sweep_stream on a
realistic bounce batch (random surface origins, cosine-ish random
directions) in three lane orders:
  shuffled            — the pool's status quo
  sort by dir octant  — 3-bit key
  sort by cell+octant — origin Morton cell (4^3) + octant, 9-bit key
A win here justifies an XLA-side argsort + column-permute in the pool
bounce loop (permutation is bit-exactly invertible).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=400_000)
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--census", action="store_true",
                    help="CPU-only: per-tile union cluster-visit counts "
                    "instead of wall time (no chip needed)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    import numpy as np

    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.ops import gemm_intersect
    from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_stream as css
    from jaderaytracerendering_tpu.scene.scene import assemble

    ds = demo.jade_scene(n_buddha_tris=args.tris, env_shape=(128, 256))
    ds.camera.r = 2.2
    ds.camera.up_angle = 10.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    print(f"clusters={sd.n_clusters} coef={sd.cluster_coef.nbytes/2**20:.1f} MB")

    rng = np.random.default_rng(0)
    m = args.m
    # origins near the model surface: sample triangle midpoints
    v0 = np.asarray(sd.tri_table[:, 0:3])
    ntri = v0.shape[0]
    pick = rng.integers(0, ntri, m)
    o = v0[pick] + rng.normal(scale=0.02, size=(m, 3))
    d = rng.normal(size=(m, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ex = np.full((m,), -1, np.int32)

    def feats_of(order):
        oo, dd = o[order], d[order]
        f = gemm_intersect.ray_features_t16(
            jnp.asarray(oo, jnp.float32), jnp.asarray(dd, jnp.float32), jnp)
        return jnp.asarray(f)

    orders = {"shuffled": np.arange(m)}
    oct_key = ((d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)).astype(
        np.int64)
    orders["octant"] = np.argsort(oct_key, kind="stable")
    lo, hi = o.min(axis=0), o.max(axis=0)
    cell = ((o - lo) / (hi - lo + 1e-9) * 4).astype(np.int64).clip(0, 3)
    ck = ((cell[:, 0] * 4 + cell[:, 1]) * 4 + cell[:, 2]) * 8 + oct_key
    orders["cell+octant"] = np.argsort(ck, kind="stable")

    if args.census:
        # slab test vs cluster boxes, pure numpy — counts the per-tile
        # UNION of hit clusters (each union member is one streamed
        # 32 KB coefficient DMA in the stream kernel)
        cpl = np.asarray(sd.cluster_planes)  # [8, C] rows 0-2 aa, 3-5 bb
        C = sd.n_clusters
        aa, bb = cpl[0:3, :C].T, cpl[3:6, :C].T  # [C, 3]
        for name, order in orders.items():
            oo, dd = o[order], d[order]
            inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
            t0s = (aa[None] - oo[:, None]) * inv[:, None]   # [M, C, 3]
            t1s = (bb[None] - oo[:, None]) * inv[:, None]
            tn = np.minimum(t0s, t1s).max(axis=2)
            tf = np.maximum(t0s, t1s).min(axis=2)
            hit = (tf >= np.maximum(tn, 0.0))               # [M, C]
            for tile in (128, 256):
                u = hit.reshape(m // tile, tile, C).any(axis=1).sum(axis=1)
                print(f"{name:>12} tile={tile:4d}  union mean="
                      f"{u.mean():6.1f}  max={u.max():4d}  "
                      f"per-ray {hit.sum(axis=1).mean():.2f}")
        return

    exr = jnp.asarray(ex, jnp.int32)[None, :]
    for name, order in orders.items():
        f = feats_of(order)
        call = jax.jit(lambda ff: jnp.sum(
            css.nearest_hit_sweep_stream_feats_jnp(
                ff, exr, sd, interpret=args.cpu)[0]))
        s = np.asarray(call(f))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = np.asarray(call(f))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:>12}  wall={dt*1e3:8.2f} ms  "
              f"{m/dt/1e6:6.2f} Mrays/s  (chk {float(s):.4g})")


if __name__ == "__main__":
    main()
