"""Pallas cluster sweep v2: fully fused, no host-side prep.

v1 (cluster_sweep.py) computes each tile's active-cluster list in XLA
([M, C] slab + packing) and feeds it through scalar prefetch. v2 moves
everything into the kernel: each tile computes its own [TM, C] slab
planes in VMEM, any-reduces to a sublane-oriented activity column, and
loops over *all* clusters with a dynamic trip count, @pl.when-skipping
inactive ones.

MEASURED OUTCOME (v5e, 20k-tri demo, 65k camera rays): v2 is ~2x slower
than v1 (9.8 ms vs 4.6 ms) — the per-cluster scalar-branch loop runs C
iterations per tile regardless of activity, and that scalar overhead
(~500k branch evaluations per call) exceeds the host prep it saves. v1's
compacted candidate lists iterate only the ~10-30 active clusters. Kept
as a correctness-equivalent reference point for the fusion trade-off; use
v1 (``traversal='sweep'``) in production.

Mosaic lessons encoded here: dynamic fori bounds prevent full unrolling;
scalar control-flow reads need sublane-dim indexing ([C, 1] activity,
not [1, C]); cast to 32-bit before inserting a minor dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import vecmath as vm
from .. import intersect

INF = intersect.INF


def _sweep2_kernel(cnum_ref, begins_ref, o_ref, d_ref, ex_ref, boxes_ref,
                   blocks_ref, bt_ref, bi_ref, act_ref, k: int):
    tm = o_ref.shape[0]
    n_clusters = cnum_ref[0]

    bt_ref[:] = jnp.full((tm, 1), INF, jnp.float32)
    bi_ref[:] = jnp.zeros((tm, 1), jnp.int32)

    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    ex = ex_ref[:, 0:1]

    # ---- in-kernel tile activity: per-axis slab planes [TM, C] ----
    ray_ok = (jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)) > 0.0
    t0v = None
    t1v = None
    for ax, (oc, dc) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
        inv = 1.0 / dc
        fa = (boxes_ref[3 + ax : 4 + ax, :] - oc) * inv
        na = (boxes_ref[ax : ax + 1, :] - oc) * inv
        hi = jnp.maximum(fa, na)
        lo = jnp.minimum(fa, na)
        t1v = hi if t1v is None else jnp.minimum(t1v, hi)
        t0v = lo if t0v is None else jnp.maximum(t0v, lo)
    dist_pos = jnp.where(t0v > 0.0, t0v, t1v) > 0.0
    hit_box = (t1v >= t0v) & dist_pos & ray_ok
    # sublane-oriented activity column (lane-dim scalar reads need
    # 128-aligned indices; sublane reads don't)
    act_ref[:] = jnp.any(hit_box, axis=0).astype(jnp.int32)[:, None]

    def test_cluster(cid):
        block = blocks_ref[pl.ds(cid, 1)][0]  # [12, K]
        p1x, p1y, p1z = block[0:1, :], block[1:2, :], block[2:3, :]
        p2x, p2y, p2z = block[3:4, :], block[4:5, :], block[5:6, :]
        p3x, p3y, p3z = block[6:7, :], block[7:8, :], block[8:9, :]
        e1x, e1y, e1z = p2x - p1x, p2y - p1y, p2z - p1z
        e2x, e2y, e2z = p3x - p1x, p3y - p1y, p3z - p1z
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx, sy, sz = ox - p1x, oy - p1y, oz - p1z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ids_k = begins_ref[cid] + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
              & (ids_k != ex))
        t = jnp.where(ok, t, INF)
        tmin = jnp.min(t, axis=1, keepdims=True)
        sel = jnp.where(t <= tmin, ids_k, jnp.int32(2**30))
        imin = jnp.min(sel, axis=1, keepdims=True)
        better = tmin < bt_ref[:]
        bt_ref[:] = jnp.where(better, tmin, bt_ref[:])
        bi_ref[:] = jnp.where(better, imin, bi_ref[:])

    def visit(c, carry):
        @pl.when(act_ref[c, 0] > 0)
        def _():
            test_cluster(c)

        return carry

    jax.lax.fori_loop(0, n_clusters, visit, 0)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def nearest_hit_sweep2_jnp(origins, dirs, exclude, sd, tile_m=128,
                           interpret=False):
    """Fused sweep v2. Same (hit, index, t) contract as every intersector."""
    m = origins.shape[0]
    c = sd.n_clusters
    k = sd.cluster_k
    dirs_u = vm.normalize(dirs, jnp)

    pad_m = (-m) % tile_m
    if pad_m:
        origins = jnp.concatenate([origins, jnp.zeros((pad_m, 3), origins.dtype)])
        dirs_u = jnp.concatenate([dirs_u, jnp.zeros((pad_m, 3), dirs_u.dtype)])
        exclude = jnp.concatenate([exclude, jnp.full((pad_m,), -1, exclude.dtype)])
    mp = m + pad_m
    n_tiles = mp // tile_m

    c_pad = -(-c // 128) * 128
    boxes = jnp.zeros((8, c_pad), jnp.float32)
    boxes = boxes.at[0:3, :c].set(sd.cluster_aa.T)
    boxes = boxes.at[3:6, :c].set(sd.cluster_bb.T)
    # padding clusters: empty boxes with aa > bb never pass the slab test
    boxes = boxes.at[0:3, c:].set(1.0)
    boxes = boxes.at[3:6, c:].set(-1.0)

    kern = functools.partial(_sweep2_kernel, k=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_m, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((c_pad, 1), jnp.int32)],
    )
    bt, bi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.full((1,), c, jnp.int32), sd.cluster_begin, origins, dirs_u,
      exclude[:, None], boxes, sd.cluster_tris)
    bt = bt[:m, 0]
    bi = bi[:m, 0]
    return bt < INF, jnp.where(bt < INF, bi, 0), bt
