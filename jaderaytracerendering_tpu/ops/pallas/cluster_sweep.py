"""Pallas TPU kernel: tile-coherent cluster sweep nearest-hit.

The fused replacement for the XLA cluster traversal: per ray-tile the
kernel loops over that tile's *active clusters* (precomputed host-side
from dense [tiles, C] slab tests and fed through scalar prefetch), slices
the VMEM-resident packed triangle blocks at a scalar index — no gathers —
and runs the Moller-Trumbore test for TM rays x K triangles entirely in
VMEM. Intermediates never touch HBM, which is what the XLA version could
not avoid (each visit materialized [M, K, 12] blocks plus test temps).

Design notes (pallas_guide.md):
- scalar prefetch (PrefetchScalarGridSpec) drives dynamic VMEM slicing,
  the standard block-sparse pattern;
- SMEM is ~1 MB, so the per-tile candidate list is capped at L_MAX
  entries; the rare tile whose union exceeds the cap falls back to a
  full sweep over all C clusters (still exact, just denser);
- cluster blocks [C, 12, K] live whole in VMEM (1.4 MB at 20k tris,
  ~7 MB at 150k) — the scene fits on-chip, the reference's GPU texture
  fetches become VMEM reads;
- per-(tile, cluster) compute is dense [TM, K] VPU work with dynamic
  trip counts (static bounds would be fully unrolled by Mosaic).

Exactness: a tile visits every cluster whose AABB any of its rays enters,
so results equal brute force (equivalence-tested); there is no ordering /
early-out, coherence does the work instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams

from ...core import vecmath as vm
from .. import intersect

INF = intersect.INF
L_MAX = 64  # SMEM candidate-list cap per tile


def _sweep_kernel(ids_ref, counts_ref, begins_ref, o_ref, d_ref, ex_ref,
                  blocks_ref, bt_ref, bi_ref, k: int, n_clusters: int):
    tile = pl.program_id(0)
    tm = o_ref.shape[0]
    n_active = counts_ref[tile]

    bt_ref[:] = jnp.full((tm, 1), INF, jnp.float32)
    bi_ref[:] = jnp.zeros((tm, 1), jnp.int32)

    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    ex = ex_ref[:, 0:1]

    def test_cluster(cid):
        block = blocks_ref[pl.ds(cid, 1)][0]  # [12, K] dynamic slice
        p1x, p1y, p1z = block[0:1, :], block[1:2, :], block[2:3, :]
        p2x, p2y, p2z = block[3:4, :], block[4:5, :], block[5:6, :]
        p3x, p3y, p3z = block[6:7, :], block[7:8, :], block[8:9, :]
        # Moller-Trumbore, scalarized (all [TM, K])
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
        tmin = jnp.min(t, axis=1, keepdims=True)          # [TM, 1]
        sel = jnp.where(t <= tmin, ids_k, jnp.int32(2**30))
        imin = jnp.min(sel, axis=1, keepdims=True)
        better = tmin < bt_ref[:]
        bt_ref[:] = jnp.where(better, tmin, bt_ref[:])
        bi_ref[:] = jnp.where(better, imin, bi_ref[:])

    @pl.when(n_active <= L_MAX)
    def _listed():
        # 2 visits per trip: per-visit sequencer/branch overhead dominates
        # the dense test work, so halving loop iterations is a real win
        def visit(l, carry):
            cid0 = ids_ref[tile, 2 * l]
            cid1 = ids_ref[tile, 2 * l + 1]

            @pl.when(cid0 >= 0)
            def _():
                test_cluster(cid0)

            @pl.when(cid1 >= 0)
            def _():
                test_cluster(cid1)

            return carry

        jax.lax.fori_loop(0, (n_active + 1) // 2, visit, 0)

    @pl.when(n_active > L_MAX)
    def _overflow():  # candidate list truncated: sweep every cluster
        def visit(c, carry):
            test_cluster(c)
            return carry

        jax.lax.fori_loop(0, n_clusters, visit, 0)


def prepare_tiles(origins, dirs, exclude, sd, tile_m, sort_rays):
    """Shared host-side (XLA) prep for the sweep kernels: normalize +
    optionally coherence-sort + pad rays to tile multiples, and build the
    per-tile active-cluster candidate lists from dense slab tests.

    Returns (origins, dirs_u, exclude, ids, counts, perm, m, mp) where
    ids is [n_tiles, L+1] int32 (-1 padded) and perm is the applied ray
    permutation (None when sort_rays=False)."""
    m = origins.shape[0]
    c = sd.n_clusters
    dirs_u = vm.normalize(dirs, jnp)

    perm = None
    if sort_rays:
        # coherence sort: tiles get rays with similar origin cell +
        # direction octant, shrinking each tile's active-cluster union.
        lo = jnp.min(sd.cluster_aa, axis=0)
        hi = jnp.max(sd.cluster_bb, axis=0)
        cell = jnp.clip(((origins - lo) / (hi - lo + 1e-9) * 8).astype(jnp.int32), 0, 7)
        octant = ((dirs_u[:, 0] > 0).astype(jnp.int32)
                  + 2 * (dirs_u[:, 1] > 0).astype(jnp.int32)
                  + 4 * (dirs_u[:, 2] > 0).astype(jnp.int32))
        key = ((cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2]) * 8 + octant
        dead = jnp.sum(jnp.abs(dirs_u), axis=-1) <= 0
        key = jnp.where(dead, jnp.int32(1 << 30), key)
        perm = jnp.argsort(key)
        origins = origins[perm]
        dirs_u = dirs_u[perm]
        exclude = exclude[perm]

    pad_m = (-m) % tile_m
    if pad_m:
        zpad3 = jnp.zeros((pad_m, 3), origins.dtype)
        origins = jnp.concatenate([origins, zpad3])
        dirs_u = jnp.concatenate([dirs_u, jnp.zeros((pad_m, 3), dirs_u.dtype)])
        exclude = jnp.concatenate([exclude, jnp.full((pad_m,), -1, exclude.dtype)])
    mp = m + pad_m
    n_tiles = mp // tile_m

    # host-side (XLA) tile -> active-cluster lists. Scalarized per-axis
    # slab test: [M, C] planes only (the [M, C, 3] broadcast form
    # materializes ~2 GB of temporaries at M=65k).
    t0v = None
    t1v = None
    for ax in range(3):
        inv = 1.0 / dirs_u[:, ax : ax + 1]                      # [M, 1]
        fa = (sd.cluster_bb[None, :, ax] - origins[:, ax : ax + 1]) * inv
        na = (sd.cluster_aa[None, :, ax] - origins[:, ax : ax + 1]) * inv
        hi = jnp.maximum(fa, na)
        lo = jnp.minimum(fa, na)
        t1v = hi if t1v is None else jnp.minimum(t1v, hi)
        t0v = lo if t0v is None else jnp.maximum(t0v, lo)
    # reference semantics (dist > 0): entry t if outside, exit t if inside
    dist_pos = jnp.where(t0v > 0.0, t0v, t1v) > 0.0
    ray_ok = jnp.sum(jnp.abs(dirs_u), axis=-1) > 0
    hits_box = (t1v >= t0v) & dist_pos & ray_ok[:, None]
    active = hits_box.reshape(n_tiles, tile_m, c).any(axis=1)  # [tiles, C]
    l_list = min(c, L_MAX)
    # pack active cluster ids to the front via cumsum scatter (no argsort).
    # The cumsum runs as ONE MXU matmul against a triangular ones matrix
    # instead of XLA's ~log2(C)-pass scan (each pass is a ~30us kernel
    # launch on the axon runtime): 0/1 inputs are exact in bf16 and the
    # f32 accumulation makes integer sums exact.
    triu = jnp.triu(jnp.ones((c, c), jnp.float32))
    pos = jnp.dot(active.astype(jnp.float32), triu,
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    counts = pos[:, -1]  # == active.sum(axis=1)
    slot = jnp.where(active & (pos <= l_list), pos - 1, l_list)
    rows = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]
    cols = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :],
                            (n_tiles, c))
    ids = jnp.full((n_tiles, l_list + 1), -1, jnp.int32)
    ids = ids.at[rows, slot].set(cols, mode="drop")[:, :l_list]
    # one clean -1 column so the 2-wide unrolled visit loop can read one
    # past an odd n_active without touching scatter garbage
    ids = jnp.concatenate(
        [ids, jnp.full((n_tiles, 1), -1, jnp.int32)], axis=1
    )
    return origins, dirs_u, exclude, ids, counts, perm, m, mp


def unpermute_results(bt, bi, perm, m):
    """Scatter sweep results back to caller ray order after sort_rays."""
    bt = bt[:m, 0]
    bi = bi[:m, 0]
    if perm is not None:
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(m))
        bt = bt[inv]
        bi = bi[inv]
    return bt < INF, jnp.where(bt < INF, bi, 0), bt


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "sort_rays"))
def nearest_hit_sweep_jnp(origins, dirs, exclude, sd, tile_m=128,
                          interpret=False, sort_rays=False):
    """Pallas cluster-sweep nearest hit. Same contract as the other
    intersectors: (hit [M], index [M] i32, t [M] f32, t along unit dir)."""
    c = sd.n_clusters
    k = sd.cluster_k
    origins, dirs_u, exclude, ids, counts, perm, m, mp = prepare_tiles(
        origins, dirs, exclude, sd, tile_m, sort_rays
    )
    n_tiles = mp // tile_m

    kern = functools.partial(_sweep_kernel, k=k, n_clusters=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_m, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks, whole
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    bt, bi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_cparams(),
    )(ids, counts, sd.cluster_begin, origins, dirs_u, exclude[:, None],
      sd.cluster_tris)
    return unpermute_results(bt, bi, perm, m)
