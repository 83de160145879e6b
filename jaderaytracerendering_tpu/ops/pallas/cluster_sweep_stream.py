"""Pallas TPU kernel: self-preparing, HBM-streaming cluster sweep.

The VMEM-resident fused kernel (cluster_sweep_fused) holds the whole
coefficient table on-chip and compacts candidates with a [Cp, Cp]
triangular matmul — both quadratic walls at large scenes (a 400k-tri
scene has ~4.4k clusters: 88 MB of coefficients, an 80 MB triu). This
kernel removes both walls so buddha-scale scenes (PathTrace.cpp:1002)
run the same tile-coherent sweep:

per ray tile (one grid step):
  1. level-1 slab: test the tile's rays against CHUNK AABBs (unions of
     128 BVH-ordered clusters, [8, NCp] in VMEM) — chunks no ray enters
     are skipped entirely, making slab work output-sensitive;
  2. per active chunk, slab its 128 clusters ([TM, 128]) and compact
     the active ids with a fixed [128, 128] triangular matmul cumsum
     into a [L_CAP, 1] sublane-indexed list (no [Cp, Cp] anything);
  3. visits run the same bf16x3 MXU Möller–Trumbore + deferred
     reduction as the fused kernel, but cluster coefficient blocks are
     DMA-streamed from HBM through a double buffer (pl.ANY memory
     space) — VMEM holds only [2, 10, 4Kp] in flight, so scene size is
     bounded by HBM, not VMEM;
  4. if a tile's candidate count overflows L_CAP, it falls back to a
     streamed sweep of every cluster (exact, just denser — same
     escape hatch as cluster_sweep.L_MAX).

Exactness: level-2 slab math is identical to cluster_sweep_fused /
prepare_tiles (same reference dist>0 semantics, PathTrace.cu:746-760
slab form); the level-1 chunk test is made CONSERVATIVE under the
degenerate 0*inf=NaN case (forced active) so it can only add visits,
never hide one. Candidate order is ascending cluster id, so min-id
tie-breaks match the other intersectors. Equivalence-tested vs brute
force in both coef modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams

from ...core import vecmath as vm
from .. import gemm_intersect, intersect

INF = intersect.INF
L_CAP = 512  # per-tile candidate-list rows (VMEM scratch, sublane-indexed)


def _stream_kernel(f_ref, ex_ref, planes_ref, chunkp_ref, begin_ref,
                   triu128_ref, coefs_ref, bt_ref, bi_ref,
                   ids_ref, off_ref, cstat_ref, btw_ref, bw_ref, *rest,
                   kp: int, cp: int, n_clusters: int, l_cap: int,
                   stream: bool):
    tm = f_ref.shape[1]
    # transposed lane-dense inputs (see cluster_sweep_fused): one
    # in-kernel relayout each, then row-major math as before
    feats = jnp.transpose(f_ref[:], (1, 0))  # [TM, 16] = (d, dxo, o, 1, 0..)
    ex = jnp.transpose(ex_ref[:], (1, 0))    # [TM, 1]
    n_chunks = cp // 128
    ncp = cstat_ref.shape[0]                 # chunk lanes (>= n_chunks)

    ray_ok = (jnp.abs(feats[:, 0:1]) + jnp.abs(feats[:, 1:2])
              + jnp.abs(feats[:, 2:3])) > 0.0

    def slab(planes, conservative_nan):
        """Rays vs AABB planes [8, W] -> hits [TM, W] (reference dist>0
        semantics, cluster_sweep.prepare_tiles math)."""
        t0v = None
        t1v = None
        for ax in range(3):
            d_c = feats[:, ax : ax + 1]
            o_c = feats[:, 6 + ax : 7 + ax]
            inv = 1.0 / d_c
            fa = (planes[3 + ax : 4 + ax, :] - o_c) * inv
            na = (planes[ax : ax + 1, :] - o_c) * inv
            hi = jnp.maximum(fa, na)
            lo = jnp.minimum(fa, na)
            if conservative_nan:
                # degenerate 0*inf lanes force the chunk ACTIVE so the
                # coarse level can only add visits, never hide one
                hi = jnp.where(jnp.isnan(hi), jnp.float32(1e30), hi)
                lo = jnp.where(jnp.isnan(lo), jnp.float32(-1e30), lo)
            t1v = hi if t1v is None else jnp.minimum(t1v, hi)
            t0v = lo if t0v is None else jnp.maximum(t0v, lo)
        dist_pos = jnp.where(t0v > 0.0, t0v, t1v) > 0.0
        return (t1v >= t0v) & dist_pos & ray_ok

    # ---- level 1: active chunks ----
    chits = slab(chunkp_ref[:], conservative_nan=True)       # [TM, NCp]
    cact = jnp.max(chits.astype(jnp.int32), axis=0, keepdims=True)
    cstat_ref[:] = cact.T                                    # [NCp, 1]

    # ---- level 2: per-chunk slab + chunked compaction ----
    ids_ref[:] = jnp.zeros((l_cap, 1), jnp.int32)
    off_ref[0:1, 0:1] = jnp.zeros((1, 1), jnp.int32)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (l_cap, 128), 0)

    for j in range(n_chunks):  # static: <=128 chunks unrolled

        @pl.when(cstat_ref[j, 0] > 0)
        def _(j=j):
            hits = slab(planes_ref[:, j * 128 : (j + 1) * 128],
                        conservative_nan=False)              # [TM, 128]
            cid_l = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                     + j * 128)
            act = (jnp.max(hits.astype(jnp.float32), axis=0, keepdims=True)
                   * (cid_l < n_clusters).astype(jnp.float32))  # [1, 128]
            pos = jnp.dot(act, triu128_ref[:],
                          preferred_element_type=jnp.float32)
            off = off_ref[0, 0]
            slot = pos.astype(jnp.int32) + off - 1           # [1, 128]
            sel = (l_iota == slot) & (act > 0.0)
            ids_ref[:] = ids_ref[:] + jnp.sum(
                jnp.where(sel, (cid_l + 1).astype(jnp.float32), 0.0),
                axis=1, keepdims=True).astype(jnp.int32)
            off_ref[0:1, 0:1] = off_ref[0:1, 0:1] + jnp.sum(
                act, axis=1, keepdims=True).astype(jnp.int32)

    total = off_ref[0, 0]

    # ---- visits: bf16x3 MXU MT + deferred reduction (fused-kernel form) ----
    fh = feats.astype(jnp.bfloat16)
    fl = (feats - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    fcat = jnp.concatenate([fh, fh, fl], axis=1)             # [TM, 48]
    k_io = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)

    if stream:
        buf_ref, sem = rest

        def start_fetch(slot, cid):
            pltpu.make_async_copy(coefs_ref.at[cid], buf_ref.at[slot],
                                  sem.at[slot]).start()

        def wait_fetch(slot, cid):
            pltpu.make_async_copy(coefs_ref.at[cid], buf_ref.at[slot],
                                  sem.at[slot]).wait()

        def coef_at(slot):
            return buf_ref[slot]
    else:
        def start_fetch(slot, cid):
            pass

        def wait_fetch(slot, cid):
            pass

        def coef_at_cid(cid):
            return coefs_ref[pl.ds(cid, 1)][0]

    def test_cluster(coef, begin):
        ch = coef.astype(jnp.bfloat16)
        cl_ = (coef - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        ccat = jnp.concatenate([ch, cl_, ch], axis=0)        # [48, 4*Kp]
        s = jnp.dot(fcat, ccat, preferred_element_type=jnp.float32)
        a = s[:, 0 * kp : 1 * kp]
        su = s[:, 1 * kp : 2 * kp]
        sv = s[:, 2 * kp : 3 * kp]
        st = s[:, 3 * kp : 4 * kp]
        # sign-exact division-free forms of u>=0, v>=0, u+v<=1, t>0
        ok = ((su * a >= 0.0) & (sv * a >= 0.0)
              & ((su + sv) * a <= a * a) & (st * a > 0.0)
              & (k_io + begin != ex))
        t = jnp.where(ok, st / a, INF)
        better = t < btw_ref[:]                              # first visit
        btw_ref[:] = jnp.where(better, t, btw_ref[:])        # wins ties
        bw_ref[:] = jnp.where(better, begin, bw_ref[:])

    def run_stream(n_visits, cid_of):
        """Double-buffered streamed visit loop (pallas_guide double-
        buffering pattern); cid_of maps visit ordinal -> cluster id."""
        start_fetch(0, cid_of(0))

        def visit(l, carry):
            slot = jax.lax.rem(l, 2)
            nxt = jax.lax.rem(l + 1, 2)

            @pl.when(l + 1 < n_visits)
            def _():
                start_fetch(nxt, cid_of(l + 1))

            cid = cid_of(l)
            wait_fetch(slot, cid)
            test_cluster(coef_at(slot), begin_ref[cid, 0])
            return carry

        jax.lax.fori_loop(0, n_visits, visit, 0)

    def run_vmem(n_visits, cid_of):
        def visit(l, carry):
            cid = cid_of(l)
            test_cluster(coef_at_cid(cid), begin_ref[cid, 0])
            return carry

        jax.lax.fori_loop(0, n_visits, visit, 0)

    run = run_stream if stream else run_vmem

    @pl.when(total > 0)
    def _():
        btw_ref[:] = jnp.full((tm, kp), INF, jnp.float32)
        bw_ref[:] = jnp.zeros((tm, kp), jnp.int32)

        @pl.when(total <= l_cap)
        def _():
            run(total, lambda l: ids_ref[l, 0] - 1)

        @pl.when(total > l_cap)
        def _():  # overflow: exact dense sweep of every cluster
            # traced bound (total * 0 + C) keeps Mosaic from unrolling
            run(total * 0 + n_clusters, lambda l: l)

        btw = btw_ref[:]
        tmin = jnp.min(btw, axis=1, keepdims=True)           # [TM, 1]
        idw = bw_ref[:] + jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1)
        sel2 = jnp.where(btw <= tmin, idw, jnp.int32(2**30))
        # transposed [1, TM] outputs: lane-dense HBM buffers (a [Mp, 1]
        # pallas output forces a 128-lane-padded layout)
        bt_ref[:] = jnp.transpose(tmin, (1, 0))
        bi_ref[:] = jnp.transpose(jnp.min(sel2, axis=1, keepdims=True),
                                  (1, 0))

    @pl.when(total == 0)
    def _():
        bt_ref[:] = jnp.full((1, tm), INF, jnp.float32)
        bi_ref[:] = jnp.zeros((1, tm), jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "stream",
                                             "l_cap"))
def nearest_hit_sweep_stream_jnp(origins, dirs, exclude, sd, tile_m=256,
                                 interpret=False, stream=None,
                                 l_cap=L_CAP):
    """Streaming cluster-sweep nearest hit. Same contract as the other
    intersectors: (hit [M], index [M] i32, t [M] f32, t along unit dir).

    ``stream=None`` auto-selects: coefficient tables beyond the VMEM
    budget stream from HBM; small scenes stay VMEM-resident."""
    dirs_u = vm.normalize(dirs, jnp)
    feats = gemm_intersect.ray_features_t16(origins, dirs_u, jnp)  # [16, M]
    return nearest_hit_sweep_stream_feats_jnp(
        feats, exclude.astype(jnp.int32)[None, :], sd, tile_m=tile_m,
        interpret=interpret, stream=stream, l_cap=l_cap)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "stream",
                                             "l_cap", "anyhit"))
def nearest_hit_sweep_stream_feats_jnp(feats, exclude, sd, tile_m=256,
                                       interpret=False, stream=None,
                                       l_cap=L_CAP, anyhit=None):
    """Feats-level entry (see cluster_sweep_fused counterpart): the
    integrator passes [16, M] transposed features + [1, M] i32 exclusion
    built directly from its SoA planes. ``anyhit`` is accepted for
    interface parity and currently ignored (full nearest semantics are a
    superset; the streamed epilogue is reduction-bound, not
    winner-tracking-bound)."""
    c = sd.n_clusters
    kp = sd.cluster_coef.shape[2] // 4
    cp = sd.cluster_planes.shape[1]
    if stream is None:
        stream = sd.cluster_coef.nbytes > 10 * 1024 * 1024
    m = feats.shape[1]
    pad = (-m) % tile_m
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((16, pad), feats.dtype)], axis=1)
        exclude = jnp.concatenate(
            [exclude, jnp.full((1, pad), -1, exclude.dtype)], axis=1)
    mp = m + pad
    n_tiles = mp // tile_m
    triu128 = jnp.triu(jnp.ones((128, 128), jnp.float32))
    ncp = sd.cluster_chunk_planes.shape[1]

    kern = functools.partial(_stream_kernel, kp=kp, cp=cp, n_clusters=c,
                             l_cap=l_cap, stream=stream)
    scratch = [
        pltpu.VMEM((l_cap, 1), jnp.int32),       # candidate ids
        pltpu.VMEM((1, 1), jnp.int32),           # running offset
        pltpu.VMEM((ncp, 1), jnp.int32),         # chunk activity
        pltpu.VMEM((tile_m, kp), jnp.float32),   # best-t wide
        pltpu.VMEM((tile_m, kp), jnp.int32),     # winner begin wide
    ]
    if stream:
        scratch += [
            pltpu.VMEM((2, 16, 4 * kp), jnp.float32),  # coef double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ]
    bt, bi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((16, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster planes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # chunk planes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # begin col
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triu128
            pl.BlockSpec(memory_space=pl.ANY if stream else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((1, mp), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_cparams(),
    )(feats, exclude, sd.cluster_planes,
      sd.cluster_chunk_planes, sd.cluster_begin_col, triu128,
      sd.cluster_coef)
    bt = bt[0, :m]
    bi = bi[0, :m]
    return bt < INF, jnp.where(bt < INF, bi, 0), bt
