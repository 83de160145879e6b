"""Pallas TPU MEGAKERNEL: the whole render in ONE kernel launch.

The reference's entire render is one kernel launch with zero
inter-stage HBM traffic (`render_pixel<<<grid, block>>>`,
PathTrace.cu:1725-1731): each CUDA thread owns a pixel and loops over
samples and bounces privately. This kernel is the TPU-native analogue:

  - grid = pixel TILES of TM=128 lanes (lane i of tile t owns pixel
    t*TM + i — film writes are DENSE lane writes, no scatter, no
    respawn compaction: a retired lane simply starts ITS OWN pixel's
    next sample);
  - per tile, a `lax.while_loop` runs the pool engine's exact loop body
    (bounce actives -> resolve -> accumulate -> spawn fresh) entirely
    in VMEM/registers until every lane has consumed `spp` samples;
  - the scene lives whole in VMEM (f32 cluster coefficients, packed
    row tables); per-bounce row/env/CDF fetches are in-kernel gathers
    from 128-lane-packed tables (see scene.mega_pack);
  - pixel-tile lanes share nearly identical primary rays, so the
    cluster sweep's tile unions are far tighter than the pool's
    respawn-shuffled batches.

Semantics are pinned to the pool/scan engines: the SAME value-level
implementations run in-kernel (wavefront.bounce_front,
wavefront.resolve_tail, sampling.*, counter RNG keyed by
(pixel, sample, bounce, site)), so radiance parity with the oracle
holds lane-for-lane up to FMA contraction ulps. Per-pixel sample order
(ascending) matches the pool's work-queue assignment (pixel p receives
sample indices {p, p+npix, ...} -> smp 0..spp-1).

Gating (integrator/mega.py): VMEM-resident scenes only (the fused
sweep's c_pad <= 2048 class; larger scenes fall back to the pool +
HBM-streaming sweep). Direct refraction runs as an in-kernel march
(a while_loop of nested sweeps that exits when no lane is inside the
medium).

Trace core: a value-returning re-expression of the fused cluster
sweep (ops/pallas/cluster_sweep_fused.py — slab + MXU cumsum
compaction + bf16x3 Moller-Trumbore visits + deferred reduction),
equivalence-pinned by tests/test_mega.py against the scan engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import vecmath as vm
from ...core.vecmath import V3, vwhere
from .. import intersect

INF = intersect.INF
TM = 128

# Raised Mosaic VMEM limit (see common.py): the resident scene tables
# (~14.3 MB for the 20k-tri bench scene) nearly exhaust XLA's default
# 16 MiB scope, leaving no room for cfg.mega_tile > 128 scratch.
from .common import compiler_params as _mega_compiler_params


# --------------------------------------------------------------------------
# in-kernel gathers from 128-lane-packed tables (scene.mega_pack layout)
# --------------------------------------------------------------------------

def _take_rows(tab_ref, ids_row, idsl_ref, grow_ref, mode: str, gate=None,
               mask=None, dma_sem=None):
    """Gather rows: tab [R, 128], ids [1, TM] i32 -> [TM, 128] f32
    (i32 tables are value-exact in f32 up to 2^24 — all of ours are).

    mode 'loop' (production): per-lane dynamic SUBLANE loads stored
    through the [TM, 128] VMEM scratch (a dynamic_update_slice on a
    register value costs O(TM) vreg shuffles per row; a ref store is
    one VMEM write). Mosaic's vector gather lowers only the
    shape-preserving take_along_axis form (lowering.py:2464-2524), so
    table-shaped 'take' works in interpret mode only (kept for tests
    and future Mosaic support)."""
    tm = ids_row.shape[1]
    if mode == "zero":  # perf ablation (_debug='nogather'): no fetch
        return jnp.zeros((tm, 128), jnp.float32)
    if mode == "take":
        return jnp.take(tab_ref[:], ids_row[0], axis=0).astype(jnp.float32)
    if mode == "block":
        # COHERENT-id path: loop the [bmin, bmax] 128-row block range;
        # per block, ONE tpu.dynamic_gather (take_along_axis over
        # sublanes — the only vector-gather form Mosaic lowers) selects
        # each lane's row, then a compare-select keeps lanes whose id
        # lives in this block. Pixel-tile hits are cluster-local
        # (BVH-ordered ids), so the range is typically 1-3 blocks;
        # scattered tables (CDF buckets, bounce-direction env texels)
        # must use 'loop' instead. Tables are padded to >= 128 rows
        # (mega_pack) so the clamped window never reads out of bounds.
        nrow = tab_ref.shape[0]
        ids_t = jnp.transpose(ids_row, (1, 0))        # [TM, 1]
        blk_t = ids_t // 128
        # block range to scratch scalars (the cnt_ref pattern: Mosaic
        # scalars live in SMEM/VMEM [1, 1] cells, not vreg reductions)
        idsl_ref[0:1, 0:1] = jnp.min(blk_t, axis=0, keepdims=True)
        idsl_ref[1:2, 0:1] = jnp.max(blk_t, axis=0, keepdims=True)

        def body(b_, out):
            base = jnp.minimum(b_ * 128, nrow - 128)
            block = tab_ref[pl.ds(base, 128), :].astype(jnp.float32)
            pos_rel = jnp.clip(ids_t - base, 0, 127)
            # Mosaic lowers only the SHAPE-PRESERVING take_along_axis
            # (indices shape == operand shape, lowering.py:2464-2524),
            # so gather 128 lanes at a time when tm > 128
            parts = [
                jnp.take_along_axis(
                    block,
                    jnp.broadcast_to(pos_rel[s * 128:(s + 1) * 128],
                                     (128, 128)),
                    axis=0)
                for s in range(tm // 128)
            ]
            rows_b = (jnp.concatenate(parts, axis=0)
                      if len(parts) > 1 else parts[0])
            return jnp.where(blk_t == b_, rows_b, out)

        return jax.lax.fori_loop(idsl_ref[0, 0], idsl_ref[1, 0] + 1, body,
                                 jnp.zeros((tm, 128), jnp.float32))
    if mode == "mxu":
        # one-hot MXU gather, EXACT and VMEM-free: loop the spanned
        # 128-row block range; per block, rows = onehot([TM, 128]) @
        # block([128, 128]) at Precision.HIGHEST. The one-hot operand
        # is exactly 0/1, so every bf16 pass multiplies by 1.0 and the
        # 6-pass HIGHEST decomposition reconstructs each f32 table row
        # bit-exactly (b_hi + b_lo + ... = b). ~0.5 us/block vs the
        # serial loop's fixed ~128 row loads: a big win for coherent
        # ids (cluster-local tri rows, primary env texels, 1-3 blocks)
        # and a wash for fully scattered ones. tpu.dynamic_gather
        # ('block' mode) is NOT an option: Mosaic only lowers gathers
        # whose source spans one vreg along the gather dim (<= 8 f32
        # sublanes), measured as an HTTP-500 backend reject.
        nrow = tab_ref.shape[0]
        ids_t = jnp.transpose(ids_row, (1, 0))        # [TM, 1]
        blk_t = ids_t // 128
        if mask is not None:
            # consumer mask tightens the block span: non-consumer lanes
            # carry junk/zero ids that would otherwise stretch
            # [bmin, bmax] (e.g. crow's miss lanes hold id 0)
            # transpose in i32: Mosaic's backend rejects tpu.transpose
            # on i1 vectors (the round-3 megakernel HTTP-500 class)
            mask_t = jnp.transpose(
                mask.astype(jnp.int32), (1, 0)) != 0  # [TM, 1]
            bmin2 = jnp.where(mask_t, blk_t, jnp.int32(2 ** 30))
            bmax2 = jnp.where(mask_t, blk_t, jnp.int32(-1))
        else:
            mask_t = None
            bmin2 = bmax2 = blk_t
        idsl_ref[0:1, 0:1] = jnp.min(bmin2, axis=0, keepdims=True)
        idsl_ref[1:2, 0:1] = jnp.max(bmax2, axis=0, keepdims=True)
        io = jax.lax.broadcasted_iota(jnp.int32, (tm, 128), 1)

        def mbody(b_, acc):
            base = jnp.minimum(b_ * 128, nrow - 128)
            block = tab_ref[pl.ds(base, 128), :].astype(jnp.float32)
            # blk_t == b_ guards the clamped last window: ids inside
            # the overlap of the clamped base and the previous block
            # must contribute exactly once
            ok = (io == ids_t - base) & (blk_t == b_)
            if mask_t is not None:
                ok = ok & mask_t
            oh = ok.astype(jnp.float32)
            return acc + jnp.dot(oh, block,
                                 precision=jax.lax.Precision.HIGHEST)

        lo_b = idsl_ref[0, 0]
        hi_b = idsl_ref[1, 0] + 1
        if gate is not None:
            hi_b = jnp.where(gate, hi_b, lo_b)
        return jax.lax.fori_loop(lo_b, hi_b, mbody,
                                 jnp.zeros((tm, 128), jnp.float32))
    if mode == "dma":
        # 'dma' reads tab_ref via async copies only — a fall-through to
        # the generic per-lane loop below would read a pl.ANY (HBM) ref
        # directly, an illegal Mosaic load. Fail loudly at trace time.
        assert mask is not None, "_take_rows mode='dma' requires a mask"
        assert dma_sem is not None, "_take_rows mode='dma' needs dma_sem"
    if mode in ("cloop", "dma") and mask is not None:
        # count-compacted loop for SCATTERED sites: MXU-cumsum compact
        # the consumer lanes' (id, lane) pairs to a prefix, then loop
        # only cnt times (vs the fixed-128 'loop' / the block-span
        # 'mxu'). Two small dots: positions via m @ triu (products are
        # 0/1 — DEFAULT exact), compacted (id; lane) rows via a HIGHEST
        # dot against the position one-hot (ids exceed bf16's exact
        # integer range; HIGHEST reconstructs f32 exactly since the
        # one-hot side is exactly 1.0).
        m = mask.astype(jnp.float32)                   # [1, tm]
        io_r = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
        io_c = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
        triu_incl = (io_r <= io_c).astype(jnp.float32)
        c_inc = jnp.dot(m, triu_incl)                  # [1, tm] inclusive
        pos_t = jnp.transpose(c_inc - m, (1, 0)).astype(jnp.int32)
        oh = ((io_c == pos_t)
              & (jnp.transpose(m, (1, 0)) > 0)).astype(jnp.float32)
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, tm), 1).astype(jnp.float32)
        packed = jnp.concatenate(
            [ids_row.astype(jnp.float32), lane_iota], axis=0)  # [2, tm]
        comp = jnp.dot(packed, oh,
                       precision=jax.lax.Precision.HIGHEST)    # [2, tm]
        idsl_ref[:, 0:2] = jnp.transpose(comp, (1, 0)).astype(jnp.int32)
        cnt = jnp.sum(m).astype(jnp.int32)
        if gate is not None:
            cnt = jnp.where(gate, cnt, 0)

        if mode == "dma":
            # HBM-resident table (pl.ANY): one async row DMA per
            # consumer lane. Start ALL copies before waiting any: a
            # serial start+wait chain pays the HBM round-trip latency
            # cnt times, while the batched form overlaps the in-flight
            # copies (destination rows are distinct lanes — idsl col 1
            # is the compaction's strictly increasing lane list — so
            # copies never alias). Tables must be f32-packed
            # ([R, 128], values exact in f32 — ids < 2^24): DMA copies
            # raw bytes, so dtypes must match grow_ref.
            def cp_at(l):
                return pltpu.make_async_copy(
                    tab_ref.at[pl.ds(idsl_ref[l, 0], 1)],
                    grow_ref.at[pl.ds(idsl_ref[l, 1], 1)],
                    dma_sem)

            def start1(l, carry):
                cp_at(l).start()
                return carry

            def wait1(l, carry):
                cp_at(l).wait()
                return carry

            jax.lax.fori_loop(0, cnt, start1, 0)
            jax.lax.fori_loop(0, cnt, wait1, 0)
        else:
            def onec(l, carry):
                row = tab_ref[pl.ds(idsl_ref[l, 0], 1), :]
                grow_ref[pl.ds(idsl_ref[l, 1], 1), :] = row.astype(
                    jnp.float32)
                return carry

            jax.lax.fori_loop(0, cnt, onec, 0)
        return grow_ref[:]
    idsl_ref[:, 0:1] = jnp.transpose(ids_row, (1, 0))

    def one(l, carry):
        row = tab_ref[pl.ds(idsl_ref[l, 0], 1), :]
        grow_ref[pl.ds(l, 1), :] = row.astype(jnp.float32)
        return carry

    # activity gate: a dynamic trip count of 0 skips the whole serial
    # 128-row loop when no lane in the tile consumes this site's rows
    # (the caller masks every downstream use, so the stale grow_ref
    # contents are never observed). The gather loops are ~63% of the
    # megakernel's wall time (megaprobe full vs nogather), and on the
    # sky-heavy bench most tiles need only the primary env fetch.
    trip = tm if gate is None else jnp.where(gate, tm, 0)
    jax.lax.fori_loop(0, trip, one, 0)
    return grow_ref[:]


def _sel4(rows, sub_row, width: int):
    """rows [TM, 128] -> [TM, width]: lane block ``sub``*width per lane
    (sub [1, TM] i32 in 0..128//width-1) via a static where-chain
    (dynamic lane slices must be 128-aligned on TPU)."""
    n = 128 // width
    sub_t = jnp.transpose(sub_row, (1, 0))            # [TM, 1]
    out = rows[:, 0:width]
    for j in range(1, n):
        out = jnp.where(sub_t == j,
                        rows[:, j * width:(j + 1) * width], out)
    return out


def _rows_fetch(tri8_ref, mat_ref, idsl_ref, grow_ref, idx_row, mode,
                gate=None, mask=None):
    """Tri + mat rows for triangle ids [1, TM] -> (trow [16, TM],
    mrow [16, TM]) — the in-kernel twin of wavefront._tri_mat_rows_t.
    Triangle rows gather from tri_table packed 8 per 128-lane row; the
    material row is a per-OBJECT select from the whole [O, 16] material
    table (objects are few — carrying 16 mat columns per TRIANGLE like
    the XLA path's combined tri_mat_table would cost 2x the VMEM)."""
    rows = _take_rows(tri8_ref, idx_row // 8, idsl_ref, grow_ref, mode,
                      gate=gate, mask=mask)
    tri16 = _sel4(rows, idx_row % 8, 16)              # [TM, 16]
    trow = jnp.transpose(tri16, (1, 0))               # [16, TM]
    obj = trow[12:13].astype(jnp.int32)               # TRI_OBJ
    mrow = jnp.zeros_like(trow)
    for o_ in range(mat_ref.shape[0]):
        mrow = jnp.where(obj == o_,
                         jnp.transpose(mat_ref[o_:o_ + 1, :], (1, 0)),
                         mrow)
    return trow, mrow


_PI_F = 3.14159265358979


def _atan_poly(a):
    """atan on [0, tan(pi/8)] — Cephes atanf minimax (~2e-8 max err)."""
    t = a * a
    return a * (1.0 + t * (-0.333329491539 + t * (0.199777106478
                + t * (-0.138776856032 + t * 0.080586623927))))


def _atan2(z, x):
    """f32 atan2 built from sub/rsqrt/poly — Mosaic registers no
    atan2/asin lowering (lowering.py trig table: sin/cos/tan only), so
    the env sampler computes its equirect angles with this ~2e-8-error
    twin. atan2(0, 0) = 0 (the XLA convention dead zero-direction lanes
    rely on). Quadrant logic per the standard reduction; the inner
    [0, 1] range folds at tan(pi/8) via atan(a)=pi/4+atan((a-1)/(a+1))."""
    ax = jnp.abs(x)
    az = jnp.abs(z)
    num = jnp.minimum(ax, az)
    den = jnp.maximum(jnp.maximum(ax, az), 1e-30)
    a = num / den
    big = a > 0.4142135623730950            # tan(pi/8): fold to [0, ~0.414]
    a2 = (a - 1.0) / (a + 1.0)
    r = jnp.where(big, _PI_F / 4.0 + _atan_poly(a2), _atan_poly(a))
    r = jnp.where(az > ax, _PI_F / 2.0 - r, r)
    r = jnp.where(x < 0.0, _PI_F - r, r)
    return jnp.where(z < 0.0, -r, r)


def _asin(y):
    return _atan2(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))


def _env_sample(env_ref, idsl_ref, grow_ref, d: V3, shape, clamp, mode,
                gate=None, mask=None):
    """In-kernel twin of envmap.sample_env_packed_p ([1, TM] planes):
    one row gather from the packed 2x2 bilinear table (8 entries of 16
    per 128-lane row) + the same math, with the equirect angles from
    the in-kernel _atan2/_asin (Mosaic lowers no inverse trig). The
    ~2e-8 angle error can flip a bilinear texel index only within
    ~5e-6 of a texel boundary — invisible against the filter."""
    h, w = shape
    u = _atan2(d.z, d.x) / (2.0 * 3.1415926) + 0.5
    v = 1.0 - (_asin(jnp.clip(d.y, -1.0, 1.0)) / 3.1415926 + 0.5)
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)
    rid = (y0i + 1) * (w + 1) + (x0i + 1)             # [1, TM]
    rows = _take_rows(env_ref, rid // 8, idsl_ref, grow_ref, mode,
                      gate=gate, mask=mask)
    rowt = jnp.transpose(_sel4(rows, rid % 8, 16), (1, 0))  # [16, TM]
    c00 = vm.v3rows(rowt, 0)
    c01 = vm.v3rows(rowt, 3)
    c10 = vm.v3rows(rowt, 6)
    c11 = vm.v3rows(rowt, 9)
    color = (c00 * (1 - tx) * (1 - ty) + c01 * tx * (1 - ty)
             + c10 * (1 - tx) * ty + c11 * tx * ty)
    return V3(jnp.minimum(color.x, clamp), jnp.minimum(color.y, clamp),
              jnp.minimum(color.z, clamp))


def _cdf_pick(buk_ref, win_ref, idsl_ref, grow_ref, u, nbv, basev, ota,
              cdf_window: int, mode, gate=None, mask=None, dma_sem=None):
    """In-kernel twin of sampling.area_cdf_pick_fast_p ([1, TM] planes):
    bucket row (64 (jlo, jhi) pairs per 128-lane row, one-hot lane
    extraction) -> window row (CDF_WINDOW prefix f32 + CDF_WINDOW ids,
    packed 128//(2*CDF_WINDOW) per row) -> exact windowed count.

    ``nbv``/``basev`` [1, TM] f32: the lane's object's bucket count and
    flat bucket-table base (per-object counts — see
    sampling.build_area_cdf_tables); values < 2^24 so f32 is exact."""
    tm = u.shape[1]
    nbi = nbv.astype(jnp.int32)
    b = jnp.clip((u * nbv).astype(jnp.int32), 0, nbi - 1)
    bid = basev.astype(jnp.int32) + b                 # [1, TM]
    rows = _take_rows(buk_ref, bid // 64, idsl_ref, grow_ref, mode,
                      gate=gate, mask=mask, dma_sem=dma_sem)
    p2_t = jnp.transpose(2 * (bid % 64), (1, 0))      # [TM, 1]
    io = jax.lax.broadcasted_iota(jnp.int32, (tm, 128), 1)
    jlo = jnp.transpose(jnp.sum(jnp.where(io == p2_t, rows, 0.0),
                                axis=1, keepdims=True),
                        (1, 0)).astype(jnp.int32)     # [1, TM]
    jhi = jnp.transpose(jnp.sum(jnp.where(io == p2_t + 1, rows, 0.0),
                                axis=1, keepdims=True),
                        (1, 0)).astype(jnp.int32)
    target = u * ota
    per = 128 // (2 * cdf_window)
    wrows = _take_rows(win_ref, jlo // per, idsl_ref, grow_ref, mode,
                       gate=gate, mask=mask, dma_sem=dma_sem)
    wrow = jnp.transpose(_sel4(wrows, jlo % per, 2 * cdf_window),
                         (1, 0))                      # [2W, TM]
    width = jhi - jlo
    cnt = jnp.zeros_like(jlo)
    for k in range(cdf_window):
        cnt = cnt + ((k < width) & (wrow[k:k + 1] < target)).astype(
            jlo.dtype)
    picked = jnp.zeros_like(target)
    for k in range(cdf_window):
        picked = picked + jnp.where(cnt == k, wrow[cdf_window + k
                                                   :cdf_window + k + 1], 0.0)
    return picked.astype(jnp.int32)


# --------------------------------------------------------------------------
# value-returning cluster sweep (cluster_sweep_fused semantics)
# --------------------------------------------------------------------------

def _sweep(feats_t, ex_row, planes_ref, begin_ref, triu_ref, coefs_ref,
           ids_ref, cnt_ref, btw_ref, bw_ref, *, kp, cp, n_clusters,
           l_cap, anyhit: bool, gate, chunkp_ref=None, cstat_ref=None,
           buf_ref=None, dsem=None, chunked: bool = False,
           stream: bool = False, visit_reps: int = 1, stat_ref=None,
           bounds: bool = False, prefilter_reps: int = 1):
    """One tile trace: feats [16, TM] (ray_features_t16 layout), ex
    [1, TM] i32 -> (bt [1, TM] f32 INF=miss, bi [1, TM] i32).

    Identical slab/compaction/visit semantics to cluster_sweep_fused
    (same dist>0 slab, ascending-id candidate order, bf16x3 MT with
    sign-exact compares, deferred reduction). Two large-scene modes
    (the in-kernel twins of cluster_sweep_stream):

      - ``chunked``: candidate compaction runs per 128-cluster chunk
        behind a conservative sub16 prefilter (``chunkp_ref``
        [8, NSp] 16-cluster boxes, ``cstat_ref`` [NCp, 1] compacted
        active-chunk ids), with ``planes_ref`` restacked [NC, 8, 128]
        and ``triu_ref`` holding the fixed [128, 128] triu instead of
        the [Cp, Cp] one — removes the quadratic compaction wall past
        c_pad 2048;
      - ``stream``: ``coefs_ref`` lives in HBM (pl.ANY) and per-visit
        [16, 4Kp] blocks DMA through the ``buf_ref`` [2, 16, 4Kp]
        double buffer (``dsem`` DMA((2,))). Pixel-coherent mega tiles
        union ~10-80 clusters (prepare_tiles census) vs the pool's
        respawn-shuffled ~400, which is what makes streaming viable
        where the pool's stream sweep is DMA-bandwidth-bound.

    ``gate`` [1, 1]-able bool: False skips all work (outputs INF)."""
    tm = feats_t.shape[1]
    feats = jnp.transpose(feats_t, (1, 0))            # [TM, 16]
    ex = jnp.transpose(ex_row, (1, 0))                # [TM, 1]

    ray_ok = (jnp.abs(feats[:, 0:1]) + jnp.abs(feats[:, 1:2])
              + jnp.abs(feats[:, 2:3])) > 0.0

    def slab(planes, conservative_nan=False):
        """Rays vs AABB planes [>=6, W] -> hits [TM, W] (reference
        dist>0 semantics; conservative_nan forces degenerate 0*inf
        lanes ACTIVE so the chunk prefilter can only add visits)."""
        t0v = t1v = None
        for ax in range(3):
            d_c = feats[:, ax:ax + 1]
            o_c = feats[:, 6 + ax:7 + ax]
            inv = 1.0 / d_c
            fa = (planes[3 + ax:4 + ax, :] - o_c) * inv
            na = (planes[ax:ax + 1, :] - o_c) * inv
            hi = jnp.maximum(fa, na)
            lo = jnp.minimum(fa, na)
            if conservative_nan:
                hi = jnp.where(jnp.isnan(hi), jnp.float32(1e30), hi)
                lo = jnp.where(jnp.isnan(lo), jnp.float32(-1e30), lo)
            t1v = hi if t1v is None else jnp.minimum(t1v, hi)
            t0v = lo if t0v is None else jnp.maximum(t0v, lo)
        dist_pos = jnp.where(t0v > 0.0, t0v, t1v) > 0.0
        return (t1v >= t0v) & dist_pos & ray_ok

    if not chunked:
        hits = slab(planes_ref[:, :cp])               # [TM, Cp]
        cid_i = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        act = jnp.max(hits.astype(jnp.float32), axis=0, keepdims=True)
        act = act * (cid_i < n_clusters).astype(jnp.float32)

        cnt = jnp.sum(act, axis=1, keepdims=True)
        cnt_ref[0:1, 0:1] = jnp.where(gate, cnt.astype(jnp.int32), 0)
        n_act = cnt_ref[0, 0]

        @pl.when((n_act > 0) & (n_act <= l_cap))
        def _():
            pos = jnp.dot(act, triu_ref[:],
                          preferred_element_type=jnp.float32)
            l_iota = jax.lax.broadcasted_iota(
                jnp.int32, (l_cap, cp), 0).astype(jnp.float32)
            sel = (pos == l_iota + 1.0) & (act > 0.0)
            ids_ref[:] = jnp.sum(
                jnp.where(sel, (cid_i + 1).astype(jnp.float32), 0.0),
                axis=1, keepdims=True).astype(jnp.int32)
    else:
        # level 1: conservative sub16 prefilter -> per-chunk gate;
        # level 2: a DYNAMIC fori_loop over the COMPACTED active-chunk
        # list (avg ~1.1 active chunks/sweep at 400k) doing the
        # per-chunk slab + fixed [128, 128]-triu compaction with a
        # running offset (cluster_sweep_stream._stream_kernel form;
        # slots past l_cap fall outside l_iota and simply don't select
        # — overflow is handled by the dense visit fallback below).
        # The r4 replay decomposition showed the previous STATIC
        # 36-chunk unrolled pl.when chain cost ~271 ms/launch at 400k
        # (38% of wall) in serialized scalar predicate reads even with
        # every chunk gated off — the dynamic loop pays only for
        # chunks that are actually active. planes_ref is [NC, 8, 128]
        # in chunked mode (render_mega restacks it) so the per-chunk
        # slab is a leading-dim dynamic index — the proven coefs_ref
        # pattern, no lane-dim dynamic slicing.
        assert stat_ref is not None, "chunked sweep needs stat_ref"
        ncs = cstat_ref.shape[0]
        assert ncs == 128 and triu_ref.shape == (128, 128), (
            "chunked compaction reuses the fixed 128-triu for the "
            f"chunk-id compaction; got ncs={ncs} (cp={cp} > 16384 "
            "clusters needs a two-level chunk compaction)")
        ids_ref[:] = jnp.zeros((l_cap, 1), jnp.int32)
        cnt_ref[0:1, 0:1] = jnp.zeros((1, 1), jnp.int32)
        stat_ref[4:5, 0:1] = jnp.zeros((1, 1), jnp.int32)
        l_iota_c = jax.lax.broadcasted_iota(jnp.int32, (l_cap, 128), 0)

        @pl.when(gate)
        def _():
            # sub16 prefilter: one [TM, NSp] slab over the 16-cluster
            # union boxes (8 per chunk). Box-nesting monotonicity
            # (cluster box inside sub box inside chunk box, slab
            # monotone in the plane values) keeps the gate conservative,
            # so act — and with it the candidate set and every result —
            # is unchanged bit-for-bit vs the ungated sweep. The finer
            # boxes gate far more chunk slabs than the chunk-union box
            # did (r4 stats: 1.23M chunk slabs ran for only 75.6k
            # chunks with candidates).
            shits = slab(chunkp_ref[:], conservative_nan=True)
            sact = jnp.max(shits.astype(jnp.float32), axis=0,
                           keepdims=True)                  # [1, NSp]
            nsp = chunkp_ref.shape[1]
            ns_real = -(-n_clusters // 16)
            s_io = jax.lax.broadcasted_iota(jnp.int32, (1, nsp), 1)
            sact = sact * (s_io < ns_real).astype(jnp.float32)
            # chunk gate = any of its 8 sub-boxes active: a tiny
            # [1, NSp] x [NSp, NCs] dot against the sub->chunk
            # indicator built from iotas (values are 0/1 and sums <= 8
            # — exact in any MXU pass precision; lane-dim strided
            # reductions are not otherwise expressible in Mosaic)
            g_io_s = jax.lax.broadcasted_iota(jnp.int32, (nsp, ncs), 0)
            g_io_j = jax.lax.broadcasted_iota(jnp.int32, (nsp, ncs), 1)
            gmat = (g_io_s // 8 == g_io_j).astype(jnp.float32)
            cgate = jnp.dot(sact, gmat,
                            preferred_element_type=jnp.float32)
            # normalize to 0/1 FIRST: cgate holds the chunk's ACTIVE
            # SUB-BOX COUNT (0..8) — prefixing the raw counts leaves
            # holes in the compacted list (slot 0 -> j = -1 -> an OOB
            # VMEM read that crashed the TPU worker; interpret mode
            # masked it via Python negative-index wrapping + visit
            # idempotency, so only hardware caught it — pinned by
            # tests/test_mega.py::test_mega_chunked_visit_counts...)
            cg01 = (cgate > 0.0).astype(jnp.float32)
            # compact the active chunk ids (ascending) into cstat_ref:
            # the same triu prefix-position trick as the cluster
            # compaction, at chunk granularity (stored value is
            # chunk_id+1, 0 = empty slot)
            cpos = jnp.dot(cg01, triu_ref[:],
                           preferred_element_type=jnp.float32)
            l_io2 = jax.lax.broadcasted_iota(jnp.int32, (ncs, ncs), 0)
            j_io2 = jax.lax.broadcasted_iota(jnp.int32, (ncs, ncs), 1)
            sel_c = (cpos.astype(jnp.int32) == l_io2 + 1) & (cg01 > 0.0)
            cstat_ref[:] = jnp.sum(
                jnp.where(sel_c, (j_io2 + 1).astype(jnp.float32), 0.0),
                axis=1, keepdims=True).astype(jnp.int32)
            stat_ref[4:5, 0:1] = jnp.sum(
                cg01, axis=1, keepdims=True).astype(jnp.int32)

            if prefilter_reps == 2:
                # '2xprefilter' replay: re-run the sub16 slab + chunk
                # gate + compaction-position math on inputs perturbed
                # by an opaque runtime zero (stat row 9 — only ever
                # written in 'bounds' mode) and sink one cell into
                # btw_ref (re-initialized before any visit reads it).
                # Splits the chunked compaction's FIXED prefilter cost
                # from the per-active-chunk loop: 2xsweep minus
                # 2xvisit minus 2xprefilter = the chunk loop.
                epsc = stat_ref[9:10, 0:1].astype(jnp.float32)
                shits2 = slab(chunkp_ref[:] + epsc,
                              conservative_nan=True)
                sact2 = jnp.max(shits2.astype(jnp.float32), axis=0,
                                keepdims=True)
                sact2 = sact2 * (s_io < ns_real).astype(jnp.float32)
                cgate2 = jnp.dot(sact2, gmat,
                                 preferred_element_type=jnp.float32)
                cg012 = (cgate2 > 0.0).astype(jnp.float32)
                cpos2 = jnp.dot(cg012, triu_ref[:],
                                preferred_element_type=jnp.float32)
                btw_ref[0:1, 0:1] = jnp.sum(
                    cpos2, axis=1, keepdims=True)

        def chunk_body(l, carry):
            # clamp like the stream path's cid: a compaction bug must
            # degrade to a harmless duplicate chunk-0 slab, not an OOB
            # VMEM read (= TPU worker crash)
            if bounds:
                # _debug='bounds': every compacted chunk slot the loop
                # visits must hold a real chunk id (the r4 crash class:
                # a raw-count prefix left holes -> slot 0 -> j = -1 ->
                # OOB VMEM read; interpret mode masked it)
                jr = cstat_ref[l, 0] - 1
                bad = (jr < 0) | (jr >= (n_clusters + 127) // 128)
                stat_ref[9:10, 0:1] = (stat_ref[9:10, 0:1]
                                       + bad.astype(jnp.int32))
            j = jnp.maximum(cstat_ref[l, 0] - 1, 0)
            hits = slab(planes_ref[pl.ds(j, 1)][0])       # [TM, 128]
            cid_l = (jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1) + j * 128)
            act = (jnp.max(hits.astype(jnp.float32), axis=0,
                           keepdims=True)
                   * (cid_l < n_clusters).astype(jnp.float32))
            ncand = jnp.sum(act, axis=1, keepdims=True)
            # row 3: chunks with candidates (telemetry parity with the
            # static-chain version's "dots run" counter)
            stat_ref[3:4, 0:1] = stat_ref[3:4, 0:1] + (
                ncand > 0).astype(jnp.int32)
            pos = jnp.dot(act, triu_ref[:],
                          preferred_element_type=jnp.float32)
            off = cnt_ref[0, 0]
            slot = pos.astype(jnp.int32) + off - 1        # [1, 128]
            sel = (l_iota_c == slot) & (act > 0.0)
            ids_ref[:] = ids_ref[:] + jnp.sum(
                jnp.where(sel, (cid_l + 1).astype(jnp.float32), 0.0),
                axis=1, keepdims=True).astype(jnp.int32)
            cnt_ref[0:1, 0:1] = (cnt_ref[0:1, 0:1]
                                 + ncand.astype(jnp.int32))
            return carry

        jax.lax.fori_loop(0, stat_ref[4, 0], chunk_body, 0)

        n_act = cnt_ref[0, 0]

    @pl.when(n_act > 0)
    def _():
        if anyhit:
            btw_ref[0:tm] = jnp.zeros((tm, kp), jnp.float32)
        else:
            btw_ref[0:tm] = jnp.full((tm, kp), INF, jnp.float32)
            bw_ref[0:tm] = jnp.zeros((tm, kp), jnp.int32)

        fh = feats.astype(jnp.bfloat16)
        fl = (feats - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        fcat = jnp.concatenate([fh, fh, fl], axis=1)  # [TM, 48]
        k_io = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)

        def test_cluster_val(coef, begin):
            ch = coef.astype(jnp.bfloat16)
            cl_ = (coef - ch.astype(jnp.float32)).astype(jnp.bfloat16)
            ccat = jnp.concatenate([ch, cl_, ch], axis=0)
            s = jnp.dot(fcat, ccat, preferred_element_type=jnp.float32)
            a = s[:, 0 * kp:1 * kp]
            su = s[:, 1 * kp:2 * kp]
            sv = s[:, 2 * kp:3 * kp]
            st = s[:, 3 * kp:4 * kp]
            ok = ((su * a >= 0.0) & (sv * a >= 0.0)
                  & ((su + sv) * a <= a * a) & (st * a > 0.0)
                  & (k_io + begin != ex))
            if anyhit:
                btw_ref[0:tm] = jnp.maximum(btw_ref[0:tm],
                                            ok.astype(jnp.float32))
            else:
                t = jnp.where(ok, st / a, INF)
                better = t < btw_ref[0:tm]
                btw_ref[0:tm] = jnp.where(better, t, btw_ref[0:tm])
                bw_ref[0:tm] = jnp.where(better, begin, bw_ref[0:tm])

        if stream:
            # cid is clamped to >= 0 at every fetch: the compaction
            # invariant says slots 0..n_act-1 are always populated
            # (cid >= 0), but an out-of-bounds HBM DMA from
            # coefs_ref.at[-1] on a future compaction bug would be
            # silent corruption — clamp so the failure mode is a
            # harmless duplicate visit of cluster 0 instead.
            def start_fetch(slot, cid):
                pltpu.make_async_copy(coefs_ref.at[jnp.maximum(cid, 0)],
                                      buf_ref.at[slot],
                                      dsem.at[slot]).start()

            def wait_fetch(slot, cid):
                pltpu.make_async_copy(coefs_ref.at[jnp.maximum(cid, 0)],
                                      buf_ref.at[slot],
                                      dsem.at[slot]).wait()

            def run(n_visits, cid_of):
                # double-buffered streamed visits (pallas_guide pattern)
                start_fetch(0, cid_of(0))

                def visit(l, carry):
                    slot = jax.lax.rem(l, 2)
                    nxt = jax.lax.rem(l + 1, 2)

                    @pl.when(l + 1 < n_visits)
                    def _():
                        start_fetch(nxt, cid_of(l + 1))

                    cid = cid_of(l)
                    if bounds:  # _debug='bounds': visited candidate
                        # slots must hold real cluster ids
                        bad = (cid < 0) | (cid >= n_clusters)
                        stat_ref[9:10, 0:1] = (stat_ref[9:10, 0:1]
                                               + bad.astype(jnp.int32))
                    wait_fetch(slot, cid)

                    @pl.when(cid >= 0)  # parity with the resident path
                    def _():
                        test_cluster_val(buf_ref[slot],
                                         begin_ref[jnp.maximum(cid, 0), 0])

                    return carry

                jax.lax.fori_loop(0, n_visits, visit, 0)
        else:
            def run(n_visits, cid_of):
                def visit(l, carry):
                    cid = cid_of(l)
                    if bounds:  # _debug='bounds': visited candidate
                        # slots must hold real cluster ids
                        bad = (cid < 0) | (cid >= n_clusters)
                        stat_ref[9:10, 0:1] = (stat_ref[9:10, 0:1]
                                               + bad.astype(jnp.int32))

                    @pl.when(cid >= 0)
                    def _():
                        test_cluster_val(coefs_ref[pl.ds(cid, 1)][0],
                                         begin_ref[cid, 0])

                    return carry

                jax.lax.fori_loop(0, n_visits, visit, 0)

        # visit_reps=2 ('2xvisit' probe): min/max-accumulating visits
        # are idempotent, so a replay measures the visit loop's real
        # cost (DMA + MT) without perturbing control flow
        for _rep in range(visit_reps):

            @pl.when(n_act <= l_cap)
            def _():
                run(n_act, lambda l: ids_ref[l, 0] - 1)

            @pl.when(n_act > l_cap)
            def _():
                run(n_act * 0 + n_clusters, lambda l: l)

    empty = n_act == 0
    if anyhit:
        # transpose the f32 reduction, not the bool: Mosaic's backend
        # cannot legalize tpu.transpose on i1 vectors (measured HTTP-500
        # on hardware; the AOT lowering gate does not reach that stage).
        hmax_t = jnp.transpose(
            jnp.max(btw_ref[0:tm], axis=1, keepdims=True), (1, 0))
        bt = jnp.where(empty | (hmax_t <= 0.0), INF, 1.0)
        return bt, jnp.zeros((1, tm), jnp.int32)
    btw = btw_ref[0:tm]
    tmin = jnp.min(btw, axis=1, keepdims=True)
    idw = bw_ref[0:tm] + jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1)
    sel2 = jnp.where(btw <= tmin, idw, jnp.int32(2 ** 30))
    bt = jnp.where(empty, INF, jnp.transpose(tmin, (1, 0)))
    bi = jnp.where(empty, 0,
                   jnp.transpose(jnp.min(sel2, axis=1, keepdims=True),
                                 (1, 0)))
    return bt, jnp.where(bt < INF, bi, 0)


def _unit_p(v: V3) -> V3:
    return vm.vnormalize(v, jnp, eps=1e-30)


def _feats16(o: V3, d: V3):
    """[16, TM] ray features (gemm_intersect.ray_features_t16 layout)
    with the trace path's double normalization (wavefront._nearest_planes
    / bounce_front._unit2): dead zero-dir lanes become NaN rows = miss."""
    d_u = vm.vnormalize(_unit_p(d), jnp)
    w = vm.vcross(d_u, o)
    tm = o.x.shape[1]
    ones = jnp.ones((1, tm), jnp.float32)
    zrow = jnp.zeros((1, tm), jnp.float32)
    return jnp.concatenate([
        d_u.x, d_u.y, d_u.z, w.x, w.y, w.z, o.x, o.y, o.z, ones,
        zrow, zrow, zrow, zrow, zrow, zrow]), d_u


# --------------------------------------------------------------------------
# the megakernel
# --------------------------------------------------------------------------

def _mega_kernel(ints_ref, cam_ref, ltab_ref, lights_ref, planes_ref,
                 begin_ref, triu_ref, coefs_ref, tri8_ref, mat_ref,
                 env_ref, buk_ref, win_ref, ota_ref, chunkp_ref, out_ref,
                 fst_ref, mst_ref, ids_ref, cnt_ref, btw_ref, bw_ref,
                 idsl_ref, grow_ref, *rest, cfg, npix: int, e_cnt: int,
                 has_sss: bool, has_refract: bool,
                 kp: int, cp: int, n_clusters: int, l_cap: int,
                 env_shape, cdf_window: int, spp: int,
                 max_iters: int, gather: str, debug: str = "full",
                 tm: int = TM, chunked: bool = False, stream: bool = False):
    from ...core import camera as camera_mod
    from ...core import rng
    from ...core.rng import DrawSites as S
    from ...integrator import sampling, wavefront

    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tm), 1)
    # ints col 3 = dynamic pixel offset (film shard base, multi-chip)
    tile_base = ints_ref[0:1, 3:4] + tile * tm         # [1, 1] i32
    pix_id = tile_base + lane                          # [1, TM] i32
    # intra-tile work redistribution (cfg.mega_redistribute): lane !=
    # pixel — lanes pull (pixel, sample) work items from a per-tile
    # counter in sample-major order (item w -> pixel w % TM, sample
    # w // TM: iteration 0 is the identity assignment), so a lane whose
    # pixel finished all spp keeps working on tile-mates' samples
    # instead of idling (measured 36% divergence-idle lane-iterations
    # at 64x64 spp8). Film writes become exact one-hot MXU scatters at
    # retire time; RNG streams are site-keyed by (pixel, sample) so
    # radiance is scan-parity up to per-pixel fp add order.
    # valid (in-film) pixel count of this tile: tail tiles enumerate
    # work items over ONLY their valid pixels (item w -> pixel
    # w % n_valid, sample w // n_valid) so fresh lanes never burn pull
    # rounds consuming out-of-film padding items. Full tiles have
    # n_valid == tm — identical enumeration to the lane==pixel
    # identity at iteration 0. Per-pixel sample order is unchanged
    # (sample-major either way), so the film is bit-equal.
    n_valid = jnp.clip(npix - tile_base, 0, tm)        # [1, 1] i32
    n_valid_g = jnp.maximum(n_valid, 1)
    w_total = spp * n_valid                            # [1, 1] i32
    seed = cfg.seed
    width, height = cfg.width, cfg.height
    zrow = jnp.zeros((1, tm), jnp.float32)
    zi = jnp.zeros((1, tm), jnp.int32)

    # eye / rotation scalars; dynamic sample base (ints col 2 — the
    # spawn_front layout, [1, 1] slice for Mosaic-safe broadcast) so
    # progressive resumes don't recompile
    sample_base = ints_ref[0:1, 2:3]
    eye = V3(cam_ref[0:1, 16:17] + zrow, cam_ref[0:1, 17:18] + zrow,
             cam_ref[0:1, 18:19] + zrow)

    class _Mat:  # camera_rotate [1, 16] flat (4*col + row), spawn_front
        def __getitem__(self, cr):
            c, r = cr
            return cam_ref[0:1, 4 * c + r:4 * c + r + 1]

    class _Rows:  # [16, TM] block -> row-indexable (bounce_front.py)
        def __init__(self, a):
            self._a = a

        def __getitem__(self, i):
            if isinstance(i, int):
                return self._a[i:i + 1]
            return self._a[i]

    lpt = lambda i, c: ltab_ref[i:i + 1, c:c + 1]
    light_pts = [
        (V3(lpt(i, 0), lpt(i, 1), lpt(i, 2)),
         V3(lpt(i, 3), lpt(i, 4), lpt(i, 5)),
         V3(lpt(i, 6), lpt(i, 7), lpt(i, 8)))
        for i in range(e_cnt)
    ]
    l_norms = [V3(lights_ref[i:i + 1, 0:1], lights_ref[i:i + 1, 1:2],
                  lights_ref[i:i + 1, 2:3]) for i in range(e_cnt)]
    l_emises = [V3(lights_ref[i:i + 1, 3:4], lights_ref[i:i + 1, 4:5],
                   lights_ref[i:i + 1, 5:6]) for i in range(e_cnt)]
    l_areas = [lights_ref[i:i + 1, 6:7] for i in range(e_cnt)]
    l_eidx = [lights_ref[i:i + 1, 7:8].astype(jnp.int32)
              for i in range(e_cnt)]

    # optional large-scene scratch (appended in render_mega's order)
    redist = bool(getattr(cfg, "mega_redistribute", False))
    prologue = redist and bool(getattr(cfg, "mega_prologue", False))
    ri = iter(rest)
    cstat_ref = next(ri) if chunked else None
    buf_ref = next(ri) if stream else None
    dsem = next(ri) if stream else None
    rsem = next(ri) if stream else None
    wl_ref = next(ri) if prologue else None
    # sweep-stats cells (always last): row 0 max n_act, 1 overflow
    # events (n_act > l_cap -> dense all-cluster fallback), 2 total
    # clusters visited — surfaced on out rows 5-7 for tuning l_cap
    # against real tile unions ([8, 1] so scalar reads index sublanes)
    stat_ref = next(ri)

    _base_sweep = functools.partial(
        _sweep, planes_ref=planes_ref, begin_ref=begin_ref,
        triu_ref=triu_ref, coefs_ref=coefs_ref, ids_ref=ids_ref,
        cnt_ref=cnt_ref, btw_ref=btw_ref, bw_ref=bw_ref, kp=kp, cp=cp,
        n_clusters=n_clusters, l_cap=l_cap, chunkp_ref=chunkp_ref,
        cstat_ref=cstat_ref, buf_ref=buf_ref, dsem=dsem,
        chunked=chunked, stream=stream,
        visit_reps=2 if debug == "2xvisit" else 1, stat_ref=stat_ref,
        bounds=debug == "bounds",
        prefilter_reps=2 if debug == "2xprefilter" else 1)

    def _one_sweep(*a, gate, **k):
        r = _base_sweep(*a, gate=gate, **k)
        n = cnt_ref[0:1, 0:1]
        stat_ref[0:1, 0:1] = jnp.maximum(stat_ref[0:1, 0:1], n)
        stat_ref[1:2, 0:1] = stat_ref[1:2, 0:1] + (n > l_cap).astype(
            jnp.int32)
        stat_ref[2:3, 0:1] = stat_ref[2:3, 0:1] + jnp.where(
            n > l_cap, n_clusters, n)
        if debug == "2xsweep":
            # idempotent replay: the whole sweep (slab + compaction +
            # visits) re-runs on identical inputs and reproduces its
            # outputs bit-exactly, so wall(2xsweep) - wall(full) is the
            # sweep's REAL cost under unchanged control flow — the
            # zero-stub ablations (notrace/nogather) change hit results
            # and with them the ray mix, which muddies attribution
            r = _base_sweep(*a, gate=gate, **k)
        return r

    # fabric/sweep width decoupling (cfg.mega_sweep_tile = SWT > 0):
    # wide lane tiles recover VPU sublane utilization on the [1, TM]
    # bounce-math rows (subprobe: ~24 Gflop/s at [1, 128] vs ~150 at
    # [1, 1024]) but widen every sweep's candidate UNION (more visits,
    # the old TM=1024 regression). Splitting each sweep call into
    # SWT-wide sub-calls — each with its own slab + compaction +
    # visit loop — keeps the union at sub-tile granularity while the
    # rest of the iteration runs at full width. Results are identical:
    # a ray's hits depend only on its own slab row, and every cluster
    # it can hit passes its own slab test (AABB conservativeness), so
    # candidate-set membership of OTHER rays' clusters never changes
    # its min. Per-call stats update per sub-call (l_cap capacity is
    # per-compaction, so that is the honest granularity).
    swt = int(getattr(cfg, "mega_sweep_tile", 0) or 0)
    if swt < 0:  # auto (see utils/config.py mega_sweep_tile)
        swt = 256 if (chunked or stream) else 128

    def sweep(feats_t, ex_row, *, gate, **k):
        if debug == "notrace":  # ablation: all visits gated off
            gate = jnp.float32(0) > 0.0
        w = feats_t.shape[1]
        if swt <= 0 or w <= swt:
            return _one_sweep(feats_t, ex_row, gate=gate, **k)
        assert w % swt == 0, (w, swt)
        bts, bis = [], []
        for i in range(w // swt):
            bt_i, bi_i = _one_sweep(feats_t[:, i * swt:(i + 1) * swt],
                                    ex_row[:, i * swt:(i + 1) * swt],
                                    gate=gate, **k)
            bts.append(bt_i)
            bis.append(bi_i)
        return (jnp.concatenate(bts, axis=1),
                jnp.concatenate(bis, axis=1))

    # 'block' only pays off for COHERENT ids (cluster-local triangle
    # rows, primary-ray env texels); scattered fetches (CDF buckets,
    # uniform-sphere bounce-direction env texels) keep the lane loop
    gm_coh = gather
    gm_scat = "loop" if gather in ("block", "mxuloop") else gather
    if gather == "mxuloop":  # hybrid: one-hot MXU for coherent ids,
        gm_coh = "mxu"       # serial lane loop for scattered ones
    gm_env_m = gm_scat
    if gather == "auto":
        # measured split (megaprobe, demo bench): coherent rows ->
        # 'mxu'; the SSS pick chain (few consumer lanes/iter) ->
        # 'cloop' (-41 ms); env fetches -> masked 'mxu' (cloop env
        # measured +118 ms — NEE/miss masks keep ~half the tile, so
        # the compacted loop degenerates to 'loop' plus overhead while
        # the consumer mask already tightens the mxu block span)
        gm_coh = "mxu"
        gm_scat = "cloop"
        gm_env_m = "mxu"
    if debug == "nogather":  # ablation: all in-kernel gathers stubbed
        gm_coh = gm_scat = gm_env_m = "zero"
    # per-site-class ablations (megaprobe --debug noenv,nocdf,norows):
    # env texel fetches / the SSS pick chain (CDF bucket+window rows +
    # exit-tri rows) / tri+mat row fetches (continuation + primary)
    gm_env = "zero" if debug == "noenv" else gm_env_m
    # stream mode: buk/win live in HBM (pl.ANY) — their rows must DMA;
    # the exit-triangle rows still gather from the VMEM tri8 table
    gm_cdf = "dma" if stream else gm_scat
    gm_cdfrow = gm_scat
    if debug == "nocdf":
        gm_cdf = gm_cdfrow = "zero"
    gm_row = "zero" if debug == "norows" else gm_coh

    # '2xgather' idempotent replay (PERF.md round-4 method): every
    # gather helper runs twice on identical inputs — the scratch-ref
    # writes make the duplicate CSE-proof and the second run reproduces
    # the first bit-exactly, so wall(2xgather) - wall(full) is the true
    # gather cost under UNCHANGED control flow (the 'nogather' zero
    # stub kills hits and changes the ray mix, which mis-attributes)
    _g_reps = 2 if debug == "2xgather" else 1

    def rows_fetchG(*a, **k):
        for _ in range(_g_reps - 1):
            _rows_fetch(*a, **k)
        return _rows_fetch(*a, **k)

    def env_sampleG(*a, **k):
        for _ in range(_g_reps - 1):
            _env_sample(*a, **k)
        return _env_sample(*a, **k)

    def cdf_pickG(*a, **k):
        for _ in range(_g_reps - 1):
            _cdf_pick(*a, **k)
        return _cdf_pick(*a, **k)

    # ---- init per-tile state ----
    # grow is gather scratch: with activity-gated loops its stale
    # contents can reach (masked) selects — zero it once so skipped
    # gathers never surface uninitialized-VMEM NaN bit patterns
    grow_ref[:] = jnp.zeros_like(grow_ref[:])
    stat_ref[:] = jnp.zeros((10, 1), jnp.int32)
    fst_ref[:] = jnp.zeros((48, tm), jnp.float32)
    # mst rows: 0 active, 1 hit_idx, 2 bounce, 3 ns (samples consumed;
    # unused under redistribution), 4 smp (in-flight sample id),
    # 5 tile-local pixel (redistribution), 6-7 spare
    mst_ref[:] = jnp.zeros((8, tm), jnp.int32)
    if redist:
        mst_ref[5:6] = lane
    out_ref[:] = jnp.zeros((10, tm), jnp.float32)

    nw = max(1, spp)
    if prologue:
        # ---- primary prologue: trace all spp x n_valid primaries at
        # FULL lane density (lane == pixel), resolve sky misses
        # immediately as DENSE lane adds into the film (no scatter),
        # and compact surface hits (item id, hit t, hit tri) into the
        # wl_ref work list via one-hot MXU scatters. The main loop's
        # spawn rounds then pull PRE-TRACED surface items — no spawn
        # sweep, no sky pull stall (51% of the demo scene's primary
        # samples are sky; telemetry showed ~36% of lane-iterations
        # stalled pending on pulls that yielded instant sky retires).
        wl_ref[:] = jnp.zeros_like(wl_ref[:])
        validp = lane < n_valid
        pixp = tile_base + lane
        pup = jnp.where(validp, pixp, 0).astype(jnp.uint32)
        io_rp = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
        io_cp = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
        triu_p = (io_rp <= io_cp).astype(jnp.float32)
        pxf = (pup % jnp.uint32(width)).astype(jnp.int32).astype(
            jnp.float32)
        pyf = (pup // jnp.uint32(width)).astype(jnp.int32).astype(
            jnp.float32)

        def p_step(s):
            smp_p = jnp.zeros((1, tm), jnp.int32) + s + sample_base
            smp_pu = smp_p.astype(jnp.uint32)
            uj = rng.uniform_sites(jnp, pup, smp_pu, 0,
                                   [S.JITTER_X, S.JITTER_Y], seed)
            u1, u2 = uj[0:1], uj[1:2]
            if cfg.jitter == "cuda":
                ndc_x = -1.0 + 2.0 / width * (pxf + u1 - 0.5)
                ndc_y = -1.0 + 2.0 / height * (pyf + u2 - 0.5)
            else:  # "gl"
                ndc_x = (-1.0 + 2.0 * (pxf + 0.5) / width
                         + (u1 - 0.5) / width)
                ndc_y = (-1.0 + 2.0 * (pyf + 0.5) / height
                         + (u2 - 0.5) / height)
            dcam = V3(ndc_x, ndc_y,
                      jnp.full_like(ndc_x, camera_mod.FOCAL_Z))
            dirs = vm.vnormalize(vm.vtransform(_Mat(), dcam, 0.0), jnp)
            pf, d_u = _feats16(eye, vwhere(validp, dirs, 0.0, jnp))
            anyv = jnp.sum(validp.astype(jnp.float32)) > 0.0
            p_bt, p_bi = sweep(pf, jnp.full((1, tm), -1, jnp.int32),
                               anyhit=False, gate=anyv)
            p_hit = validp & (p_bt < INF)
            miss = validp & ~p_hit
            g_miss = jnp.sum(miss.astype(jnp.float32)) > 0.0
            psky = env_sampleG(env_ref, idsl_ref, grow_ref, d_u,
                               env_shape, cfg.hdr_clamp, gm_env,
                               gate=g_miss, mask=miss)
            skyv = vwhere(miss, psky, 0.0, jnp)
            O = out_ref[0:4]
            out_ref[0:4] = jnp.concatenate([
                O[0:1] + skyv.x, O[1:2] + skyv.y, O[2:3] + skyv.z,
                O[3:4] + validp.astype(jnp.float32)])
            # append hits at slots nh .. nh+hits-1 (pos spans at most
            # two [1, TM] rows of each plane; one-hot MXU scatter per
            # row — the scatter3 mechanism; slots are written once so
            # accumulate-into-zero is exact)
            hf = p_hit.astype(jnp.float32)
            nh = stat_ref[8, 0]
            pos = nh + (jnp.dot(hf, triu_p) - hf).astype(jnp.int32)
            item = jnp.where(p_hit, s * tm + lane + 1, 0).astype(
                jnp.float32)                       # +1: 0 = empty slot
            biv = jnp.where(p_hit, p_bi, 0).astype(jnp.float32)
            btv = jnp.where(p_hit, p_bt, 0.0)
            r0 = nh // tm
            for rr in range(2):
                ridx = jnp.minimum(r0 + rr, nw - 1)
                selm = p_hit & (pos // tm == r0 + rr)
                lcol = jnp.transpose(
                    jnp.where(selm, jax.lax.rem(pos, tm), -1), (1, 0))
                oh = (lcol == io_cp).astype(jnp.float32)
                for off, valr in ((0, item), (nw, btv), (2 * nw, biv)):
                    upd = jnp.dot(valr, oh,
                                  precision=jax.lax.Precision.HIGHEST)
                    wl_ref[pl.ds(off + ridx, 1), :] = (
                        wl_ref[pl.ds(off + ridx, 1), :] + upd)
            stat_ref[8:9, 0:1] = stat_ref[8:9, 0:1] + jnp.sum(
                hf, axis=1, keepdims=True).astype(jnp.int32)
            return s + 1

        jax.lax.while_loop(lambda s: s < spp, p_step, 0)

    def _sink(x):
        # DCE-proof sink for the 2x-replay debug variants (PERF.md r4
        # method): storing one duplicate row into fst row 15 (spare;
        # the state merge writes zrow there at body end) forces the
        # duplicate computation to materialize — wall(2x) - wall(full)
        # is then the component's true cost under unchanged control
        # flow, where zero-stub ablations change the ray mix and
        # mis-attribute. The replay INPUTS are perturbed by a
        # compiler-opaque runtime zero (the body reads fst row 15,
        # always 0 by the zrow merge) so the duplicate graph cannot
        # CSE with the original; replay outputs reach only this sink,
        # so results are correct regardless of the perturbation value.
        fst_ref[15:16] = x[0:1]

    def body(carry):
        it, _ = carry
        F = fst_ref[:]
        M_ = mst_ref[:]
        active = M_[0:1] != 0
        hit_idx = M_[1:2]
        b = M_[2:3]
        ns = M_[3:4]
        smp = M_[4:5]
        smp_u = smp.astype(jnp.uint32)
        if redist:
            pixl_cur = M_[5:6]                 # tile-local pixel
            pix = tile_base + pixl_cur
        else:
            pixl_cur = lane
            pix = pix_id
        pix_ok = pix < npix
        pix_u = pix.astype(jnp.uint32)
        # replay perturbations: runtime-zero (row 15 is zrow-merged
        # every iteration), opaque to the compiler — see _sink
        eps_f = F[15:16]
        eps_u = eps_f.astype(jnp.int32).astype(jnp.uint32)
        eps_b = eps_f != 0.0
        ray_src = V3(F[0:1], F[1:2], F[2:3])
        out_dir = V3(F[3:4], F[4:5], F[5:6])
        t_put = V3(F[6:7], F[7:8], F[8:9])
        l_acc = V3(F[9:10], F[10:11], F[11:12])
        le0 = V3(F[12:13], F[13:14], F[14:15])
        trow = _Rows(F[16:32])
        mrow = _Rows(F[32:48])
        tri = jnp.where(active, hit_idx, 0)

        # ================= bounce actives (pool body order) =============
        b1 = b.astype(jnp.uint32) + jnp.uint32(1)
        sites = wavefront.BASE_SITES + [
            S.LIGHT_BASE + 2 * i for i in range(e_cnt)
        ] + [S.LIGHT_BASE + 2 * i + 1 for i in range(e_cnt)]
        # all S draws in ONE [S, TM] batched hash (bit-identical to the
        # per-site calls; S stacked rows pack sublanes where S separate
        # [1, TM] chains run ~1/8-utilized vregs)
        us_all = rng.uniform_sites(jnp, pix_u, smp_u, b1, sites, seed)
        if debug == "2xrng":  # replay: the batched per-bounce RNG hash
            _sink(rng.uniform_sites(jnp, pix_u + eps_u, smp_u, b1,
                                    sites, seed))
        us = [us_all[i:i + 1] for i in range(len(sites))]

        if has_sss:
            obj = trow[12].astype(jnp.int32)
            ota = jnp.zeros((1, tm), jnp.float32)
            nbv = jnp.ones((1, tm), jnp.float32)
            basev = jnp.zeros((1, tm), jnp.float32)
            for o_ in range(ota_ref.shape[0]):
                sel = obj == o_
                ota = jnp.where(sel, ota_ref[o_, 0], ota)
                nbv = jnp.where(sel, ota_ref[o_, 1], nbv)
                basev = jnp.where(sel, ota_ref[o_, 2], basev)
            # branch masks FIRST so the whole SSS pick chain (bucket +
            # window + exit-tri rows: 4 serial gather loops) is skipped
            # when no lane in the tile exits an SSS walk this iteration
            emis0 = vm.v3rows(mrow, 0)
            _, _, _, _, sss_exit0, _, _, _ = wavefront._branch_masks(
                active, us[0], us[1], mrow[7].astype(jnp.int32),
                mrow[6].astype(jnp.int32), cfg, emis0, jnp)
            g_sss = jnp.sum(sss_exit0.astype(jnp.float32)) > 0.0
            exit_tri = cdf_pickG(buk_ref, win_ref, idsl_ref, grow_ref,
                                 us[2], nbv, basev, ota, cdf_window,
                                 gm_cdf, gate=g_sss, mask=sss_exit0,
                                 dma_sem=rsem)
            exit_tri = jnp.where(sss_exit0, exit_tri, 0)
            et_row, em_row = rows_fetchG(tri8_ref, mat_ref, idsl_ref, grow_ref,
                                         exit_tri, gm_cdfrow, gate=g_sss,
                                         mask=sss_exit0)
            erows = _Rows(jnp.concatenate([et_row, em_row]))
            tot_a = jnp.zeros((1, tm), jnp.float32)
            eobj = et_row[12:13].astype(jnp.int32)
            for o_ in range(ota_ref.shape[0]):
                tot_a = jnp.where(eobj == o_, ota_ref[o_, 0], tot_a)
            if debug == "2xsssprep":  # replay: the SSS preamble's pure
                # math (per-object table selects + branch masks + the
                # exit-row object selects; the gathers themselves are
                # counted by 2xgather)
                obj2 = obj + eps_u.astype(jnp.int32)
                ota2 = jnp.zeros((1, tm), jnp.float32)
                nbv2 = jnp.ones((1, tm), jnp.float32)
                base2 = jnp.zeros((1, tm), jnp.float32)
                for o_ in range(ota_ref.shape[0]):
                    sel2 = obj2 == o_
                    ota2 = jnp.where(sel2, ota_ref[o_, 0], ota2)
                    nbv2 = jnp.where(sel2, ota_ref[o_, 1], nbv2)
                    base2 = jnp.where(sel2, ota_ref[o_, 2], base2)
                _, _, _, _, sss_exit2, _, _, _ = wavefront._branch_masks(
                    active ^ eps_b, us[0] + eps_f, us[1],
                    mrow[7].astype(jnp.int32), mrow[6].astype(jnp.int32),
                    cfg, emis0, jnp)
                tot2 = jnp.zeros((1, tm), jnp.float32)
                eobj2 = eobj + eps_u.astype(jnp.int32)
                for o_ in range(ota_ref.shape[0]):
                    tot2 = jnp.where(eobj2 == o_, ota_ref[o_, 0], tot2)
                _sink(ota2 + nbv2 + base2 + tot2
                      + sss_exit2.astype(jnp.float32))
        else:
            erows = exit_tri = tot_a = None

        if has_refract:
            # ---- in-kernel direct-refraction march (the in-kernel twin
            # of wavefront._refract_march, PathTrace.cu:1180-1234): a
            # while_loop of <= max_refract_bounces nested sweeps that
            # exits as soon as no lane is still inside the medium ----
            emis0 = vm.v3rows(mrow, 0)
            _, _, _, _, _, is_dirref0, _, _ = wavefront._branch_masks(
                active, us[0], us[1], mrow[7].astype(jnp.int32),
                mrow[6].astype(jnp.int32), cfg, emis0, jnp)
            miu = mrow[14]
            normal0 = vm.v3rows(trow, 9)
            r0r = sampling.schlick_r0(miu)
            fres_ri = sampling.fresnel_entry(
                r0r, jnp.abs(vm.vdot(normal0, out_dir)))
            rdir0, _ = sampling.refract_dir_p(-out_dir, normal0,
                                              1.0 / miu, jnp)
            rdir0 = vwhere(is_dirref0, rdir0, 0.0, jnp)
            one_mf = 1.0 - fres_ri
            zb = jnp.zeros((1, tm), jnp.int32)
            n_live0 = jnp.sum(is_dirref0.astype(jnp.float32))

            def m_cond(c):
                return (c[0] < cfg.max_refract_bounces) & (c[1] > 0.0)

            def m_body(c):
                (i, _, rdx, rdy, rdz, rtx, rty, rtz, esc, exi,
                 sx, sy, sz, exc) = c
                rdir = V3(rdx, rdy, rdz)
                rate = V3(rtx, rty, rtz)
                src = V3(sx, sy, sz)
                escaped = esc != 0
                exited = exi != 0
                live = is_dirref0 & ~exited & ~escaped
                mf, _ = _feats16(src, rdir)
                mex = jnp.where(live, exc, -2)
                bt_m, bi_m = sweep(
                    mf, mex, anyhit=False,
                    gate=jnp.sum(live.astype(jnp.float32)) > 0.0)
                hit_m = bt_m < INF
                idx_m = jnp.where(hit_m, bi_m, 0)
                escaped = escaped | (live & ~hit_m)
                step_ok = live & hit_m
                rdir_u = _unit_p(rdir)
                hp = src + rdir_u * bt_m
                irow, rrow = rows_fetchG(
                    tri8_ref, mat_ref, idsl_ref, grow_ref, idx_m, gm_row,
                    gate=jnp.sum(step_ok.astype(jnp.float32)) > 0.0,
                    mask=step_ok)
                n_i = V3(irow[9:10], irow[10:11], irow[11:12])
                new_rdir, full_reflex = sampling.refract_dir_p(
                    rdir_u, n_i, miu, jnp)
                rr8 = V3(rrow[8:9], rrow[9:10], rrow[10:11])
                absorb = V3(rr8.x ** bt_m, rr8.y ** bt_m, rr8.z ** bt_m)
                rate = vwhere(step_ok, rate * absorb, rate, jnp)
                src = vwhere(step_ok, hp, src, jnp)
                exc = jnp.where(step_ok, idx_m, exc)
                fres_o = sampling.fresnel_exit(
                    r0r, jnp.abs(vm.vdot(new_rdir, n_i)))
                u_m = rng.uniform(jnp, pix_u, smp_u, b1,
                                  int(S.REFRACT_BASE) + i, seed)
                reflect_pick = full_reflex | (
                    u_m < cfg.internal_reflect_rate)
                reflected = vm.vreflect(new_rdir, n_i)
                rate = vwhere(step_ok & ~reflect_pick,
                              rate * (1.0 - fres_o) * 1.25, rate, jnp)
                rate = vwhere(step_ok & reflect_pick & ~full_reflex,
                              rate * fres_o * 5.0, rate, jnp)
                rdir = vwhere(
                    step_ok,
                    vwhere(reflect_pick, reflected, new_rdir, jnp),
                    rdir, jnp)
                exited = exited | (step_ok & ~reflect_pick)
                live2 = is_dirref0 & ~exited & ~escaped
                return (i + 1, jnp.sum(live2.astype(jnp.float32)),
                        rdir.x, rdir.y, rdir.z, rate.x, rate.y, rate.z,
                        escaped.astype(jnp.int32),
                        exited.astype(jnp.int32),
                        src.x, src.y, src.z, exc)

            mc = jax.lax.while_loop(m_cond, m_body, (
                0, n_live0, rdir0.x, rdir0.y, rdir0.z,
                one_mf + zrow, one_mf + zrow, one_mf + zrow,
                zb, zb, ray_src.x, ray_src.y, ray_src.z, tri))
            refr = (V3(mc[2], mc[3], mc[4]), V3(mc[5], mc[6], mc[7]),
                    mc[8] != 0, mc[13], V3(mc[10], mc[11], mc[12]))
            if debug == "2xmarch":  # replay: the WHOLE direct-
                # refraction march (its nested sweeps + row/env work
                # included — overlaps 2xsweep/2xgather on those parts;
                # runtime-identical trip count since eps is zero)
                mc2 = jax.lax.while_loop(m_cond, m_body, (
                    0, n_live0, rdir0.x + eps_f, rdir0.y, rdir0.z,
                    one_mf + zrow, one_mf + zrow, one_mf + zrow,
                    zb, zb, ray_src.x + eps_f, ray_src.y, ray_src.z,
                    tri))
                _sink(mc2[2] + mc2[5])
        else:
            refr = None

        pre = wavefront.FrontPre(us, erows, exit_tri, tot_a, refr)
        if debug == "2xfront":  # replay: branch select + sampling math
            pre_p = wavefront.FrontPre(
                [u + eps_f for u in us], erows, exit_tri, tot_a, refr)
            _sink(wavefront.bounce_front(
                active ^ eps_b, V3(ray_src.x + eps_f, ray_src.y,
                                   ray_src.z), out_dir, tri, trow, mrow,
                pre_p, light_pts, e_cnt, has_sss, has_refract, cfg,
                jnp).cdir.x)
        f = wavefront.bounce_front(active, ray_src, out_dir, tri, trow,
                                   mrow, pre, light_pts, e_cnt, has_sss,
                                   has_refract, cfg, jnp)

        # segment traces (light segs -> HDR any-hit -> continuation)
        any_act = jnp.sum(active.astype(jnp.float32)) > 0.0
        nee_o = vwhere(f.needs_nee, f.nee_src, 0.0, jnp)
        cf, _ = _feats16(vwhere(f.alive, f.cont_src, 0.0, jnp),
                         vwhere(f.alive, f.cdir, 0.0, jnp))
        if getattr(cfg, "mega_stack_segments", True):
            # ONE stacked sweep for all E+2 segments: they share their
            # origins (this bounce's hit points), so the candidate
            # compaction — 35% of the 400k wall as E+2 separate calls
            # (PERF.md round-4) — runs once over ~the same cluster set,
            # and each coefficient fetch serves every segment. anyhit
            # epilogues degrade to closest-hit (same booleans).
            segs, exs = [], []
            for i in range(e_cnt):
                sf, _ = _feats16(nee_o, vwhere(f.needs_nee, f.ldirs[i],
                                               0.0, jnp))
                segs.append(sf)
                exs.append(f.nee_excl)
            hf, _ = _feats16(nee_o, vwhere(f.needs_nee, f.hdir, 0.0,
                                           jnp))
            segs.append(hf)
            exs.append(f.nee_excl)
            segs.append(cf)
            exs.append(f.cont_excl)
            if debug == "2xsegfeats":  # replay: the E+2 segment
                # feature builds + the stacked-operand concats
                nee_p = V3(nee_o.x + eps_f, nee_o.y, nee_o.z)
                segs2 = []
                for i in range(e_cnt):
                    sf2, _ = _feats16(nee_p, vwhere(
                        f.needs_nee, f.ldirs[i], 0.0, jnp))
                    segs2.append(sf2)
                hf2, _ = _feats16(nee_p, vwhere(f.needs_nee, f.hdir,
                                                0.0, jnp))
                segs2.append(hf2)
                cf2, _ = _feats16(vwhere(f.alive, V3(
                    f.cont_src.x + eps_f, f.cont_src.y, f.cont_src.z),
                    0.0, jnp), vwhere(f.alive, f.cdir, 0.0, jnp))
                segs2.append(cf2)
                _sink(jnp.concatenate(segs2, axis=1)[:, :tm])
            sbt, sbi = sweep(jnp.concatenate(segs, axis=1),
                             jnp.concatenate(exs, axis=1),
                             anyhit=False, gate=any_act)
            l_oks = []
            for i in range(e_cnt):
                lbt = sbt[:, i * tm:(i + 1) * tm]
                lbi = sbi[:, i * tm:(i + 1) * tm]
                l_oks.append(f.l_gates[i] & (lbt < INF)
                             & (lbi == l_eidx[i]))
            hbt = sbt[:, e_cnt * tm:(e_cnt + 1) * tm]
            h_hit = hbt < INF
            c_bt = sbt[:, (e_cnt + 1) * tm:(e_cnt + 2) * tm]
            c_bi = sbi[:, (e_cnt + 1) * tm:(e_cnt + 2) * tm]
        else:
            l_oks = []
            for i in range(e_cnt):
                sf, _ = _feats16(nee_o, vwhere(f.needs_nee, f.ldirs[i],
                                               0.0, jnp))
                lbt, lbi = sweep(sf, f.nee_excl, anyhit=False,
                                 gate=any_act)
                l_oks.append(f.l_gates[i] & (lbt < INF)
                             & (lbi == l_eidx[i]))
            hf, _ = _feats16(nee_o, vwhere(f.needs_nee, f.hdir, 0.0,
                                           jnp))
            hbt, _ = sweep(hf, f.nee_excl, anyhit=True, gate=any_act)
            h_hit = hbt < INF
            c_bt, c_bi = sweep(cf, f.cont_excl, anyhit=False,
                               gate=any_act)
        c_hit = c_bt < INF
        c_idx = jnp.where(c_hit, c_bi, 0)

        # env radiance (hdir for NEE, cdir for mirror/miss sky) — both
        # single eps-normalized, matching the pool's env2 fetch (p1 rows
        # 6-8 raw hdir -> _unit_p; rows 9-11 = front's cdir_u)
        hdir_u = _unit_p(f.hdir)
        cdir_u = _unit_p(f.cdir)
        # gate each env gather on its EXACT consumers (resolve_tail):
        # sky feeds only `needs_nee & ~h_hit` (NEE env when the HDR
        # shadow ray escapes); sky_c feeds only the mirror/direct-
        # refraction sky-on-miss break (`(is_mirror|is_dirref) &
        # ~c_hit`) — on mirror-free scenes the sky_c loop never runs
        m_nee = f.needs_nee & ~h_hit
        m_skyc = (f.is_mirror | f.is_dirref) & ~c_hit
        # the two consumer masks are DISJOINT (needs_nee excludes the
        # mirror/dirref branches), so ONE gather serves both: per lane,
        # fetch the texel of whichever direction that lane consumes.
        # resolve_tail vwhere-masks sky to m_nee and sky_c to m_skyc,
        # so each lane only ever reads its own fetched value —
        # bit-exact, and the scattered env row loop runs once per
        # bounce instead of twice.
        m_env = m_nee | m_skyc
        g_env = jnp.sum(m_env.astype(jnp.float32)) > 0.0
        env_dir = V3(jnp.where(m_nee, hdir_u.x, cdir_u.x),
                     jnp.where(m_nee, hdir_u.y, cdir_u.y),
                     jnp.where(m_nee, hdir_u.z, cdir_u.z))
        env_val = env_sampleG(env_ref, idsl_ref, grow_ref, env_dir,
                              env_shape, cfg.hdr_clamp, gm_env,
                              gate=g_env, mask=m_env)
        sky = sky_c = env_val

        # continuation-hit rows + resolve (bounce_resolve._kernel math)
        g_chit = jnp.sum(c_hit.astype(jnp.float32)) > 0.0
        crow_t, cmrow_t = rows_fetchG(tri8_ref, mat_ref, idsl_ref, grow_ref, c_idx,
                                      gm_row, gate=g_chit, mask=c_hit)
        c_obj_em = V3(cmrow_t[0:1], cmrow_t[1:2], cmrow_t[2:3])
        if debug == "2xresolve":  # replay: the NEE/branch resolve math
            skyp = V3(sky.x + eps_f, sky.y, sky.z)
            _sink(wavefront.resolve_tail(
                jnp, e_cnt, has_sss, has_refract, cfg.rr_rate,
                cfg.sss_rate, f.ldirs, l_oks, l_norms, l_emises, l_areas,
                skyp, skyp, f.hdir, cdir_u, f.nee_norm, f.exit_norm,
                f.bss, f.fr, f.fr_alb, f.emissive, c_obj_em, f.cont_src,
                f.ref_rate, f.r0_sss, f.total_area, f.k, f.u_rr,
                c_bt + eps_f, f.sss_entry, f.sss_exit, f.is_mirror,
                f.is_dirref, f.alive, active ^ eps_b, f.emit_break,
                jnp.zeros_like(active), f.needs_nee, c_hit, h_hit,
                f.ref_escaped)[0].x)
        dir_out, rate_out, new_src, accept, killed = wavefront.resolve_tail(
            jnp, e_cnt, has_sss, has_refract, cfg.rr_rate, cfg.sss_rate,
            f.ldirs, l_oks, l_norms, l_emises, l_areas,
            sky, sky_c, f.hdir, cdir_u, f.nee_norm, f.exit_norm, f.bss,
            f.fr, f.fr_alb, f.emissive, c_obj_em, f.cont_src, f.ref_rate,
            f.r0_sss, f.total_area, f.k, f.u_rr, c_bt,
            f.sss_entry, f.sss_exit, f.is_mirror, f.is_dirref, f.alive,
            active, f.emit_break, jnp.zeros_like(active), f.needs_nee,
            c_hit, h_hit, f.ref_escaped)

        l_acc = l_acc + t_put * dir_out
        t_put = t_put * rate_out
        b2 = jnp.where(active, b + 1, b)
        depth_capped = accept & (b2 >= cfg.max_depth)
        l_acc = l_acc + vwhere(depth_capped, t_put * dir_out, 0.0, jnp)
        finished = (active & ~accept) | depth_capped
        still = accept & ~depth_capped

        l_final = vwhere(killed, 0.0, l_acc, jnp) + le0
        contrib = vwhere(finished, l_final, 0.0, jnp)

        ray_src2 = vwhere(accept, new_src, ray_src, jnp)
        out_dir2 = vwhere(accept, -cdir_u, out_dir, jnp)
        hit_idx2 = jnp.where(accept, c_idx, hit_idx)

        # ================= spawn fresh lanes ============================
        # cfg.spawn_rounds rounds (pool semantics, pool.py:288-291): a
        # primary MISS retires its sample to the film immediately and
        # the lane pulls its NEXT sample in the same iteration — cheap
        # here (one extra gated sweep per round), and it collapses
        # sky-dominated tiles from one sample/iteration to
        # spawn_rounds samples/iteration.
        fresh = ~still
        started = jnp.zeros_like(fresh)
        sky_sum = V3(zrow, zrow, zrow)     # lane-indexed (lane == pixel)
        film_sc = V3(zrow, zrow, zrow)     # pixel-indexed (redistribution)
        n_got = zrow
        srcP, dirP = ray_src2, out_dir2
        hitP, le0P = hit_idx2, le0
        rowP, mrowP = crow_t, cmrow_t
        smp_n, ns_r = smp, ns
        pixl_n = pixl_cur
        if redist:
            io_r2 = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
            io_c2 = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
            triu_i2 = (io_r2 <= io_c2).astype(jnp.float32)

            def scatter3(v, pixl_t, mask):
                # exact one-hot film scatter: lane rows land in their
                # target pixel's column; several lanes retiring samples
                # of one pixel sum in the dot. One-hot operand is 0/1
                # so the 6-pass HIGHEST decomposition reconstructs the
                # f32 radiance exactly (the 'mxu' gather argument).
                pcol = jnp.transpose(
                    jnp.where(mask, pixl_t, -1).astype(jnp.int32), (1, 0))
                oh = (pcol == io_c2).astype(jnp.float32)   # [TM, TM]
                st = jnp.concatenate([v.x, v.y, v.z], axis=0)
                o = jnp.dot(st, oh,
                            precision=jax.lax.Precision.HIGHEST)
                return V3(o[0:1], o[1:2], o[2:3])

            # retire finished paths into their pixels' film columns
            if debug == "2xfilm":  # replay: the one-hot MXU scatter
                _sink(scatter3(V3(contrib.x + eps_f, contrib.y,
                                  contrib.z), pixl_cur + (eps_f != 0.0),
                               finished).x)
            film_sc = scatter3(contrib, pixl_cur, finished)
        for _ in range(max(1, cfg.spawn_rounds)):
            bt_pre = None
            if redist and prologue:
                # pull PRE-TRACED surface items from the prologue's
                # work list. w_l spans at most two [1, TM] rows of
                # each plane; per-lane fields come from one-hot MXU
                # dots (the scatter3 mechanism reversed). Every item
                # is a surface hit — no spawn sweep, no sky handling.
                cf = fresh.astype(jnp.float32)
                rank = jnp.dot(cf, triu_i2) - cf           # exclusive
                c_now = stat_ref[7, 0]
                w_l = c_now + rank.astype(jnp.int32)
                haswork = fresh & (w_l < stat_ref[8, 0])
                r0p = c_now // tm
                acc_it = acc_bt = acc_bi = zrow
                for rr in range(2):
                    ridx = jnp.minimum(r0p + rr, nw - 1)
                    selm = haswork & (w_l // tm == r0p + rr)
                    ohp = ((jax.lax.rem(w_l, tm) == io_r2) & selm
                           ).astype(jnp.float32)          # [TM, TM]
                    hi = jax.lax.Precision.HIGHEST
                    acc_it = acc_it + jnp.dot(
                        wl_ref[pl.ds(ridx, 1), :], ohp, precision=hi)
                    acc_bt = acc_bt + jnp.dot(
                        wl_ref[pl.ds(nw + ridx, 1), :], ohp,
                        precision=hi)
                    acc_bi = acc_bi + jnp.dot(
                        wl_ref[pl.ds(2 * nw + ridx, 1), :], ohp,
                        precision=hi)
                itemv = acc_it.astype(jnp.int32) - 1
                if debug == "bounds":
                    # every in-range pull must land a populated slot
                    # holding a decodable (sample, pixel) item
                    badp = haswork & ((itemv < 0)
                                      | (itemv >= spp * tm))
                    stat_ref[9:10, 0:1] = stat_ref[9:10, 0:1] + jnp.sum(
                        badp.astype(jnp.int32), axis=1, keepdims=True)
                got = haswork & (itemv >= 0)
                bt_pre = (jnp.where(got, acc_bt, INF),
                          acc_bi.astype(jnp.int32))
                pixl_g = jnp.where(got, jax.lax.rem(itemv, tm), 0)
                pix_g = tile_base + pixl_g
                smp_g = jnp.where(got,
                                  jax.lax.div(itemv, tm) + sample_base,
                                  smp_n)
                pixl_n = jnp.where(got, pixl_g, pixl_n)
                stat_ref[7:8, 0:1] = stat_ref[7:8, 0:1] + jnp.sum(
                    haswork.astype(jnp.int32), axis=1, keepdims=True)
                pu_g = jnp.where(got, pix_g, pix).astype(jnp.uint32)
            elif redist:
                # pull work items w = wbase + rank(fresh lane):
                # pixel w % n_valid, sample w // n_valid — every item
                # is an in-film (pixel, sample) pair by construction.
                cf = fresh.astype(jnp.float32)
                rank = jnp.dot(cf, triu_i2) - cf           # exclusive
                w_l = stat_ref[7, 0] + rank.astype(jnp.int32)
                haswork = fresh & (w_l < w_total)
                pixl_g = jax.lax.rem(w_l, n_valid_g)
                pix_g = tile_base + pixl_g
                got = haswork & (pix_g < npix)
                smp_g = jnp.where(got,
                                  jax.lax.div(w_l, n_valid_g)
                                  + sample_base, smp_n)
                pixl_n = jnp.where(got, pixl_g, pixl_n)
                stat_ref[7:8, 0:1] = stat_ref[7:8, 0:1] + jnp.sum(
                    haswork.astype(jnp.int32), axis=1, keepdims=True)
                pu_g = jnp.where(got, pix_g, pix).astype(jnp.uint32)
            else:
                got = fresh & pix_ok & (ns_r < spp)
                smp_g = jnp.where(got, ns_r + sample_base, smp_n)
                pixl_g = pixl_cur
                pu_g = pix_u
            px = (pu_g % jnp.uint32(width)).astype(jnp.int32).astype(
                jnp.float32)
            py = (pu_g // jnp.uint32(width)).astype(jnp.int32).astype(
                jnp.float32)
            smp_nu = smp_g.astype(jnp.uint32)
            uj = rng.uniform_sites(jnp, pu_g, smp_nu, 0,
                                   [S.JITTER_X, S.JITTER_Y], seed)
            u1, u2 = uj[0:1], uj[1:2]
            if cfg.jitter == "cuda":
                ndc_x = -1.0 + 2.0 / width * (px + u1 - 0.5)
                ndc_y = -1.0 + 2.0 / height * (py + u2 - 0.5)
            else:  # "gl"
                ndc_x = (-1.0 + 2.0 * (px + 0.5) / width
                         + (u1 - 0.5) / width)
                ndc_y = (-1.0 + 2.0 * (py + 0.5) / height
                         + (u2 - 0.5) / height)
            dcam = V3(ndc_x, ndc_y,
                      jnp.full_like(ndc_x, camera_mod.FOCAL_Z))
            dirs = vm.vnormalize(vm.vtransform(_Mat(), dcam, 0.0), jnp)
            if bt_pre is not None:
                # prologue: the primary was pre-traced; only the unit
                # direction (for the hit point and the path state) is
                # needed — same double normalization as _feats16
                d_u = vm.vnormalize(
                    _unit_p(vwhere(got, dirs, 0.0, jnp)), jnp)
                p_bt, p_bi = bt_pre
                if debug == "2xpull":  # replay: the prologue pull
                    # machinery — rank dot, the 3-plane one-hot work-
                    # list fetch dots, item decode, jitter RNG + camera
                    # rotate + direction normalize
                    cf2 = cf + eps_f
                    rank2 = jnp.dot(cf2, triu_i2) - cf2
                    w_l2 = c_now + rank2.astype(jnp.int32)
                    acc2 = zrow
                    hi2 = jax.lax.Precision.HIGHEST
                    for rr in range(2):
                        ridx2 = jnp.minimum(r0p + rr, nw - 1)
                        selm2 = haswork & (w_l2 // tm == r0p + rr)
                        ohp2 = ((jax.lax.rem(w_l2, tm) == io_r2)
                                & selm2).astype(jnp.float32)
                        for off2 in (0, nw, 2 * nw):
                            acc2 = acc2 + jnp.dot(
                                wl_ref[pl.ds(off2 + ridx2, 1), :], ohp2,
                                precision=hi2)
                    itm2 = acc2.astype(jnp.int32) - 1
                    uj2 = rng.uniform_sites(
                        jnp, pu_g + eps_u, smp_nu, 0,
                        [S.JITTER_X, S.JITTER_Y], seed)
                    d2 = vm.vnormalize(vm.vtransform(_Mat(), V3(
                        dcam.x + uj2[0:1] - uj2[0:1], dcam.y, dcam.z),
                        0.0), jnp)
                    du2 = vm.vnormalize(
                        _unit_p(vwhere(got, d2, 0.0, jnp)), jnp)
                    _sink(du2.x + itm2.astype(jnp.float32)
                          + jax.lax.rem(itm2, tm).astype(jnp.float32))
            else:
                pf, d_u = _feats16(eye, vwhere(got, dirs, 0.0, jnp))
                if debug == "2xspawncam":  # replay: jitter RNG +
                    # camera rotate + the primary [16, TM] feature
                    # build (the spawn round's non-sweep math)
                    uj2 = rng.uniform_sites(jnp, pu_g + eps_u, smp_nu,
                                            0, [S.JITTER_X, S.JITTER_Y],
                                            seed)
                    d2 = vm.vnormalize(vm.vtransform(_Mat(), V3(
                        dcam.x + uj2[0:1] - uj2[0:1], dcam.y, dcam.z),
                        0.0), jnp)
                    pf2, _ = _feats16(eye, vwhere(got, d2, 0.0, jnp))
                    _sink(pf2[0:1] + uj2[0:1])
                any_got = jnp.sum(got.astype(jnp.float32)) > 0.0
                p_bt, p_bi = sweep(pf, jnp.full((1, tm), -1, jnp.int32),
                                   anyhit=False, gate=any_got)
            p_hit = p_bt < INF
            p_idx = jnp.where(p_hit, p_bi, 0)
            miss = got & ~p_hit
            st_r = got & p_hit
            st2d = st_r[0]
            g_st = jnp.sum(st_r.astype(jnp.float32)) > 0.0
            row0, p_mrow = rows_fetchG(tri8_ref, mat_ref, idsl_ref, grow_ref,
                                       p_idx, gm_row, gate=g_st, mask=st_r)
            if bt_pre is not None:
                pass  # prologue: every pulled item is a surface hit —
                # sky was resolved densely in the prologue
            else:
                g_miss = jnp.sum(miss.astype(jnp.float32)) > 0.0
                psky = env_sampleG(env_ref, idsl_ref, grow_ref, d_u,
                                   env_shape, cfg.hdr_clamp, gm_env,
                                   gate=g_miss, mask=miss)
                if redist:
                    # instant sky retire: scatter to the PULLED pixel
                    # (the lane may pull a different pixel next round)
                    film_sc = film_sc + scatter3(
                        vwhere(miss, psky, 0.0, jnp), pixl_g, miss)
                else:
                    sky_sum = sky_sum + vwhere(miss, psky, 0.0, jnp)
            if bt_pre is None:
                # (prologue counts primaries densely at trace time)
                n_got = n_got + got.astype(jnp.float32)
            started = started | st_r
            srcP = vwhere(st_r, eye + d_u * p_bt, srcP, jnp)
            dirP = vwhere(st_r, -d_u, dirP, jnp)
            hitP = jnp.where(st_r, p_idx, hitP)
            le0P = vwhere(st_r, V3(p_mrow[0:1], p_mrow[1:2], p_mrow[2:3]),
                          le0P, jnp)
            # started lanes take the primary rows; everyone else keeps
            # the continuation rows (idle lanes get c_idx=0 = the
            # pool's tri-0 column — inert, active gates all shading)
            rowP = jnp.where(st2d, row0, rowP)
            mrowP = jnp.where(st2d, p_mrow, mrowP)
            smp_n = smp_g
            ns_r = jnp.where(got, ns_r + 1, ns_r)
            fresh = fresh & ~st_r

        # film: dense lane accumulation (lane == pixel), or the
        # pixel-indexed scatter accumulator under redistribution
        O = out_ref[:]
        if redist:
            film = V3(O[0:1] + film_sc.x, O[1:2] + film_sc.y,
                      O[2:3] + film_sc.z)
        else:
            film = V3(O[0:1], O[1:2], O[2:3]) + contrib + sky_sum
        n_ray = O[3:4] + active.astype(jnp.float32) * (e_cnt + 2) + n_got

        # next state merge (started lanes take the primary block)
        ray_src3 = srcP
        out_dir3 = dirP
        hit_idx3 = hitP
        b3 = jnp.where(started, 0, b2)
        t_put3 = vwhere(started, V3(jnp.ones((1, tm), jnp.float32),
                                    jnp.ones((1, tm), jnp.float32),
                                    jnp.ones((1, tm), jnp.float32)),
                        t_put, jnp)
        l_acc3 = vwhere(started, 0.0, l_acc, jnp)
        le03 = le0P
        trow3 = rowP
        mrow3 = mrowP
        active3 = still | started
        ns2 = ns_r

        if debug == "2xstatecat":  # replay: the state-merge concat
            # (48 rows from 18 pieces) + one extra full-state store
            cat2 = jnp.concatenate([
                ray_src3.x + eps_f, ray_src3.y, ray_src3.z,
                out_dir3.x, out_dir3.y, out_dir3.z,
                t_put3.x, t_put3.y, t_put3.z,
                l_acc3.x, l_acc3.y, l_acc3.z,
                le03.x, le03.y, le03.z, zrow, trow3, mrow3])
            fst_ref[:] = cat2
        fst_ref[:] = jnp.concatenate([
            ray_src3.x, ray_src3.y, ray_src3.z,
            out_dir3.x, out_dir3.y, out_dir3.z,
            t_put3.x, t_put3.y, t_put3.z,
            l_acc3.x, l_acc3.y, l_acc3.z,
            le03.x, le03.y, le03.z, zrow, trow3, mrow3])
        mst_ref[:] = jnp.concatenate([
            active3.astype(jnp.int32), hit_idx3, b3, ns2, smp_n,
            pixl_n if redist else zi, zi, zi])
        # lane-utilization telemetry: row 8 sums ACTIVE lanes per
        # iteration (a live path this bounce), row 9 sums PENDING lanes
        # (active or still owing samples) — utilization = row8 /
        # (TM * iters); row9 - row8 = lanes stalled waiting to spawn;
        # TM * iters - row9 = lanes idle because their pixel finished
        # all spp while tile-mates' deep paths kept iterating
        # (intra-tile divergence — the headroom a lane-redistribution
        # scheme would recover)
        if redist and prologue:
            live3 = active3 | (stat_ref[7:8, 0:1] < stat_ref[8:9, 0:1])
        elif redist:
            live3 = active3 | (stat_ref[7:8, 0:1] < w_total)
        else:
            live3 = active3 | (pix_ok & (ns2 < spp))
        stat_ref[5:6, 0:1] = stat_ref[5:6, 0:1] + jnp.sum(
            active3.astype(jnp.int32), axis=1, keepdims=True)
        stat_ref[6:7, 0:1] = stat_ref[6:7, 0:1] + jnp.sum(
            live3.astype(jnp.int32), axis=1, keepdims=True)

        # rows 5-7: max tile union | active-chunk count (chunked mode;
        # l_cap overflow is visible as row5 > l_cap) | total visits —
        # except under _debug='bounds', where row 7 carries the
        # compaction-invariant VIOLATION count (stat row 9: compacted
        # cluster/chunk slots outside their tables, work-list pulls
        # that landed empty slots) so hardware runs can assert 0 on
        # the OOB crash class interpret mode cannot catch
        visits_row = (stat_ref[9:10, 0:1] if debug == "bounds"
                      else stat_ref[2:3, 0:1])
        out_ref[:] = jnp.concatenate([
            film.x, film.y, film.z, n_ray, O[4:5] + 1.0,
            zrow + stat_ref[0:1, 0:1].astype(jnp.float32),
            zrow + stat_ref[3:4, 0:1].astype(jnp.float32),
            zrow + visits_row.astype(jnp.float32),
            zrow + stat_ref[5:6, 0:1].astype(jnp.float32),
            zrow + stat_ref[6:7, 0:1].astype(jnp.float32)])

        cont = jnp.sum(live3.astype(jnp.float32)) > 0.0
        return it + 1, cont.astype(jnp.int32)

    jax.lax.while_loop(
        lambda c: (c[1] != 0) & (c[0] < max_iters), body, (0, 1))


@functools.partial(jax.jit, static_argnames=(
    "n_clusters", "cfg", "npix", "e_cnt", "has_sss", "has_refract",
    "env_shape", "cdf_window", "spp", "shard_px", "l_cap", "gather",
    "interpret", "_debug", "chunked", "stream"))
def render_mega(n_clusters, ints, cam, ltab, lights2, sd_planes, sd_begin,
                sd_triu, sd_coef, tri8, mat16, envp, buk, win, ota, chunkp,
                *, cfg, npix,
                e_cnt, has_sss, env_shape, cdf_window, spp,
                has_refract=False, shard_px=None, l_cap=64, gather="take",
                interpret=False, _debug="full", chunked=False, stream=False):
    """One launch = the whole render: returns [10, Mp] f32 with rows
    0-2 per-pixel radiance sums over ``spp`` samples, 3 ray count,
    4 loop iterations (per tile), 5-7 sweep stats (max tile union /
    active chunks / visits), 8-9 lane-utilization sums (active,
    pending lane-iterations). ``shard_px`` (TM multiple) renders
    only the pixel window [ints[0,3], ints[0,3]+shard_px) — the film
    shard of one device in the multi-chip mesh.

    Large-scene statics: ``chunked`` compacts candidates per 128-
    cluster chunk (``sd_triu`` must then be the fixed [128, 128] triu,
    ``chunkp`` the [8, NSp] 16-cluster sub-box planes —
    sd.cluster_sub16_planes); ``stream`` keeps ``sd_coef``
    (and the SSS ``buk``/``win`` tables) in HBM, DMA-streaming visit
    blocks through a double buffer."""
    tmq = int(getattr(cfg, "mega_tile", TM) or TM)
    assert tmq % 128 == 0, "mega_tile must be a multiple of 128 lanes"
    mp = shard_px if shard_px else -(-npix // tmq) * tmq
    kp = sd_coef.shape[2] // 4
    cp = sd_planes.shape[1]
    if chunked:
        # restack the [8, Cp] planes into per-chunk [NC, 8, 128] blocks
        # so the kernel's dynamic active-chunk loop reads chunk j with a
        # leading-dim dynamic index (the proven coefs_ref pattern)
        assert cp % 128 == 0, "chunked mega expects 128-padded planes"
        sd_planes = jnp.transpose(
            sd_planes.reshape(8, cp // 128, 128), (1, 0, 2))
    max_iters = spp * (cfg.max_depth + 2) + 4
    if getattr(cfg, "mega_redistribute", False):
        # work-pulling schedule slack: the loop self-terminates on
        # no-live-work, so the cap only needs to dominate the worst
        # case — greedy makespan <= total/TM + longest item =
        # spp*(max_depth+1) + max_depth + pull rounds. Without this a
        # small mega_spp_batch at deep max_depth (spp + 4 < max_depth)
        # hits the cap and silently drops in-flight samples
        # (test_mega_redistribute_deep_paths_not_dropped).
        max_iters += cfg.max_depth + 1
    kern = functools.partial(
        _mega_kernel, cfg=cfg, npix=int(npix), e_cnt=int(e_cnt),
        has_sss=bool(has_sss), has_refract=bool(has_refract),
        kp=kp, cp=cp, n_clusters=int(n_clusters),
        l_cap=int(l_cap), env_shape=env_shape,
        cdf_window=int(cdf_window), spp=int(spp),
        max_iters=int(max_iters), gather=gather, debug=_debug, tm=tmq,
        chunked=chunked, stream=stream)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [whole] * 15
    if stream:
        in_specs[7] = anyspec                     # sd_coef
        in_specs[11] = anyspec                    # buk
        in_specs[12] = anyspec                    # win
    # stacked-segment sweeps trace all E+2 bounce segments in one call
    # of (e_cnt+2)*tmq lanes — btw/bw must cover the widest call
    sseg = ((int(e_cnt) + 2)
            if getattr(cfg, "mega_stack_segments", True) else 1)
    scratch = [
        pltpu.VMEM((48, tmq), jnp.float32),   # fst state
        pltpu.VMEM((8, tmq), jnp.int32),      # mst state
        pltpu.VMEM((l_cap, 1), jnp.int32),    # sweep candidate ids
        pltpu.VMEM((1, 1), jnp.int32),        # sweep count
        pltpu.VMEM((sseg * tmq, kp), jnp.float32),  # best-t wide
        pltpu.VMEM((sseg * tmq, kp), jnp.int32),    # winner begin wide
        pltpu.VMEM((tmq, 8), jnp.int32),      # gather ids/slots
        pltpu.VMEM((tmq, 128), jnp.float32),  # gather rows out
    ]
    if chunked:
        # per-chunk gate cells [NCs, 1] (chunkp itself is the FINER
        # [8, NSp] sub16 table; 8 sub-boxes fold into each chunk gate)
        nc_pad = -(-max(cp // 128, 1) // 128) * 128
        n_sub = -(-cp // 16)
        ns_pad = -(-n_sub // 128) * 128         # pad128(ceil(cp/16))
        assert chunkp.shape[1] == ns_pad, (
            "chunked mega expects cluster_sub16_planes (16-cluster "
            f"boxes, [8, {ns_pad}]), got {chunkp.shape} for cp={cp}")
        scratch.append(pltpu.VMEM((nc_pad, 1), jnp.int32))
    if stream:
        scratch += [
            pltpu.VMEM((2, 16, 4 * kp), jnp.float32),  # coef dbl buffer
            pltpu.SemaphoreType.DMA((2,)),             # coef DMA sems
            pltpu.SemaphoreType.DMA,                   # row-gather sem
        ]
    if getattr(cfg, "mega_prologue", False) and getattr(
            cfg, "mega_redistribute", False):
        # primary-prologue work list: rows [0:spp] item+1 (0 = empty;
        # item = sample*tm + tile-local pixel), [spp:2spp] hit t,
        # [2spp:3spp] hit tri — all f32 (one-hot MXU scatter/gather
        # planes; integer payloads < 2^24 are exact)
        scratch.append(pltpu.VMEM((3 * max(1, spp), tmq), jnp.float32))
    scratch.append(pltpu.VMEM((10, 1), jnp.int32))     # sweep stats
    out = pl.pallas_call(
        kern,
        grid=(mp // tmq,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((10, tmq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, mp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_mega_compiler_params(),
    )(ints, cam, ltab, lights2, sd_planes, sd_begin, sd_triu, sd_coef,
      tri8, mat16, envp, buk, win, ota, chunkp)
    return out


# --------------------------------------------------------------------------
# preview megakernel: the interactive 2-bounce integrator, one launch/frame
# --------------------------------------------------------------------------

def _preview_kernel(ints_ref, cam_ref, planes_ref, begin_ref, triu_ref,
                    coefs_ref, tri8_ref, mat_ref, env_ref, out_ref,
                    ids_ref, cnt_ref, btw_ref, bw_ref, idsl_ref, grow_ref, *,
                    cfg, npix: int, kp: int, cp: int, n_clusters: int,
                    l_cap: int, env_shape, spp: int,
                    max_bounce: int, gather: str, tm: int = TM):
    """In-kernel twin of integrator/preview.trace_preview_p (the
    reference's interactive shader, fshader_preview.fsh:332-375):
    uniform-hemisphere bounces, pdf 1/2pi, multiplicative history, no
    NEE. One launch renders a whole progressive frame; sample/bounce
    loops are static (spp is the per-frame batch, 1-4)."""
    from ...core import camera as camera_mod
    from ...core import rng
    from ...core.rng import DrawSites as S
    from ...integrator import sampling
    from ...integrator.sampling import PI

    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tm), 1)
    # ints col 3 = dynamic pixel offset (band/film-shard base), same
    # convention as the full megakernel
    pix = ints_ref[0, 3] + tile * tm + lane
    pix_ok = pix < npix
    pix_u = pix.astype(jnp.uint32)
    seed = cfg.seed
    width, height = cfg.width, cfg.height
    zrow = jnp.zeros((1, tm), jnp.float32)

    eye = V3(cam_ref[0:1, 16:17] + zrow, cam_ref[0:1, 17:18] + zrow,
             cam_ref[0:1, 18:19] + zrow)

    class _Mat:
        def __getitem__(self, cr):
            c, r = cr
            return cam_ref[0:1, 4 * c + r:4 * c + r + 1]

    _p_sweep = functools.partial(
        _sweep, planes_ref=planes_ref, begin_ref=begin_ref,
        triu_ref=triu_ref, coefs_ref=coefs_ref, ids_ref=ids_ref,
        cnt_ref=cnt_ref, btw_ref=btw_ref, bw_ref=bw_ref, kp=kp, cp=cp,
        n_clusters=n_clusters, l_cap=l_cap, anyhit=False)

    # fabric/sweep width decoupling — same mechanism as _mega_kernel's
    # cfg.mega_sweep_tile (bit-identical; see the comment there)
    _swt_p = int(getattr(cfg, "mega_sweep_tile", 0) or 0)
    if _swt_p < 0:  # auto (preview scenes are always resident)
        _swt_p = 128

    def sweep(feats_t, ex_row, *, gate, **k):
        w = feats_t.shape[1]
        if _swt_p <= 0 or w <= _swt_p:
            return _p_sweep(feats_t, ex_row, gate=gate, **k)
        assert w % _swt_p == 0, (w, _swt_p)
        outs = [_p_sweep(feats_t[:, i * _swt_p:(i + 1) * _swt_p],
                         ex_row[:, i * _swt_p:(i + 1) * _swt_p],
                         gate=gate, **k)
                for i in range(w // _swt_p)]
        return (jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1))

    gm_coh = gather
    gm_scat = "loop" if gather in ("block", "mxuloop") else gather
    if gather == "mxuloop":  # hybrid: one-hot MXU for coherent ids,
        gm_coh = "mxu"       # serial lane loop for scattered ones
    if gather == "auto":     # preview has no CDF chain; both its site
        gm_coh = gm_scat = "mxu"  # classes measured best as masked mxu
    film = V3(zrow, zrow, zrow)
    px = (pix_u % jnp.uint32(width)).astype(jnp.int32).astype(jnp.float32)
    py = (pix_u // jnp.uint32(width)).astype(jnp.int32).astype(jnp.float32)
    true_g = jnp.float32(1.0) > 0.0
    sample_base = ints_ref[0:1, 2:3]

    for s in range(spp):
        smp_u = (jnp.zeros((1, tm), jnp.int32) + sample_base
                 + s).astype(jnp.uint32)
        u1 = rng.uniform(jnp, pix_u, smp_u, 0, int(S.JITTER_X), seed)
        u2 = rng.uniform(jnp, pix_u, smp_u, 0, int(S.JITTER_Y), seed)
        if cfg.jitter == "cuda":
            ndc_x = -1.0 + 2.0 / width * (px + u1 - 0.5)
            ndc_y = -1.0 + 2.0 / height * (py + u2 - 0.5)
        else:
            ndc_x = -1.0 + 2.0 * (px + 0.5) / width + (u1 - 0.5) / width
            ndc_y = -1.0 + 2.0 * (py + 0.5) / height + (u2 - 0.5) / height
        dcam = V3(ndc_x, ndc_y, jnp.full_like(ndc_x, camera_mod.FOCAL_Z))
        dirs = vm.vnormalize(vm.vtransform(_Mat(), dcam, 0.0), jnp)
        pf, d_u = _feats16(eye, vwhere(pix_ok, dirs, 0.0, jnp))
        bt0, bi0 = sweep(pf, jnp.full((1, tm), -1, jnp.int32), gate=true_g)
        hit0 = bt0 < INF
        idx0 = jnp.where(hit0, bi0, 0)
        g_m0 = jnp.sum((pix_ok & ~hit0).astype(jnp.float32)) > 0.0
        g_h0 = jnp.sum(hit0.astype(jnp.float32)) > 0.0
        sky0 = _env_sample(env_ref, idsl_ref, grow_ref, d_u, env_shape,
                           cfg.hdr_clamp, gm_coh, gate=g_m0,
                           mask=pix_ok & ~hit0)
        _, mrow0 = _rows_fetch(tri8_ref, mat_ref, idsl_ref, grow_ref, idx0,
                               gm_coh, gate=g_h0, mask=hit0)
        le0 = V3(mrow0[0:1], mrow0[1:2], mrow0[2:3])

        ones = jnp.ones((1, tm), jnp.float32)
        lo = V3(zrow, zrow, zrow)
        history = V3(ones, ones, ones)
        active = hit0
        point = eye + d_u * bt0
        view_dir = d_u
        tri = idx0

        for b in range(max_bounce):
            g_act = jnp.sum(active.astype(jnp.float32)) > 0.0
            trow, mrow = _rows_fetch(tri8_ref, mat_ref, idsl_ref, grow_ref, tri,
                                     gm_coh, gate=g_act, mask=active)
            normal = V3(trow[9:10], trow[10:11], trow[11:12])
            brdf = V3(mrow[3:4], mrow[4:5], mrow[5:6])
            w1 = rng.uniform(jnp, pix_u, smp_u, b + 1, int(S.CONT_COS),
                             seed)
            w2 = rng.uniform(jnp, pix_u, smp_u, b + 1, int(S.CONT_PHI),
                             seed)
            wi = sampling.uniform_sphere_p(w1, w2, jnp)
            flip = vm.vdot(wi, normal) * vm.vdot(view_dir, normal) > 0
            wi = vwhere(flip, -wi, wi, jnp)
            wi = vwhere(active, wi, 0.0, jnp)

            bf, wi_u = _feats16(point, wi)
            ex = jnp.where(active, tri, -2)
            bt, bi = sweep(bf, ex, gate=jnp.sum(
                active.astype(jnp.float32)) > 0.0)
            hit = bt < INF
            idx = jnp.where(hit, bi, 0)
            g_hit = jnp.sum((active & hit).astype(jnp.float32)) > 0.0
            _, nmrow = _rows_fetch(tri8_ref, mat_ref, idsl_ref, grow_ref, idx,
                                   gm_coh, gate=g_hit, mask=active & hit)
            n_emis = V3(nmrow[0:1], nmrow[1:2], nmrow[2:3])
            cos_i = jnp.abs(vm.vdot(wi, normal))
            f_r = brdf * (1.0 / PI)
            weight = f_r * cos_i * (2.0 * PI)

            miss = active & ~hit
            sky = _env_sample(env_ref, idsl_ref, grow_ref, wi_u, env_shape,
                              cfg.hdr_clamp, gm_scat,
                              gate=jnp.sum(miss.astype(jnp.float32)) > 0.0,
                              mask=miss)
            lo = lo + vwhere(miss, history * sky * weight, 0.0, jnp)
            lo = lo + vwhere(active & hit, history * n_emis * weight, 0.0,
                             jnp)
            cont = active & hit
            history = vwhere(cont, history * weight, history, jnp)
            point = vwhere(cont, point + wi_u * bt, point, jnp)
            view_dir = vwhere(cont, wi_u, view_dir, jnp)
            tri = jnp.where(cont, idx, tri)
            active = cont

        film = film + vwhere(hit0, le0 + lo, sky0, jnp)

    out_ref[:] = jnp.concatenate([
        film.x, film.y, film.z, zrow, zrow, zrow, zrow, zrow])


@functools.partial(jax.jit, static_argnames=(
    "n_clusters", "cfg", "npix", "env_shape", "spp",
    "max_bounce", "l_cap", "gather", "interpret", "shard_px"))
def render_preview_mega(n_clusters, ints, cam, sd_planes, sd_begin, sd_triu,
                        sd_coef, tri8, mat16, envp, *, cfg, npix, env_shape,
                        spp, max_bounce=2, l_cap=64,
                        gather="take", interpret=False, shard_px=None):
    """One launch = one whole progressive preview frame ([8, Mp] f32,
    rows 0-2 the per-pixel radiance sum over ``spp`` samples).
    ``shard_px`` (TM multiple) renders only the pixel window
    [ints[0,3], ints[0,3]+shard_px) — one band of a banded progressive
    preview (cfg.preview_bands) or one chip's film shard."""
    tmq = int(getattr(cfg, "mega_tile", TM) or TM)
    mp = shard_px if shard_px else -(-npix // tmq) * tmq
    kp = sd_coef.shape[2] // 4
    cp = sd_planes.shape[1]
    kern = functools.partial(
        _preview_kernel, cfg=cfg, npix=int(npix), kp=kp, cp=cp,
        n_clusters=int(n_clusters), l_cap=int(l_cap), env_shape=env_shape,
        spp=int(spp), max_bounce=int(max_bounce), gather=gather, tm=tmq)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(mp // tmq,),
        in_specs=[whole] * 9,
        out_specs=pl.BlockSpec((8, tmq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l_cap, 1), jnp.int32),
            pltpu.VMEM((1, 1), jnp.int32),
            pltpu.VMEM((tmq, kp), jnp.float32),
            pltpu.VMEM((tmq, kp), jnp.int32),
            pltpu.VMEM((tmq, 8), jnp.int32),
            pltpu.VMEM((tmq, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_mega_compiler_params(),
    )(ints, cam, sd_planes, sd_begin, sd_triu, sd_coef, tri8, mat16, envp)
