"""Pallas TPU kernel: fully fused cluster sweep (prep + MXU trace).

The round-1 sweep kernels split the work: an XLA prep chain built dense
[M, C] slab tests and per-tile candidate lists that were fed to the
kernel through scalar prefetch. Additive in-loop ablation showed that
split costs ~0.4 ms per call in prefetch/convert/launch overhead alone
on the axon runtime — more than the actual visit work for typical
bounce batches. This kernel moves the *entire* pipeline into one
pallas_call with no scalar prefetch:

per ray tile (one grid step):
  1. slab-test the tile's rays against all cluster AABBs ([TM, Cp] VPU
     work, cluster planes live whole in VMEM);
  2. compact the active-cluster ids with an MXU cumsum (one [1,Cp] @
     [Cp,Cp] triangular matmul) + a masked-sum scatter into a [Cp, 1]
     VMEM scratch — sublane layout, so the visit loop can read candidate
     ids as scalars (Mosaic allows dynamic *sublane* indexing; dynamic
     lane indexing would need 128 alignment);
  3. per candidate cluster, one bf16x3 MXU Möller–Trumbore pass (same
     coefficient form as cluster_sweep_mxu, PathTrace.cu:776-792 math);
  4. DEFERRED reduction: winners are kept as elementwise [TM, Kp] mins
     across visits (3 VPU ops/visit instead of two 7-step cross-lane
     reductions per visit — reductions were ~half the per-visit cost);
     one final min/argmin pair runs after the loop.

Exactness: the visit set equals prepare_tiles' (same slab math, same
reference dist>0 semantics); candidate order is ascending cluster id and
cluster_begin is monotonic, so min-id tie-breaks match the other
intersectors. Equivalence-tested against brute force.
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


def _fused_kernel(f_ref, ex_ref, planes_ref, begin_ref, triu_ref, coefs_ref,
                  bt_ref, bi_ref, ids_ref, cnt_ref, btw_ref, bw_ref,
                  kp: int, cp: int, n_clusters: int,
                  anyhit_tiles: tuple = (0, 0), anyhit_seg: int = -1,
                  debug_variant: str = "full"):
    tm = f_ref.shape[1]
    # stacked-segment mode (anyhit_seg >= 0): grid is (lane tile, segment);
    # excl/bt/bi blocks hold ALL segment rows for the tile (TPU block
    # rules: sublane block dims must be 8-divisible or whole), and the
    # segment's row is selected/stored via dynamic SUBLANE indexing
    stacked = anyhit_seg >= 0
    seg = pl.program_id(1) if stacked else None

    def _store(btv, biv):
        if stacked:
            bt_ref[pl.ds(seg, 1)] = btv
            bi_ref[pl.ds(seg, 1)] = biv
        else:
            bt_ref[:] = btv
            bi_ref[:] = biv

    ex_row = ex_ref[pl.ds(seg, 1)] if stacked else ex_ref[:]   # [1, TM]
    if debug_variant == "stub":
        # perf ablation floor: consume the inputs, write miss outputs —
        # measures per-grid-step + XLA-tail cost with ALL kernel work
        # removed (in-kernel so XLA cannot DCE the downstream shading)
        _store(f_ref[0:1] * 0.0 + INF, ex_row * 0)
        return
    # transposed lane-dense inputs: [16, TM] features / [1, TM] exclusion
    # (a [Mp, 10] buffer pads 10 lanes to 128 = 33 MB at batch size);
    # one in-kernel relayout each, then the math is row-major as before
    feats = jnp.transpose(f_ref[:], (1, 0))  # [TM, 16] = (d, dxo, o, 1, 0..)
    ex = jnp.transpose(ex_row, (1, 0))       # [TM, 1]

    # ---- 1. slab tests -> active clusters [1, Cp] ----
    # identical math/semantics to cluster_sweep.prepare_tiles: per-axis
    # planes, reference dist>0 (entry t outside / exit t inside), dead
    # zero-direction rays excluded
    t0v = None
    t1v = None
    for ax in range(3):
        d_c = feats[:, ax : ax + 1]
        o_c = feats[:, 6 + ax : 7 + ax]
        inv = 1.0 / d_c
        fa = (planes_ref[3 + ax : 4 + ax, :] - o_c) * inv   # bb plane
        na = (planes_ref[ax : ax + 1, :] - o_c) * inv       # aa plane
        hi = jnp.maximum(fa, na)
        lo = jnp.minimum(fa, na)
        t1v = hi if t1v is None else jnp.minimum(t1v, hi)
        t0v = lo if t0v is None else jnp.maximum(t0v, lo)
    dist_pos = jnp.where(t0v > 0.0, t0v, t1v) > 0.0
    ray_ok = (jnp.abs(feats[:, 0:1]) + jnp.abs(feats[:, 1:2])
              + jnp.abs(feats[:, 2:3])) > 0.0
    hits = (t1v >= t0v) & dist_pos & ray_ok                  # [TM, Cp]
    cid_i = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
    act = jnp.max(hits.astype(jnp.float32), axis=0, keepdims=True)
    act = act * (cid_i < n_clusters).astype(jnp.float32)     # [1, Cp]

    # ---- 2. compact ids into sublane scratch (matmul cumsum) ----
    # The one-hot select is the dominant per-tile FIXED cost (measured:
    # with visits entirely stubbed the loop still paid ~2 ms/iter in
    # kernel prep across ~640 tiles), so it is (a) capped at L_CAP rows
    # — a tile beyond the cap runs a dense sweep of all clusters
    # instead (exact, just denser) — and (b) skipped for empty tiles
    # (the median bounce-batch tile has zero candidates).
    cnt = jnp.sum(act, axis=1, keepdims=True)
    cnt_ref[0:1, 0:1] = cnt.astype(jnp.int32)

    n_act = cnt_ref[0, 0]
    if debug_variant == "slab_only":   # perf ablation: skip the visits
        n_act = n_act * 0
    elif debug_variant.startswith("cap"):  # perf ablation: visit cap
        n_act = jnp.minimum(n_act, int(debug_variant[3:]))

    l_cap = ids_ref.shape[0]

    @pl.when((n_act > 0) & (n_act <= l_cap))
    def _():
        pos = jnp.dot(act, triu_ref[:], preferred_element_type=jnp.float32)
        # slot l holds (cid + 1) of the l-th active cluster; empty slots
        # stay 0 so the visit loop's (id - 1 >= 0) guard skips them
        l_iota = jax.lax.broadcasted_iota(
            jnp.int32, (l_cap, cp), 0).astype(jnp.float32)
        sel = (pos == l_iota + 1.0) & (act > 0.0)
        ids_ref[:] = jnp.sum(
            jnp.where(sel, (cid_i + 1).astype(jnp.float32), 0.0),
            axis=1, keepdims=True,
        ).astype(jnp.int32)                                  # [L_CAP, 1]

    # Empty-tile fast path: the median bounce-batch tile has ZERO
    # candidate clusters (dead/sky lanes), so skipping the scratch init,
    # bf16 feature split, visit loop and final reduction for n_act == 0
    # removes most of the per-tile fixed cost on real workloads.
    @pl.when(n_act == 0)
    def _():
        _store(jnp.full((1, tm), INF, jnp.float32),
               jnp.zeros((1, tm), jnp.int32))

    if stacked:
        has_anyhit = True
        is_anyhit = seg == anyhit_seg
    else:
        pid = pl.program_id(0)
        has_anyhit = anyhit_tiles[1] > anyhit_tiles[0]
        is_anyhit = ((pid >= anyhit_tiles[0]) & (pid < anyhit_tiles[1])
                     if has_anyhit else jnp.bool_(False))

    def mt_terms(fcat, cid):
        """One bf16x3 MXU Möller–Trumbore pass + the ok mask. The [48,
        4*Kp] = [hi; lo; hi] coefficient rows are pre-split at scene
        assembly (sd.cluster_coef_b16) — in-kernel per-visit splitting
        cost two converts + a concat in the hot loop."""
        ccat = coefs_ref[pl.ds(cid, 1)][0]                   # [48, 4*Kp]
        s = jnp.dot(fcat, ccat, preferred_element_type=jnp.float32)
        a = s[:, 0 * kp : 1 * kp]
        su = s[:, 1 * kp : 2 * kp]
        sv = s[:, 2 * kp : 3 * kp]
        st = s[:, 3 * kp : 4 * kp]
        begin = begin_ref[cid, 0]
        k_io = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
        # sign-exact division-free forms of u>=0, v>=0, u+v<=1, t>0
        ok = ((su * a >= 0.0) & (sv * a >= 0.0)
              & ((su + sv) * a <= a * a) & (st * a > 0.0)
              & (k_io + begin != ex))
        return ok, a, st, begin

    def run_visits(test_fn):
        @pl.when(n_act <= l_cap)
        def _():
            def visit(l, carry):
                cid0 = ids_ref[2 * l, 0] - 1
                cid1 = ids_ref[2 * l + 1, 0] - 1

                @pl.when(cid0 >= 0)
                def _():
                    test_fn(cid0)

                @pl.when(cid1 >= 0)
                def _():
                    test_fn(cid1)

                return carry

            jax.lax.fori_loop(0, (n_act + 1) // 2, visit, 0)

        @pl.when(n_act > l_cap)
        def _():  # candidate overflow: exact dense sweep of every cluster
            def dense(c_, carry):
                test_fn(c_)
                return carry

            # traced bound keeps Mosaic from unrolling the static C
            jax.lax.fori_loop(0, n_act * 0 + n_clusters, dense, 0)

    @pl.when((n_act > 0) & ~is_anyhit)
    def _():
        btw_ref[:] = jnp.full((tm, kp), INF, jnp.float32)
        bw_ref[:] = jnp.zeros((tm, kp), jnp.int32)

        fh = feats.astype(jnp.bfloat16)
        fl = (feats - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        fcat = jnp.concatenate([fh, fh, fl], axis=1)         # [TM, 48]

        def test_cluster(cid):
            ok, a, st, begin = mt_terms(fcat, cid)
            t = jnp.where(ok, st / a, INF)
            better = t < btw_ref[:]                          # first visit
            btw_ref[:] = jnp.where(better, t, btw_ref[:])    # wins ties
            bw_ref[:] = jnp.where(better, begin, bw_ref[:])

        run_visits(test_cluster)

        btw = btw_ref[:]
        tmin = jnp.min(btw, axis=1, keepdims=True)           # [TM, 1]
        idw = bw_ref[:] + jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1)
        sel2 = jnp.where(btw <= tmin, idw, jnp.int32(2**30))
        _store(jnp.transpose(tmin, (1, 0)),
               jnp.transpose(jnp.min(sel2, axis=1, keepdims=True), (1, 0)))

    if has_anyhit:
        # Any-hit tiles (the HDR-visibility segment): downstream consumes
        # only the hit boolean, so the per-visit epilogue drops the
        # division, min-update and winner tracking — just an OR into the
        # wide hit accumulator (reuses btw_ref as f32 0/1).
        @pl.when((n_act > 0) & is_anyhit)
        def _():
            btw_ref[:] = jnp.zeros((tm, kp), jnp.float32)

            fh = feats.astype(jnp.bfloat16)
            fl = (feats - fh.astype(jnp.float32)).astype(jnp.bfloat16)
            fcat = jnp.concatenate([fh, fh, fl], axis=1)

            def test_anyhit(cid):
                ok, _, _, _ = mt_terms(fcat, cid)
                btw_ref[:] = jnp.maximum(btw_ref[:], ok.astype(jnp.float32))

            run_visits(test_anyhit)

            hit_any = jnp.max(btw_ref[:], axis=1, keepdims=True) > 0.0
            _store(jnp.transpose(jnp.where(hit_any, 1.0, INF), (1, 0)),
                   jnp.zeros((1, tm), jnp.int32))


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "anyhit",
                                             "l_cap", "_debug_variant"))
def nearest_hit_sweep_fused_jnp(origins, dirs, exclude, sd, tile_m=128,
                                interpret=False, anyhit=None, l_cap=64,
                                _debug_variant="full"):
    """Fused cluster-sweep nearest hit. Same contract as the other
    intersectors: (hit [M], index [M] i32, t [M] f32, t along unit dir).

    ``anyhit=(lo, hi)``: static row range where the caller consumes ONLY
    the hit boolean (e.g. the integrator's HDR-visibility segment,
    wavefront.py batch layout). Tiles fully inside the range run a
    cheaper any-hit epilogue (no division / winner tracking); their idx
    is 0 and t is 1.0-when-hit. Rows outside aligned tile bounds keep
    full nearest semantics."""
    m = origins.shape[0]
    dirs_u = vm.normalize(dirs, jnp)
    feats = gemm_intersect.ray_features_t16(origins, dirs_u, jnp)  # [16, M]
    return nearest_hit_sweep_fused_feats_jnp(
        feats, exclude.astype(jnp.int32)[None, :], sd, tile_m=tile_m,
        interpret=interpret, anyhit=anyhit, l_cap=l_cap,
        _debug_variant=_debug_variant)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "anyhit",
                                             "l_cap", "_debug_variant"))
def nearest_hit_sweep_fused_feats_jnp(feats, exclude, sd, tile_m=128,
                                      interpret=False, anyhit=None, l_cap=64,
                                      _debug_variant="full"):
    """Feats-level entry: the integrator builds the transposed ray
    features ([16, M] = d, dxo, o, 1, 0-pad rows; gemm_intersect.
    ray_features_t16 layout) and exclusion ([1, M] i32) directly from
    its SoA planes, so no padded [M, 3] batch buffers ever materialize
    at the kernel boundary (docs/PERF.md round-3 layout plan).
    Directions must be pre-normalized (zero-direction rays miss)."""
    c = sd.n_clusters
    kp = sd.cluster_coef.shape[2] // 4
    cp = sd.cluster_triu.shape[0]
    m = feats.shape[1]
    pad = (-m) % tile_m
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((16, pad), feats.dtype)], axis=1)
        exclude = jnp.concatenate(
            [exclude, jnp.full((1, pad), -1, exclude.dtype)], axis=1)
    mp = m + pad
    n_tiles = mp // tile_m

    if anyhit is not None:
        tlo = -(-anyhit[0] // tile_m)     # first tile fully inside
        thi = anyhit[1] // tile_m         # one past last tile fully inside
        anyhit_tiles = (tlo, max(tlo, thi))
    else:
        anyhit_tiles = (0, 0)
    kern = functools.partial(_fused_kernel, kp=kp, cp=cp, n_clusters=c,
                             anyhit_tiles=anyhit_tiles,
                             debug_variant=_debug_variant)
    bt, bi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((16, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # planes, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # begin col, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triu, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef blocks, whole
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
        scratch_shapes=[
            pltpu.VMEM((l_cap, 1), jnp.int32),   # candidate ids (L_CAP)
            pltpu.VMEM((1, 1), jnp.int32),       # candidate count
            pltpu.VMEM((tile_m, kp), jnp.float32),  # best-t wide
            pltpu.VMEM((tile_m, kp), jnp.int32),    # winner begin wide
        ],
        interpret=interpret,
        compiler_params=_cparams(),
    )(feats, exclude, sd.cluster_planes,
      sd.cluster_begin_col, sd.cluster_triu, sd.cluster_coef_b16)
    bt = bt[0, :m]
    bi = bi[0, :m]
    return bt < INF, jnp.where(bt < INF, bi, 0), bt


@functools.partial(jax.jit, static_argnames=("n_seg", "tile_m", "interpret",
                                             "anyhit_seg", "l_cap",
                                             "_debug_variant"))
def nearest_hit_sweep_fused_stacked_jnp(feats_stk, exclude, sd, n_seg,
                                        tile_m=256, interpret=False,
                                        anyhit_seg=-1, l_cap=64,
                                        _debug_variant="full"):
    """Segment-STACKED feats entry for the pool's fused bounce pipeline.

    ``feats_stk`` [(n_seg*16), M]: segment s occupies rows
    [s*16, (s+1)*16) in ray_features_t16 layout (what the bounce-front
    kernel emits directly). ``exclude`` [>=n_seg, M] i32: row s is
    segment s's per-lane exclusion. Grid is (segment, lane tile); when
    ``anyhit_seg`` >= 0 that segment runs the cheap any-hit epilogue.

    Returns RAW per-segment rows (bt [n_seg, M] f32 with INF = miss,
    bi [n_seg, M] i32) — the resolve kernel derives hit booleans
    in-kernel, so no [M]-plane slicing happens at this boundary."""
    c = sd.n_clusters
    kp = sd.cluster_coef.shape[2] // 4
    cp = sd.cluster_triu.shape[0]
    m = feats_stk.shape[1]
    pad = (-m) % tile_m
    if pad:
        feats_stk = jnp.concatenate(
            [feats_stk, jnp.zeros((feats_stk.shape[0], pad),
                                  feats_stk.dtype)], axis=1)
        exclude = jnp.concatenate(
            [exclude, jnp.full((exclude.shape[0], pad), -1, exclude.dtype)],
            axis=1)
    mp = m + pad
    n_tiles = mp // tile_m

    kern = functools.partial(_fused_kernel, kp=kp, cp=cp, n_clusters=c,
                             anyhit_seg=anyhit_seg,
                             debug_variant=_debug_variant)
    # grid is (lane tile, segment) with segment INNERMOST: the excl/bt/bi
    # blocks (whole-rows x tile, per TPU sublane-block rules) then stay
    # resident across all of a tile's segments — one fetch/writeback per
    # tile. The kernel row-indexes them by program_id(1).
    sep = exclude.shape[0]
    so = -(-n_seg // 8) * 8  # output rows padded to a sublane multiple
    bt, bi = pl.pallas_call(
        kern,
        grid=(n_tiles, n_seg),
        in_specs=[
            pl.BlockSpec((16, tile_m), lambda i, s: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sep, tile_m), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # planes, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # begin col, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triu, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef blocks, whole
        ],
        out_specs=[
            pl.BlockSpec((so, tile_m), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((so, tile_m), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # rows >= n_seg are never written (padding for the resolve
            # kernel's sublane-block consumption)
            jax.ShapeDtypeStruct((so, mp), jnp.float32),
            jax.ShapeDtypeStruct((so, mp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((l_cap, 1), jnp.int32),
            pltpu.VMEM((1, 1), jnp.int32),
            pltpu.VMEM((tile_m, kp), jnp.float32),
            pltpu.VMEM((tile_m, kp), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_cparams(),
    )(feats_stk, exclude, sd.cluster_planes,
      sd.cluster_begin_col, sd.cluster_triu, sd.cluster_coef_b16)
    if pad:
        bt, bi = bt[:, :m], bi[:, :m]
    return bt, bi
