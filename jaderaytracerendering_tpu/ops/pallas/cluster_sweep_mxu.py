"""Pallas TPU kernel: MXU cluster sweep (tracing-as-GEMM per visit).

Same traversal structure as cluster_sweep (per ray-tile loop over that
tile's active clusters from scalar-prefetched candidate lists) but the
dense [TM, K] Moller-Trumbore math runs on the *MXU*: each visit is one

    [TM, 10] ray-features @ [10, 4*Kp] cluster coefficients

matmul producing the four determinant-form scalars (a, su, sv, st) for
every (ray, triangle) pair — the in-kernel form of ops/gemm_intersect
(hitArray, PathTrace.cu:776-792). The VPU epilogue is sign-product
hit testing plus the running min/argmin, ~20 elementwise ops versus the
~43 of the VPU sweep; the systolic array does the rest.

Exactness: identical visit set to the VPU sweep (shared prepare_tiles);
the sign-product tests (su*a >= 0 etc.) are sign-exact equivalents of
the reference's u = su/a >= 0 division forms, and t = st/a is a plain
f32 divide, so results match the other intersectors to f32 rounding
(equivalence-tested vs brute force).

Coefficient planes are packed planar [a | su | sv | st], each Kp wide
with Kp % 32 == 0, so the four static lane slices stay 128-aligned
(Mosaic requirement). Zero pad columns can't hit: st*a > 0 is strict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams

from .. import gemm_intersect, intersect
from . import cluster_sweep

INF = intersect.INF
L_MAX = cluster_sweep.L_MAX


def _sweep_mxu_kernel(ids_ref, counts_ref, begins_ref, f_ref, ex_ref,
                      coefs_ref, bt_ref, bi_ref, kp: int, n_clusters: int):
    tile = pl.program_id(0)
    tm = f_ref.shape[0]
    n_active = counts_ref[tile]

    bt_ref[:] = jnp.full((tm, 1), INF, jnp.float32)
    bi_ref[:] = jnp.zeros((tm, 1), jnp.int32)

    feats = f_ref[:]              # [TM, 10] = (d, d x o, o, 1)
    ex = ex_ref[:, 0:1]
    # manual bf16x3 ("HIGH") matmul: Mosaic supports only DEFAULT (one
    # bf16 pass, loses ~1e-2 of t — breaks oracle parity) and HIGHEST
    # (6 passes, slower than the VPU sweep). hi/lo splits give f32-grade
    # dots in 3 bf16 passes. Ray halves are loop-invariant per tile.
    featsp = jnp.concatenate(
        [feats, jnp.zeros((tm, 6), jnp.float32)], axis=1)  # 16-row coef pad
    fh = featsp.astype(jnp.bfloat16)
    fl = (featsp - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    # the three passes stack along the contraction dim (10 -> 30, still
    # one physical 128-deep MXU pass), so the partial sums accumulate in
    # the systolic array instead of as [TM, 4Kp] f32 adds
    fcat = jnp.concatenate([fh, fh, fl], axis=1)     # [TM, 48]

    def test_cluster(cid):
        coef = coefs_ref[pl.ds(cid, 1)][0]       # [16, 4*Kp]
        ch = coef.astype(jnp.bfloat16)
        cl = (coef - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        ccat = jnp.concatenate([ch, cl, ch], axis=0)  # [48, 4*Kp]
        s = jnp.dot(fcat, ccat, preferred_element_type=jnp.float32)
        a = s[:, 0 * kp : 1 * kp]
        su = s[:, 1 * kp : 2 * kp]
        sv = s[:, 2 * kp : 3 * kp]
        st = s[:, 3 * kp : 4 * kp]
        ids_k = begins_ref[cid] + jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
        # sign-exact division-free forms of u >= 0, v >= 0, u+v <= 1, t > 0
        w = su + sv
        ok = ((su * a >= 0.0) & (sv * a >= 0.0) & (w * a <= a * a)
              & (st * a > 0.0) & (ids_k != ex))
        t = jnp.where(ok, st / a, INF)
        tmin = jnp.min(t, axis=1, keepdims=True)          # [TM, 1]
        sel = jnp.where(t <= tmin, ids_k, jnp.int32(2**30))
        imin = jnp.min(sel, axis=1, keepdims=True)
        better = tmin < bt_ref[:]
        bt_ref[:] = jnp.where(better, tmin, bt_ref[:])
        bi_ref[:] = jnp.where(better, imin, bi_ref[:])

    @pl.when(n_active <= L_MAX)
    def _listed():
        # 2 visits per trip (see cluster_sweep: per-visit branch overhead)
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


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "sort_rays"))
def nearest_hit_sweep_mxu_jnp(origins, dirs, exclude, sd, tile_m=256,
                              interpret=False, sort_rays=False):
    """MXU cluster-sweep nearest hit. Same contract as the other
    intersectors: (hit [M], index [M] i32, t [M] f32, t along unit dir)."""
    c = sd.n_clusters
    kp = sd.cluster_coef.shape[2] // 4
    origins, dirs_u, exclude, ids, counts, perm, m, mp = (
        cluster_sweep.prepare_tiles(origins, dirs, exclude, sd, tile_m,
                                    sort_rays)
    )
    n_tiles = mp // tile_m
    feats = gemm_intersect.ray_features(origins, dirs_u, jnp)  # [Mp, 10]

    kern = functools.partial(_sweep_mxu_kernel, kp=kp, n_clusters=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_m, 10), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef blocks, whole
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
    )(ids, counts, sd.cluster_begin, feats, exclude[:, None],
      sd.cluster_coef)
    return cluster_sweep.unpermute_results(bt, bi, perm, m)
