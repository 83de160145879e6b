"""Pallas TPU kernel: the pre-trace bounce FRONT for the pool engine.

One pallas_call runs the bounce's whole pre-trace elementwise chain —
branch selection, SSS exit shading values, HDR/continuation direction
sampling, NEE light directions, and the per-segment ray-feature build —
by calling the SAME wavefront.bounce_front implementation the XLA path
uses (dual-lowering pattern, like resolve_tail in bounce_resolve.py).
The round-3 tail decomposition (docs/PERF.md) measured ~1.2 ms/iter of
elementwise/structural XLA floor at 16k lanes; this kernel collapses
those ~60 fusions + 7 lane-dim concats into one launch and emits the
trace kernel's segment-STACKED feature block directly, so no [B, 3]
batch buffer or [16, 4M] lane-concat ever materializes.

Interface (lane blocks (rows, TM) over the lane grid; E = n_emit):
  fst   [48, M] f32 in — pool carry (src 0-2, dir 3-5, trow 16-31,
                         mrow 32-47)
  ust   [8, M] i32 in  — carry ids (0 active, 1 hit_idx, 2 bounce,
                         3 slot, 4 pixel, 5 sample); the per-bounce RNG
                         batch is recomputed IN-KERNEL from these
                         counters (pure hash, bit-identical to the XLA
                         front_precompute batch)
  ltab  [Ep, 16] f32 in (whole) — light p1 (0-2), p2 (3-5), p3 (6-8)
  exaux [8, M] f32 in  — (has_sss) 0 total_area, 1 exit_tri-as-f32
  erows [32, M] f32 in — (has_sss) exit tri++mat rows
  refr  [16, M] f32 in — (has_refract) ref_dir 0-2, ref_src 3-5,
                         ref_rate 6-8, ref_escaped 9, ref_last 10
outputs:
  feats [(E+2)*16, M] f32 — segment-stacked ray features (segment s =
        light s for s<E, HDR at E, continuation at E+1), each 16-row
        block in gemm_intersect.ray_features_t16 layout
  excl  [SEp, M] i32 — per-segment exclusion rows (same segment order)
  p1    [48, M] f32 — resolve-kernel value pack (bounce_resolve layout;
        sky 0-5, c_obj_em 30-32 and c_t 43 are post-trace: left zero)
  maskf [8, M] i32 — row 0: mask bits (bounce_resolve layout, minus the
        post-trace c_hit/h_hit bits; 12+i = light GATES, visibility is
        resolved in-kernel by bounce_resolve from the trace rows)
  ld    [LRp, M] f32 — per-light NEE direction rows (3 per light)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams

from ...core import vecmath as vm
from ...core.vecmath import V3, vwhere


class _Rows:
    """Adapter so [K, TM] kernel blocks look like the [K, M] transposed
    row tables bounce_front indexes: integer row index -> a [1, TM]
    slice (keeps everything 2-D for Mosaic)."""

    def __init__(self, arr):
        self._a = arr

    def __getitem__(self, i):
        if isinstance(i, int):
            return self._a[i : i + 1]
        return self._a[i]


def _unit2(d: V3) -> V3:
    """The batch build's double normalization (wavefront._nearest_planes):
    eps-guarded unit then exact unit, bit-matching the XLA path. Dead
    zero-direction lanes become NaN rows, which fail every slab/hit
    compare in the trace kernel (treated as a miss)."""
    return vm.vnormalize(vm.vnormalize(d, jnp, eps=1e-30), jnp)


def _kernel(fst_ref, ust_ref, ltab_ref, *rest, e_cnt: int,
            has_sss: bool, has_refract: bool, cfg):
    from ...core import rng
    from ...core.rng import DrawSites as S
    from ...integrator import wavefront

    r = list(rest)
    exaux_ref = r.pop(0) if has_sss else None
    erows_ref = r.pop(0) if has_sss else None
    refr_ref = r.pop(0) if has_refract else None
    feats_ref, excl_ref, p1_ref, maskf_ref, ld_ref = r

    F = fst_ref[:]
    tm = F.shape[1]
    ray_src = V3(F[0:1], F[1:2], F[2:3])
    out_dir = V3(F[3:4], F[4:5], F[5:6])
    trow = _Rows(F[16:32])
    mrow = _Rows(F[32:48])

    active = ust_ref[0:1] != 0
    hit_idx = ust_ref[1:2]
    tri = jnp.where(active, hit_idx, 0)

    # ---- per-bounce RNG recomputed IN-KERNEL (pure counter hash ->
    # bit-identical to the XLA batch front_precompute builds for the
    # scan engine; carrying the [12+, M] us block through HBM cost
    # ~0.3 ms/iter of launch+staging, docs/PERF.md) ----
    b1 = ust_ref[2:3].astype(jnp.uint32) + jnp.uint32(1)
    pix_u = ust_ref[4:5].astype(jnp.uint32)
    smp_u = ust_ref[5:6].astype(jnp.uint32)
    sites = wavefront.BASE_SITES + [
        S.LIGHT_BASE + 2 * i for i in range(e_cnt)
    ] + [S.LIGHT_BASE + 2 * i + 1 for i in range(e_cnt)]
    us_rows = [rng.uniform(jnp, pix_u, smp_u, b1, int(s), cfg.seed)
               for s in sites]

    if has_sss:
        total_area = exaux_ref[0:1]
        exit_tri = exaux_ref[1:2].astype(jnp.int32)
        erows = _Rows(erows_ref[:])
    else:
        total_area = exit_tri = erows = None
    if has_refract:
        R = refr_ref[:]
        refr = (V3(R[0:1], R[1:2], R[2:3]), V3(R[6:7], R[7:8], R[8:9]),
                R[9:10] > 0.0, R[10:11].astype(jnp.int32),
                V3(R[3:4], R[4:5], R[5:6]))
        # _refract_march returns (dir, rate, escaped, last, src)
        refr = (refr[0], refr[1], refr[2], refr[3], refr[4])
    else:
        refr = None

    pre = wavefront.FrontPre(us_rows, erows, exit_tri, total_area, refr)
    lpt = lambda i, c: ltab_ref[i : i + 1, c : c + 1]
    light_pts = [
        (V3(lpt(i, 0), lpt(i, 1), lpt(i, 2)),
         V3(lpt(i, 3), lpt(i, 4), lpt(i, 5)),
         V3(lpt(i, 6), lpt(i, 7), lpt(i, 8)))
        for i in range(e_cnt)
    ]

    f = wavefront.bounce_front(active, ray_src, out_dir, tri, trow, mrow,
                               pre, light_pts, e_cnt, has_sss,
                               has_refract, cfg, jnp)

    # ---- segment-stacked ray features + exclusions ----
    nee_o = vwhere(f.needs_nee, f.nee_src, 0.0, jnp)
    segs = [(nee_o, vwhere(f.needs_nee, ld, 0.0, jnp)) for ld in f.ldirs]
    segs.append((nee_o, vwhere(f.needs_nee, f.hdir, 0.0, jnp)))
    segs.append((vwhere(f.alive, f.cont_src, 0.0, jnp),
                 vwhere(f.alive, f.cdir, 0.0, jnp)))
    ones = jnp.ones((1, tm), jnp.float32)
    zrow = jnp.zeros((1, tm), jnp.float32)
    blocks = []
    for o, d in segs:
        d_u = _unit2(d)
        w = vm.vcross(d_u, o)
        blocks += [d_u.x, d_u.y, d_u.z, w.x, w.y, w.z, o.x, o.y, o.z,
                   ones, zrow, zrow, zrow, zrow, zrow, zrow]
    feats_ref[:] = jnp.concatenate(blocks)

    ex_rows = [f.nee_excl] * (e_cnt + 1) + [f.cont_excl]
    zi = jnp.zeros((1, tm), jnp.int32)
    ex_rows += [zi] * (excl_ref.shape[0] - len(ex_rows))
    excl_ref[:] = jnp.concatenate(ex_rows)

    # ---- resolve pack (bounce_resolve p1 layout) ----
    cdir_u = vm.vnormalize(f.cdir, jnp, eps=1e-30)
    z1 = zrow
    rows = [z1, z1, z1, z1, z1, z1,                      # sky/sky_c (env)
            f.hdir.x, f.hdir.y, f.hdir.z,
            cdir_u.x, cdir_u.y, cdir_u.z,
            f.nee_norm.x, f.nee_norm.y, f.nee_norm.z,
            f.exit_norm.x, f.exit_norm.y, f.exit_norm.z,
            f.bss.x, f.bss.y, f.bss.z,
            f.fr.x, f.fr.y, f.fr.z,
            f.fr_alb.x, f.fr_alb.y, f.fr_alb.z,
            f.emissive.x, f.emissive.y, f.emissive.z,
            z1, z1, z1,                                  # c_obj_em (crows)
            f.cont_src.x, f.cont_src.y, f.cont_src.z,
            f.ref_rate.x, f.ref_rate.y, f.ref_rate.z,
            f.r0_sss, f.total_area, f.k, f.u_rr, z1]     # c_t from trace
    rows += [z1] * (48 - len(rows))
    p1_ref[:] = jnp.concatenate(rows)

    bits = [active, f.alive, f.emit_break, f.needs_nee, f.sss_entry,
            f.sss_exit, f.is_mirror, f.is_dirref,
            jnp.zeros_like(active),                      # killed (pool: 0)
            f.ref_escaped]
    mask = jnp.zeros((1, tm), jnp.int32)
    for i, bmask in enumerate(bits):
        mask = mask | (bmask.astype(jnp.int32) << i)
    for i, g in enumerate(f.l_gates):
        mask = mask | (g.astype(jnp.int32) << (12 + i))
    # rows 1-3 copy the carry's hit_idx/bounce/slot so maskf doubles as
    # the resolve kernel's aux block with no XLA re-pack
    maskf_ref[:] = jnp.concatenate([mask, ust_ref[1:4]] + [zi] * 4)

    ld_rows = []
    for v in f.ldirs:
        ld_rows += [v.x, v.y, v.z]
    ld_rows += [z1] * (ld_ref.shape[0] - len(ld_rows))
    ld_ref[:] = jnp.concatenate(ld_rows)


def front_bounce(fst, ust, ltab, exaux, erows, refr, e_cnt, has_sss,
                 has_refract, cfg, tile_m=256, interpret=False):
    """Run the front kernel -> (feats, excl, p1, maskf, ld).

    ``exaux``/``erows`` may be None unless has_sss; ``refr`` None unless
    has_refract. cfg is the static RenderConfig (hashable). All RNG
    draws are computed in-kernel from the ust counters."""
    m = fst.shape[1]
    pad = (-m) % tile_m
    ins = [fst, ust]
    if has_sss:
        ins += [exaux, erows]
    if has_refract:
        ins += [refr]
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
        ins = [zf(a) for a in ins]
    mp = m + pad
    n_seg = e_cnt + 2
    sep = -(-n_seg // 8) * 8
    lr = max(8, -(-3 * max(e_cnt, 1) // 8) * 8)

    lane = lambda r: pl.BlockSpec((r, tile_m), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    in_specs = [lane(48), lane(8)]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # ltab whole
    if has_sss:
        in_specs += [lane(8), lane(32)]
    if has_refract:
        in_specs += [lane(16)]

    kern = functools.partial(_kernel, e_cnt=e_cnt, has_sss=has_sss,
                             has_refract=has_refract, cfg=cfg)
    feats, excl, p1, maskf, ld = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=in_specs,
        out_specs=[lane(n_seg * 16), lane(sep), lane(48), lane(8),
                   lane(lr)],
        out_shape=[
            jax.ShapeDtypeStruct((n_seg * 16, mp), jnp.float32),
            jax.ShapeDtypeStruct((sep, mp), jnp.int32),
            jax.ShapeDtypeStruct((48, mp), jnp.float32),
            jax.ShapeDtypeStruct((8, mp), jnp.int32),
            jax.ShapeDtypeStruct((lr, mp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cparams(),
    )(ins[0], ins[1], ltab, *ins[2:])
    if pad:
        feats, excl, p1, maskf, ld = (feats[:, :m], excl[:, :m], p1[:, :m],
                                      maskf[:, :m], ld[:, :m])
    return feats, excl, p1, maskf, ld
