"""Pallas TPU kernel: fused post-trace bounce tail for the pool engine.

One pallas_call runs the ENTIRE per-bounce epilogue that previously
spread over ~40 XLA kernels and dozens of VMEM<->HBM ping-pong copies of
[1, M] plane buffers (round-3 HLO census, docs/PERF.md): the shading
resolve (wavefront.resolve_tail — THE shared implementation, called
inside the kernel so there is no second parity surface), the pool's
forward throughput accumulation L += T*dir; T *= rate with the
reference's depth-cap seeding quirk (PathTrace.cu:1410-1415), the
refraction-escape kill, film contribution masking, and the next-state
selects — emitting the pool's packed [48, M] state block directly.

Interface (all lane-dense blocks, tiled [rows, TM] over the lane grid):
  fst   [48, M] f32 in  — the pool carry (rows 0-14 state planes)
  p1    [48, M] f32 in  — packed resolve inputs (layout in pack() below)
  ld    [LR, M] f32 in  — per-light NEE directions (3 rows per light)
  aux   [8, M] s32 in   — 0 mask bits, 1 c_idx, 2 bounce, 3 slot,
                          4 prior hit_idx
  crows [32, M] f32 in  — continuation-hit tri++mat rows (transposed,
                          one combined tri_mat_table gather)
  lights [E, 8] f32 in  — (norm.xyz, emis.xyz, area, 0) per light, whole
outputs:
  fstc  [48, M] f32 — candidate next carry (src, dir, T, L, le0, pad,
                      crow, cmrow) for lanes that continue
  meta  [8, M] s32  — 0 accept, 1 hit_idx', 2 bounce', 3 slot_done,
                      4 finished, 5 still
  scat  [8, M] f32  — 0-2 finished-path film contribution
Mask bits: active 0, alive 1, emit_break 2, needs_nee 3, sss_entry 4,
sss_exit 5, is_mirror 6, is_dirref 7, killed 8, c_hit 9, h_hit 10,
ref_escaped 11, l_ok[i] 12+i (>=20 lights falls back to the XLA tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams

from ...core.vecmath import V3, v3rows, vwhere


def _kernel(fst_ref, p1_ref, ld_ref, aux_ref, crows_ref, *rest, e_cnt: int,
            has_sss: bool, has_refract: bool, rr_rate: float,
            sss_rate: float, max_depth: int, npix: int,
            post_in_kernel: bool = False):
    from ...integrator import wavefront
    from ..intersect import INF

    if post_in_kernel:
        bt_ref, bi_ref, env_ref, lights_ref = rest[:4]
        fstc_ref, meta_ref, scat_ref = rest[4:]
    else:
        bt_ref = bi_ref = env_ref = None
        lights_ref, fstc_ref, meta_ref, scat_ref = rest

    P = p1_ref[:]
    F = fst_ref[:]
    tm = P.shape[1]

    def pv3(r):
        return V3(P[r:r + 1], P[r + 1:r + 2], P[r + 2:r + 3])

    mask = aux_ref[0:1]

    def bit(i):
        return (mask & (1 << i)) != 0

    ldirs = [V3(ld_ref[3 * i:3 * i + 1], ld_ref[3 * i + 1:3 * i + 2],
                ld_ref[3 * i + 2:3 * i + 3]) for i in range(e_cnt)]
    l_norms = [V3(lights_ref[i:i + 1, 0:1], lights_ref[i:i + 1, 1:2],
                  lights_ref[i:i + 1, 2:3]) for i in range(e_cnt)]
    l_emises = [V3(lights_ref[i:i + 1, 3:4], lights_ref[i:i + 1, 4:5],
                   lights_ref[i:i + 1, 5:6]) for i in range(e_cnt)]
    l_areas = [lights_ref[i:i + 1, 6:7] for i in range(e_cnt)]

    if post_in_kernel:
        # front-kernel mask layout (bounce_front.py): bits 0-8 as below,
        # ref_escaped at 9, light GATES at 12+i; trace results, env
        # radiance and the continuation rows arrive raw and every
        # post-trace value is derived here
        c_t = bt_ref[e_cnt + 1:e_cnt + 2]
        c_hit = c_t < INF
        c_idx = jnp.where(c_hit, bi_ref[e_cnt + 1:e_cnt + 2], 0)
        h_hit = bt_ref[e_cnt:e_cnt + 1] < INF
        ref_escaped = bit(9)
        l_oks = []
        for i in range(e_cnt):
            l_hit = bt_ref[i:i + 1] < INF
            eidx = lights_ref[i:i + 1, 7:8].astype(jnp.int32)
            l_oks.append(bit(12 + i) & l_hit & (bi_ref[i:i + 1] == eidx))
        sky = V3(env_ref[0:1], env_ref[1:2], env_ref[2:3])
        sky_c = V3(env_ref[3:4], env_ref[4:5], env_ref[5:6])
        c_obj_em = V3(crows_ref[16:17], crows_ref[17:18], crows_ref[18:19])
    else:
        c_t = P[43:44]
        c_hit, h_hit, ref_escaped = bit(9), bit(10), bit(11)
        c_idx = aux_ref[1:2]
        l_oks = [bit(12 + i) for i in range(e_cnt)]
        sky, sky_c, c_obj_em = pv3(0), pv3(3), pv3(30)

    cdir_u = pv3(9)
    cont_src = pv3(33)
    dir_out, rate_out, new_src, accept, killed = wavefront.resolve_tail(
        jnp, e_cnt, has_sss, has_refract, rr_rate, sss_rate,
        ldirs, l_oks, l_norms, l_emises, l_areas,
        sky, sky_c, pv3(6), cdir_u, pv3(12), pv3(15), pv3(18),
        pv3(21), pv3(24), pv3(27), c_obj_em, cont_src, pv3(36),
        P[39:40], P[40:41], P[41:42], P[42:43], c_t,
        bit(4), bit(5), bit(6), bit(7), bit(1), bit(0), bit(2), bit(8),
        bit(3), c_hit, h_hit, ref_escaped,
    )

    # ---- pool accumulation (forward composite; pool.py docstring) ----
    t_put = V3(F[6:7], F[7:8], F[8:9])
    l_acc = V3(F[9:10], F[10:11], F[11:12])
    le0 = V3(F[12:13], F[13:14], F[14:15])
    active = bit(0)
    b = aux_ref[2:3]
    slot = aux_ref[3:4]
    hit_idx_prev = aux_ref[1:2] if post_in_kernel else aux_ref[4:5]

    l_acc = l_acc + t_put * dir_out
    t_put = t_put * rate_out
    b2 = jnp.where(active, b + 1, b)
    depth_capped = accept & (b2 >= max_depth)
    # reference fold seeds from the last pushed l_dir at the cap
    l_acc = l_acc + vwhere(depth_capped, t_put * dir_out, 0.0, jnp)
    finished = (active & ~accept) | depth_capped
    still = accept & ~depth_capped

    l_final = vwhere(killed, 0.0, l_acc, jnp) + le0
    contrib = vwhere(finished, l_final, 0.0, jnp)
    slot_done = jnp.where(finished, slot, npix)

    ray_src2 = vwhere(accept, new_src, V3(F[0:1], F[1:2], F[2:3]), jnp)
    out_dir2 = vwhere(accept, -cdir_u, V3(F[3:4], F[4:5], F[5:6]), jnp)
    hit_idx2 = jnp.where(accept, c_idx, hit_idx_prev)

    zrow = jnp.zeros((1, tm), jnp.float32)
    fstc_ref[:] = jnp.concatenate([
        ray_src2.x, ray_src2.y, ray_src2.z,
        out_dir2.x, out_dir2.y, out_dir2.z,
        t_put.x, t_put.y, t_put.z,
        l_acc.x, l_acc.y, l_acc.z,
        le0.x, le0.y, le0.z, zrow,
        crows_ref[:],
    ])
    zi = jnp.zeros((1, tm), jnp.int32)
    meta_ref[:] = jnp.concatenate([
        accept.astype(jnp.int32), hit_idx2, b2, slot_done,
        finished.astype(jnp.int32), still.astype(jnp.int32), zi, zi,
    ])
    scat_ref[:] = jnp.concatenate([
        contrib.x, contrib.y, contrib.z, zrow, zrow, zrow, zrow, zrow,
    ])


@functools.partial(jax.jit, static_argnames=(
    "e_cnt", "has_sss", "has_refract", "rr_rate", "sss_rate", "max_depth",
    "npix", "tile_m", "interpret"))
def resolve_bounce(fst, p1, ld, aux, crows, lights, e_cnt, has_sss,
                   has_refract, rr_rate, sss_rate, max_depth, npix,
                   tile_m=256, interpret=False):
    m = fst.shape[1]
    pad = (-m) % tile_m
    if pad:
        # zero-mask pad lanes: active=0 -> finished=0 -> slot_done=npix
        # (the drop row), contrib=0 — inert through the whole epilogue
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
        fst, p1, ld, aux, crows = (
            zf(fst), zf(p1), zf(ld), zf(aux), zf(crows))
    mp = m + pad
    lr = ld.shape[0]
    kern = functools.partial(
        _kernel, e_cnt=e_cnt, has_sss=has_sss, has_refract=has_refract,
        rr_rate=float(rr_rate), sss_rate=float(sss_rate),
        max_depth=int(max_depth), npix=int(npix))
    lane = lambda r: pl.BlockSpec((r, tile_m), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    fstc, meta, scat = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=[lane(48), lane(48), lane(lr), lane(8), lane(32),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[lane(48), lane(8), lane(8)],
        out_shape=[
            jax.ShapeDtypeStruct((48, mp), jnp.float32),
            jax.ShapeDtypeStruct((8, mp), jnp.int32),
            jax.ShapeDtypeStruct((8, mp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cparams(),
    )(fst, p1, ld, aux, crows, lights)
    if pad:
        fstc, meta, scat = fstc[:, :m], meta[:, :m], scat[:, :m]
    return fstc, meta, scat


@functools.partial(jax.jit, static_argnames=(
    "e_cnt", "has_sss", "has_refract", "rr_rate", "sss_rate", "max_depth",
    "npix", "tile_m", "interpret"))
def resolve_bounce2(fst, p1, ld, aux, crows, bt, bi, env, lights, e_cnt,
                    has_sss, has_refract, rr_rate, sss_rate, max_depth,
                    npix, tile_m=256, interpret=False):
    """Front-kernel-pipeline variant: post-trace values are derived
    IN-KERNEL from the raw per-segment trace rows (bt/bi, stacked trace
    layout), the env radiance block (rows 0-2 sky, 3-5 sky_c) and the
    continuation rows — so between trace and resolve the XLA graph holds
    only the env gather and the crows gather. ``lights`` col 7 carries
    emit_idx. aux: 0 mask (front layout), 1 prior hit_idx, 2 bounce,
    3 slot."""
    m = fst.shape[1]
    pad = (-m) % tile_m
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
        fst, p1, ld, aux, crows, bt, bi, env = (
            zf(fst), zf(p1), zf(ld), zf(aux), zf(crows), zf(bt), zf(bi),
            zf(env))
    mp = m + pad
    lr = ld.shape[0]
    kern = functools.partial(
        _kernel, e_cnt=e_cnt, has_sss=has_sss, has_refract=has_refract,
        rr_rate=float(rr_rate), sss_rate=float(sss_rate),
        max_depth=int(max_depth), npix=int(npix), post_in_kernel=True)
    lane = lambda r: pl.BlockSpec((r, tile_m), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    fstc, meta, scat = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=[lane(48), lane(48), lane(lr), lane(8), lane(32),
                  lane(bt.shape[0]), lane(bi.shape[0]), lane(8),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[lane(48), lane(8), lane(8)],
        out_shape=[
            jax.ShapeDtypeStruct((48, mp), jnp.float32),
            jax.ShapeDtypeStruct((8, mp), jnp.int32),
            jax.ShapeDtypeStruct((8, mp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cparams(),
    )(fst, p1, ld, aux, crows, bt, bi, env, lights)
    if pad:
        fstc, meta, scat = fstc[:, :m], meta[:, :m], scat[:, :m]
    return fstc, meta, scat


def pack_tail(t, xp):
    """TailInputs -> (p1 [48, M], ld [LR, M], mask_row [1, M] i32,
    lights [E, 8]). Three stack fusions replace ~30 separate plane
    materializations at the kernel boundary."""
    e_cnt = len(t.ldirs)
    zero = xp.zeros_like(t.u_rr)
    rows = [t.sky.x, t.sky.y, t.sky.z, t.sky_c.x, t.sky_c.y, t.sky_c.z,
            t.hdir.x, t.hdir.y, t.hdir.z, t.cdir_u.x, t.cdir_u.y,
            t.cdir_u.z, t.nee_norm.x, t.nee_norm.y, t.nee_norm.z,
            t.exit_norm.x, t.exit_norm.y, t.exit_norm.z,
            t.bss.x, t.bss.y, t.bss.z, t.fr.x, t.fr.y, t.fr.z,
            t.fr_alb.x, t.fr_alb.y, t.fr_alb.z,
            t.emissive.x, t.emissive.y, t.emissive.z,
            t.c_obj_em.x, t.c_obj_em.y, t.c_obj_em.z,
            t.cont_src.x, t.cont_src.y, t.cont_src.z,
            t.ref_rate.x, t.ref_rate.y, t.ref_rate.z,
            t.r0_sss, t.total_area, t.k, t.u_rr, t.c_t]
    rows += [zero] * (48 - len(rows))
    p1 = xp.stack(rows)

    lr = max(8, -(-3 * max(e_cnt, 1) // 8) * 8)
    ld_rows = []
    for v in t.ldirs:
        ld_rows += [v.x, v.y, v.z]
    ld_rows += [zero] * (lr - len(ld_rows))
    ld = xp.stack(ld_rows)

    bits = [t.active, t.alive, t.emit_break, t.needs_nee, t.sss_entry,
            t.sss_exit, t.is_mirror, t.is_dirref, t.killed, t.c_hit,
            t.h_hit, t.ref_escaped] + list(t.l_oks)
    mask = xp.zeros_like(t.c_idx)
    for i, bmask in enumerate(bits):
        mask = mask | (bmask.astype(xp.int32) << i)

    lights = xp.stack([
        xp.stack([t.l_norms[i].x, t.l_norms[i].y, t.l_norms[i].z,
                  t.l_emises[i].x, t.l_emises[i].y, t.l_emises[i].z,
                  t.l_areas[i], xp.zeros_like(t.l_areas[i])])
        for i in range(e_cnt)
    ]) if e_cnt else xp.zeros((1, 8), p1.dtype)
    return p1, ld, mask, lights
