"""Pallas TPU kernel: fused post-trace shading resolve.

The bounce resolve (NEE contributions, branch scales, Russian roulette,
continuation rates, break values — wavefront.resolve_tail) is ~35 XLA
fusions/copies per while-loop iteration; at the axon runtime's ~10-30us
per-kernel tax that tail dominated the whole bounce step (docs/PERF.md
round-2 census). This wrapper packs the per-lane inputs into three wide
arrays (one f32 [M, 48], one i32 bitmask [M, 1], one [M, 3E] light-dir
block) and runs THE SAME resolve_tail code inside one pallas_call —
identical jnp ops, Mosaic lowering instead of XLA, so there is no
separate math implementation to keep in parity.

Column layout of the packed f32 input (build/unpack below):
  sky 0:3 | sky_c 3:6 | hdir 6:9 | cdir_u 9:12 | nee_norm 12:15 |
  exit_norm 15:18 | bss 18:21 | fr 21:24 | fr_alb 24:27 |
  emissive 27:30 | c_obj_em 30:33 | cont_src 33:36 | ref_rate 36:39 |
  r0_sss 39 | total_area 40 | k 41 | u_rr 42 | c_t 43 | pad ..48
Mask bits: active 0, alive 1, emit_break 2, needs_nee 3, sss_entry 4,
sss_exit 5, is_mirror 6, is_dirref 7, killed 8, c_hit 9, h_hit 10,
ref_escaped 11, l_ok[i] 12+i.
Output f32 [M, 16]: dir_out 0:3 | rate_out 3:6 | new_src 6:9 |
accept 9 | killed 10 | pad ..16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p_ref, ld_ref, mk_ref, lights_ref, out_ref, *, e_cnt: int,
            has_sss: bool, has_refract: bool, rr_rate: float,
            sss_rate: float):
    from ...integrator import wavefront

    P = p_ref[:]
    mk = mk_ref[:]

    def bit(b):
        return (mk & (1 << b)) != 0          # [TM, 1]

    def sl(a, b):
        return P[:, a:b]

    ldir_list = [ld_ref[:, 3 * i : 3 * i + 3] for i in range(e_cnt)]
    l_ok_list = [bit(12 + i) for i in range(e_cnt)]

    dir_out, rate_out, new_src, accept, killed = wavefront.resolve_tail(
        jnp, e_cnt, has_sss, has_refract, rr_rate, sss_rate,
        ldir_list, l_ok_list, lights_ref[:],
        sl(0, 3), sl(3, 6), sl(6, 9), sl(9, 12), sl(12, 15), sl(15, 18),
        sl(18, 21), sl(21, 24), sl(24, 27), sl(27, 30), sl(30, 33),
        sl(33, 36), sl(36, 39),
        sl(39, 40), sl(40, 41), sl(41, 42), sl(42, 43), sl(43, 44),
        bit(4), bit(5), bit(6), bit(7), bit(1), bit(0), bit(2), bit(8),
        bit(3), bit(9), bit(10), bit(11),
    )
    tm = P.shape[0]
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    out_ref[:] = jnp.concatenate([
        dir_out, rate_out, new_src,
        jnp.where(accept, one, zero), jnp.where(killed, one, zero),
        jnp.zeros((tm, 5), jnp.float32),
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("e_cnt", "has_sss",
                                             "has_refract", "rr_rate",
                                             "sss_rate"))
def _resolve_call(packed, ldirs, masks, lights, e_cnt, has_sss,
                  has_refract, rr_rate, sss_rate):
    m = packed.shape[0]
    tile_m = 256
    pad = (-m) % tile_m
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, packed.shape[1]), packed.dtype)])
        ldirs = jnp.concatenate(
            [ldirs, jnp.zeros((pad, ldirs.shape[1]), ldirs.dtype)])
        masks = jnp.concatenate(
            [masks, jnp.zeros((pad, 1), masks.dtype)])
    mp = m + pad
    le = max(3 * e_cnt, 1)
    interp = jax.default_backend() == "cpu"
    kern = functools.partial(_kernel, e_cnt=e_cnt, has_sss=has_sss,
                             has_refract=has_refract, rr_rate=rr_rate,
                             sss_rate=sss_rate)
    out = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, packed.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, le), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lights, whole
        ],
        out_specs=pl.BlockSpec((tile_m, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 16), jnp.float32),
        interpret=interp,
    )(packed, ldirs, masks, lights)
    return out[:m]


def resolve_tail_jnp(e_cnt, has_sss, has_refract, rr_rate, sss_rate,
                     ldir_list, l_ok_list, lights, sky, sky_c, hdir,
                     cdir_u, nee_norm, exit_norm, bss, fr, fr_alb,
                     emissive, c_obj_em, cont_src, ref_rate, r0_sss,
                     total_area, k, u_rr, c_t, sss_entry, sss_exit,
                     is_mirror, is_dirref, alive, active, emit_break,
                     killed, needs_nee, c_hit, h_hit, ref_escaped):
    """Drop-in for wavefront.resolve_tail(jnp, ...) running as ONE
    Pallas kernel. Packs inputs (three fusions) and unpacks outputs."""
    m = sky.shape[0]
    packed = jnp.concatenate([
        sky, sky_c, hdir, cdir_u, nee_norm, exit_norm, bss, fr, fr_alb,
        emissive, c_obj_em, cont_src, ref_rate,
        r0_sss, total_area, k, u_rr, c_t,
        jnp.zeros((m, 4), sky.dtype),
    ], axis=1)                                               # [M, 48]
    bits = [active, alive, emit_break, needs_nee, sss_entry, sss_exit,
            is_mirror, is_dirref, killed, c_hit, h_hit, ref_escaped]
    bits += l_ok_list
    mask = jnp.zeros((m, 1), jnp.int32)
    for i, b in enumerate(bits):
        mask = mask | (b.astype(jnp.int32) << i)
    ldirs = (jnp.concatenate(ldir_list, axis=1) if e_cnt
             else jnp.zeros((m, 1), sky.dtype))
    lights_p = (lights if e_cnt else jnp.zeros((1, 8), sky.dtype))
    out = _resolve_call(packed, ldirs, mask, lights_p, e_cnt, has_sss,
                        has_refract, float(rr_rate), float(sss_rate))
    dir_out = out[:, 0:3]
    rate_out = out[:, 3:6]
    new_src = out[:, 6:9]
    accept = out[:, 9:10] > 0.5
    killed_out = out[:, 10:11] > 0.5
    return dir_out, rate_out, new_src, accept, killed_out
