"""Wavefront path integrator.

The reference's CUDA megakernel (pathTracing, PathTrace.cu:905-1416) is a
per-thread divergent loop: four material branches (diffuse / mirror /
SSS entry / SSS exit / direct refraction), nested Russian roulette, and
replay stacks of (l_dir, indir_rate) pairs composited backward at path
end (PathTrace.cu:1410-1415). On TPU that divergence becomes *masked
lanes*: every bounce computes all branches for all lanes and selects, and
the replay stacks become per-bounce scan outputs folded after the loop.

Faithfulness notes (all constants/factors from the reference):

- bounce 0 re-checks emissive and breaks with l_dir = Le; combined with
  the driver's ``color = Le + pathTracing(...)`` (PathTrace.cu:1448-1451)
  primary light hits count Le twice — replicated (CUDA parity; the GLSL
  renderer does not do this);
- a path whose refraction march escapes an open surface returns 0 for
  the *whole* path, discarding its stack (PathTrace.cu:1231) — the
  ``killed`` flag replicates this;
- pdf-compensation factors: lobe select rate k = 2 for refractive
  materials (PathTrace.cu:923), 1/SSS_RATE and 1/(1-SSS_RATE)
  (PathTrace.cu:986, 1133), internal-reflection x5 / refract-out x1.25
  (PathTrace.cu:1220, 1225), mirror k/(RR/pi) (PathTrace.cu:1391);
- NEE geometric term uses the *unnormalized* light vector, giving the
  reference's |cos cos'|/d^4 * area form (PathTrace.cu:959-961);
- all random draws are site-keyed (core.rng), so the NumPy oracle in
  cpuref/ consumes identical streams.

One nearest-hit batch per bounce covers all NEE light rays, the HDR
visibility ray, and the continuation ray ([M*(E+2)] rays); the direct-
refraction march (sequential, <=32 traces) is compiled only when the
scene contains a DIR_REFRACT material (static flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng, vecmath as vm
from ..scene import envmap
from . import sampling
from .sampling import PI

S = rng.DrawSites
INF = 2147483647.0

EMIT_BREAK_EPS = 1.4e-5   # PathTrace.cu:917
EMIT_SKIP_EPS = 1.5e-4    # PathTrace.cu:1005


def _any3(v, thresh, xp):
    return (v > thresh).any(axis=-1)


def _unit(v, xp):
    return vm.normalize(v, xp, eps=1e-30)


def _tri_rows(sd, idx):
    """One wide-row gather for all per-triangle data (scene.TRI_* slices)."""
    return sd.tri_table[idx]


def _mat_rows(sd, obj, xp):
    """Per-object material rows via one-hot matmul (scene.MAT_* slices).

    The object table is tiny (O rows), so a [M, O] @ [O, 16] product beats
    a scattered gather by a wide margin on TPU."""
    if xp is jnp:
        onehot = (obj[:, None] == xp.arange(sd.n_objects)[None, :]).astype(
            sd.mat_table.dtype
        )
        return jnp.dot(onehot, sd.mat_table, preferred_element_type=jnp.float32)
    return sd.mat_table[obj]


def _refract_march(alive_ref, tri, miu_in, normal, ray_src, out_dir, sd, cfg,
                   xp, nearest_fn, u_fn):
    """DIR_REFRACT internal march (PathTrace.cu:1180-1234).

    Returns (exit_dir, rate, escaped, last_idx, src). Only compiled when
    sd.has_refract.
    """
    from ..scene import scene as scene_mod

    miu = miu_in[..., None]
    r0 = sampling.schlick_r0(miu)
    fres_i = sampling.fresnel_entry(r0, xp.abs(vm.dot(normal, out_dir, xp)))
    rdir, _ = sampling.refract_dir(-out_dir, normal, 1.0 / miu, xp)
    rdir = xp.where(alive_ref[..., None], rdir, 0.0)  # mask non-refract lanes
    rate = xp.broadcast_to(1.0 - fres_i, ray_src.shape) + xp.zeros_like(ray_src)
    src = ray_src
    exclude = tri
    escaped = xp.zeros(tri.shape, bool)
    exited = xp.zeros(tri.shape, bool)
    for i in range(cfg.max_refract_bounces):
        live = alive_ref & ~exited & ~escaped
        hit, idx, t = nearest_fn(src, _unit(rdir, xp), xp.where(live, exclude, -2))
        escaped = escaped | (live & ~hit)
        step_ok = live & hit
        hp = src + _unit(rdir, xp) * t[..., None]
        irow = _tri_rows(sd, idx)
        n_i = irow[:, scene_mod.TRI_NORM]
        new_rdir, full_reflex = sampling.refract_dir(_unit(rdir, xp), n_i, miu, xp)
        rate_row = _mat_rows(sd, irow[:, scene_mod.TRI_OBJ].astype(xp.int32), xp)
        absorb = rate_row[:, scene_mod.MAT_REFRACT_RATE] ** t[..., None]
        rate = xp.where(step_ok[..., None], rate * absorb, rate)
        src = xp.where(step_ok[..., None], hp, src)
        exclude = xp.where(step_ok, idx.astype(exclude.dtype), exclude)
        fres_o = sampling.fresnel_exit(r0, xp.abs(vm.dot(new_rdir, n_i, xp)))
        u = u_fn(S.REFRACT_BASE + i)
        reflect_pick = full_reflex | (u < cfg.internal_reflect_rate)
        reflected = vm.reflect(new_rdir, n_i, xp)
        # exit via refraction: x1.25 compensates the 0.8 continue pdf
        rate = xp.where(
            (step_ok & ~reflect_pick)[..., None], rate * (1.0 - fres_o) * 1.25, rate
        )
        # internal (non-total) reflection: x fresnel_o x5 (PathTrace.cu:1220)
        rate = xp.where(
            (step_ok & reflect_pick & ~full_reflex)[..., None], rate * fres_o * 5.0, rate
        )
        rdir = xp.where(step_ok[..., None],
                        xp.where(reflect_pick[..., None], reflected, new_rdir), rdir)
        exited = exited | (step_ok & ~reflect_pick)
    return rdir, rate, escaped, exclude, src


def resolve_tail(xp, e_cnt, has_sss, has_refract, rr_rate, sss_rate,
                 ldir_list, l_ok_list, lights, sky, sky_c, hdir, cdir_u,
                 nee_norm, exit_norm, bss, fr, fr_alb, emissive, c_obj_em,
                 cont_src, ref_rate, r0_sss, total_area, k, u_rr, c_t,
                 sss_entry, sss_exit, is_mirror, is_dirref, alive,
                 active, emit_break, killed, needs_nee, c_hit, h_hit,
                 ref_escaped):
    """Post-trace shading resolve: NEE light/env contributions, branch
    scales, Russian roulette acceptance, continuation rates, break
    values (bounce_step's tail — PathTrace.cu:941-1416 epilogue math).

    Pure function of arrays so the SAME code runs as the XLA tail and
    inside the Pallas shade-resolve kernel (ops/pallas/shade_resolve.py)
    — one implementation, two lowerings, no parity surface. All masks
    and scalars are [M, 1]-shaped (Mosaic-friendly 2D).

    ``ldir_list``/``l_ok_list``: per-light [M, 3] directions and [M, 1]
    accept masks (visibility already resolved by the caller).
    ``lights``: packed [E, 8] rows = (l_norm.xyz, l_emis.xyz, area, 0).
    Returns (dir_out, rate_out, new_src, accept [M,1], killed [M,1]).
    """
    m3 = sky.shape
    l_dir = xp.zeros(m3, sky.dtype)
    for i in range(e_cnt):
        ldir = ldir_list[i]
        ok = l_ok_list[i]
        l_norm_i = lights[i : i + 1, 0:3]
        l_emis_i = lights[i : i + 1, 3:6]
        d2 = vm.dot(ldir, ldir, xp)
        geom = xp.abs(
            vm.dot(nee_norm, ldir, xp) * vm.dot(l_norm_i, ldir, xp)
        ) / d2 / d2 * lights[i : i + 1, 6:7]
        f_entry = xp.where(sss_entry, fr_alb, fr)
        contrib = l_emis_i * f_entry * geom
        if has_sss:
            fres_o = sampling.fresnel_exit(
                r0_sss, xp.abs(vm.dot(_unit(ldir, xp), exit_norm, xp))
            )
            contrib_exit = (
                l_emis_i * fres_o * bss * geom / PI * total_area
            )
            contrib = xp.where(sss_exit, contrib_exit, contrib)
        l_dir = l_dir + xp.where(ok, contrib, 0.0)

    # ---- NEE environment (cu:968-980 / 1111-1130) ----
    cos_h = xp.abs(vm.dot(hdir, nee_norm, xp))
    env_entry = (sky * xp.where(sss_entry, fr_alb, fr)
                 * cos_h * (2.0 * PI))
    if has_sss:
        fres_oh = sampling.fresnel_exit(
            r0_sss, xp.abs(vm.dot(hdir, exit_norm, xp))
        )
        env_exit = sky * fres_oh * bss * cos_h * 2.0  # cu:1130
        env_c = xp.where(sss_exit, env_exit, env_entry)
    else:
        env_c = env_entry
    l_dir = l_dir + xp.where(needs_nee & ~h_hit, env_c, 0.0)

    # ---- branch scale on l_dir (cu:986, 1133, 1322) ----
    scale = xp.where(
        sss_entry, k / sss_rate,
        xp.where(sss_exit, k / (1.0 - sss_rate), k),
    )
    l_dir = l_dir * scale
    l_dir = xp.where(needs_nee, l_dir, 0.0)

    # ---- Russian roulette + continuation acceptance ----
    rr_ok = u_rr < rr_rate
    # strict (em < eps).all(), matching the oracle / reference (cu:1005
    # region; cpuref lines 141/188/273): a channel exactly AT the
    # threshold rejects continuation. max-form is boolean-identical
    # (incl. NaN propagation) and avoids a Mosaic i1 lane-reduce.
    c_nonemit = xp.max(c_obj_em, axis=-1, keepdims=True) < EMIT_SKIP_EPS
    # (mirror|dirref) | c_nonemit ≡ where(mirror|dirref, True, c_nonemit)
    accept = alive & rr_ok & c_hit & ((is_mirror | is_dirref) | c_nonemit)
    killed_out = killed
    if has_refract:
        accept = accept & ~(is_dirref & ref_escaped)
        killed_out = killed | (alive & is_dirref & ref_escaped)

    cos_c = xp.abs(vm.dot(cdir_u, nee_norm, xp))
    rate_diffuse = fr * cos_c / rr_rate * k  # cu:1344 (+ *k at push, 1352)
    rate_entry = fr * cos_c / rr_rate * (k / sss_rate)  # cu:1008, 1016
    if has_sss:
        fres_oc = sampling.fresnel_exit(
            r0_sss, xp.abs(vm.dot(cdir_u, exit_norm, xp)))
        rate_exit = (
            bss * fres_oc * xp.abs(vm.dot(cdir_u, exit_norm, xp))
            * total_area * 2.0 / rr_rate * (k / (1.0 - sss_rate))
        )  # cu:1160, 1166
    else:
        rate_exit = xp.zeros(m3, sky.dtype)
    rate_mirror = fr * (k / (rr_rate / PI))  # cu:1391
    rate = xp.where(sss_entry, rate_entry, rate_diffuse)
    if has_sss:
        rate = xp.where(sss_exit, rate_exit, rate)
    rate = xp.where(is_mirror, rate_mirror, rate)
    if has_refract:
        rate = xp.where(is_dirref, ref_rate * (k / rr_rate), rate)

    # ---- break values (cu:1396, 1254) ----
    mirror_sky = sky_c * rate_mirror
    dirref_sky = sky_c * ref_rate * (k / rr_rate)
    break_val = l_dir  # diffuse / entry / exit keep their NEE sum
    zeros3 = xp.zeros(m3, sky.dtype)
    break_val = xp.where(
        is_mirror & rr_ok & ~c_hit, mirror_sky,
        xp.where(is_mirror, zeros3, break_val),
    )
    if has_refract:
        break_val = xp.where(
            is_dirref & rr_ok & ~c_hit & ~ref_escaped, dirref_sky,
            xp.where(is_dirref, zeros3, break_val),
        )
    else:
        break_val = xp.where(is_dirref, zeros3, break_val)
    break_val = xp.where(emit_break, emissive, break_val)

    # ---- emit (dir_b, rate_b) (cu:1410-1415 stack entries) ----
    dir_out = xp.where(
        accept,
        xp.where(is_mirror | is_dirref, zeros3, l_dir),
        xp.where(active, break_val, 0.0),
    )
    rate_out = xp.where(
        accept, rate,
        xp.where(active, 0.0, 1.0),
    )
    new_src = cont_src + cdir_u * c_t
    return dir_out, rate_out, new_src, accept, killed_out


def bounce_step(state, b, pixel_id, sample_id, sd, cfg, xp, nearest_fn,
                cont_override=None, rows=None, want_rows=False):
    """One masked megakernel bounce. Returns (state, (dir_b, rate_b)).

    ``cont_override=(mask, src, dir)`` injects extra rays into otherwise-
    idle lanes' continuation slots (exclusion -1) — the pool engine rides
    its respawn primary rays through the same batched trace. When given,
    the raw continuation trace (hit, idx, t) is returned as a third
    element.

    ``rows=(trow, mrow)`` supplies the per-lane triangle/material rows
    for ``where(active, hit_idx, 0)`` precomputed (the pool engine
    carries them across iterations — re-gathering per bounce costs two
    extra launches per while-loop iteration on the axon backend).
    ``want_rows=True`` appends ``(crow, c_mrow)`` — the continuation
    hit's rows — as the final returned element so the caller can build
    the next iteration's carry without another gather."""
    active, ray_src, out_dir, hit_idx, killed = state
    m = ray_src.shape[0]
    e_cnt = sd.n_emit

    # ---- all RNG draws for this bounce in ONE [M, S] computation ----
    # The (pixel, sample) base hash is site-independent, so batching the
    # per-site mixes over a broadcast site axis yields bit-identical
    # streams while collapsing ~12 separate elementwise launch chains
    # (at ~30us each on the axon runtime) into one.
    base_sites = [S.SELECT_REFRACT, S.SELECT_SSS, S.AREA_CDF, S.EXIT_U,
                  S.EXIT_V, S.HDR_COS, S.HDR_PHI, S.CONT_COS, S.CONT_PHI,
                  S.RR]
    col = {site: i for i, site in enumerate(base_sites)}
    site_vals = np.asarray(
        base_sites
        + [S.LIGHT_BASE + 2 * i for i in range(e_cnt)]
        + [S.LIGHT_BASE + 2 * i + 1 for i in range(e_cnt)],
        np.uint32,
    )
    pid2 = pixel_id[:, None] if getattr(pixel_id, "ndim", 0) == 1 else pixel_id
    sid2 = sample_id[:, None] if getattr(sample_id, "ndim", 0) == 1 else sample_id
    b2 = b[:, None] if getattr(b, "ndim", 0) == 1 else b
    us = rng.uniform(xp, pid2, sid2, b2 + 1, xp.asarray(site_vals)[None, :],
                     cfg.seed)

    def u(site, pid=pixel_id):
        if site in col:
            return us[:, col[site]]
        return rng.uniform(xp, pid, sample_id, b + 1, site, cfg.seed)

    from ..scene import scene as scene_mod

    TRI, MAT = scene_mod, scene_mod
    tri = xp.where(active, hit_idx, 0)
    if rows is None:
        trow = _tri_rows(sd, tri)
        mrow = _mat_rows(sd, trow[:, TRI.TRI_OBJ].astype(xp.int32), xp)
    else:
        trow, mrow = rows
    normal = trow[:, TRI.TRI_NORM]
    obj = trow[:, TRI.TRI_OBJ].astype(xp.int32)
    emissive = mrow[:, MAT.MAT_EMISSIVE]
    brdf = mrow[:, MAT.MAT_BRDF]
    refract_mode = mrow[:, MAT.MAT_REFRACT_MODE].astype(xp.int32)
    reflex_mode = mrow[:, MAT.MAT_REFLEX].astype(xp.int32)

    emit_break = active & _any3(emissive, EMIT_BREAK_EPS, xp)
    alive = active & ~emit_break

    # ---- branch selection (PathTrace.cu:923-925, 930-931) ----
    k = xp.where(refract_mode != 0, 2.0, 1.0)[..., None]
    u_sel = u(S.SELECT_REFRACT)
    take_refract = alive & (u_sel < 0.5) & (refract_mode != 0)
    is_sss = take_refract & (refract_mode == 1)
    u_sss = u(S.SELECT_SSS)
    sss_entry = is_sss & (u_sss < cfg.sss_rate)
    sss_exit = is_sss & ~(u_sss < cfg.sss_rate)
    is_dirref = take_refract & (refract_mode == 2)
    is_diffuse = alive & ~take_refract & (reflex_mode == 0)
    is_mirror = alive & ~take_refract & (reflex_mode == 1)

    fr = brdf * (1.0 / PI)
    fr_alb = mrow[:, MAT.MAT_REFRACT_ALBEDO] * (1.0 / PI)

    # ---- SSS exit point (PathTrace.cu:1029-1070) ----
    if sd.has_sss:
        import math

        n_bisect = max(2, int(math.ceil(math.log2(max(sd.n_triangles, 2)))) + 1)
        if sd.sss_nb:
            # exact table-driven pick: 2 wide gathers instead of ~16
            # sequential scalar ones (see sampling.build_area_cdf_tables)
            exit_tri = sampling.area_cdf_pick_fast(u(S.AREA_CDF), obj, sd, xp)
        else:
            exit_tri = sampling.area_cdf_pick(
                u(S.AREA_CDF), obj, sd.prefix_area, sd.obj_total_area,
                sd.seg_begin, sd.seg_end, sd.mapping, xp, n_iters=n_bisect,
            )
        exit_tri = xp.where(sss_exit, exit_tri, 0)
        erow = _tri_rows(sd, exit_tri)
        exit_point = sampling.triangle_point(
            erow[:, TRI.TRI_P1], erow[:, TRI.TRI_P2], erow[:, TRI.TRI_P3],
            u(S.EXIT_U), u(S.EXIT_V), xp,
        )
        exit_norm = erow[:, TRI.TRI_NORM]
        exit_obj = erow[:, TRI.TRI_OBJ].astype(xp.int32)
        emrow = _mat_rows(sd, exit_obj, xp)
        inner_dir = exit_point - ray_src
        inner_dist = vm.norm(inner_dir, xp)
        sigma = emrow[:, MAT.MAT_REFRACT_RATE]
        r0_sss = sampling.schlick_r0(mrow[:, MAT.MAT_REFRACT_INDEX])[..., None]
        fres_i = sampling.fresnel_entry(
            r0_sss, xp.abs(vm.dot(normal, out_dir, xp))
        )
        bss = sampling.bssrdf(xp.maximum(inner_dist, 1e-12), sigma, xp) * fres_i
        total_area = sd.obj_total_area[exit_obj][..., None]
    else:
        exit_tri = xp.zeros_like(tri)
        exit_point = ray_src
        exit_norm = normal
        inner_dir = out_dir
        bss = xp.zeros_like(ray_src)
        r0_sss = xp.zeros((m, 1), ray_src.dtype)
        total_area = xp.ones((m, 1), ray_src.dtype)

    # NEE origin/normal/exclusion: exit lanes shade from the exit point
    nee_src = xp.where(sss_exit[..., None], exit_point, ray_src)
    nee_norm = xp.where(sss_exit[..., None], exit_norm, normal)
    nee_excl = xp.where(sss_exit, exit_tri.astype(tri.dtype), tri)

    # ---- direct-refraction march (static gate) ----
    if sd.has_refract:
        ref_dir, ref_rate, ref_escaped, ref_last, ref_src = _refract_march(
            is_dirref, tri, mrow[:, MAT.MAT_REFRACT_INDEX], normal, ray_src,
            out_dir, sd, cfg, xp, nearest_fn, u,
        )
    else:
        ref_dir = out_dir
        ref_rate = xp.zeros_like(ray_src)
        ref_escaped = xp.zeros(m, bool)
        ref_last = tri
        ref_src = ray_src

    # ---- build the combined shadow/continuation ray batch ----
    # HDR NEE direction (PathTrace.cu:968-974 / 1111-1117)
    hdir_raw = sampling.uniform_sphere(u(S.HDR_COS), u(S.HDR_PHI), xp)
    hdir_entry = sampling.fold_same_hemisphere(hdir_raw, normal, out_dir, xp)
    hdir_exit = sampling.fold_same_hemisphere(hdir_raw, exit_norm, inner_dir, xp)
    hdir = xp.where(sss_exit[..., None], hdir_exit, hdir_entry)

    # continuation direction
    cdir_raw = sampling.uniform_sphere(u(S.CONT_COS), u(S.CONT_PHI), xp)
    cdir_entry = sampling.fold_same_hemisphere(cdir_raw, normal, out_dir, xp)
    cdir_exit = sampling.fold_opposite_hemisphere(cdir_raw, exit_norm, inner_dir, xp)
    cdir_mirror = normal * (2.0 * vm.dot(out_dir, normal, xp)) - out_dir  # cu:1378
    cdir = xp.where(sss_exit[..., None], cdir_exit, cdir_entry)
    cdir = xp.where(is_mirror[..., None], cdir_mirror, cdir)
    if sd.has_refract:
        cdir = xp.where(is_dirref[..., None], ref_dir, cdir)
    cont_src = xp.where(is_dirref[..., None], ref_src, nee_src)
    cont_excl = xp.where(is_dirref, ref_last.astype(tri.dtype), nee_excl)
    cont_mask = alive
    if cont_override is not None:
        ov_mask, ov_src, ov_dir = cont_override
        ov3 = ov_mask[..., None]
        cdir = xp.where(ov3, ov_dir, cdir)
        cont_src = xp.where(ov3, ov_src, cont_src)
        cont_excl = xp.where(ov_mask, -1, cont_excl)
        cont_mask = alive | ov_mask

    needs_nee = is_diffuse | sss_entry | sss_exit
    if e_cnt > 0:
        le_ids = sd.emit_idx  # [E]
        # hoisted at assemble time (scene.py): gathering per bounce
        # re-staged these tables every while-loop iteration
        lp1, lp2, lp3 = sd.light_p1, sd.light_p2, sd.light_p3
        l_norm = sd.light_norm
        l_emis = sd.light_emis
        l_area = sd.light_area
        lu = us[:, 10 : 10 + e_cnt]          # sites LIGHT_BASE + 2i
        lv = us[:, 10 + e_cnt : 10 + 2 * e_cnt]  # sites LIGHT_BASE + 2i + 1
        lpoint = sampling.triangle_point(
            lp1[None], lp2[None], lp3[None], lu, lv, xp
        )  # [M, E, 3]
        ldir = lpoint - nee_src[:, None, :]
        # entry-type hemisphere gate (PathTrace.cu:950-952); exit has none
        same_hemi = (
            vm.dot_s(ldir, nee_norm[:, None, :], xp)
            * vm.dot_s(out_dir, normal, xp)[:, None] >= 0
        )
        l_gate = needs_nee[:, None] & (same_hemi | sss_exit[:, None])
    else:
        ldir = xp.zeros((m, 0, 3), ray_src.dtype)
        l_gate = xp.zeros((m, 0), bool)

    # one nearest-hit batch: [M*E light] + [M hdr] + [M continuation].
    # Dead/masked lanes get zero directions: every intersector treats a
    # zero-direction ray as a miss, so dead lanes cost no traversal work
    # (their stale origins are o + d*INF garbage otherwise).
    nee_gate3 = needs_nee[..., None]
    alive3 = cont_mask[..., None]
    batch_o = xp.concatenate([
        xp.broadcast_to(
            xp.where(nee_gate3, nee_src, 0.0)[:, None, :], (m, e_cnt, 3)
        ).reshape(-1, 3),
        xp.where(nee_gate3, nee_src, 0.0),
        xp.where(alive3, cont_src, 0.0),
    ])
    batch_d = xp.concatenate([
        xp.where(nee_gate3[:, None, :], ldir, 0.0).reshape(-1, 3),
        xp.where(nee_gate3, hdir, 0.0),
        xp.where(alive3, cdir, 0.0),
    ])
    batch_e = xp.concatenate([
        xp.broadcast_to(nee_excl[:, None], (m, e_cnt)).reshape(-1),
        nee_excl, cont_excl,
    ])
    # the HDR-visibility segment [m*e_cnt, m*e_cnt+m) is consumed as a
    # hit boolean only (h_hit below) — intersectors that understand the
    # hint run it with a cheaper any-hit epilogue
    import inspect

    try:
        _params = inspect.signature(nearest_fn).parameters
        _takes_anyhit = ("anyhit" in _params or any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in _params.values()
        ))
    except (TypeError, ValueError):  # builtins / partials without sigs
        _takes_anyhit = False
    if _takes_anyhit:
        bhit, bidx, bt = nearest_fn(batch_o, _unit(batch_d, xp), batch_e,
                                    anyhit=(m * e_cnt, m * e_cnt + m))
    else:
        bhit, bidx, bt = nearest_fn(batch_o, _unit(batch_d, xp), batch_e)
    l_hit = bhit[: m * e_cnt].reshape(m, e_cnt)
    l_idx = bidx[: m * e_cnt].reshape(m, e_cnt)
    h_hit = bhit[m * e_cnt : m * e_cnt + m]
    c_hit = bhit[m * e_cnt + m :]
    c_idx = bidx[m * e_cnt + m :]
    c_t = bt[m * e_cnt + m :]

    # ---- post-trace resolve: one merged env fetch, then the shared
    # resolve_tail (Pallas kernel on TPU, plain XLA/NumPy otherwise) ----
    cdir_u = _unit(cdir, xp)
    env2 = envmap.sample_env_sd(
        sd, xp.concatenate([_unit(hdir, xp), cdir_u]), xp, clamp=cfg.hdr_clamp
    )
    sky = env2[:m]
    sky_c = env2[m:]

    u_rr = u(S.RR)
    crow = _tri_rows(sd, xp.where(c_hit, c_idx, 0))
    c_mrow = _mat_rows(sd, crow[:, TRI.TRI_OBJ].astype(xp.int32), xp)
    c_obj_em = c_mrow[:, MAT.MAT_EMISSIVE]

    # per-light visibility: exact-index test against the nearest hit
    # (PathTrace.cu:959-961 semantics)
    if e_cnt > 0:
        l_ok = l_gate & l_hit & (l_idx == le_ids[None, :])     # [M, E]
        lights = xp.concatenate([
            l_norm, l_emis, l_area[:, None],
            xp.zeros((e_cnt, 1), ray_src.dtype),
        ], axis=1)                                             # [E, 8]
    else:
        l_ok = xp.zeros((m, 0), bool)
        lights = xp.zeros((0, 8), ray_src.dtype)
    ldir_list = [ldir[:, i, :] for i in range(e_cnt)]
    l_ok_list = [l_ok[:, i : i + 1] for i in range(e_cnt)]

    c2 = lambda a: a[:, None]  # [M] -> [M, 1] (resolve_tail is 2D-shaped)
    tail_args = (
        e_cnt, sd.has_sss, sd.has_refract, cfg.rr_rate, cfg.sss_rate,
        ldir_list, l_ok_list, lights, sky, sky_c, hdir, cdir_u,
        nee_norm, exit_norm, bss, fr, fr_alb, emissive, c_obj_em,
        cont_src, ref_rate, r0_sss, total_area, k, c2(u_rr), c2(c_t),
        c2(sss_entry), c2(sss_exit), c2(is_mirror), c2(is_dirref),
        c2(alive), c2(active), c2(emit_break), c2(killed), c2(needs_nee),
        c2(c_hit), c2(h_hit), c2(ref_escaped),
    )
    if xp is jnp and getattr(cfg, "pallas_shading", True):
        from ..ops.pallas import shade_resolve

        dir_out, rate_out, new_src, accept2, killed2 = (
            shade_resolve.resolve_tail_jnp(*tail_args)
        )
    else:
        dir_out, rate_out, new_src, accept2, killed2 = resolve_tail(
            xp, *tail_args
        )
    accept = accept2[:, 0]
    killed = killed2[:, 0]
    ray_src = xp.where(accept2, new_src, ray_src)
    out_dir = xp.where(accept2, -cdir_u, out_dir)
    hit_idx = xp.where(accept, c_idx.astype(hit_idx.dtype), hit_idx)
    active = accept

    new_state = (active, ray_src, out_dir, hit_idx, killed)
    out = [new_state, (dir_out, rate_out)]
    if cont_override is not None:
        out.append((c_hit, c_idx, c_t))
    if want_rows:
        out.append((crow, c_mrow))
    return tuple(out) if len(out) > 2 else (out[0], out[1])


def composite(dir_ys, rate_ys, xp):
    """Backward replay-stack fold (PathTrace.cu:1410-1415).

    dir_ys/rate_ys: [D, M, 3]. Init from the top entry itself (for lanes
    still alive at the depth cap the reference starts the fold from the
    last pushed l_dir — which equals the top stack entry)."""
    l = dir_ys[-1]
    d = dir_ys.shape[0]
    for i in range(d - 1, -1, -1):
        l = l * rate_ys[i] + dir_ys[i]
    return l


def trace_radiance(origins, dirs, pixel_id, sample_id, sd, cfg, xp, nearest_fn,
                   with_stats: bool = False):
    """Primary rays -> radiance [M, 3] (render_pixel body, cu:1426-1455).

    with_stats=True also returns the number of *useful* rays traced
    (primary + per-bounce shadow/continuation rays of live lanes) for
    Mrays/sec accounting — masked dead lanes are not counted.
    """
    from ..scene import scene as scene_mod

    m = origins.shape[0]
    d_unit = _unit(dirs, xp)
    ex0 = xp.full((m,), -1, xp.int32)
    hit0, idx0, t0 = nearest_fn(origins, d_unit, ex0)
    sky0 = envmap.sample_env_sd(sd, d_unit, xp, clamp=cfg.hdr_clamp)
    row0 = _tri_rows(sd, xp.where(hit0, idx0, 0))
    le0 = _mat_rows(
        sd, row0[:, scene_mod.TRI_OBJ].astype(xp.int32), xp
    )[:, scene_mod.MAT_EMISSIVE]

    state = (
        hit0,
        origins + d_unit * t0[..., None],
        -d_unit,
        xp.where(hit0, idx0, 0),
        xp.zeros(m, bool),
    )

    rays_per_lane = sd.n_emit + 2  # NEE lights + HDR + continuation

    if xp is jnp:
        def body(carry, b):
            st, nrays = carry
            live = jnp.sum(st[0].astype(jnp.float32))
            st, ys = bounce_step(st, b, pixel_id, sample_id, sd, cfg, jnp,
                                 nearest_fn)
            return (st, nrays + live * rays_per_lane), ys

        (state, n_rays), (dir_ys, rate_ys) = jax.lax.scan(
            body, (state, jnp.float32(m)),
            jnp.arange(cfg.max_depth, dtype=jnp.uint32),
        )
    else:
        dir_list, rate_list = [], []
        n_rays = m
        for b in range(cfg.max_depth):
            n_rays += int(state[0].sum()) * rays_per_lane
            state, (d_b, r_b) = bounce_step(
                state, np.uint32(b), pixel_id, sample_id, sd, cfg, np, nearest_fn
            )
            dir_list.append(d_b)
            rate_list.append(r_b)
        dir_ys = np.stack(dir_list)
        rate_ys = np.stack(rate_list)

    li = composite(dir_ys, rate_ys, xp)
    killed = state[4]
    li = xp.where(killed[..., None], 0.0, li)
    radiance = xp.where(hit0[..., None], le0 + li, sky0)
    if with_stats:
        return radiance, n_rays
    return radiance
