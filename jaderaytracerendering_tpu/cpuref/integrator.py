"""CPU reference integrator: the correctness oracle.

A deliberately *branchy, per-path* NumPy transcription of the CUDA
megakernel's control flow (pathTracing, PathTrace.cu:905-1416) — real
if/else per bounce, a real Python replay stack — sharing nothing with
integrator/wavefront.py except the primitive sampling helpers and the
site-keyed RNG. Because draws are keyed by (pixel, sample, bounce, site)
rather than sequence, this oracle consumes bit-identical random streams
to the masked wavefront, so the two must agree to float precision; any
larger gap is a masking/selection bug in the wavefront (SURVEY §4
integration-test row).

Slow by design; use only on small films.
"""

from __future__ import annotations

import numpy as np

from ..core import camera as camera_mod, rng, vecmath as vm
from ..ops import bruteforce
from ..scene import envmap
from ..integrator import sampling
from ..integrator.sampling import PI

S = rng.DrawSites


def _nearest1(o, d, exclude, sd):
    h, i, t = bruteforce.nearest_hit_np(
        o[None].astype(np.float32),
        d[None].astype(np.float32),
        np.array([exclude], np.int32),
        sd.tri_p1, sd.tri_p2, sd.tri_p3,
    )
    return bool(h[0]), int(i[0]), float(t[0])


def _sky(d, sd, cfg):
    return envmap.sample_env(
        sd.env_map, vm.normalize(d[None].astype(np.float32), np), np,
        clamp=cfg.hdr_clamp,
    )[0]


def _u(pixel, sample, bounce, site, seed):
    return float(rng.uniform(np, np.uint32(pixel), np.uint32(sample),
                             np.uint32(bounce), np.uint32(site), seed))


def _sphere_dir(u1, u2):
    return sampling.uniform_sphere(np.float32(u1), np.float32(u2), np)


def _tri_point(sd, tri, u, v):
    return sampling.triangle_point(
        sd.tri_p1[tri], sd.tri_p2[tri], sd.tri_p3[tri],
        np.float32(u), np.float32(v), np,
    )


def _nee_lights(sd, cfg, src, src_norm, out_dir, exclude, f_term, pixel,
                sample, b, gate, exit_mode=False, r0=0.0, bss=None,
                total_area=0.0):
    """NEE loop over emissive triangles (PathTrace.cu:934-963 diffuse form,
    1074-1107 exit form). Returns the radiance sum."""
    acc = np.zeros(3, np.float32)
    for i in range(sd.n_emit):
        uu = _u(pixel, sample, b + 1, S.LIGHT_BASE + 2 * i, cfg.seed)
        vv = _u(pixel, sample, b + 1, S.LIGHT_BASE + 2 * i + 1, cfg.seed)
        emit_tri = int(sd.emit_idx[i])
        lp = _tri_point(sd, emit_tri, uu, vv)
        ldir = lp - src
        if gate and float(np.dot(ldir, src_norm)) * float(np.dot(out_dir, src_norm)) < 0:
            continue
        hit, idx, _ = _nearest1(src, ldir, exclude, sd)
        if not (hit and idx == emit_tri):
            continue
        le = sd.mat_emissive[sd.tri_obj[emit_tri]]
        ln = sd.tri_norm[emit_tri]
        d2 = float(np.dot(ldir, ldir))
        area = float(vm.triangle_area(sd.tri_p1[emit_tri], sd.tri_p2[emit_tri],
                                      sd.tri_p3[emit_tri], np))
        geom = abs(float(np.dot(src_norm, ldir)) * float(np.dot(ln, ldir))) / d2 / d2 * area
        if exit_mode:
            lu = ldir / np.sqrt(d2)
            fo = sampling.fresnel_exit(r0, abs(float(np.dot(lu, src_norm))))
            acc = acc + le * fo * bss * geom / PI * total_area
        else:
            acc = acc + le * f_term * geom
    return acc


def trace_path(first_idx, first_point, out_dir, pixel, sample, sd, cfg):
    """Transcription of pathTracing for one path. Returns Li (3,)."""
    stack = []  # (l_dir, rate) pairs
    ray_src = first_point.astype(np.float32)
    out_direction = out_dir.astype(np.float32)
    obj_hit = int(first_idx)
    l_dir = np.zeros(3, np.float32)
    u = lambda b, s: _u(pixel, sample, b + 1, s, cfg.seed)

    for b in range(cfg.max_depth):
        tri = obj_hit
        obj = int(sd.tri_obj[tri])
        normal = sd.tri_norm[tri]
        emissive = sd.mat_emissive[obj]
        if (emissive > 1.4e-5).any():  # cu:916-919
            l_dir = emissive.copy()
            break
        l_dir = np.zeros(3, np.float32)
        fr = sd.mat_brdf[obj] / PI
        refract_mode = int(sd.mat_refract[obj])
        k = 2.0 if refract_mode != 0 else 1.0
        u_sel = u(b, S.SELECT_REFRACT)

        if u_sel < 0.5 and refract_mode != 0:
            if refract_mode == 1:  # SUB_SURFACE
                u_sss = u(b, S.SELECT_SSS)
                if u_sss < cfg.sss_rate:
                    # ---- SSS entry (cu:927-1028) ----
                    fr_alb = sd.mat_refract_albedo[obj] / PI
                    l_dir = l_dir + _nee_lights(
                        sd, cfg, ray_src, normal, out_direction, tri, fr_alb,
                        pixel, sample, b, gate=True,
                    )
                    hdir = _sphere_dir(u(b, S.HDR_COS), u(b, S.HDR_PHI))
                    if float(np.dot(hdir, normal)) * float(np.dot(out_direction, normal)) < 0:
                        hdir = -hdir
                    hh, _, _ = _nearest1(ray_src, hdir, tri, sd)
                    if not hh:
                        l_dir = l_dir + _sky(hdir, sd, cfg) * fr_alb * abs(
                            float(np.dot(normal, hdir))) * 2 * PI
                    l_dir = l_dir * (k / cfg.sss_rate)
                    if u(b, S.RR) < cfg.rr_rate:
                        c = _sphere_dir(u(b, S.CONT_COS), u(b, S.CONT_PHI))
                        if float(np.dot(c, normal)) * float(np.dot(out_direction, normal)) < 0:
                            c = -c
                        h2, i2, t2 = _nearest1(ray_src, c, tri, sd)
                        em2 = sd.mat_emissive[sd.tri_obj[i2]]
                        if h2 and (em2 < 1.5e-4).all():
                            rate = fr * abs(float(np.dot(-c, normal))) / cfg.rr_rate
                            stack.append((l_dir, rate * (k / cfg.sss_rate)))
                            ray_src = ray_src + c * t2
                            out_direction = -c
                            obj_hit = i2
                        else:
                            break
                    else:
                        break
                else:
                    # ---- SSS exit random walk (cu:1029-1178) ----
                    exit_tri = int(sampling.area_cdf_pick(
                        np.float32(u(b, S.AREA_CDF)), np.int64(obj),
                        sd.prefix_area, sd.obj_total_area, sd.seg_begin,
                        sd.seg_end, sd.mapping, np,
                    ))
                    ep = _tri_point(sd, exit_tri, u(b, S.EXIT_U), u(b, S.EXIT_V))
                    en = sd.tri_norm[exit_tri]
                    inner = ep - ray_src
                    dist = float(np.linalg.norm(inner))
                    sigma = sd.mat_refract_rate[sd.tri_obj[exit_tri]]
                    bss = sampling.bssrdf(np.float32(max(dist, 1e-12)), sigma, np)
                    r0 = sampling.schlick_r0(float(sd.mat_refract_index[obj]))
                    bss = bss * sampling.fresnel_entry(
                        r0, abs(float(np.dot(normal, out_direction))))
                    total_area = float(sd.obj_total_area[sd.tri_obj[exit_tri]])
                    l_dir = l_dir + _nee_lights(
                        sd, cfg, ep, en, out_direction, exit_tri, None,
                        pixel, sample, b, gate=False, exit_mode=True, r0=r0,
                        bss=bss, total_area=total_area,
                    )
                    hdir = _sphere_dir(u(b, S.HDR_COS), u(b, S.HDR_PHI))
                    if float(np.dot(hdir, en)) * float(np.dot(inner, en)) < 0:
                        hdir = -hdir
                    hh, _, _ = _nearest1(ep, hdir, exit_tri, sd)
                    if not hh:
                        fo = sampling.fresnel_exit(r0, abs(float(np.dot(hdir, en))))
                        l_dir = l_dir + _sky(hdir, sd, cfg) * fo * bss * abs(
                            float(np.dot(en, hdir))) * 2  # cu:1130
                    l_dir = l_dir * (k / (1 - cfg.sss_rate))
                    c = _sphere_dir(u(b, S.CONT_COS), u(b, S.CONT_PHI))
                    if float(np.dot(c, en)) * float(np.dot(inner, en)) > 0:
                        c = -c  # cu:1140-1142
                    if u(b, S.RR) < cfg.rr_rate:
                        h2, i2, t2 = _nearest1(ep, c, exit_tri, sd)
                        em2 = sd.mat_emissive[sd.tri_obj[i2]]
                        if h2 and (em2 < 1.5e-4).all():
                            back = -c
                            fo = sampling.fresnel_exit(r0, abs(float(np.dot(back, en))))
                            rate = bss * fo * abs(float(np.dot(back, en))) \
                                * total_area * 2 / cfg.rr_rate
                            stack.append((l_dir, rate * (k / (1 - cfg.sss_rate))))
                            ray_src = ep + c * t2
                            out_direction = back
                            obj_hit = i2
                        else:
                            break
                    else:
                        break
            else:
                # ---- direct refraction (cu:1180-1262) ----
                miu = float(sd.mat_refract_index[obj])
                r0 = sampling.schlick_r0(miu)
                fi = sampling.fresnel_entry(r0, abs(float(np.dot(normal, out_direction))))
                rdir, _ = sampling.refract_dir(
                    -out_direction[None], normal[None], 1.0 / miu, np)
                rdir = rdir[0]
                rate = np.full(3, 1.0 - fi, np.float32)
                src = ray_src
                excl = tri
                escaped = exited = False
                for i in range(cfg.max_refract_bounces):
                    hh, ii, tt = _nearest1(src, rdir, excl, sd)
                    if not hh:
                        escaped = True
                        break
                    n_i = sd.tri_norm[ii]
                    new_rdir, full_reflex = sampling.refract_dir(
                        vm.normalize(rdir[None], np), n_i[None], miu, np)
                    new_rdir = new_rdir[0]
                    full_reflex = bool(full_reflex[0])
                    rate = rate * sd.mat_refract_rate[sd.tri_obj[ii]] ** tt
                    src = src + vm.normalize(rdir[None], np)[0] * tt
                    fo = sampling.fresnel_exit(r0, abs(float(np.dot(new_rdir, n_i))))
                    excl = ii
                    if full_reflex or u(b, S.REFRACT_BASE + i) < cfg.internal_reflect_rate:
                        rdir = new_rdir - n_i * (2 * float(np.dot(new_rdir, n_i)))
                        if not full_reflex:
                            rate = rate * fo * 5.0
                    else:
                        rate = rate * (1.0 - fo) * 1.25
                        rdir = new_rdir
                        exited = True
                        break
                if escaped:
                    return np.zeros(3, np.float32)  # cu:1231 kills the path
                if u(b, S.RR) < cfg.rr_rate:
                    h2, i2, t2 = _nearest1(src, rdir, excl, sd)
                    if h2:
                        cu = vm.normalize(rdir[None], np)[0]
                        stack.append((np.zeros(3, np.float32),
                                      rate * (k / cfg.rr_rate)))
                        ray_src = src + cu * t2
                        out_direction = -cu
                        obj_hit = i2
                    else:
                        l_dir = _sky(rdir, sd, cfg) * rate * (k / cfg.rr_rate)
                        break
                else:
                    break
        else:
            if int(sd.mat_reflex[obj]) == 0:
                # ---- diffuse (cu:1266-1363) ----
                l_dir = l_dir + _nee_lights(
                    sd, cfg, ray_src, normal, out_direction, tri, fr,
                    pixel, sample, b, gate=True,
                )
                hdir = _sphere_dir(u(b, S.HDR_COS), u(b, S.HDR_PHI))
                if float(np.dot(hdir, normal)) * float(np.dot(out_direction, normal)) < 0:
                    hdir = -hdir
                hh, _, _ = _nearest1(ray_src, hdir, tri, sd)
                if not hh:
                    l_dir = l_dir + _sky(hdir, sd, cfg) * fr * abs(
                        float(np.dot(normal, hdir))) * 2 * PI
                l_dir = l_dir * k
                if u(b, S.RR) < cfg.rr_rate:
                    c = _sphere_dir(u(b, S.CONT_COS), u(b, S.CONT_PHI))
                    if float(np.dot(c, normal)) * float(np.dot(out_direction, normal)) < 0:
                        c = -c
                    h2, i2, t2 = _nearest1(ray_src, c, tri, sd)
                    em2 = sd.mat_emissive[sd.tri_obj[i2]]
                    if h2 and (em2 < 1.5e-4).all():
                        rate = fr * abs(float(np.dot(-c, normal))) / cfg.rr_rate
                        stack.append((l_dir, rate * k))
                        ray_src = ray_src + c * t2
                        out_direction = -c
                        obj_hit = i2
                    else:
                        break
                else:
                    break
            else:
                # ---- mirror (cu:1365-1405) ----
                if u(b, S.RR) < cfg.rr_rate:
                    refl = normal * (2 * float(np.dot(out_direction, normal))) - out_direction
                    h2, i2, t2 = _nearest1(ray_src, refl, tri, sd)
                    if h2:
                        cu = vm.normalize(refl[None], np)[0]
                        stack.append((np.zeros(3, np.float32),
                                      fr * (k / (cfg.rr_rate / PI))))
                        ray_src = ray_src + cu * t2
                        out_direction = -cu
                        obj_hit = i2
                    else:
                        l_dir = _sky(refl, sd, cfg) * fr * (k / (cfg.rr_rate / PI))
                        break
                else:
                    break

    for d, r in reversed(stack):  # cu:1410-1415
        l_dir = l_dir * r + d
    return l_dir


def render_radiance(sd, cam, cfg) -> np.ndarray:
    """Scalar-oracle render -> [H, W, 3] mean radiance (small films only)."""
    npix = cfg.width * cfg.height
    out = np.zeros((npix, 3), np.float32)
    for pix in range(npix):
        for s in range(cfg.spp):
            o, d = camera_mod.generate_rays(
                np, cam.eye, cam.camera_rotate, cfg.width, cfg.height,
                np.array([pix], np.uint32), np.uint32(s), cfg.seed, cfg.jitter,
            )
            o, d = o[0], d[0]
            hit, idx, t = _nearest1(o, d, -1, sd)
            if not hit:
                out[pix] += _sky(d, sd, cfg)
                continue
            le = sd.mat_emissive[sd.tri_obj[idx]]
            li = trace_path(idx, o + d * t, -d, pix, s, sd, cfg)
            out[pix] += le + li
    return (out / cfg.spp).reshape(cfg.height, cfg.width, 3)
