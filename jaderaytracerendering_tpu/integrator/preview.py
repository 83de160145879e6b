"""Preview integrator: the cheap 2-bounce path tracer.

Mirrors pathTracing_ in the interactive preview shader
(fshader_preview.fsh:332-375): uniform-hemisphere bounces with pdf 1/2pi,
multiplicative ``history`` throughput, emissive + sky accumulation, and
*no* NEE shadow rays — the cost profile that gives the reference its
interactive FPS. Used by the preview CLI per progressive frame; the full
wavefront integrator (wavefront.py) is the offline/'R-key' path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import rng, vecmath as vm
from ..scene import envmap, scene as scene_mod
from . import sampling
from .sampling import PI
from .wavefront import _mat_rows, _tri_rows, _unit

S = rng.DrawSites


def trace_preview(origins, dirs, pixel_id, sample_id, sd, cfg, xp, nearest_fn,
                  max_bounce: int = 2):
    """Primary rays -> radiance [M, 3] at preview quality."""
    m = origins.shape[0]
    d_unit = _unit(dirs, xp)
    ex0 = xp.full((m,), -1, xp.int32)
    hit0, idx0, t0 = nearest_fn(origins, d_unit, ex0)
    sky0 = envmap.sample_env_sd(sd, d_unit, xp, clamp=cfg.hdr_clamp)

    row0 = _tri_rows(sd, xp.where(hit0, idx0, 0))
    le0 = _mat_rows(sd, row0[:, scene_mod.TRI_OBJ].astype(xp.int32), xp)[
        :, scene_mod.MAT_EMISSIVE
    ]

    lo = xp.zeros((m, 3), xp.float32)
    history = xp.ones((m, 3), xp.float32)
    active = hit0
    point = origins + d_unit * t0[..., None]
    view_dir = d_unit  # incoming direction (toward the surface)
    tri = xp.where(hit0, idx0, 0)

    for b in range(max_bounce):
        trow = _tri_rows(sd, tri)
        normal = trow[:, scene_mod.TRI_NORM]
        obj = trow[:, scene_mod.TRI_OBJ].astype(xp.int32)
        brdf = _mat_rows(sd, obj, xp)[:, scene_mod.MAT_BRDF]
        u1 = rng.uniform(xp, pixel_id, sample_id, b + 1, S.CONT_COS, cfg.seed)
        u2 = rng.uniform(xp, pixel_id, sample_id, b + 1, S.CONT_PHI, cfg.seed)
        wi = sampling.uniform_sphere(u1, u2, xp)
        # fold away from the view direction (fshader_preview.fsh:343-345)
        flip = vm.dot(wi, normal, xp) * vm.dot(view_dir, normal, xp) > 0
        wi = xp.where(flip, -wi, wi)
        wi = xp.where(active[..., None], wi, 0.0)

        hit, idx, t = nearest_fn(point, wi, xp.where(active, tri, -2))
        nrow = _tri_rows(sd, xp.where(hit, idx, 0))
        n_emis = _mat_rows(sd, nrow[:, scene_mod.TRI_OBJ].astype(xp.int32), xp)[
            :, scene_mod.MAT_EMISSIVE
        ]
        cos_i = xp.abs(vm.dot(wi, normal, xp))
        f_r = brdf * (1.0 / PI)
        weight = f_r * cos_i * (2.0 * PI)  # / pdf = * 2pi

        sky = envmap.sample_env_sd(sd, _unit(wi, xp), xp, clamp=cfg.hdr_clamp)
        miss = active & ~hit
        lo = lo + xp.where(miss[..., None], history * sky * weight, 0.0)
        lo = lo + xp.where((active & hit)[..., None], history * n_emis * weight, 0.0)

        history = xp.where((active & hit)[..., None], history * weight, history)
        point = xp.where((active & hit)[..., None], point + _unit(wi, xp) * t[..., None], point)
        view_dir = xp.where((active & hit)[..., None], _unit(wi, xp), view_dir)
        tri = xp.where(active & hit, idx, tri)
        active = active & hit

    return xp.where(hit0[..., None], le0 + lo, sky0)
