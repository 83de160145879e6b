"""Batched ray-primitive intersection math (xp-agnostic).

Two ray-triangle tests are provided:

- ``'shadow'``: the reference's non-standard projection test — project
  the triangle onto the plane through the ray origin perpendicular to the
  ray, test containment by scalar-triple-product signs, then recover the
  hit via a 2D (x,y) barycentric solve (PathTrace.cu:705-754,
  fshader_render.fsh:175-224). Kept for behavioral parity studies; note
  its 2D solve is singular for rays with dir.z ~ 0 (a real reference
  limitation).
- ``'mt'``: Moller-Trumbore, the robust default.

Both use *index exclusion* instead of a t-epsilon to avoid
self-intersection, exactly like the reference (``src_object_idx``
threading, PathTrace.cu:776-786): shading code passes the source
triangle's index and the test skips it.

The slab AABB test matches hitAABB (PathTrace.cu:758-771): returns entry
t, or exit t when the origin is inside, or -1 on miss.
"""

from __future__ import annotations

import contextlib

import numpy as np

from ..core import vecmath as vm

INF = 2147483647.0  # PathTrace.cu:23


def _ieee(xp):
    """IEEE inf/nan from zero divides is intended (JAX semantics);
    silence NumPy's warnings so the oracle matches quietly."""
    if xp is np:
        return np.errstate(divide="ignore", invalid="ignore")
    return contextlib.nullcontext()


def ray_triangle(origins, dirs, p1, p2, p3, xp, method: str = "mt"):
    """Intersect rays with triangles (shapes broadcast; typically
    origins/dirs [..., 3] vs p1/p2/p3 [..., 3]).

    ``dirs`` must be normalized. Returns (hit_mask [...], t [...]) with
    t = distance along the unit direction; t is INF where hit is False.
    """
    with _ieee(xp):
        return _ray_triangle(origins, dirs, p1, p2, p3, xp, method)


def _ray_triangle(origins, dirs, p1, p2, p3, xp, method):
    if method == "mt":
        e1 = p2 - p1
        e2 = p3 - p1
        h = vm.cross(dirs, e2, xp)
        a = vm.dot_s(e1, h, xp)
        # no epsilon culling: parallel rays give a=0 -> inf/nan, rejected
        # by the comparisons below, mirroring the reference's behavior of
        # relying on sign tests rather than epsilons.
        f = 1.0 / a
        s = origins - p1
        u = f * vm.dot_s(s, h, xp)
        q = vm.cross(s, e1, xp)
        v = f * vm.dot_s(dirs, q, xp)
        t = f * vm.dot_s(e2, q, xp)
        hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    elif method == "shadow":
        nd = dirs
        sa = p1 - nd * vm.dot(nd, p1 - origins, xp)
        sb = p2 - nd * vm.dot(nd, p2 - origins, xp)
        sc = p3 - nd * vm.dot(nd, p3 - origins, xp)
        pa = sa - origins
        pb = sb - origins
        pc = sc - origins
        papb = vm.mixed_product(nd, pa, pb, xp)
        pbpc = vm.mixed_product(nd, pb, pc, xp)
        pcpa = vm.mixed_product(nd, pc, pa, xp)
        inside = ((papb > 0) & (pbpc > 0) & (pcpa > 0)) | (
            (papb < 0) & (pbpc < 0) & (pcpa < 0)
        )
        b = sb - sa
        c = sc - sa
        av = origins - sa
        divider = b[..., 0] * c[..., 1] - b[..., 1] * c[..., 0]
        inv = 1.0 / divider
        rate_a = (c[..., 1] * av[..., 0] - c[..., 0] * av[..., 1]) * inv
        rate_b = (-b[..., 1] * av[..., 0] + b[..., 0] * av[..., 1]) * inv
        hitp = p1 + (p2 - p1) * rate_a[..., None] + (p3 - p1) * rate_b[..., None]
        t = vm.dot_s(hitp - origins, nd, xp)
        hit = inside & (t > 0.0)
    else:
        raise ValueError(f"unknown intersector {method!r}")
    t = xp.where(hit, t, INF)
    return hit, t


def ray_aabb(origins, dirs, aa, bb, xp):
    """Slab test (PathTrace.cu:758-771). Returns (enter, dist) where
    ``dist`` reproduces the reference's return (entry t, exit t if inside,
    -1 on miss) and ``enter = max(t0, 0)`` supports ordered pruning."""
    with _ieee(xp):
        return _ray_aabb(origins, dirs, aa, bb, xp)


def _ray_aabb(origins, dirs, aa, bb, xp):
    invdir = 1.0 / dirs
    f = (bb - origins) * invdir
    n = (aa - origins) * invdir
    # 0 * inf -> NaN when a zero-direction ray starts exactly on a slab
    # plane. The reference's vec3 max/min are ternaries (a > b ? a : b,
    # PathTrace.cu:484-494) and its scalar reductions fminf/fmaxf DROP
    # NaN operands (PathTrace.cu:766-767), so a NaN axis falls out of
    # both reductions: a ray on the AA plane ignores that slab (hit via
    # the other axes) while one on the BB plane misses. jnp/np min/max
    # propagate NaN (always-miss) — reproduce the reference exactly:
    # where() matches the ternary, the isnan() replacement the fminf.
    tmax = xp.where(f > n, f, n)
    tmin = xp.where(f < n, f, n)
    pinf = xp.asarray(xp.inf, f.dtype)
    t1 = xp.min(xp.where(xp.isnan(tmax), pinf, tmax), axis=-1)
    t0 = xp.max(xp.where(xp.isnan(tmin), -pinf, tmin), axis=-1)
    dist = xp.where(t1 >= t0, xp.where(t0 > 0.0, t0, t1), -1.0)
    enter = xp.maximum(t0, 0.0)
    return enter, dist
