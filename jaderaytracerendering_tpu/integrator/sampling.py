"""Sampling primitives shared by the wavefront integrator and CPU oracle.

Each helper reproduces one sampling idiom of the reference megakernel
(PathTrace.cu:905-1416) exactly — including its quirks, which are load-
bearing for CPU-vs-TPU parity:

- uniform sphere directions from (cos_theta, phi) draws
  (PathTrace.cu:968-971);
- triangle point sampling with the u+v>1 fold (PathTrace.cu:936-941);
- hemisphere folding by sign product tests (PathTrace.cu:972-974);
- Schlick Fresnel: entry form R0 + (1-R0)(1-c)^5 (PathTrace.cu:1069) and
  the reference's *exit* form R0 - (1-R0)(1-c)^5 (PathTrace.cu:1102,
  1127, 1157, 1212 — note the minus sign; kept verbatim for parity);
- the dipole-style BSSRDF (e^{-d/s} + e^{-d/(3s)}) / (s * 8 pi d)
  (PathTrace.cu:1062-1063);
- Cg-style refraction with total-internal-reflection flag
  (gen_refract_ray, PathTrace.cu:876-894);
- the per-object area-CDF binary search for BSSRDF exit points
  (PathTrace.cu:1031-1048), vectorized as a masked fixed-iteration
  bisection (data-dependent loops can't live under jit).
"""

from __future__ import annotations

from ..core import rng, vecmath as vm

PI = 3.1415926  # the reference's PI (PathTrace.cu:36)


def uniform_sphere(u_cos, u_phi, xp):
    """Unit direction from two U[0,1) draws (PathTrace.cu:968-971)."""
    cos_t = 2.0 * (u_cos - 0.5)
    sin_t = xp.sqrt(xp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u_phi
    return xp.stack([sin_t * xp.cos(phi), sin_t * xp.sin(phi), cos_t], axis=-1)


def fold_same_hemisphere(d, normal, reference, xp):
    """Flip d so sign(d.n) == sign(reference.n) (PathTrace.cu:972-974)."""
    flip = vm.dot(d, normal, xp) * vm.dot(reference, normal, xp) < 0
    return xp.where(flip, -d, d)


def fold_opposite_hemisphere(d, normal, reference, xp):
    """Flip d so sign(d.n) != sign(reference.n) (PathTrace.cu:1140-1142)."""
    flip = vm.dot(d, normal, xp) * vm.dot(reference, normal, xp) > 0
    return xp.where(flip, -d, d)


def triangle_point(p1, p2, p3, u, v, xp):
    """Uniform point via folded barycentrics (PathTrace.cu:936-945)."""
    over = u + v > 1.0
    u = xp.where(over, 1.0 - u, u)
    v = xp.where(over, 1.0 - v, v)
    return p1 + (p2 - p1) * u[..., None] + (p3 - p1) * v[..., None]


def schlick_r0(ior, xp=None):
    """R0 = ((ior-1)/(ior+1))^2 (PathTrace.cu:1066, 1184)."""
    r = (ior - 1.0) / (ior + 1.0)
    return r * r


def fresnel_entry(r0, cos_abs):
    """R0 + (1-R0)(1-|c|)^5 (PathTrace.cu:1067-1069)."""
    oc = 1.0 - cos_abs
    oc2 = oc * oc
    return r0 + (1.0 - r0) * oc2 * oc2 * oc


def fresnel_exit(r0, cos_abs):
    """R0 - (1-R0)(1-|c|)^5 — the reference's sign (PathTrace.cu:1100-1102)."""
    oc = 1.0 - cos_abs
    oc2 = oc * oc
    return r0 - (1.0 - r0) * oc2 * oc2 * oc


def bssrdf(dist, sigma, xp):
    """Dipole-style profile (PathTrace.cu:1062-1063).

    (e^{-d/sigma} + e^{-(d/3)/sigma}) / (sigma * 8 pi d), componentwise
    over the 3-channel sigma (= material refract_rate). dist [...]
    unsqueezed against sigma [..., 3].
    """
    d = dist[..., None]
    return (xp.exp(-d / sigma) + xp.exp(-(d / 3.0) / sigma)) / (
        sigma * (8.0 * PI) * d
    )


def refract_dir(d_in, normal, eta, xp):
    """Cg-style refraction (gen_refract_ray, PathTrace.cu:876-894).

    d_in points *into* the surface. Returns (dir, full_reflex): on total
    internal reflection the reference returns d_in unchanged and sets the
    flag. All lanes computed, selected by mask.
    """
    cosi = vm.dot(d_in, normal, xp)
    n = xp.where(cosi > 0, -normal, normal)
    cosi = xp.abs(cosi)
    cost2 = 1.0 - eta * eta * (1.0 - cosi * cosi)
    full_reflex = cost2[..., 0] <= 0
    safe = xp.sqrt(xp.maximum(cost2, 0.0))
    refracted = d_in * eta + n * (eta * cosi - safe)
    return xp.where(full_reflex[..., None], d_in, refracted), full_reflex


def area_cdf_pick(u, obj_id, prefix_area, obj_total_area, seg_begin, seg_end,
                  mapping, xp, n_iters: int = 32):
    """Pick an exit triangle on the object by area (PathTrace.cu:1031-1048).

    Reproduces the reference's bisection over the load-order prefix-sum
    table: left/right start at the object's segment bounds, loop while
    left < right-1 moving toward the target, and the *final middle* is
    taken (then translated through mapping to the BVH-sorted index). A
    fixed iteration count replaces the data-dependent while loop; 32
    halvings cover any segment length < 2^32.
    """
    target = u * obj_total_area[obj_id]
    left = seg_begin[obj_id]
    right = seg_end[obj_id]
    middle = xp.zeros_like(left)
    for _ in range(n_iters):
        go = left < right - 1
        m = (left + right) // 2
        middle = xp.where(go, m, middle)
        le = target <= prefix_area[m]
        right = xp.where(go & le, m, right)
        # reference uses `else if (>=)`: strict complement except equality,
        # where the first branch wins
        left = xp.where(go & ~le, m, left)
    return mapping[middle]
