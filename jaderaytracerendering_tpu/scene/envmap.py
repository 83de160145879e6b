"""Equirectangular environment-map sampling.

Replaces the reference's HDR texture path: direction -> equirect uv
(SampleSphericalMap, PathTrace.cu:686-694 / fshader_render.fsh:101-107),
bilinear filtering with mirror addressing like the CUDA texture refs
(PathTrace.cu:1652-1665), and the radiance clamp to 10.0
(PathTrace.cu:700, fshader_render.fsh:113). The GL path instead uses
nearest/clamp-to-edge textures (PathTrace.cpp:283-287) — available via
``filtering='nearest_clamp'``.

xp-agnostic: the same code drives the NumPy oracle and the jit'd TPU
integrator (gathers become XLA gathers).
"""

from __future__ import annotations


def spherical_uv(v, xp):
    """Unit direction [..., 3] -> equirect uv in [0,1]^2 (v=0 at top)."""
    u = xp.arctan2(v[..., 2], v[..., 0]) / (2.0 * 3.1415926) + 0.5
    w = 1.0 - (xp.arcsin(xp.clip(v[..., 1], -1.0, 1.0)) / 3.1415926 + 0.5)
    return u, w


def _mirror_index(i, n, xp):
    """Mirror (reflect) addressing: ... 2 1 0 0 1 2 ... n-1 n-1 n-2 ..."""
    period = 2 * n
    i = i % period  # floored mod: negatives reflect correctly (-1 -> 0)
    return xp.where(i >= n, period - 1 - i, i)


def sample_env(img, dirs, xp, clamp: float = 10.0, filtering: str = "bilinear_mirror"):
    """Sample env map [H, W, 3] at unit directions [..., 3] -> [..., 3].

    ``clamp``: per-channel radiance limit (10.0 in the reference).
    """
    h, w = img.shape[0], img.shape[1]
    u, v = spherical_uv(dirs, xp)
    if filtering == "bilinear_mirror":
        fx = u * w - 0.5
        fy = v * h - 0.5
        x0 = xp.floor(fx)
        y0 = xp.floor(fy)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        x0i = x0.astype(xp.int32)
        y0i = y0.astype(xp.int32)
        x1i = _mirror_index(x0i + 1, w, xp)
        y1i = _mirror_index(y0i + 1, h, xp)
        x0i = _mirror_index(x0i, w, xp)
        y0i = _mirror_index(y0i, h, xp)
        c00 = img[y0i, x0i]
        c01 = img[y0i, x1i]
        c10 = img[y1i, x0i]
        c11 = img[y1i, x1i]
        color = (
            c00 * (1 - tx) * (1 - ty)
            + c01 * tx * (1 - ty)
            + c10 * (1 - tx) * ty
            + c11 * tx * ty
        )
    elif filtering == "nearest_clamp":
        xi = xp.clip((u * w).astype(xp.int32), 0, w - 1)
        yi = xp.clip((v * h).astype(xp.int32), 0, h - 1)
        color = img[yi, xi]
    else:
        raise ValueError(f"unknown filtering {filtering!r}")
    return xp.minimum(color, clamp)
