"""Tone mapping and quantization.

- ACES filmic with the reference's constants 2.51/0.03/2.43/0.59/0.14
  (PathTrace.cu:674-682) — the CUDA output path;
- luminance Reinhard with limit 1.5 and weights (0.3, 0.6, 0.1)
  (pass3.fsh:8-11, PathTrace.cu:669-672) — the GL pass3 path;
- gamma 2.2 and the *255 clamp-to-u8 quantize (PathTrace.cu:1464-1473).

xp-agnostic so post can run fused on-device after the integrator or on
host over a saved film.
"""

from __future__ import annotations


def aces(color, xp=None):
    """ACES filmic curve (PathTrace.cu:680-682)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return (color * (color * a + b)) / (color * (color * c + d) + e)


def reinhard_luminance(color, xp, limit: float = 1.5):
    """Luminance Reinhard (pass3.fsh:8-11)."""
    lum = 0.3 * color[..., 0] + 0.6 * color[..., 1] + 0.1 * color[..., 2]
    return color * (1.0 / (1.0 + lum / limit))[..., None]


def gamma(color, xp, g: float = 2.2):
    """Gamma encode (PathTrace.cu:1464-1466)."""
    return xp.maximum(color, 0.0) ** (1.0 / g)


def tonemap(color, xp, mode: str = "aces"):
    if mode == "aces":
        return aces(color, xp)
    if mode == "reinhard":
        return reinhard_luminance(color, xp)
    if mode == "none":
        return color
    raise ValueError(f"unknown tonemap {mode!r}")


def quantize_u8(color, xp):
    """[0,1]-ish float -> u8 with the reference's clamp (cu:1468-1473)."""
    v = color * 255.0
    return xp.clip(v, 0.0, 255.0).astype(xp.uint8)


def finalize(radiance, xp, mode: str = "aces", g: float = 2.2):
    """Mean radiance -> display u8 RGB [H, W, 3]."""
    return quantize_u8(gamma(tonemap(radiance, xp, mode), xp, g), xp)
