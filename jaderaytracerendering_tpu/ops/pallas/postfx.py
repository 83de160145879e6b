"""Pallas TPU kernel: fused progressive-blend + tonemap + gamma + quantize.

Replaces the reference's pass2/pass3 shader chain (pass2.fsh copies into
the accumulation texture, pass3.fsh applies Reinhard + gamma to screen;
the CUDA path fuses ACES + gamma + u8 into the megakernel tail,
PathTrace.cu:1459-1473) with one VMEM pass: radiance-sum -> mean ->
tonemap -> gamma -> u8, no intermediate HBM buffers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams


def _postfx_kernel(accum_ref, count_ref, out_ref, mode: int, g: float,
                   limit: float):
    inv_n = 1.0 / jnp.maximum(count_ref[0], 1.0)
    c = accum_ref[:] * inv_n
    if mode == 0:  # ACES (PathTrace.cu:674-682)
        c = (c * (c * 2.51 + 0.03)) / (c * (c * 2.43 + 0.59) + 0.14)
    elif mode == 1:  # luminance Reinhard (pass3.fsh:8-11)
        lum = 0.3 * c[:, :, 0:1] + 0.6 * c[:, :, 1:2] + 0.1 * c[:, :, 2:3]
        c = c * (1.0 / (1.0 + lum / limit))
    c = jnp.maximum(c, 0.0) ** (1.0 / g)
    c = jnp.clip(c * 255.0, 0.0, 255.0)
    # Mosaic lacks f32->u8 casts; emit i32, narrowed outside the kernel
    out_ref[:] = c.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode", "g", "limit", "interpret"))
def postfx(accum, count, mode: str = "aces", g: float = 2.2,
           limit: float = 1.5, interpret: bool = False):
    """[H, W, 3] radiance sum + sample count -> display u8 RGB [H, W, 3]."""
    mode_i = {"aces": 0, "reinhard": 1, "none": 2}[mode]
    h, w, _ = accum.shape
    kern = functools.partial(_postfx_kernel, mode=mode_i, g=g, limit=limit)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w, 3), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_cparams(),
    )(accum, jnp.asarray(count, jnp.float32).reshape(1))
    return out.astype(jnp.uint8)
