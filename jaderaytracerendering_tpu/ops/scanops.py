"""Scan primitives rebuilt for the TPU cost model.

XLA lowers a length-M cumsum to ~log2(M) kernel passes; on the axon
runtime every unfused pass costs ~30 us of launch overhead, so a 16k
cumsum inside the pool loop paid ~14 launches per bounce. Small integer
scans are exact as MXU matmuls against triangular ones matrices (0/1
inputs and block sums <= 256 are exact in bf16; accumulation is f32),
so a two-level 128-block decomposition does the whole scan in two
matmuls + one add.
"""

from __future__ import annotations

import jax.numpy as jnp

_BLOCK = 128


def cumsum_indicator(x, xp=jnp):
    """Inclusive cumsum of a {0,1} int vector [M] via MXU matmuls.

    Exact for any M < 2^24 (f32-representable totals). Falls back to
    xp.cumsum on the NumPy backend or for non-padding-friendly inputs.
    """
    if xp is not jnp:
        return xp.cumsum(x.astype(xp.int32))
    m = x.shape[0]
    pad = (-m) % _BLOCK
    xf = jnp.concatenate(
        [x.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)]
    ) if pad else x.astype(jnp.float32)
    b = (m + pad) // _BLOCK
    rows = xf.reshape(b, _BLOCK)
    triu = jnp.triu(jnp.ones((_BLOCK, _BLOCK), jnp.float32))
    within = jnp.dot(rows, triu, preferred_element_type=jnp.float32)
    sums = within[:, -1]                                  # [b] block totals
    offs = jnp.dot(sums, jnp.triu(jnp.ones((b, b), jnp.float32), k=1),
                   preferred_element_type=jnp.float32)    # exclusive
    out = (within + offs[:, None]).reshape(-1)[:m]
    return out.astype(jnp.int32)
