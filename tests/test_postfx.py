"""Fused Pallas postfx kernel vs the reference numpy post path."""

import numpy as np
import jax.numpy as jnp
import pytest

from jaderaytracerendering_tpu.ops.pallas import postfx
from jaderaytracerendering_tpu.post import tonemap


@pytest.mark.parametrize("mode", ["aces", "reinhard", "none"])
def test_postfx_matches_numpy(mode):
    rng = np.random.default_rng(1)
    accum = rng.uniform(0, 40, (16, 128, 3)).astype(np.float32)
    count = 4
    want = tonemap.finalize(accum / count, np, mode)
    got = np.asarray(postfx.postfx(jnp.asarray(accum), count, mode,
                                   interpret=True))
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()


def test_postfx_zero_count_guard():
    accum = np.zeros((8, 128, 3), np.float32)
    got = np.asarray(postfx.postfx(jnp.asarray(accum), 0, "aces", interpret=True))
    assert (got == 0).all()
