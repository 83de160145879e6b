"""Film: progressive accumulation state.

The reference keeps the running average in the ``lastFrame`` texture and
blends each new frame with ``mix(last, new, 1/(frameCounter+1))``
(fshader_preview.fsh:402-403, pass2.fsh:9); any camera movement resets
``frameCounter`` (PathTrace.cpp:743-800). Here the film is an explicit
(accum_radiance_sum, sample_count) pair — a pytree that can be donated to
jit, sharded across a device mesh, and checkpointed to disk for bitwise
resume (the reference's nearest analogue to checkpoint/resume, SURVEY §5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Film:
    """Running radiance sum over samples; mean = accum / count."""

    accum: jax.Array  # [H, W, 3] float32 radiance sum
    count: jax.Array  # [] int32 samples accumulated per pixel

    @staticmethod
    def create(height: int, width: int) -> "Film":
        return Film(
            accum=jnp.zeros((height, width, 3), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def add(self, radiance_sum: jax.Array, n_samples) -> "Film":
        """Accumulate a batch's radiance *sum* over n_samples spp."""
        return Film(
            accum=self.accum + radiance_sum,
            count=self.count + jnp.asarray(n_samples, jnp.int32),
        )

    def reset(self) -> "Film":
        """Camera moved: restart progressive accumulation."""
        return Film(accum=jnp.zeros_like(self.accum), count=jnp.zeros_like(self.count))

    def mean(self) -> jax.Array:
        """Current radiance estimate [H, W, 3]."""
        return self.accum / jnp.maximum(self.count, 1).astype(jnp.float32)

    # -- checkpoint / resume ------------------------------------------------

    def save(self, path: str) -> None:
        np.savez(
            path, accum=np.asarray(self.accum), count=np.asarray(self.count)
        )

    @staticmethod
    def load(path: str) -> "Film":
        data = np.load(path)
        return Film(accum=jnp.asarray(data["accum"]), count=jnp.asarray(data["count"]))
