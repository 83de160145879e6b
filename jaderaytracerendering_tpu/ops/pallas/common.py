"""Shared Mosaic compiler parameters for the Pallas kernels.

v5e has 128 MiB of physical VMEM per core; XLA's default *scoped*
limit is 16 MiB. Wide lane tiles (which pack more sublanes per vreg —
tools/subprobe.py: 24 Gflop/s at [1,128] vs 150 at [1,1024]) need
per-tile scratch beyond that default on top of resident scene tables,
so every production kernel raises the Mosaic limit. Keep headroom
below physical for XLA's own scoped buffers.
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
