"""Scene argument packing: 49 SceneData buffers -> one blob per dtype.

The axon runtime charges a per-buffer dispatch tax on every jitted-call
argument (tools/argtax.py measures it; docs/PERF.md round-3 attributes
~4 ms/buffer to the same mechanism on while-loop carries). A pool render
call that takes SceneData directly pays that tax 49 times. Packing every
array field into ONE flat buffer per dtype (f32 / i32 / bf16 / ...)
reduces the scene's contribution to a handful of arguments; the unpack
(static slices + reshapes) runs on-device once per call, outside the
bounce loop, and costs only an HBM-bandwidth copy of the tables
(~tens of us for demo-scale scenes).

Mirrors the reference's single flat scene upload (the CUDA build passes
base pointers once, PathTrace.cu render_pixel's parameter block) rather
than its per-array cudaMemcpy stage.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .scene import SceneData

_ARRAY_FIELDS = tuple(
    f.name for f in dataclasses.fields(SceneData)
    if not f.metadata.get("static")
)
_STATIC_FIELDS = tuple(
    f.name for f in dataclasses.fields(SceneData)
    if f.metadata.get("static")
)


def pack_scene(sd: SceneData) -> Tuple[Tuple[jax.Array, ...], tuple]:
    """SceneData -> (blobs, meta).

    ``blobs`` is one flat device array per dtype present (ordered by
    dtype name); ``meta`` is a hashable description (field layout +
    the SceneData static metadata) for :func:`unpack_scene`. Pass
    ``blobs`` through the jit boundary and ``meta`` as a static arg.
    """
    parts: dict = {}
    layout = []
    for name in _ARRAY_FIELDS:
        a = getattr(sd, name)
        key = jnp.dtype(a.dtype).name
        lst = parts.setdefault(key, [])
        off = sum(int(x.size) for x in lst)
        layout.append((name, key, tuple(int(s) for s in a.shape), off))
        lst.append(a.reshape(-1))
    keys = tuple(sorted(parts))
    blobs = tuple(jnp.concatenate(parts[k]) for k in keys)
    statics = tuple((n, getattr(sd, n)) for n in _STATIC_FIELDS)
    meta = (tuple(layout), keys, statics)
    return blobs, meta


def unpack_scene(blobs: Tuple[jax.Array, ...], meta: tuple) -> SceneData:
    """Rebuild a SceneData view from packed blobs (trace-time, static)."""
    layout, keys, statics = meta
    kidx = {k: i for i, k in enumerate(keys)}
    fields = {}
    for name, key, shape, off in layout:
        size = 1
        for s in shape:
            size *= s
        flat = jax.lax.slice(blobs[kidx[key]], (off,), (off + size,))
        fields[name] = flat.reshape(shape)
    fields.update(dict(statics))
    return SceneData(**fields)
