"""Regenerate the committed golden images (CPU backend, fixed seeds).

Run deliberately — ONLY when a semantic change is intended and has been
re-verified against the reference (see tests/test_goldens.py docstring):

    python tests/goldens/regen.py

The configs here must stay in sync with tests/test_goldens.py.
"""

import os

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp  # noqa: E402

from jaderaytracerendering_tpu.integrator import render as R  # noqa: E402
from jaderaytracerendering_tpu.models import demo  # noqa: E402
from jaderaytracerendering_tpu.scene.scene import assemble  # noqa: E402
from jaderaytracerendering_tpu.utils.config import RenderConfig  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def scenes():
    ds = demo.diffuse_scene(n_buddha_tris=400, env_shape=(16, 32))
    yield "diffuse_12x12_4spp.npy", ds, RenderConfig(
        width=12, height=12, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5)
    yield "diffuse_64x64_4spp.npy", ds, RenderConfig(
        width=64, height=64, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5)

    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    yield "jade_10x10_4spp.npy", ds, RenderConfig(
        width=10, height=10, spp=4, spp_batch=4, max_depth=5,
        traversal="bvh", engine="pool", rays_per_launch=64, seed=5)
    yield "jade_64x64_4spp.npy", ds, RenderConfig(
        width=64, height=64, spp=4, spp_batch=4, max_depth=5,
        traversal="bvh", engine="pool", rays_per_launch=4096, seed=5)

    ds = demo.cornell_scene()
    yield "cornell_10x10_4spp.npy", ds, RenderConfig(
        width=10, height=10, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5)
    yield "cornell_64x64_4spp.npy", ds, RenderConfig(
        width=64, height=64, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5)


def main():
    for name, ds, cfg in scenes():
        sd = jax.tree.map(jnp.asarray, assemble(ds.objects, ds.env_map, xp=np))
        img = np.asarray(R.render_film(sd, ds.camera, cfg).mean())
        np.save(os.path.join(HERE, name), img)
        print(f"wrote {name}  mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
