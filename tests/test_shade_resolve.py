"""The fused Pallas shade-resolve kernel (ops/pallas/shade_resolve.py)
must match the plain XLA resolve_tail path — same code, two lowerings.
Runs interpreted on the CPU backend."""

import numpy as np
import jax
import jax.numpy as jnp

from jaderaytracerendering_tpu.integrator import render as R
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.scene.scene import assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig


def test_pallas_resolve_matches_xla():
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = jax.tree.map(jnp.asarray, assemble(ds.objects, ds.env_map, xp=np))
    base = RenderConfig(width=10, height=10, spp=4, spp_batch=4, max_depth=5,
                        traversal="bvh", engine="pool", rays_per_launch=256,
                        seed=5)
    a = np.asarray(R.render_film(sd, ds.camera,
                                 base.replace(pallas_shading=False)).mean())
    b = np.asarray(R.render_film(sd, ds.camera,
                                 base.replace(pallas_shading=True)).mean())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3)


def test_pallas_resolve_scan_engine():
    ds = demo.diffuse_scene(n_buddha_tris=300, env_shape=(16, 32))
    sd = jax.tree.map(jnp.asarray, assemble(ds.objects, ds.env_map, xp=np))
    base = RenderConfig(width=8, height=8, spp=2, spp_batch=2, max_depth=3,
                        traversal="bvh", engine="scan", seed=3)
    a = np.asarray(R.render_film(sd, ds.camera,
                                 base.replace(pallas_shading=False)).mean())
    b = np.asarray(R.render_film(sd, ds.camera,
                                 base.replace(pallas_shading=True)).mean())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3)
