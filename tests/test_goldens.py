"""Golden-image regression: committed oracle renders at fixed seeds.

Unlike the live oracle-parity tests (which would drift silently if oracle
and integrator changed together), these baselines pin today's verified
behavior across rounds. Regenerate deliberately (see tests/goldens/) only
when a semantic change is intended and re-verified against the reference.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from jaderaytracerendering_tpu.integrator import render as R
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.scene.scene import assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _check(name, ds, cfg):
    want = np.load(os.path.join(GOLDENS, name))
    sd = jax.tree.map(jnp.asarray, assemble(ds.objects, ds.env_map, xp=np))
    got = np.asarray(R.render_film(sd, ds.camera, cfg).mean())
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)


def test_golden_diffuse():
    ds = demo.diffuse_scene(n_buddha_tris=400, env_shape=(16, 32))
    _check("diffuse_12x12_4spp.npy", ds, RenderConfig(
        width=12, height=12, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5))


def test_golden_jade():
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    _check("jade_10x10_4spp.npy", ds, RenderConfig(
        width=10, height=10, spp=4, spp_batch=4, max_depth=5,
        traversal="bvh", engine="pool", rays_per_launch=64, seed=5))


def test_golden_cornell():
    ds = demo.cornell_scene()
    _check("cornell_10x10_4spp.npy", ds, RenderConfig(
        width=10, height=10, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5))


# ---- 64x64 goldens (round-2: image-quality evidence at real size; ----
# ---- regenerate ONLY via tests/goldens/regen.py)                  ----

def test_golden_diffuse_64():
    ds = demo.diffuse_scene(n_buddha_tris=400, env_shape=(16, 32))
    _check("diffuse_64x64_4spp.npy", ds, RenderConfig(
        width=64, height=64, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5))


def test_golden_jade_64():
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    _check("jade_64x64_4spp.npy", ds, RenderConfig(
        width=64, height=64, spp=4, spp_batch=4, max_depth=5,
        traversal="bvh", engine="pool", rays_per_launch=4096, seed=5))


def test_golden_cornell_64():
    ds = demo.cornell_scene()
    _check("cornell_64x64_4spp.npy", ds, RenderConfig(
        width=64, height=64, spp=4, spp_batch=4, max_depth=4,
        traversal="bvh", engine="scan", seed=5))
