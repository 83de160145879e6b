"""Property tests: oracle-vs-wavefront parity on randomized scenes.

Random triangle soups with random material assignments (diffuse / mirror
/ SSS / refractive), random cameras — the branchy scalar oracle and the
masked wavefront must agree to float precision on every draw because they
consume identical site-keyed RNG streams. This is the strongest guard on
bounce_step's masking logic."""

import numpy as np
import pytest

from jaderaytracerendering_tpu.core.camera import OrbitCamera
from jaderaytracerendering_tpu.cpuref import integrator as oracle
from jaderaytracerendering_tpu.integrator import render as R
from jaderaytracerendering_tpu.scene import hdr, material
from jaderaytracerendering_tpu.scene.objloader import MeshData
from jaderaytracerendering_tpu.scene.scene import SceneObject, assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig
from jaderaytracerendering_tpu.core import vecmath as vm


def _random_object(rng, n_tris, mat):
    c = rng.uniform(-1.2, 1.2, (n_tris, 1, 3))
    tri = c + rng.normal(scale=0.25, size=(n_tris, 3, 3))
    p1, p2, p3 = (tri[:, i].astype(np.float32) for i in range(3))
    norm = vm.face_normal(p1.astype(np.float64), p2.astype(np.float64),
                          p3.astype(np.float64), np).astype(np.float32)
    return SceneObject(mesh=MeshData(p1=p1, p2=p2, p3=p3, norm=norm), material=mat)


def _random_scene(seed):
    rng = np.random.default_rng(seed)
    mats = [
        material.Material(brdf=tuple(rng.uniform(0.1, 0.9, 3))),
        material.Material(
            brdf=tuple(rng.uniform(0.05, 0.5, 3)),
            reflex_mode=material.MIRROR,
        ),
        material.Material(
            brdf=(0.02, 0.02, 0.02),
            reflex_mode=material.MIRROR,
            refract_mode=material.SUB_SURFACE,
            refract_rate=tuple(rng.uniform(0.05, 0.3, 3)),
            refract_albedo=tuple(rng.uniform(0.1, 0.5, 3)),
            refract_index=float(rng.uniform(1.2, 2.8)),
        ),
        material.Material(
            reflex_mode=material.DIFFUSE,
            refract_mode=material.DIR_REFRACT,
            refract_rate=tuple(rng.uniform(0.5, 0.95, 3)),
            refract_index=float(rng.uniform(1.1, 1.8)),
        ),
        material.Material(emissive=tuple(rng.uniform(5, 50, 3))),
    ]
    objs = [
        _random_object(rng, int(rng.integers(6, 40)), m) for m in mats
    ]
    env = hdr.procedural_sky(16, 32, sun_intensity=float(rng.uniform(5, 40)))
    cam = OrbitCamera(
        up_angle=float(rng.uniform(-30, 40)),
        rotate_angle=float(rng.uniform(0, 360)),
        r=float(rng.uniform(2.0, 5.0)),
    )
    return objs, env, cam


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_oracle_parity(seed):
    objs, env, cam = _random_scene(seed)
    sd = assemble(objs, env, xp=np)
    cfg = RenderConfig(width=6, height=6, spp=3, spp_batch=3, max_depth=4,
                       max_refract_bounces=6, traversal="brute", seed=seed)
    ref = oracle.render_radiance(sd, cam, cfg)
    got = R.render_radiance_np(sd, cam, cfg)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=2e-3)


def test_fuzz_traversals_agree(tmp_path):
    objs, env, cam = _random_scene(99)
    sd = assemble(objs, env, xp=np)
    base = RenderConfig(width=6, height=6, spp=2, spp_batch=2, max_depth=3,
                        max_refract_bounces=4, seed=99)
    imgs = {}
    for trav in ("brute", "bvh", "clusters"):
        imgs[trav] = R.render_radiance_np(sd, cam, base.replace(traversal=trav))
    np.testing.assert_allclose(imgs["bvh"], imgs["brute"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(imgs["clusters"], imgs["brute"], rtol=1e-4, atol=1e-4)
