"""Preview integrator tests (the 2-bounce no-NEE path)."""

import numpy as np
import jax
import jax.numpy as jnp

from jaderaytracerendering_tpu.core import camera as camera_mod
from jaderaytracerendering_tpu.integrator import preview, render as R
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.scene.scene import assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig


def _setup():
    ds = demo.tiny_scene()
    sdn = assemble(ds.objects, ds.env_map, xp=np)
    cfg = RenderConfig(width=8, height=8, spp=1, spp_batch=1, traversal="brute",
                       integrator="preview")
    return ds, sdn, cfg


def test_preview_np_finite_nonneg():
    ds, sdn, cfg = _setup()
    pid = np.arange(64, dtype=np.uint32)
    o, d = camera_mod.generate_rays(np, ds.camera.eye, ds.camera.camera_rotate,
                                    8, 8, pid, np.uint32(0))
    nearest = R.make_nearest(sdn, cfg, np)
    rad = preview.trace_preview(o, d, pid, np.uint32(0), sdn, cfg, np, nearest)
    assert np.isfinite(rad).all() and (rad >= 0).all()
    assert rad.mean() > 0


def test_preview_np_vs_jnp():
    ds, sdn, cfg = _setup()
    pid = np.arange(64, dtype=np.uint32)
    o, d = camera_mod.generate_rays(np, ds.camera.eye, ds.camera.camera_rotate,
                                    8, 8, pid, np.uint32(0))
    nearest = R.make_nearest(sdn, cfg, np)
    a = preview.trace_preview(o, d, pid, np.uint32(0), sdn, cfg, np, nearest)
    sdj = jax.tree.map(jnp.asarray, sdn)
    nearest_j = R.make_nearest(sdj, cfg, jnp)
    b = preview.trace_preview(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(pid), jnp.uint32(0),
        sdj, cfg, jnp, nearest_j,
    )
    np.testing.assert_allclose(np.asarray(b), a, rtol=1e-4, atol=1e-5)


def test_preview_direct_light_hit_is_le():
    # a pixel whose primary ray hits the emissive quad must return >= Le
    ds, sdn, cfg = _setup()
    # aim a ray at the light quad's centroid
    li = int(sdn.emit_idx[0])
    c = (sdn.tri_p1[li] + sdn.tri_p2[li] + sdn.tri_p3[li]) / 3
    eye = np.asarray(ds.camera.eye, np.float32)
    d = (c - eye)[None].astype(np.float32)
    d /= np.linalg.norm(d)
    nearest = R.make_nearest(sdn, cfg, np)
    rad = preview.trace_preview(eye[None], d, np.uint32([0]), np.uint32(0),
                                sdn, cfg, np, nearest)
    assert rad[0, 0] >= 1000.0  # Le of the demo light


def test_preview_through_render_batch():
    ds, sdn, cfg = _setup()
    sdj = jax.tree.map(jnp.asarray, sdn)
    film = R.render_film(sdj, ds.camera, cfg.replace(spp=2, spp_batch=2))
    img = np.asarray(film.mean())
    assert img.shape == (8, 8, 3) and np.isfinite(img).all()
