"""Integrator parity: scalar oracle vs wavefront (np + jnp backends),
sampling-helper unit tests, tonemap goldens, and energy sanity."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jaderaytracerendering_tpu.cpuref import integrator as oracle
from jaderaytracerendering_tpu.integrator import render as R, sampling
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.post import tonemap
from jaderaytracerendering_tpu.scene import material
from jaderaytracerendering_tpu.scene.scene import assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig


def _cfg(**kw):
    base = dict(width=8, height=8, spp=2, spp_batch=2, max_depth=3,
                traversal="brute")
    base.update(kw)
    return RenderConfig(**base)


def _parity(ds, cfg, tol=1e-4):
    sd = assemble(ds.objects, ds.env_map, xp=np)
    a = oracle.render_radiance(sd, ds.camera, cfg)
    b = R.render_radiance_np(sd, ds.camera, cfg)
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=tol * scale, rtol=1e-3)
    return sd, a


class TestOracleParity:
    def test_diffuse_scene(self):
        _parity(demo.tiny_scene(), _cfg())

    def test_jade_sss_scene(self):
        ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
        # camera closer so the statue covers more lanes (exercises SSS)
        ds.camera.r = 2.0
        _parity(ds, _cfg(max_depth=4))

    def test_dir_refract_scene(self):
        ds = demo.jade_scene(n_buddha_tris=200, env_shape=(16, 32))
        glass = dataclasses.replace(
            ds.objects[0].material, refract_mode=material.DIR_REFRACT,
            refract_index=1.5, refract_rate=(0.9, 0.9, 0.9),
        )
        ds.objects[0] = dataclasses.replace(ds.objects[0], material=glass)
        ds.camera.r = 2.0
        _parity(ds, _cfg(max_depth=3, max_refract_bounces=8))

    def test_jnp_matches_np_full_scene(self):
        ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
        ds.camera.r = 2.0
        cfg = _cfg(max_depth=4, traversal="bvh")
        sdn = assemble(ds.objects, ds.env_map, xp=np)
        a = R.render_radiance_np(sdn, ds.camera, cfg)
        sdj = jax.tree.map(jnp.asarray, sdn)
        film = R.render_film(sdj, ds.camera, cfg)
        b = np.asarray(film.mean())
        np.testing.assert_allclose(b, a, atol=1e-4 * max(np.abs(a).max(), 1), rtol=1e-3)

    def test_bvh_equals_brute_through_integrator(self):
        ds = demo.tiny_scene()
        sd = assemble(ds.objects, ds.env_map, xp=np)
        a = R.render_radiance_np(sd, ds.camera, _cfg(traversal="brute"))
        b = R.render_radiance_np(sd, ds.camera, _cfg(traversal="bvh"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


class TestSampling:
    def test_uniform_sphere_is_unit_and_uniform(self):
        rng_ = np.random.default_rng(0)
        u1 = rng_.uniform(size=20000).astype(np.float32)
        u2 = rng_.uniform(size=20000).astype(np.float32)
        d = sampling.uniform_sphere(u1, u2, np)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert abs(d.mean(axis=0)).max() < 0.02
        # z is cos(theta): uniform in [-1, 1]
        assert abs(d[:, 2].mean()) < 0.02 and abs(d[:, 2].var() - 1 / 3) < 0.01

    def test_triangle_point_inside(self):
        rng_ = np.random.default_rng(1)
        u = rng_.uniform(size=1000).astype(np.float32)
        v = rng_.uniform(size=1000).astype(np.float32)
        p1 = np.zeros((1000, 3), np.float32)
        p2 = np.tile([[1.0, 0, 0]], (1000, 1)).astype(np.float32)
        p3 = np.tile([[0.0, 1, 0]], (1000, 1)).astype(np.float32)
        p = sampling.triangle_point(p1, p2, p3, u, v, np)
        assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
        assert (p[:, 0] + p[:, 1] <= 1 + 1e-5).all()

    def test_fresnel_forms(self):
        r0 = sampling.schlick_r0(1.5)
        assert r0 == pytest.approx(0.04, abs=1e-3)
        assert sampling.fresnel_entry(r0, 1.0) == pytest.approx(r0)
        assert sampling.fresnel_entry(r0, 0.0) == pytest.approx(1.0)
        # the reference's exit form subtracts (kept verbatim)
        assert sampling.fresnel_exit(r0, 0.0) == pytest.approx(2 * r0 - 1.0)

    def test_refract_dir_snell(self):
        d = np.array([[0.0, -1.0, 0.0]], np.float32)  # straight down
        n = np.array([[0.0, 1.0, 0.0]], np.float32)
        out, tir = sampling.refract_dir(d, n, np.float32(1 / 1.5), np)
        np.testing.assert_allclose(out, d, atol=1e-6)  # normal incidence
        assert not tir[0]
        # grazing from dense medium -> TIR
        g = np.array([[0.99, -0.14, 0.0]], np.float32)
        g /= np.linalg.norm(g)
        out, tir = sampling.refract_dir(g, n, np.float32(1.5), np)
        assert tir[0]
        np.testing.assert_allclose(out, g, atol=1e-6)  # returned unchanged

    def test_area_cdf_fast_matches_bisection(self):
        """Table-driven pick == the reference bisection, exactly — incl.
        crafted ties (targets on prefix values), zero-area triangles,
        permuted mapping, and 1/2-triangle segment quirks."""
        import math

        rng_ = np.random.default_rng(11)

        class _SD:
            pass

        def build(areas_per_obj):
            seg_b, seg_e, prefix, totals = [], [], [], []
            base = 0
            for areas in areas_per_obj:
                n = len(areas)
                seg_b.append(base)
                seg_e.append(base + n - 1)
                pa = np.cumsum(np.asarray(areas, np.float64)).astype(np.float32)
                prefix.append(pa)
                totals.append(pa[-1])
                base += n
            sd = _SD()
            sd.prefix_area = np.concatenate(prefix)
            sd.obj_total_area = np.asarray(totals, np.float32)
            sd.seg_begin = np.asarray(seg_b, np.int32)
            sd.seg_end = np.asarray(seg_e, np.int32)
            sd.mapping = rng_.permutation(len(sd.prefix_area)).astype(np.int32)
            bkt, win, nbs, bases = sampling.build_area_cdf_tables(
                sd.prefix_area, sd.obj_total_area, sd.seg_begin, sd.seg_end,
                sd.mapping)
            assert bkt is not None
            sd.sss_bucket, sd.sss_window = bkt, win
            sd.sss_bnb, sd.sss_bbase = nbs, bases
            sd.sss_nb = int(nbs.max())
            return sd

        zero_runs = np.ones(300)
        zero_runs[::7] = 0.0
        for areas in ([rng_.random(800) + 0.01, [1.0, 2.0], [3.0]],
                      [np.ones(1000)], [zero_runs, np.ones(2)]):
            sd = build(areas)
            n_obj = len(sd.obj_total_area)
            u = rng_.random(20000).astype(np.float32)
            for o in range(n_obj):
                pv = sd.prefix_area[sd.seg_begin[o] : sd.seg_end[o] + 1]
                ue = (pv.astype(np.float64)
                      / float(sd.obj_total_area[o])).astype(np.float32)
                ue = ue[(ue >= 0) & (ue < 1)]
                u = np.concatenate([u, ue, np.nextafter(ue, 0),
                                    np.nextafter(ue, 1)])
            obj = rng_.integers(0, n_obj, len(u)).astype(np.int32)
            n_bis = max(2, int(math.ceil(
                math.log2(max(len(sd.prefix_area), 2)))) + 1)
            ref = sampling.area_cdf_pick(
                u, obj, sd.prefix_area, sd.obj_total_area, sd.seg_begin,
                sd.seg_end, sd.mapping, np, n_iters=n_bis)
            fast = sampling.area_cdf_pick_fast(u, obj, sd, np)
            np.testing.assert_array_equal(ref, fast)

    def test_bssrdf_positive_decreasing(self):
        s = np.array([[0.1, 0.1, 0.1]], np.float32)
        b1 = sampling.bssrdf(np.array([0.05], np.float32), s, np)
        b2 = sampling.bssrdf(np.array([0.5], np.float32), s, np)
        assert (b1 > b2).all() and (b2 > 0).all()

    def test_area_cdf_pick_matches_scalar_search(self):
        # object of 6 triangles with known areas, load order == sorted
        prefix = np.cumsum([1.0, 2.0, 0.5, 3.0, 1.5, 2.0]).astype(np.float32)
        total = np.array([prefix[-1]], np.float32)
        mapping = np.arange(6, dtype=np.int32)
        sb = np.array([0], np.int32)
        se = np.array([5], np.int32)
        for u in [0.01, 0.15, 0.35, 0.55, 0.8, 0.99]:
            got = int(sampling.area_cdf_pick(
                np.float32(u), np.int64(0), prefix, total, sb, se, mapping, np))
            # replicate the reference loop exactly
            target = u * total[0]
            left, right, middle = 0, 5, 0
            while left < right - 1:
                middle = (left + right) // 2
                if target <= prefix[middle]:
                    right = middle
                else:
                    left = middle
            assert got == middle


class TestTonemap:
    def test_aces_golden(self):
        # hand-computed from the curve at c=1: (2.51+0.03)/(2.43+0.59+0.14)
        c = np.array([1.0])
        np.testing.assert_allclose(tonemap.aces(c), 2.54 / 3.16, rtol=1e-6)
        assert float(tonemap.aces(np.array([0.0]))[0]) == 0.0

    def test_reinhard_golden(self):
        c = np.ones((1, 3))
        lum = 1.0  # 0.3+0.6+0.1
        np.testing.assert_allclose(
            tonemap.reinhard_luminance(c, np), 1 / (1 + lum / 1.5), rtol=1e-6)

    def test_quantize_clamps(self):
        v = np.array([[-1.0, 0.5, 9.0]])
        q = tonemap.quantize_u8(v, np)
        assert q.tolist() == [[0, 127, 255]]

    def test_finalize_shapes(self):
        img = tonemap.finalize(np.ones((4, 4, 3)) * 0.5, np)
        assert img.shape == (4, 4, 3) and img.dtype == np.uint8


class TestEnergyAndCoverage:
    def test_radiance_nonnegative_finite(self):
        ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
        sd = assemble(ds.objects, ds.env_map, xp=np)
        img = R.render_radiance_np(sd, ds.camera, _cfg(max_depth=4))
        assert np.isfinite(img).all()
        assert (img >= 0).all()

    def test_sky_only_pixels_match_env(self):
        # a camera pointed where nothing occludes must return env radiance
        ds = demo.tiny_scene()
        ds.camera.up_angle = 60.0  # look up at the sky
        sd = assemble(ds.objects, ds.env_map, xp=np)
        img = R.render_radiance_np(sd, ds.camera, _cfg(spp=1, max_depth=1))
        assert img.mean() > 0.01  # nonzero sky radiance
