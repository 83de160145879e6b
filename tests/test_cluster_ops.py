"""Cluster decomposition, cluster-queue traversal, GEMM intersector, and
the Pallas sweep kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jaderaytracerendering_tpu.accel import bvh, clusters
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.ops import bruteforce, cluster_traverse, gemm_intersect
from jaderaytracerendering_tpu.ops.pallas import cluster_sweep
from jaderaytracerendering_tpu.scene.scene import assemble


@pytest.fixture(scope="module")
def scene():
    ds = demo.jade_scene(n_buddha_tris=2_000, env_shape=(16, 32))
    sdn = assemble(ds.objects, ds.env_map, xp=np)
    sdj = jax.tree.map(jnp.asarray, sdn)
    return sdn, sdj


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, np.full(n, -1, np.int32)


class TestClusters:
    def test_partition_and_bounds(self, scene):
        sdn, _ = scene
        begin = np.asarray(sdn.cluster_begin)
        count = np.asarray(sdn.cluster_count)
        cover = np.zeros(sdn.n_triangles, np.int32)
        for b, c in zip(begin, count):
            cover[b : b + c] += 1
        assert (cover == 1).all()
        assert count.max() <= sdn.cluster_k

    def test_blocks_match_triangles(self, scene):
        sdn, _ = scene
        ci = 0
        b, c = int(sdn.cluster_begin[ci]), int(sdn.cluster_count[ci])
        block = np.asarray(sdn.cluster_tris[ci])  # [12, K]
        np.testing.assert_allclose(block[0:3, :c].T, sdn.tri_p1[b : b + c])
        np.testing.assert_allclose(block[6:9, :c].T, sdn.tri_p3[b : b + c])
        # padding slots degenerate
        assert (block[:, c:] == 0).all()

    def test_cluster_aabbs_contain_triangles(self, scene):
        sdn, _ = scene
        for ci in range(min(10, sdn.n_clusters)):
            b, c = int(sdn.cluster_begin[ci]), int(sdn.cluster_count[ci])
            pts = np.concatenate([sdn.tri_p1[b:b+c], sdn.tri_p2[b:b+c], sdn.tri_p3[b:b+c]])
            assert (pts >= np.asarray(sdn.cluster_aa[ci]) - 1e-4).all()
            assert (pts <= np.asarray(sdn.cluster_bb[ci]) + 1e-4).all()


class TestTraversalEquivalence:
    def test_cluster_np_vs_brute(self, scene):
        sdn, _ = scene
        o, d, ex = _rays(512, 1)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1, sdn.tri_p2, sdn.tri_p3)
        hc, ic, tc = cluster_traverse.nearest_hit_clusters_np(o, d, ex, sdn)
        np.testing.assert_array_equal(hb, hc)
        np.testing.assert_array_equal(ib[hb], ic[hb])

    def test_cluster_jnp_vs_np(self, scene):
        sdn, sdj = scene
        o, d, ex = _rays(256, 2)
        h1, i1, t1 = cluster_traverse.nearest_hit_clusters_np(o, d, ex, sdn)
        h2, i2, t2 = cluster_traverse.nearest_hit_clusters_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj
        )
        np.testing.assert_array_equal(h1, np.asarray(h2))
        np.testing.assert_array_equal(i1, np.asarray(i2))

    def test_gemm_np_vs_brute(self, scene):
        sdn, _ = scene
        o, d, ex = _rays(512, 3)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1, sdn.tri_p2, sdn.tri_p3)
        hg, ig, tg = gemm_intersect.nearest_hit_gemm_np(o, d, ex, sdn.tri_gemm)
        assert (hb == hg).mean() > 0.999  # f32 boundary flips only
        both = hb & hg
        assert (ib[both] == ig[both]).mean() > 0.999
        np.testing.assert_allclose(tb[both], tg[both], rtol=5e-3, atol=1e-3)

    def test_gemm_jnp_vs_np(self, scene):
        sdn, sdj = scene
        o, d, ex = _rays(256, 4)
        h1, i1, t1 = gemm_intersect.nearest_hit_gemm_np(o, d, ex, sdn.tri_gemm)
        h2, i2, t2 = gemm_intersect.nearest_hit_gemm_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj.tri_gemm
        )
        assert (h1 == np.asarray(h2)).mean() > 0.999

    def test_sweep_interpret_vs_brute(self, scene):
        sdn, sdj = scene
        o, d, ex = _rays(300, 5)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1, sdn.tri_p2, sdn.tri_p3)
        hs, isw, ts = map(np.asarray, cluster_sweep.nearest_hit_sweep_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        np.testing.assert_array_equal(hb, hs)
        np.testing.assert_array_equal(ib[hb], isw[hb])
        np.testing.assert_allclose(tb[hb], ts[hb], rtol=1e-4, atol=1e-5)

    def test_sweep_exclusion(self, scene):
        sdn, sdj = scene
        tri = 5
        c = (sdn.tri_p1[tri] + sdn.tri_p2[tri] + sdn.tri_p3[tri]) / 3
        n = sdn.tri_norm[tri]
        o = np.tile((c + n * 0.05)[None], (8, 1)).astype(np.float32)
        d = np.tile((-n)[None], (8, 1)).astype(np.float32)
        ex = np.full(8, tri, np.int32)
        hs, isw, _ = map(np.asarray, cluster_sweep.nearest_hit_sweep_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        assert ((~hs) | (isw != tri)).all()

    def test_zero_direction_rays_miss(self, scene):
        sdn, sdj = scene
        o = np.zeros((16, 3), np.float32)
        d = np.zeros((16, 3), np.float32)
        ex = np.full(16, -1, np.int32)
        h, _, _ = cluster_traverse.nearest_hit_clusters_np(o, d, ex, sdn)
        assert not h.any()
        hs, _, _ = map(np.asarray, cluster_sweep.nearest_hit_sweep_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        assert not hs.any()


class TestSweepMXU:
    def test_mxu_interpret_vs_brute(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_mxu

        sdn, sdj = scene
        o, d, ex = _rays(300, 7)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1,
                                               sdn.tri_p2, sdn.tri_p3)
        hs, isw, ts = map(np.asarray, cluster_sweep_mxu.nearest_hit_sweep_mxu_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        np.testing.assert_array_equal(hb, hs)
        np.testing.assert_array_equal(ib[hb], isw[hb])
        # bf16x3 matmul passes: ~1e-4 absolute on t (measured 1.3e-4 max)
        np.testing.assert_allclose(tb[hb], ts[hb], rtol=1e-3, atol=5e-4)

    def test_mxu_exclusion(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_mxu

        sdn, sdj = scene
        tri = 5
        c = (sdn.tri_p1[tri] + sdn.tri_p2[tri] + sdn.tri_p3[tri]) / 3
        n = sdn.tri_norm[tri]
        o = np.tile((c + n * 0.05)[None], (8, 1)).astype(np.float32)
        d = np.tile((-n)[None], (8, 1)).astype(np.float32)
        ex = np.full(8, tri, np.int32)
        hs, isw, _ = map(np.asarray, cluster_sweep_mxu.nearest_hit_sweep_mxu_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        assert ((~hs) | (isw != tri)).all()

    def test_mxu_zero_direction_rays_miss(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_mxu

        _, sdj = scene
        o = np.zeros((16, 3), np.float32)
        d = np.zeros((16, 3), np.float32)
        ex = np.full(16, -1, np.int32)
        hs, _, _ = map(np.asarray, cluster_sweep_mxu.nearest_hit_sweep_mxu_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        assert not hs.any()

    def test_coef_blocks_match_gemm_pack(self, scene):
        """Planar cluster coefficients == tri_gemm columns, re-laid-out."""
        sdn, _ = scene
        kp = sdn.cluster_coef.shape[2] // 4
        ci = 0
        b, c = int(sdn.cluster_begin[ci]), int(sdn.cluster_count[ci])
        blk = np.asarray(sdn.cluster_coef[ci])          # [16, 4*kp]
        ref = np.asarray(sdn.tri_gemm)                  # [10, 4*T]
        for j in range(4):
            np.testing.assert_allclose(
                blk[:10, j * kp : j * kp + c],
                ref[:, 4 * b + j : 4 * (b + c) : 4],
            )
        for j in range(4):
            assert (blk[:, j * kp + c : (j + 1) * kp] == 0).all()
        assert (blk[10:] == 0).all()  # DMA-alignment pad rows


def test_cumsum_indicator_exact():
    from jaderaytracerendering_tpu.ops import scanops

    rng = np.random.default_rng(3)
    for m in (1, 7, 128, 129, 1000, 16384):
        x = jnp.asarray(rng.random(m) < 0.3)
        a = np.asarray(jnp.cumsum(x.astype(jnp.int32)))
        b = np.asarray(scanops.cumsum_indicator(x))
        np.testing.assert_array_equal(a, b)
    # numpy backend falls through to xp.cumsum
    xn = rng.random(50) < 0.5
    np.testing.assert_array_equal(
        scanops.cumsum_indicator(xn, np), np.cumsum(xn.astype(np.int32)))


class TestSweepFused:
    """Fused prep+trace kernel (ops/pallas/cluster_sweep_fused.py)."""

    def test_fused_interpret_vs_brute(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused

        sdn, sdj = scene
        o, d, ex = _rays(300, 7)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1,
                                               sdn.tri_p2, sdn.tri_p3)
        hs, isw, ts = map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        np.testing.assert_array_equal(hb, hs)
        np.testing.assert_array_equal(ib[hb], isw[hb])
        np.testing.assert_allclose(tb[hb], ts[hb], rtol=1e-3, atol=5e-4)

    def test_fused_matches_mxu_kernel(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import (cluster_sweep_fused,
                                                          cluster_sweep_mxu)

        _, sdj = scene
        o, d, ex = _rays(512, 11)
        h1, i1, t1 = map(np.asarray, cluster_sweep_mxu.nearest_hit_sweep_mxu_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        h2, i2, t2 = map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(i1[h1], i2[h1])
        np.testing.assert_array_equal(t1[h1], t2[h1])

    def test_fused_exclusion(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused

        sdn, sdj = scene
        tri = 5
        c = (sdn.tri_p1[tri] + sdn.tri_p2[tri] + sdn.tri_p3[tri]) / 3
        n = sdn.tri_norm[tri]
        o = np.tile((c + n * 0.05)[None], (8, 1)).astype(np.float32)
        d = np.tile((-n)[None], (8, 1)).astype(np.float32)
        ex = np.full(8, tri, np.int32)
        hs, isw, _ = map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        assert ((~hs) | (isw != tri)).all()

    def test_fused_anyhit_segment(self, scene):
        """Any-hit rows report the same hit boolean as full nearest."""
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused

        sdn, sdj = scene
        o, d, ex = _rays(512, 13)
        hb, _, _ = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1,
                                             sdn.tri_p2, sdn.tri_p3)
        hs, isw, ts = map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj,
            interpret=True, anyhit=(128, 384)
        ))
        np.testing.assert_array_equal(hb, hs)
        # rows outside the any-hit range keep full nearest results
        hb2, ib2, tb2 = bruteforce.nearest_hit_np(
            o, d, ex, sdn.tri_p1, sdn.tri_p2, sdn.tri_p3)
        for sl in (slice(0, 128), slice(384, 512)):
            np.testing.assert_array_equal(ib2[sl][hb2[sl]], isw[sl][hb2[sl]])
            np.testing.assert_allclose(tb2[sl][hb2[sl]], ts[sl][hb2[sl]],
                                       rtol=1e-3, atol=5e-4)

    def test_fused_matches_stream_both_modes(self, scene):
        """The streaming kernel (vmem + dma modes) equals the fused one."""
        from jaderaytracerendering_tpu.ops.pallas import (cluster_sweep_fused,
                                                          cluster_sweep_stream)

        _, sdj = scene
        o, d, ex = _rays(512, 17)
        ref = tuple(map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        )))
        for stream in (False, True):
            got = tuple(map(np.asarray, cluster_sweep_stream.nearest_hit_sweep_stream_jnp(
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj,
                interpret=True, stream=stream
            )))
            np.testing.assert_array_equal(ref[0], got[0])
            np.testing.assert_array_equal(ref[1][ref[0]], got[1][ref[0]])
            np.testing.assert_array_equal(ref[2][ref[0]], got[2][ref[0]])

    def test_stream_overflow_fallback(self, scene):
        """Tiles overflowing the candidate cap fall back to a dense
        streamed sweep and stay exact."""
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_stream

        sdn, sdj = scene
        o, d, ex = _rays(256, 19)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1,
                                               sdn.tri_p2, sdn.tri_p3)
        hs, isw, ts = map(np.asarray, cluster_sweep_stream.nearest_hit_sweep_stream_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj,
            interpret=True, stream=True, l_cap=8,  # force overflow
        ))
        np.testing.assert_array_equal(hb, hs)
        np.testing.assert_array_equal(ib[hb], isw[hb])
        np.testing.assert_allclose(tb[hb], ts[hb], rtol=1e-3, atol=5e-4)

    def test_fused_overflow_dense_fallback(self, scene):
        """Tiles beyond the candidate cap run the dense sweep, exactly."""
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused

        sdn, sdj = scene
        o, d, ex = _rays(256, 23)
        hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sdn.tri_p1,
                                               sdn.tri_p2, sdn.tri_p3)
        hs, isw, ts = map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj,
            interpret=True, l_cap=4,  # force overflow on most tiles
        ))
        np.testing.assert_array_equal(hb, hs)
        np.testing.assert_array_equal(ib[hb], isw[hb])
        np.testing.assert_allclose(tb[hb], ts[hb], rtol=1e-3, atol=5e-4)

    def test_fused_zero_direction_rays_miss(self, scene):
        from jaderaytracerendering_tpu.ops.pallas import cluster_sweep_fused

        _, sdj = scene
        o = np.zeros((16, 3), np.float32)
        d = np.zeros((16, 3), np.float32)
        ex = np.full(16, -1, np.int32)
        hs, _, _ = map(np.asarray, cluster_sweep_fused.nearest_hit_sweep_fused_jnp(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(ex), sdj, interpret=True
        ))
        assert not hs.any()
