"""Tests: OBJ parsing, transforms, HDR IO, envmap sampling, serialization,
procedural meshes, scene assembly."""

import numpy as np
import jax.numpy as jnp
import pytest

from jaderaytracerendering_tpu.core import vecmath
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.scene import (
    envmap, hdr, material, objloader, procedural, serialization, transforms,
)
from jaderaytracerendering_tpu.scene.scene import assemble

OBJ_TEXT = """
# comment
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1/11/21 2/12/22 4/14/24
"""


class TestObjLoader:
    def test_parse_plain_and_indexed(self):
        v, f = objloader.parse_obj_text(OBJ_TEXT)
        assert v.shape == (4, 3)
        np.testing.assert_array_equal(f, [[0, 1, 2], [0, 1, 3]])

    def test_compat_slash_misparse(self):
        # the reference replaces '/' with ' ' so f a/b/c d/e/f g/h/i reads
        # vertices (a, b, c) (PathTrace.cpp:388-392)
        v, f = objloader.parse_obj_text(OBJ_TEXT, compat_slash_faces=True)
        np.testing.assert_array_equal(f[1], [0, 10, 20])

    def test_compat_slash_truncates_to_one_triangle(self):
        # the reference reads exactly three ints per face record
        # (PathTrace.cpp:403-423): a slash-replaced 3-vertex face yields
        # ONE triangle, not a 9-index fan
        text = "v 0 0 0\n" * 30 + "f 1/2/3 4/5/6 7/8/9\n"
        _, f = objloader.parse_obj_text(text, compat_slash_faces=True)
        np.testing.assert_array_equal(f, [[0, 1, 2]])
        # non-compat parses the same face correctly as (v1, v4, v7)
        _, f2 = objloader.parse_obj_text(text)
        np.testing.assert_array_equal(f2, [[0, 3, 6]])

    def test_negative_indices(self):
        v, f = objloader.parse_obj_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        np.testing.assert_array_equal(f, [[0, 1, 2]])

    def test_normalization_correct(self):
        v = np.array([[0, 0, 0], [2, 4, 8]], np.float64)
        out = objloader.normalize_vertices(v)
        np.testing.assert_allclose(out[0], [-0.125, -0.25, -0.5])
        np.testing.assert_allclose(out[1], [0.125, 0.25, 0.5])

    def test_normalization_compat_bug_differs(self):
        v = np.array([[0.0, 5.0, 0.0], [1.0, 0.0, 0.0], [0.5, 2.0, 3.0]])
        a = objloader.normalize_vertices(v, compat_aabb_bug=False)
        b = objloader.normalize_vertices(v, compat_aabb_bug=True)
        assert not np.allclose(a, b)

    def test_mesh_flat_normals(self):
        v, f = objloader.parse_obj_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        mesh = objloader.mesh_from_arrays(v, f)
        np.testing.assert_allclose(mesh.norm, [[0, 0, 1]], atol=1e-6)

    def test_write_read_roundtrip(self, tmp_path):
        v, f = procedural.box()
        p = str(tmp_path / "box.obj")
        objloader.write_obj(p, v, f)
        mesh = objloader.read_obj(p)
        assert mesh.n_triangles == 12

    def test_transform_applied(self):
        v, f = objloader.parse_obj_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        t = transforms.transform_matrix(translate=(10, 0, 0))
        mesh = objloader.mesh_from_arrays(v, f, transform=t)
        np.testing.assert_allclose(mesh.p1, [[10, 0, 0]], atol=1e-6)


class TestTransforms:
    def test_trs_order(self):
        # scale then rotate then translate: point (1,0,0) scaled x2 ->
        # (2,0,0), rotated 90 about z -> (0,2,0), translated +1x -> (1,2,0)
        m = transforms.transform_matrix(rotate=(0, 0, 90), translate=(1, 0, 0),
                                        scale=(2, 2, 2))
        p = vecmath.transform_point(m, np.array([[1.0, 0, 0]]), np)
        np.testing.assert_allclose(p, [[1, 2, 0]], atol=1e-6)

    def test_rotation_order_x_then_y(self):
        # Rx(90) takes +y->+z; Ry(90) then takes +z->+x. Combined R=Rx@Ry
        # applied to +y: Rx@(Ry@y)=Rx@y=+z
        m = transforms.transform_matrix(rotate=(90, 90, 0))
        p = vecmath.transform_point(m, np.array([[0.0, 1.0, 0]]), np)
        np.testing.assert_allclose(p, [[0, 0, 1]], atol=1e-6)


class TestHdr:
    def test_roundtrip(self, tmp_path):
        img = hdr.procedural_sky(32, 64)
        p = str(tmp_path / "sky.hdr")
        hdr.write_hdr(p, img)
        back = hdr.read_hdr(p)
        assert back.shape == img.shape
        # RGBE has ~1% mantissa precision
        bright = img > 0.01
        rel = np.abs(back - img)[bright] / img[bright]
        assert rel.max() < 0.02

    def test_rle_decoding(self, tmp_path):
        # build an RLE-encoded file by hand: 16px wide, one row, constant
        w, h = 16, 1
        rgbe = hdr._float_to_rgbe(np.full((1, w, 3), 0.5, np.float32))
        payload = bytes([2, 2, 0, w])
        for c in range(4):
            payload += bytes([128 + w, int(rgbe[0, 0, c])])  # one run
        p = tmp_path / "rle.hdr"
        p.write_bytes(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" +
                      f"-Y {h} +X {w}\n".encode() + payload)
        img = hdr.read_hdr(str(p))
        assert img.shape == (1, 16, 3)
        np.testing.assert_allclose(img, 0.5, rtol=0.02)

    def test_sun_exceeds_clamp(self):
        img = hdr.procedural_sky(64, 128)
        assert img.max() > 10.0


@pytest.mark.parametrize("xp", [np, jnp], ids=["numpy", "jax"])
class TestEnvmap:
    def test_uv_mapping_axes(self, xp):
        img = np.zeros((8, 16, 3), np.float32)
        img[:, :, 0] = np.linspace(0, 1, 16)[None, :]  # red encodes u
        d = xp.asarray([[1.0, 0.0, 0.0]])  # +x -> u=0.5
        c = np.asarray(envmap.sample_env(xp.asarray(img), d, xp))
        assert abs(c[0, 0] - 0.5) < 0.1

    def test_poles(self, xp):
        img = np.zeros((8, 16, 3), np.float32)
        img[0] = 1.0  # top row
        up = xp.asarray([[0.0, 1.0, 0.0]])
        down = xp.asarray([[0.0, -1.0, 0.0]])
        cu = float(np.asarray(envmap.sample_env(xp.asarray(img), up, xp))[0, 0])
        cd = float(np.asarray(envmap.sample_env(xp.asarray(img), down, xp))[0, 0])
        assert cu > 0.9 and cd < 0.1

    def test_clamp(self, xp):
        img = np.full((4, 8, 3), 100.0, np.float32)
        d = xp.asarray([[0.0, 0.0, 1.0]])
        c = np.asarray(envmap.sample_env(xp.asarray(img), d, xp))
        np.testing.assert_allclose(c, 10.0)

    def test_packed_matches_plain_bitwise(self, xp):
        img = hdr.procedural_sky(16, 32)
        pack = envmap.pack_bilinear(img, np)
        rng = np.random.default_rng(7)
        d = rng.normal(size=(500, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # force the border cases the raw-index table exists for: seam
        # (u ~ 0/1), poles (v ~ 0/1), and axis-aligned directions
        extra = np.array([[0, 1, 0], [0, -1, 0], [-1, 0, 0], [1, 0, 0],
                          [0, 0, 1], [0, 0, -1], [-1, 0, -1e-6],
                          [-1, 0, 1e-6]], np.float32)
        extra /= np.linalg.norm(extra, axis=-1, keepdims=True)
        d = np.concatenate([d, extra])
        a = envmap.sample_env(xp.asarray(img), xp.asarray(d), xp)
        b = envmap.sample_env_packed(xp.asarray(pack), img.shape[:2],
                                     xp.asarray(d), xp)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sample_env_sd_uses_pack(self, xp):
        from jaderaytracerendering_tpu.models import demo as demo_mod
        from jaderaytracerendering_tpu.scene.scene import assemble
        ds = demo_mod.tiny_scene()
        sd = assemble(ds.objects, ds.env_map, xp=xp)
        rng = np.random.default_rng(8)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        a = envmap.sample_env_sd(sd, xp.asarray(d), xp)
        b = envmap.sample_env(xp.asarray(ds.env_map), xp.asarray(d), xp)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_numpy_jax_agree(self, xp):
        del xp
        img = hdr.procedural_sky(16, 32)
        rng = np.random.default_rng(3)
        d = rng.normal(size=(50, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        a = envmap.sample_env(img, d, np)
        b = np.asarray(envmap.sample_env(jnp.asarray(img), jnp.asarray(d), jnp))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestSerialization:
    def _spec(self):
        ds = demo.tiny_scene()
        return demo.to_spec(ds)

    def test_render_args_roundtrip(self, tmp_path):
        spec = self._spec()
        p = str(tmp_path / "render_args.txt")
        serialization.write_render_args(p, spec)
        back = serialization.read_render_args(p)
        np.testing.assert_allclose(back.eye, spec.eye, rtol=1e-5)
        np.testing.assert_allclose(back.camera_rotate, spec.camera_rotate, rtol=1e-4, atol=1e-6)
        assert len(back.objects) == len(spec.objects)
        o0, b0 = spec.objects[0], back.objects[0]
        np.testing.assert_allclose(b0.transform, o0.transform, rtol=1e-4, atol=1e-6)
        assert b0.material.reflex_mode == o0.material.reflex_mode
        assert b0.normalize == o0.normalize

    def test_json_roundtrip(self):
        spec = self._spec()
        back = serialization.spec_from_json(serialization.spec_to_json(spec))
        np.testing.assert_allclose(back.eye, spec.eye)
        assert back.objects[1].material.emissive == spec.objects[1].material.emissive


class TestProcedural:
    def test_box(self):
        v, f = procedural.box()
        assert len(f) == 12
        mesh = objloader.mesh_from_arrays(v, f)
        # outward normals: normal . centroid > 0 for a centered box
        c = (mesh.p1 + mesh.p2 + mesh.p3) / 3
        assert (np.sum(mesh.norm * c, axis=-1) > 0).all()

    def test_sphere_radius(self):
        v, f = procedural.uv_sphere(8, 16)
        r = np.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(r, 0.5, atol=1e-6)

    def test_buddha_standin_count(self):
        v, f = procedural.buddha_standin(20_000)
        assert 10_000 <= len(f) <= 40_000

    def test_buddha_deterministic(self):
        v1, _ = procedural.buddha_standin(1000, seed=7)
        v2, _ = procedural.buddha_standin(1000, seed=7)
        np.testing.assert_array_equal(v1, v2)


class TestAssembly:
    def test_tiny_scene_buffers(self):
        ds = demo.tiny_scene()
        sd = assemble(ds.objects, ds.env_map, xp=np)
        assert sd.n_triangles == 14  # 12 box + 2 quad
        assert sd.n_emit == 2
        assert sd.n_objects == 2
        assert not sd.has_sss and not sd.has_refract
        # mapping is the inverse permutation
        assert sd.mapping.dtype == np.int32
        # prefix areas are increasing within each object
        for b, e in zip(sd.seg_begin, sd.seg_end):
            seg = sd.prefix_area[b : e + 1]
            assert (np.diff(seg) > 0).all()

    def test_emit_indices_point_at_emissive(self):
        ds = demo.tiny_scene()
        sd = assemble(ds.objects, ds.env_map, xp=np)
        for i in sd.emit_idx:
            o = sd.tri_obj[i]
            assert sd.mat_emissive[o].max() > material.EMISSIVE_THRESHOLD

    def test_jade_scene_flags(self):
        ds = demo.jade_scene(n_buddha_tris=500, env_shape=(16, 32))
        sd = assemble(ds.objects, ds.env_map, xp=np)
        assert sd.has_sss and sd.has_mirror and not sd.has_refract
        assert sd.n_objects == 3


class TestCornell:
    def test_cornell_scene_assembles(self):
        ds = demo.cornell_scene()
        sd = assemble(ds.objects, ds.env_map, xp=np)
        assert sd.n_objects == 8
        assert sd.n_emit == 2  # light quad
        assert not sd.has_sss

    def test_cornell_renders_color_bleed(self):
        import jax.numpy as jnp
        import jax
        from jaderaytracerendering_tpu.integrator import render as R
        from jaderaytracerendering_tpu.utils.config import RenderConfig

        ds = demo.cornell_scene()
        sd = assemble(ds.objects, ds.env_map, xp=np)
        sdj = jax.tree.map(jnp.asarray, sd)
        cfg = RenderConfig(width=24, height=24, spp=8, max_depth=4,
                           traversal="bvh", engine="scan", spp_batch=4)
        film = R.render_film(sdj, ds.camera, cfg)
        img = np.asarray(film.mean())
        assert np.isfinite(img).all() and img.mean() > 0.01
        # left third redder than right third; right third greener
        left = img[:, :8]; right = img[:, 16:]
        assert left[..., 0].mean() > left[..., 1].mean()
        assert right[..., 1].mean() > right[..., 0].mean()
