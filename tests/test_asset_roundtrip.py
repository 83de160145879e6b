"""Buddha-scale OBJ ingestion round-trip (VERDICT round-1 item 6).

The reference's demo loads happyBuddha.obj (~100k faces,
PathTrace.cpp:1002-1037) through readObj (PathTrace.cpp:366-466). The
reference repo ships no assets, so this test generates a buddha-scale
procedural mesh, round-trips it through BOTH parsers (numpy + native C)
in plain and `f v/vt/vn` forms under both compat flags, asserts
tree-level equality, and traces rays against the assembled scene
(cluster traversal vs brute force) as pixel-level evidence.
"""

import numpy as np
import pytest

from jaderaytracerendering_tpu.accel import bvh, native
from jaderaytracerendering_tpu.ops import bruteforce, cluster_traverse
from jaderaytracerendering_tpu.scene import objloader, procedural
from jaderaytracerendering_tpu.scene.scene import assemble, SceneObject
from jaderaytracerendering_tpu.scene.material import JADE


@pytest.fixture(scope="module")
def buddha_obj(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    v, f = procedural.buddha_standin(n_triangles=110_000, seed=3)
    plain = str(root / "buddha.obj")
    objloader.write_obj(plain, v, f)
    # `f v/vt/vn` variant (the reference misparses these via its '/'->' '
    # substitution, PathTrace.cpp:388-392)
    slashed = str(root / "buddha_vtn.obj")
    with open(plain) as fh_in, open(slashed, "w") as fh_out:
        for line in fh_in:
            if line.startswith("f "):
                a, b, c = line.split()[1:4]
                fh_out.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")
            else:
                fh_out.write(line)
    return v, f, plain, slashed


def test_parsers_agree_at_scale(buddha_obj):
    v, f, plain, slashed = buddha_obj
    assert len(f) >= 100_000
    with open(plain) as fh:
        pv, pf = objloader.parse_obj_text(fh.read())
    parsed = native.parse_obj(plain)
    assert parsed is not None, "native parser unavailable"
    nv, nf = parsed
    np.testing.assert_allclose(nv, pv)
    np.testing.assert_array_equal(nf, pf)
    np.testing.assert_array_equal(pf, f)
    np.testing.assert_allclose(pv, v)


def test_slashed_faces_both_flags(buddha_obj):
    v, f, plain, slashed = buddha_obj
    # correct parse: vertex index before the first '/'
    with open(slashed) as fh:
        text = fh.read()
    pv, pf = objloader.parse_obj_text(text)
    np.testing.assert_array_equal(pf, f)
    # compat parse (reference bug): '/'->' ' then first three ints —
    # with v/vt/vn == v/v/v the collapsed triangle is (v, v, v)... the
    # reference would read (a, a, a); verify both parsers agree on the
    # exact buggy output rather than on usefulness
    pvc, pfc = objloader.parse_obj_text(text, compat_slash_faces=True)
    parsed = native.parse_obj(slashed, compat_slash_faces=True)
    assert parsed is not None
    nvc, nfc = parsed
    np.testing.assert_array_equal(nfc, pfc)
    assert len(pfc) == len(f)  # one triangle per face record
    np.testing.assert_array_equal(pfc, np.repeat(f[:, :1], 3, axis=1))


def test_native_bvh_at_scale(buddha_obj):
    v, f, plain, _ = buddha_obj
    mesh = objloader.read_obj(plain, normalize=True, backend="native")
    assert mesh.n_triangles == len(f)
    nodes, perm = native.build(mesh.p1, mesh.p2, mesh.p3, leaf_size=8,
                               method="sah")
    bvh.check_invariants(nodes, len(f), leaf_size=8)


def test_pixel_evidence_cluster_vs_brute(buddha_obj):
    """Rays against the assembled 110k-tri scene: cluster traversal ==
    brute force (hit, idx, t)."""
    v, f, plain, _ = buddha_obj
    mesh = objloader.read_obj(plain, normalize=True)
    sd = assemble(
        [SceneObject(mesh=mesh, material=JADE, name="buddha")],
        env_map=np.ones((4, 8, 3), np.float32),
        xp=np,
    )
    rng = np.random.default_rng(11)
    n = 128
    o = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ex = np.full(n, -1, np.int32)
    hb, ib, tb = bruteforce.nearest_hit_np(o, d, ex, sd.tri_p1, sd.tri_p2,
                                           sd.tri_p3)
    hc, ic, tc = cluster_traverse.nearest_hit_clusters_np(o, d, ex, sd)
    np.testing.assert_array_equal(hb, hc)
    np.testing.assert_array_equal(ib[hb], ic[hb])
    np.testing.assert_allclose(tb[hb], tc[hb], rtol=1e-5, atol=1e-6)
    assert hb.sum() > 0
