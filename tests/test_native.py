"""Native C++ runtime equivalence tests (skipped if not built)."""

import numpy as np
import pytest

from jaderaytracerendering_tpu.accel import bvh, native
from jaderaytracerendering_tpu.scene import objloader, procedural

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libjade_native.so not built"
)


def _soup(n=500, seed=3):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, size=(n, 3))
    return tuple(
        (c + rng.normal(scale=0.05, size=(n, 3))).astype(np.float32)
        for _ in range(3)
    )


@pytest.mark.parametrize("method", ["sah", "median"])
def test_native_bvh_invariants_and_quality(method):
    p1, p2, p3 = _soup()
    nodes, perm = native.build(p1, p2, p3, leaf_size=8, method=method)
    assert sorted(perm.tolist()) == list(range(500))
    bvh.check_invariants(nodes, 500, leaf_size=8)
    # sentinel preserved
    assert nodes.left[0] == 255 and nodes.n[0] == 30


def test_native_matches_numpy_traversal_results():
    """Trees may differ on exact ties, but nearest hits must agree."""
    from jaderaytracerendering_tpu.ops import bruteforce

    p1, p2, p3 = _soup(400, seed=5)
    n_nodes, n_perm = native.build(p1, p2, p3)
    p_nodes, p_perm = bvh.build(p1, p2, p3)
    # same leaf partition cardinality and identical root AABB
    np.testing.assert_allclose(n_nodes.aa[1], p_nodes.aa[1], rtol=1e-6)
    np.testing.assert_allclose(n_nodes.bb[1], p_nodes.bb[1], rtol=1e-6)
    # identical permutations under stable sorting semantics
    np.testing.assert_array_equal(n_perm, p_perm)
    assert n_nodes.n_nodes == p_nodes.n_nodes
    np.testing.assert_array_equal(n_nodes.left, p_nodes.left)
    np.testing.assert_array_equal(n_nodes.index, p_nodes.index)


def test_native_bvh_large_mesh_speed():
    v, f = procedural.buddha_standin(60_000)
    p1 = v[f[:, 0]].astype(np.float32)
    p2 = v[f[:, 1]].astype(np.float32)
    p3 = v[f[:, 2]].astype(np.float32)
    import time

    t0 = time.perf_counter()
    nodes, perm = native.build(p1, p2, p3)
    dt = time.perf_counter() - t0
    bvh.check_invariants(nodes, len(f), leaf_size=8)
    assert dt < 30.0  # generous bound; native build is typically < 1s


def test_native_obj_parser_matches_python(tmp_path):
    v, f = procedural.uv_sphere(12, 24)
    p = str(tmp_path / "sphere.obj")
    objloader.write_obj(p, v, f)
    # add an indexed face + comment + quad to exercise parsing
    with open(p, "a") as fh:
        fh.write("# trailing comment\n")
        fh.write("f 1/2/3 5/6/7 9/10/11\n")
        fh.write("f 1 2 3 4\n")  # quad -> fan
    with open(p) as fh:
        pv, pf = objloader.parse_obj_text(fh.read())
    nv, nf = native.parse_obj(p)
    np.testing.assert_allclose(nv, pv)
    np.testing.assert_array_equal(nf, pf)


def test_native_obj_compat_slash(tmp_path):
    p = str(tmp_path / "x.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n" + "v 0 0 1\n" * 30 +
                 "f 1/11/21 2/12/22 3/13/23\n")
    with open(p) as fh:
        pv, pf = objloader.parse_obj_text(fh.read(), compat_slash_faces=True)
    nv, nf = native.parse_obj(p, compat_slash_faces=True)
    np.testing.assert_array_equal(nf, pf)


def test_read_obj_backend_selection(tmp_path):
    v, f = procedural.box()
    p = str(tmp_path / "box.obj")
    objloader.write_obj(p, v, f)
    a = objloader.read_obj(p, backend="native")
    b = objloader.read_obj(p, backend="python")
    np.testing.assert_allclose(a.p1, b.p1)
    np.testing.assert_allclose(a.norm, b.norm)
