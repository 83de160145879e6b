"""BVH builder invariants and structure tests."""

import numpy as np
import pytest

from jaderaytracerendering_tpu.accel import bvh
from jaderaytracerendering_tpu.scene import procedural


def _soup(n=200, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, size=(n, 3))
    p1 = c + rng.normal(scale=0.05, size=(n, 3))
    p2 = c + rng.normal(scale=0.05, size=(n, 3))
    p3 = c + rng.normal(scale=0.05, size=(n, 3))
    return (p1.astype(np.float32), p2.astype(np.float32), p3.astype(np.float32))


@pytest.mark.parametrize("method", ["sah", "median"])
def test_invariants_random_soup(method):
    p1, p2, p3 = _soup(333)
    nodes, perm = bvh.build(p1, p2, p3, leaf_size=8, method=method)
    p1s, p2s, p3s = p1[perm], p2[perm], p3[perm]
    bvh.check_invariants(nodes, 333, leaf_size=8)
    # each leaf box contains its triangles
    for i in range(1, nodes.n_nodes):
        if nodes.n[i] > 0:
            lo, hi = nodes.index[i], nodes.index[i] + nodes.n[i]
            pts = np.concatenate([p1s[lo:hi], p2s[lo:hi], p3s[lo:hi]])
            assert (pts >= nodes.aa[i] - 1e-4).all()
            assert (pts <= nodes.bb[i] + 1e-4).all()


def test_sentinel_node_zero():
    p1, p2, p3 = _soup(16)
    nodes, _ = bvh.build(p1, p2, p3)
    # node 0 is garbage (PathTrace.cu:1557-1563); root at node 1
    assert nodes.left[0] == 255 and nodes.right[0] == 128 and nodes.n[0] == 30


def test_single_leaf_scene():
    p1, p2, p3 = _soup(5)
    nodes, perm = bvh.build(p1, p2, p3, leaf_size=8)
    assert nodes.n_nodes == 2  # sentinel + one leaf
    assert nodes.n[1] == 5 and nodes.index[1] == 0
    bvh.check_invariants(nodes, 5)


def test_perm_is_permutation():
    p1, p2, p3 = _soup(100)
    _, perm = bvh.build(p1, p2, p3)
    assert sorted(perm.tolist()) == list(range(100))


def test_sah_splits_clustered_geometry():
    # two separated clusters: the root split should put each cluster in
    # its own subtree (SAH strongly prefers that)
    a = _soup(64, seed=1)
    b = tuple(x + 100.0 for x in _soup(64, seed=2))
    p1 = np.concatenate([a[0], b[0]])
    p2 = np.concatenate([a[1], b[1]])
    p3 = np.concatenate([a[2], b[2]])
    nodes, perm = bvh.build(p1, p2, p3)
    root = 1
    l, r = nodes.left[root], nodes.right[root]
    # children don't overlap on x
    assert nodes.bb[l][0] < nodes.aa[r][0] or nodes.bb[r][0] < nodes.aa[l][0]


def test_larger_mesh_invariants():
    v, f = procedural.buddha_standin(5_000)
    p1 = v[f[:, 0]].astype(np.float32)
    p2 = v[f[:, 1]].astype(np.float32)
    p3 = v[f[:, 2]].astype(np.float32)
    nodes, perm = bvh.build(p1, p2, p3, leaf_size=8)
    bvh.check_invariants(nodes, len(f), leaf_size=8)


def test_empty_and_degenerate():
    e = np.zeros((0, 3), np.float32)
    nodes, perm = bvh.build(e, e, e)
    assert nodes.n_nodes == 1 and len(perm) == 0
