"""Tests for tree distances / APSP vs independent oracles.

Oracle for (up, down) distances re-states the reference recursion semantics
(hateful_discussions.py:242-264) as a direct dict-passing implementation."""

import copy

import numpy as np
import pytest

from multimodaldiscussiontransformer_tpu.data.trees import (
    _tree_distance_pairs_numpy,
    edges_to_parents,
    floyd_warshall,
    tree_distance_pairs,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    parents_to_edge_index,
    random_tree_parents,
)
from multimodaldiscussiontransformer_tpu.native import loader


def _parents_to_nested(parents):
    n = len(parents)
    children = [[] for _ in range(n)]
    root = None
    for i, p in enumerate(parents):
        if p < 0:
            root = i
        else:
            children[p].append(i)

    def build(i):
        return {"id": i, "tree": [build(c) for c in children[i]]}

    return build(root)


def _reference_distances(parents):
    """Dict-passing oracle with the same semantics as the reference
    get_relative_depth/spread_downwards recursion."""
    root = _parents_to_nested(parents)

    def get_relative_depth(node, depths):
        distances = copy.deepcopy(depths)
        for key in distances:
            distances[key][0] += 1
        distances[node["id"]] = [0, 0]
        for child in node["tree"]:
            val = get_relative_depth(child, distances)
            for key, value in val.items():
                if key not in distances:
                    value[1] += 1
                    distances[key] = value
        node["distances"] = distances
        return copy.deepcopy(distances)

    def spread_downwards(node, depths):
        dists = copy.deepcopy(depths)
        for key, value in dists.items():
            if key not in node["distances"]:
                value[0] += 1
                node["distances"][key] = value
        for child in node["tree"]:
            spread_downwards(child, node["distances"])

    get_relative_depth(root, {})
    spread_downwards(root, {})

    n = len(parents)
    out = np.zeros((n, n, 2), dtype=np.int64)

    def walk(node):
        for j, (u, d) in node["distances"].items():
            out[node["id"], j] = (u, d)
        for child in node["tree"]:
            walk(child)

    walk(root)
    return out


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [1, 2, 5, 17, 40])
def test_distance_pairs_match_reference_recursion(seed, n):
    rng = np.random.default_rng(seed)
    parents = random_tree_parents(n, rng)
    got = tree_distance_pairs(parents)
    want = _reference_distances(parents)
    np.testing.assert_array_equal(got, want)


def test_chain_tree():
    parents = np.array([-1, 0, 1, 2])
    d = tree_distance_pairs(parents)
    # node 3 -> node 0: up 3, down 0; node 0 -> node 3: up 0, down 3
    assert tuple(d[3, 0]) == (3, 0)
    assert tuple(d[0, 3]) == (0, 3)
    assert tuple(d[2, 2]) == (0, 0)


def test_siblings():
    parents = np.array([-1, 0, 0])
    d = tree_distance_pairs(parents)
    assert tuple(d[1, 2]) == (1, 1)
    assert tuple(d[2, 1]) == (1, 1)


def test_native_matches_numpy():
    lib = loader.try_load()
    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for n in (1, 7, 33):
        parents = random_tree_parents(n, rng)
        np.testing.assert_array_equal(
            loader.tree_distance_pairs(lib, parents),
            _tree_distance_pairs_numpy(parents),
        )


def test_floyd_warshall_matches_bfs():
    rng = np.random.default_rng(3)
    n = 12
    parents = random_tree_parents(n, rng)
    e = parents_to_edge_index(parents)
    adj = np.zeros((n, n), dtype=np.int64)
    adj[e[0], e[1]] = 1
    dist = floyd_warshall(adj)
    # oracle: BFS from each node
    for s in range(n):
        seen = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for v in np.flatnonzero(adj[u]):
                    if v not in seen:
                        seen[v] = seen[u] + 1
                        nxt.append(v)
            frontier = nxt
        for t in range(n):
            assert dist[s, t] == seen.get(t, 510)


def test_floyd_warshall_unreachable():
    adj = np.zeros((4, 4), dtype=np.int64)
    adj[0, 1] = adj[1, 0] = 1
    d = floyd_warshall(adj)
    assert d[0, 1] == 1 and d[2, 3] == 510 and d[0, 2] == 510
    assert d[2, 2] == 0


def test_edges_to_parents_roundtrip():
    rng = np.random.default_rng(5)
    parents = random_tree_parents(9, rng)
    e = parents_to_edge_index(parents)
    got = edges_to_parents(e, 9, root=0)
    # same tree distances regardless of recovered orientation
    np.testing.assert_array_equal(
        tree_distance_pairs(got), tree_distance_pairs(parents)
    )


def test_forest_native_matches_numpy():
    """Multi-root forests: native and numpy paths must agree (cross-tree
    pairs route through a virtual super-root)."""
    from multimodaldiscussiontransformer_tpu.data.trees import (
        _tree_distance_pairs_numpy,
        tree_distance_pairs,
    )
    from multimodaldiscussiontransformer_tpu.native import loader

    parents = np.asarray([-1, 0, 1, -1, 3], dtype=np.int64)  # two roots
    want = _tree_distance_pairs_numpy(parents)
    got = tree_distance_pairs(parents)  # native when built
    np.testing.assert_array_equal(got, want)
    if loader.try_load() is not None:
        native = loader.tree_distance_pairs(loader.try_load(), parents)
        np.testing.assert_array_equal(native, want)
    # cross-tree pair (node 2 depth 2, node 4 depth 1): up 3, down 2
    np.testing.assert_array_equal(want[2, 4], [3, 2])
