"""Discussion-tree distance computation.

Functional equivalent of the reference's per-tree O(n^2) Python recursion
(`get_relative_depth` / `spread_downwards`,
mDT/experiments/hateful_discussions/datasets/hateful_discussions.py:242-264)
and of the vestigial Cython Floyd–Warshall (mDT/src/data/algos.pyx:7-52),
re-implemented as:

- a vectorized numpy LCA formulation (default), and
- a native C++ kernel (multimodaldiscussiontransformer_tpu/native) for the
  ingestion hot loop, loaded via ctypes when built.

Semantics: for an ordered node pair (i, j) in a rooted tree, the relative
distance is the pair ``(up, down)`` where ``up = depth(i) - depth(lca(i,j))``
and ``down = depth(j) - depth(lca(i,j))`` — i.e. walk up from i to the lowest
common ancestor, then down to j. This matches the reference recursion exactly
(verified by the property tests in tests/test_trees.py).
"""

from __future__ import annotations

import numpy as np

from multimodaldiscussiontransformer_tpu.native import loader as _native


def _depths_and_ancestors(parents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Compute node depths and the ancestor-at-each-level table.

    Args:
        parents: (N,) int array; parents[i] is the parent of node i, and the
            root has parent -1. Nodes need not be topologically ordered.

    Returns:
        depths: (N,) int array.
        anc: (N, max_depth+1) int array; anc[i, d] = the ancestor of node i at
            depth d (or -1 when d > depth(i)).
    """
    n = len(parents)
    depths = np.full(n, -1, dtype=np.int64)
    order = []
    for i in range(n):
        # walk up to the first node of known depth
        chain = []
        j = i
        while j != -1 and depths[j] < 0:
            chain.append(j)
            j = parents[j]
        base = 0 if j == -1 else depths[j] + 1
        for k, node in enumerate(reversed(chain)):
            depths[node] = base + k
        order.extend(chain)
    max_depth = int(depths.max(initial=0))
    anc = np.full((n, max_depth + 1), -1, dtype=np.int64)
    # fill by walking up from each node (O(n * depth); trees are pruned to
    # depth < 7 in the reference pipeline, Pre-Processing/3-prune-trees.py)
    for i in range(n):
        j = i
        d = depths[i]
        while j != -1:
            anc[i, d] = j
            j = parents[j]
            d -= 1
    return depths, anc


def tree_distance_pairs(parents: np.ndarray) -> np.ndarray:
    """All-pairs (up, down) tree distances.

    Args:
        parents: (N,) int array, parent pointers with -1 for the root.

    Returns:
        (N, N, 2) int64 array; entry [i, j] = (up, down) as defined above.
        Diagonal is (0, 0).
    """
    parents = np.asarray(parents, dtype=np.int64)
    lib = _native.try_load()
    if lib is not None:
        return _native.tree_distance_pairs(lib, parents)
    return _tree_distance_pairs_numpy(parents)


def _tree_distance_pairs_numpy(parents: np.ndarray) -> np.ndarray:
    n = len(parents)
    depths, anc = _depths_and_ancestors(parents)
    # LCA depth for every pair: deepest d where anc[i, d] == anc[j, d] != -1.
    # anc is (N, D); compare across pairs: eq[i, j, d]
    eq = (anc[:, None, :] == anc[None, :, :]) & (anc[:, None, :] >= 0)
    # deepest matching level
    d_idx = np.arange(anc.shape[1])
    lca_depth = np.where(eq, d_idx, -1).max(axis=2)
    up = depths[:, None] - lca_depth
    down = depths[None, :] - lca_depth
    out = np.stack([up, down], axis=-1)
    return out.astype(np.int64)


def edges_to_parents(edge_index: np.ndarray, n: int, root: int = 0) -> np.ndarray:
    """Convert an undirected edge list (2, E) into parent pointers rooted at
    ``root`` (BFS orientation). Mirrors how the reference builds trees from
    parent_id links (hateful_discussions.py:116-148)."""
    adj = [[] for _ in range(n)]
    e = np.asarray(edge_index)
    for a, b in zip(e[0], e[1]):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    parents = np.full(n, -1, dtype=np.int64)
    seen = np.zeros(n, dtype=bool)
    seen[root] = True
    stack = [root]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if not seen[v]:
                seen[v] = True
                parents[v] = u
                stack.append(v)
    return parents


def floyd_warshall(adjacency: np.ndarray, unreachable: int = 510) -> np.ndarray:
    """All-pairs shortest path lengths over a dense adjacency matrix.

    Functional equivalent of the reference Cython kernel
    (mDT/src/data/algos.pyx:7-52): nonzero entries are unit edges, diagonal is
    0, and unreachable pairs are clamped to ``unreachable`` (510).
    Implemented with vectorized numpy min-plus iterations (O(N^3) total work
    like the original, but without a Python inner loop); the native C++
    library provides a faster path for the ingestion pipeline.
    """
    a = np.asarray(adjacency)
    n = a.shape[0]
    lib = _native.try_load()
    if lib is not None:
        return _native.floyd_warshall(lib, a.astype(np.int64), unreachable)
    m = np.where(a != 0, 1, unreachable).astype(np.int64)
    np.fill_diagonal(m, 0)
    for k in range(n):
        np.minimum(m, m[:, k : k + 1] + m[k : k + 1, :], out=m)
    m[m >= unreachable] = unreachable
    return m
