"""Tests for Cantor spatial bucketing vs the reference math
(pre_processing.py:18-53)."""

import numpy as np

from multimodaldiscussiontransformer_tpu.data.preprocess import (
    CLIP,
    NUM_SPATIAL_BUCKETS,
    cantor,
    spatial_bucket_table,
    spatial_buckets,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    synthetic_batch_items,
)


def test_cantor_is_sorted_pairing():
    assert cantor([2, 1]) == cantor([1, 2])
    # pi(min=1, 1+2=3): 3*4/2 + 1 = 7
    assert cantor([1, 2]) == 7.0
    assert cantor([0, 0]) == 0.0
    assert cantor([5, 5]) == 60.0


def test_num_buckets():
    # sorted pairs (a, b), a <= b <= 5 -> 21 distinct buckets
    assert NUM_SPATIAL_BUCKETS == 21


def test_bucket_table_symmetry_and_clip():
    table = spatial_bucket_table()
    assert table.shape == (CLIP + 1, CLIP + 1)
    np.testing.assert_array_equal(table, table.T)
    # every clipped pair has a distinct bucket per sorted pair
    ids = set()
    for u in range(CLIP + 1):
        for d in range(u, CLIP + 1):
            ids.add(int(table[u, d]))
    assert len(ids) == 21


def test_out_of_range_maps_to_corner_bucket():
    table = spatial_bucket_table()
    corner = int(table[CLIP, CLIP])
    pairs = np.array([[[6, 1], [1, 6]], [[9, 9], [0, 3]]], dtype=np.int64)
    got = spatial_buckets(pairs)
    assert got[0, 0] == corner
    assert got[0, 1] == corner
    assert got[1, 0] == corner
    assert got[1, 1] == int(table[0, 3])


def test_buckets_match_reference_mapping_construction():
    """Independently rebuild the reference's mapping dict and compare."""
    res = []
    for i in range(6):
        for k in range(6):
            res += [cantor([i, k])]
    res = list(set(res))
    mapping = {val: i for i, val in enumerate(res)}
    rng = np.random.default_rng(0)
    pairs = rng.integers(0, 9, size=(15, 15, 2))
    got = spatial_buckets(pairs)
    for i in range(15):
        for j in range(15):
            c = cantor(list(pairs[i, j]))
            want = mapping[c] if c in mapping else mapping[cantor([5, 5])]
            assert got[i, j] == want


def test_preprocess_item_degrees():
    items = synthetic_batch_items(2, seed=1, min_nodes=5, max_nodes=9)
    for it in items:
        n = it.num_nodes
        assert it.spatial_pos.shape == (n, n)
        assert it.distance.shape == (n, n)
        # tree: sum of degrees == 2 * (n - 1)
        assert it.in_degree.sum() == 2 * (n - 1)
        # distance = up + down, symmetric for trees
        np.testing.assert_array_equal(it.distance, it.distance.T)
        assert (np.diag(it.distance) == 0).all()
