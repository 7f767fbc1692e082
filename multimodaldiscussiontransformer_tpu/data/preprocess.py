"""Per-item graph preprocessing: Cantor spatial bucketing, distances, degrees.

Reproduces the math of the reference `preprocess_item`
(mDT/src/data/pyg_datasets/pre_processing.py:18-69) exactly:

- (up, down) tree-distance pairs are mapped through the Cantor pairing
  function (sorted, so symmetric in up/down) into spatial buckets, with both
  components clipped at 5 — i.e. pairs where either component exceeds 5 fall
  into the (5, 5) bucket (pre_processing.py:39-53).
- ``distance[i, j] = up + down`` is kept separately and used by the collator
  to clip attention to nodes within ``spatial_pos_max`` hops
  (collator.py:122-126).
- in/out degrees are the adjacency row sums; trees are undirected so
  out_degree == in_degree (pre_processing.py:66-67).

The bucket-id assignment depends on CPython's ``set`` iteration order in the
reference (pre_processing.py:36-37). We reproduce it by running the identical
construction at import time, so bucket ids match the reference bit-for-bit on
the same interpreter — required for checkpoint-level parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from multimodaldiscussiontransformer_tpu.native import loader as _native

CLIP = 5  # per-component clip of (up, down) (pre_processing.py:32-34, 47)


def cantor(x) -> float:
    """Sorted Cantor pairing, float-valued like the reference
    (pre_processing.py:18-20)."""
    x = sorted(x)
    return ((x[0] + x[1]) * (x[0] + x[1] + 1)) / 2 + x[0]


def _build_mapping() -> Dict[float, int]:
    # identical construction to pre_processing.py:31-37 so that the
    # set-iteration-order-dependent bucket ids agree with the reference
    res = []
    for i in range(CLIP + 1):
        for k in range(CLIP + 1):
            res += [cantor([i, k])]
    res = list(set(res))
    return {val: i for i, val in enumerate(res)}


_MAPPING = _build_mapping()
NUM_SPATIAL_BUCKETS = len(_MAPPING)  # 21 distinct sorted pairs for clip 5


def spatial_bucket_table() -> np.ndarray:
    """(CLIP+1, CLIP+1) table: bucket id for each clipped (up, down) pair."""
    table = np.empty((CLIP + 1, CLIP + 1), dtype=np.int64)
    for u in range(CLIP + 1):
        for d in range(CLIP + 1):
            c = cantor([u, d])
            table[u, d] = _MAPPING.get(c, _MAPPING[cantor([CLIP, CLIP])])
    return table


_TABLE = spatial_bucket_table()


def spatial_buckets(pairs: np.ndarray) -> np.ndarray:
    """Map (N, N, 2) (up, down) pairs to (N, N) spatial bucket ids.

    Out-of-range pairs (either component > 5) map to the (5, 5) bucket,
    mirroring the ``cantor(k) in mapping`` fallback (pre_processing.py:43-47).
    """
    pairs = np.asarray(pairs, dtype=np.int64)
    lib = _native.try_load()
    if lib is not None and pairs.ndim == 3:
        return _native.spatial_buckets(lib, pairs, _TABLE, CLIP)
    up, down = pairs[..., 0], pairs[..., 1]
    oob = (up > CLIP) | (down > CLIP)
    u = np.where(oob, CLIP, up)
    d = np.where(oob, CLIP, down)
    return _TABLE[u, d]


@dataclass
class GraphItem:
    """One preprocessed discussion graph (host-side, numpy).

    Field names mirror the reference item attributes
    (pre_processing.py:62-67, hateful_discussions.py:150-223)."""

    idx: int
    input_ids: np.ndarray  # (N, T) int32
    token_type_ids: np.ndarray  # (N, T) int32
    attention_mask: np.ndarray  # (N, T) int32
    spatial_pos: np.ndarray  # (N, N) int64, UNSHIFTED bucket ids
    distance: np.ndarray  # (N, N) int64, up+down hop count
    in_degree: np.ndarray  # (N,) int64, UNSHIFTED degrees
    x_images: np.ndarray  # (K, 3, H, W) float32 (K may be 0)
    x_image_index: np.ndarray  # (N,) bool, which nodes carry an image
    y: np.ndarray  # labels; node task: (L,) for labelled nodes
    y_mask: Optional[np.ndarray] = None  # (N,) bool, node task only
    hard_y: Optional[np.ndarray] = None  # contrastive task only

    @property
    def num_nodes(self) -> int:
        return int(self.input_ids.shape[0])


def preprocess_item(
    idx: int,
    tokens: Dict[str, np.ndarray],
    edge_index: np.ndarray,
    distance_pairs: np.ndarray,
    x_images: np.ndarray,
    x_image_index: np.ndarray,
    y: np.ndarray,
    y_mask: Optional[np.ndarray] = None,
    hard_y: Optional[np.ndarray] = None,
) -> GraphItem:
    """Build a GraphItem from raw per-graph arrays.

    Equivalent of pre_processing.py:23-69 with numpy in place of torch:
    adjacency -> degrees; (up, down) pairs -> spatial buckets + hop distance.
    """
    n = tokens["input_ids"].shape[0]
    adj = np.zeros((n, n), dtype=bool)
    e = np.asarray(edge_index)
    if e.size:
        adj[e[0], e[1]] = True
    in_degree = adj.sum(axis=1).astype(np.int64)  # pre_processing.py:66
    pairs = np.asarray(distance_pairs, dtype=np.int64)
    spatial = spatial_buckets(pairs)
    distance = pairs.sum(axis=-1)  # pre_processing.py:54-56
    return GraphItem(
        idx=idx,
        input_ids=np.asarray(tokens["input_ids"], dtype=np.int32),
        token_type_ids=np.asarray(tokens["token_type_ids"], dtype=np.int32),
        attention_mask=np.asarray(tokens["attention_mask"], dtype=np.int32),
        spatial_pos=spatial,
        distance=distance,
        in_degree=in_degree,
        x_images=np.asarray(x_images, dtype=np.float32).reshape(
            (-1,) + tuple(np.asarray(x_images).shape[-3:])
            if np.asarray(x_images).size
            else (0, 3, 224, 224)
        ),
        x_image_index=np.asarray(x_image_index, dtype=bool),
        y=np.asarray(y),
        y_mask=None if y_mask is None else np.asarray(y_mask, dtype=bool),
        hard_y=None if hard_y is None else np.asarray(hard_y),
    )
