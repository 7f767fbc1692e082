"""HatefulDiscussions registered dataset factory.

Reference: ``create_hatespeech_dataset``
(mDT/experiments/hateful_discussions/datasets/dataset.py:7-28): registers
``hateful_discussions``, loading the processed per-graph tensors plus
train/test index files (``$SLURM_TMPDIR/{train,test}-idx-many.txt``), with
``valid_idx == test_idx``.

This factory reads the .npz graphs produced by
experiments/hateful_discussions/ingest.py (the TPU-native port of the
one-time ``HatefulDiscussions.process()``,
hateful_discussions.py:46-236). Graphs load lazily — items are callables so
only the current batch's tensors are resident.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from multimodaldiscussiontransformer_tpu.core.registry import register_dataset
from multimodaldiscussiontransformer_tpu.data.dataset import DiscussionDataset
from multimodaldiscussiontransformer_tpu.data.preprocess import GraphItem


# Shared per-tree arrays (round-5 dedup ingest layout): each labelled-node
# copy is a tiny stub referencing its tree's shared-<n>.npz. Consecutive
# copies of the same tree hit this small LRU instead of re-decompressing
# the (image-bearing) shared file.
_SHARED_CACHE: "dict[str, dict]" = {}
_SHARED_CACHE_MAX = 8


def _load_shared(path: str) -> dict:
    hit = _SHARED_CACHE.pop(path, None)
    if hit is not None:
        _SHARED_CACHE[path] = hit  # re-insert: LRU order
        return hit
    with np.load(path, allow_pickle=False) as z:
        shared = {k: z[k] for k in z.files}
    _SHARED_CACHE[path] = shared
    while len(_SHARED_CACHE) > _SHARED_CACHE_MAX:
        _SHARED_CACHE.pop(next(iter(_SHARED_CACHE)))
    return shared


def load_graph_npz(path: str) -> GraphItem:
    """Load one processed graph saved by ingest — either the
    self-contained layout (save_graph_npz) or the round-5 dedup layout
    (save_copy_npz stub + shared-<tree>.npz, resolved relative to the
    stub's directory)."""
    with np.load(path, allow_pickle=False) as z:
        if "shared_ref" in z:
            shared = _load_shared(
                os.path.join(os.path.dirname(path), str(z["shared_ref"]))
            )
            return GraphItem(
                idx=int(z["idx"]),
                input_ids=shared["input_ids"],
                token_type_ids=shared["token_type_ids"],
                attention_mask=shared["attention_mask"],
                spatial_pos=shared["spatial_pos"],
                distance=shared["distance"],
                in_degree=shared["in_degree"],
                x_images=shared["x_images"],
                x_image_index=shared["x_image_index"],
                y=z["y"],
                y_mask=z["y_mask"] if "y_mask" in z else None,
                hard_y=z["hard_y"] if "hard_y" in z else None,
            )
        return GraphItem(
            idx=int(z["idx"]),
            input_ids=z["input_ids"],
            token_type_ids=z["token_type_ids"],
            attention_mask=z["attention_mask"],
            spatial_pos=z["spatial_pos"],
            distance=z["distance"],
            in_degree=z["in_degree"],
            x_images=z["x_images"],
            x_image_index=z["x_image_index"],
            y=z["y"],
            y_mask=z["y_mask"] if "y_mask" in z else None,
            hard_y=z["hard_y"] if "hard_y" in z else None,
        )


class NpzItemLoader:
    """Picklable lazy item thunk (multi-process loaders — e.g. the Grain
    pipeline, data/grain_loader.py — pickle the dataset into workers;
    lambdas would not survive the trip)."""

    __slots__ = ("path",)

    def __init__(self, path: str):
        self.path = path

    def __call__(self) -> GraphItem:
        return load_graph_npz(self.path)

    def text_length(self) -> int:
        """Cheap probe for length-grouped batching: decompress ONLY the
        ``text_len`` scalar (written by ingest.save_graph_npz) — or, for
        pre-round-4 corpora, only the attention_mask member — never the
        (much larger) image arrays. At 10^4-10^5 graphs the full-item load
        per epoch was the length-grouping scaling hazard."""
        with np.load(self.path, allow_pickle=False) as z:
            if "text_len" in z:
                return int(z["text_len"])
            am = z["attention_mask"]
        return (
            int(np.max(np.where(am.any(axis=0))[0], initial=0)) + 1
            if am.any() else 1
        )


def _read_index_file(path: str) -> np.ndarray:
    with open(path) as f:
        return np.asarray([int(line) for line in f if line.strip()], dtype=np.int64)


@register_dataset("hateful_discussions")
def create_hatespeech_dataset(
    root: Optional[str] = None,
    split: int = 0,
    seed: int = 1,
) -> DiscussionDataset:
    """Build the dataset from a processed root directory containing
    ``graph-<k>.npz`` files and ``train-idx-many.txt`` / ``test-idx-many.txt``
    index files (same layout as the reference's processed dir,
    hateful_discussions.py:225-231; dataset.py:8-28)."""
    root = root or os.environ.get(
        "MDT_DATA_ROOT", os.environ.get("SLURM_TMPDIR", ".")
    )
    graph_dir = os.path.join(root, "processed")
    if not os.path.isdir(graph_dir):
        graph_dir = root
    names = sorted(
        (f for f in os.listdir(graph_dir) if f.startswith("graph-") and f.endswith(".npz")),
        key=lambda s: int(s.split("-")[1].split(".")[0]),
    )
    paths = [os.path.join(graph_dir, f) for f in names]
    items = [NpzItemLoader(p) for p in paths]

    # split-specific index files when present (the 7-fold layout produced by
    # split-aware ingestion runs), else the reference's single pair
    train_file = os.path.join(root, f"train-idx-many-{split}.txt")
    test_file = os.path.join(root, f"test-idx-many-{split}.txt")
    if not (os.path.exists(train_file) and os.path.exists(test_file)):
        train_file = os.path.join(root, "train-idx-many.txt")
        test_file = os.path.join(root, "test-idx-many.txt")
    if os.path.exists(train_file) and os.path.exists(test_file):
        train_idx = _read_index_file(train_file)
        test_idx = _read_index_file(test_file)
        # valid == test, as in the reference (dataset.py:24-27)
        return DiscussionDataset.from_splits(
            items, train_idx=train_idx, valid_idx=test_idx, test_idx=test_idx,
            seed=seed,
        )
    return DiscussionDataset.from_splits(items, seed=seed)
