"""Dataset wrappers: split management, epoch shuffling, batch iteration.

Functional equivalents of the reference hierarchy (mDT/src/data/dataset.py:
``GraphormerDataset`` -> ``BatchedDataDataset``/``NodeBatchedDataDataset``/
``ContrastiveBatchedDataDataset`` -> ``EpochShuffleDataset``) and the split
manager ``GraphormerPYGDataset`` (mDT/src/data/pyg_datasets/pyg_dataset.py):

- three split modes: random 80/10/10, explicit subsets, explicit index
  arrays with a seeded shuffle (pyg_dataset.py:29-63);
- per-epoch seeded permutation matching ``EpochShuffleDataset.set_epoch``
  (dataset.py:217-233: ``numpy_seed(seed + epoch - 1)`` permutation);
- batches collated into static-capacity buffers via data/collator.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import DataConfig, TaskConfig
from multimodaldiscussiontransformer_tpu.data.collator import Batch, collate
from multimodaldiscussiontransformer_tpu.data.preprocess import GraphItem


@dataclass
class DiscussionDataset:
    """An in-memory (or lazily-loading) set of preprocessed discussion graphs
    with train/valid/test splits."""

    items: Sequence  # GraphItem or callables returning GraphItem
    train_idx: np.ndarray
    valid_idx: np.ndarray
    test_idx: np.ndarray

    def get(self, i: int) -> GraphItem:
        it = self.items[i]
        return it() if callable(it) else it

    def __len__(self) -> int:
        return len(self.items)

    def text_length(self, i: int) -> int:
        """Max attended token length across the graph's nodes (cached —
        used by length-grouped batching so similar-length discussions share
        a batch and the collator's text-length bucket stays small)."""
        cache = self.__dict__.setdefault("_len_cache", {})
        if i not in cache:
            raw = self.items[i]
            if callable(getattr(raw, "text_length", None)):
                # lazy loaders expose a cheap probe (e.g. NpzItemLoader
                # reads one scalar instead of decompressing the images)
                cache[i] = int(raw.text_length())
            else:
                it = self.get(i)
                am = it.attention_mask
                cache[i] = (
                    int(np.max(np.where(am.any(axis=0))[0], initial=0)) + 1
                    if am.any()
                    else 1
                )
        return cache[i]

    @classmethod
    def from_splits(
        cls,
        items: Sequence,
        train_idx=None,
        valid_idx=None,
        test_idx=None,
        seed: int = 0,
        train_frac: float = 0.8,
        valid_frac: float = 0.1,
    ) -> "DiscussionDataset":
        """Explicit index arrays (seeded-shuffled like pyg_dataset.py:52-63)
        or a random 80/10/10 split (pyg_dataset.py:29-43)."""
        n = len(items)
        rng = np.random.RandomState(seed)
        if train_idx is None:
            perm = rng.permutation(n)
            n_train = int(n * train_frac)
            n_valid = int(n * valid_frac)
            train_idx = perm[:n_train]
            valid_idx = perm[n_train : n_train + n_valid]
            test_idx = perm[n_train + n_valid :]
        else:
            train_idx = np.asarray(train_idx)
            rng.shuffle(train_idx)
            valid_idx = np.asarray(
                valid_idx if valid_idx is not None else test_idx
            )
            test_idx = np.asarray(test_idx)
        return cls(items, train_idx, valid_idx, test_idx)


def epoch_permutation(n: int, seed: int, epoch: int) -> np.ndarray:
    """EpochShuffleDataset order: ``numpy_seed(seed + epoch - 1)``
    (dataset.py:224-226)."""
    return np.random.RandomState((seed + epoch - 1) % (2**32)).permutation(n)


def iterate_batches(
    dataset: DiscussionDataset,
    indices: np.ndarray,
    data_cfg: DataConfig,
    task_cfg: TaskConfig,
    epoch: int = 1,
    shuffle: bool = False,
    contrastive: bool = False,
    shard_multiple: int = 1,
    image_shape=(3, 224, 224),
    drop_last: Optional[bool] = None,
    batch_size: Optional[int] = None,
    pad_tail_to_batch: bool = False,
) -> Iterator[Batch]:
    """Yield collated static-shape batches for one epoch.

    ``batch_size`` overrides ``data_cfg.batch_size`` (the Trainer passes the
    dp-scaled global batch). With ``pad_tail_to_batch`` a ragged final batch
    (drop_last=False eval) is padded to the full batch size with inert
    zero-node graphs, so eval reuses the one full-batch compiled program and
    every array stays dp-shardable."""
    order = np.asarray(indices)
    if shuffle:
        order = order[epoch_permutation(len(order), task_cfg.seed, epoch)]
    bs = batch_size if batch_size is not None else data_cfg.batch_size
    drop = data_cfg.drop_last if drop_last is None else drop_last
    if shuffle and getattr(data_cfg, "length_grouped", False):
        # fairseq-style length grouping: sort the (already epoch-shuffled)
        # order by text length so each batch holds similar-length
        # discussions — the collator's per-batch text bucket then shrinks —
        # and shuffle the BATCH order with the same epoch seed so the data
        # order still varies per epoch
        lengths = np.asarray([dataset.text_length(int(i)) for i in order])
        order = order[np.argsort(lengths, kind="stable")]
        n_chunks = len(order) // bs
        chunk_perm = epoch_permutation(n_chunks, task_cfg.seed + 1, epoch)
        head = order[: n_chunks * bs].reshape(n_chunks, bs)[chunk_perm]
        order = np.concatenate([head.reshape(-1), order[n_chunks * bs :]])
    n_full = len(order) // bs
    end = n_full * bs if drop else len(order)
    for s in range(0, end, bs):
        chunk = order[s : s + bs]
        if len(chunk) == 0:
            continue
        items = [dataset.get(int(i)) for i in chunk]
        over = [
            (int(i), it.num_nodes)
            for i, it in zip(chunk, items)
            if it.num_nodes > task_cfg.max_nodes
        ]
        if over:
            raise ValueError(
                f"graph(s) exceed task.max_nodes={task_cfg.max_nodes} "
                f"(idx, nodes): {over[:5]} — the reference's --max-nodes "
                "bound (task.py:41-44); raise --max-nodes or prune the trees"
            )
        yield collate(
            items,
            pad_to_graphs=bs if pad_tail_to_batch else None,
            spatial_pos_max=task_cfg.spatial_pos_max,
            node_buckets=data_cfg.node_buckets,
            node_capacity_buckets=data_cfg.node_capacity_buckets,
            image_capacity_buckets=data_cfg.image_capacity_buckets,
            label_capacity_buckets=data_cfg.label_capacity_buckets,
            shard_multiple=shard_multiple,
            contrastive=contrastive,
            image_shape=image_shape,
            text_len_buckets=getattr(data_cfg, "text_len_buckets", None),
        )
