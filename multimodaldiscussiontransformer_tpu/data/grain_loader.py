"""Grain-based multi-process batch loader.

The reference feeds its single GPU with 8 forked torch DataLoader workers
(mDT/src/__init__.py:8, run_train.sh:31 ``--num-workers 8``). The in-repo
default loader is a single prefetch thread (data/loader.py) — enough for
one chip because npz-load + collation is far cheaper than a train step —
but pod-scale input wants process-parallel collation with deterministic
order. This module provides that on Grain (pygrain):

- the batch ORDER is computed up front with exactly the
  ``data/dataset.py::iterate_batches`` semantics (seeded epoch shuffle,
  optional length grouping, drop-last / padded tails), so Grain only
  parallelizes the per-batch work (item loads + collate) across worker
  PROCESSES while preserving order;
- per-host slicing for multi-host meshes follows the
  ``parallel/input.py`` contract: pass ``host_index``/``host_count`` and
  each host collates only its contiguous slice of every global batch
  (combine on device with ``put_host_local``);
- dataset item thunks must be picklable for ``worker_count > 0``
  (``experiments/hateful_discussions/dataset.py::NpzItemLoader``; plain
  ``GraphItem`` dataclasses are picklable already).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import DataConfig, TaskConfig
from multimodaldiscussiontransformer_tpu.data.collator import Batch, collate
from multimodaldiscussiontransformer_tpu.data.dataset import (
    DiscussionDataset,
    epoch_permutation,
)
from multimodaldiscussiontransformer_tpu.parallel.input import (
    check_host_shapes,
    host_data_config,
    host_graph_slice,
)

try:  # grain is optional at import time; grain_batches requires it
    import grain.python as _pg

    _MapBase = _pg.MapTransform
except Exception:  # pragma: no cover - grain present in the target env
    _MapBase = object


def batch_index_chunks(
    dataset: DiscussionDataset,
    indices: np.ndarray,
    data_cfg: DataConfig,
    task_cfg: TaskConfig,
    epoch: int = 1,
    shuffle: bool = False,
    drop_last: Optional[bool] = None,
    batch_size: Optional[int] = None,
) -> List[np.ndarray]:
    """The epoch's batch order as index chunks — the exact order logic of
    ``iterate_batches`` (dataset.py:97-133), factored so a parallel loader
    can own the per-batch work without touching the order contract."""
    order = np.asarray(indices)
    if shuffle:
        order = order[epoch_permutation(len(order), task_cfg.seed, epoch)]
    bs = batch_size if batch_size is not None else data_cfg.batch_size
    drop = data_cfg.drop_last if drop_last is None else drop_last
    if shuffle and getattr(data_cfg, "length_grouped", False):
        lengths = np.asarray([dataset.text_length(int(i)) for i in order])
        order = order[np.argsort(lengths, kind="stable")]
        n_chunks = len(order) // bs
        chunk_perm = epoch_permutation(n_chunks, task_cfg.seed + 1, epoch)
        head = order[: n_chunks * bs].reshape(n_chunks, bs)[chunk_perm]
        order = np.concatenate([head.reshape(-1), order[n_chunks * bs :]])
    n_full = len(order) // bs
    end = n_full * bs if drop else len(order)
    return [order[s : s + bs] for s in range(0, end, bs) if len(order[s:s + bs])]


class _ChunkSource:
    """Grain RandomAccessDataSource over per-batch index chunks."""

    def __init__(self, chunks: List[np.ndarray]):
        self._chunks = chunks

    def __len__(self) -> int:
        return len(self._chunks)

    def __getitem__(self, i: int) -> np.ndarray:
        return self._chunks[i]


class _CollateChunk(_MapBase):
    """Picklable per-batch work: load items for one chunk and collate.
    A grain MapTransform so the DataLoader applies it in worker
    processes."""

    def __init__(
        self,
        dataset: DiscussionDataset,
        data_cfg: DataConfig,
        task_cfg: TaskConfig,
        contrastive: bool,
        shard_multiple: int,
        image_shape,
        pad_to_graphs: Optional[int],
        host_index: int,
        host_count: int,
        global_batch: int,
        global_nsamples: bool = False,
    ):
        self.dataset = dataset
        self.data_cfg = data_cfg
        self.task_cfg = task_cfg
        self.contrastive = contrastive
        self.shard_multiple = shard_multiple
        self.image_shape = tuple(image_shape)
        self.pad_to_graphs = pad_to_graphs
        self.host_index = host_index
        self.host_count = host_count
        self.global_batch = global_batch
        self.global_nsamples = global_nsamples

    def map(self, chunk: np.ndarray) -> Batch:
        return self(chunk)

    def __call__(self, chunk: np.ndarray) -> Batch:
        global_real = len(chunk)  # before host slicing
        if self.host_count > 1:
            if len(chunk) != self.global_batch and self.pad_to_graphs is None:
                # a ragged tail sliced per host would give later hosts
                # short/empty item lists and desynchronized shapes — the
                # multi-host hang check_host_shapes exists to prevent
                raise ValueError(
                    f"multi-host loading got a ragged chunk of {len(chunk)} "
                    f"rows (global batch {self.global_batch}); use "
                    "drop_last=True for training or pad_tail_to_batch=True "
                    "for eval so every chunk is host-sliceable"
                )
            # a short tail slices proportionally: host h owns rows
            # [h*per, (h+1)*per) of the padded global batch, so its real
            # rows are whatever of the tail falls in that window (possibly
            # none — collate([]) emits the matching all-pad batch)
            chunk = chunk[
                host_graph_slice(
                    self.host_index, self.host_count, self.global_batch
                )
            ]
        cfg = self.data_cfg
        items = [self.dataset.get(int(i)) for i in chunk]
        pad_to = self.pad_to_graphs
        if pad_to is not None and self.host_count > 1:
            pad_to = pad_to // self.host_count
        out = collate(
            items,
            spatial_pos_max=self.task_cfg.spatial_pos_max,
            node_buckets=cfg.node_buckets,
            node_capacity_buckets=cfg.node_capacity_buckets,
            image_capacity_buckets=cfg.image_capacity_buckets,
            label_capacity_buckets=cfg.label_capacity_buckets,
            shard_multiple=self.shard_multiple,
            contrastive=self.contrastive,
            image_shape=self.image_shape,
            text_len_buckets=getattr(cfg, "text_len_buckets", None),
            pad_to_graphs=pad_to,
            text_len=cfg.max_text_len,
        )
        if self.host_count > 1:
            check_host_shapes(out.asdict(), cfg)
            if self.global_nsamples:
                # put_host_local contract (parallel/input.py): nsamples
                # must be the GLOBAL real-graph count — host-computable
                # from the global chunk before slicing, no communication
                # needed. Opt-in: the default (local count) feeds
                # assemble_global_batch, which sums parts.
                import dataclasses

                out = dataclasses.replace(
                    out, nsamples=np.asarray(global_real, out.nsamples.dtype)
                )
        return out


def grain_batches(
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
    worker_count: int = 0,
    host_index: int = 0,
    host_count: int = 1,
    read_ahead: int = 2,
    global_nsamples: bool = False,
) -> Iterator[Batch]:
    """``iterate_batches``-equivalent stream with Grain process workers.

    ``worker_count=0`` runs in-process (useful for tests / small runs);
    ``worker_count>0`` forks that many collation workers while preserving
    batch order. With ``host_count>1``, yields this host's slice of every
    global batch (per-host capacities, parallel/input.py contract)."""
    import grain.python as pg

    bs = batch_size if batch_size is not None else data_cfg.batch_size
    chunks = batch_index_chunks(
        dataset, indices, data_cfg, task_cfg,
        epoch=epoch, shuffle=shuffle, drop_last=drop_last, batch_size=bs,
    )
    cfg = data_cfg if host_count == 1 else host_data_config(data_cfg, host_count)
    transform = _CollateChunk(
        dataset, cfg, task_cfg, contrastive, shard_multiple, image_shape,
        bs if pad_tail_to_batch else None, host_index, host_count, bs,
        global_nsamples,
    )

    if worker_count <= 0:
        for chunk in chunks:
            yield transform(chunk)
        return

    loader = pg.DataLoader(
        data_source=_ChunkSource(chunks),
        sampler=pg.IndexSampler(
            num_records=len(chunks),
            shard_options=pg.NoSharding(),  # host slicing is per-batch rows
            shuffle=False,  # order was fixed by batch_index_chunks
            num_epochs=1,
        ),
        operations=[transform],
        worker_count=worker_count,
        read_options=pg.ReadOptions(
            prefetch_buffer_size=max(read_ahead, 1),
            num_threads=max(read_ahead, 1),  # reads are per-batch thunks
        ),
    )
    yield from loader
