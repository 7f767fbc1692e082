"""Host-side prefetching loader.

Replaces the reference's fork-based torch DataLoader workers
(mDT/src/__init__.py:8, run_train.sh:31 ``--num-workers 8``): a background
thread collates the next batches and stages them into device memory
(``jax.device_put`` with dp sharding) while the current step computes, so
the TPU never waits on the host for input.

One worker thread suffices: collation is numpy memcpy-bound and overlaps
fully with multi-millisecond device steps; ``device_put`` is async (returns
immediately, transfer overlaps compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

_SENTINEL = object()


class ThreadedPrefetcher:
    """Wrap a host batch iterator; yields device-resident batches.

    Args:
        batches: iterator of collator ``Batch`` objects (or dicts).
        put_fn: host batch dict -> device batch (e.g. ``shard_batch(mesh, .)``).
        depth: number of batches staged ahead.

    Supports early shutdown: ``close()`` (also called by the context manager
    and by garbage collection of an abandoned iterator) unblocks and joins
    the worker so no thread or staged device buffers leak when the consumer
    stops mid-epoch (e.g. trainer max_updates)."""

    def __init__(
        self,
        batches: Iterator[Any],
        put_fn: Callable[[dict], Any],
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def work():
            try:
                for b in batches:
                    host = b.asdict() if hasattr(b, "asdict") else b
                    staged = put_fn(host)
                    while not self._stop.is_set():
                        try:
                            self._q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and drop staged batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # last-resort cleanup for abandoned iterators
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()


def stack_microbatches(batches, k: int, pad_tail: bool = False):
    """Group a host batch stream into (k, ...)-stacked dicts for the
    scan-accumulated train step.

    Group members with different bucket shapes are grown to the group's
    member-wise max with INERT padding (collator.pad_batch_to_shapes —
    numerics-identical by the padding-invariance contract), so multi-entry
    bucket ladders work: the compiled-signature space is the set of
    member-wise-max combinations, the same ladder space as single batches.

    A ragged final group is yielded with its smaller leading dim (one
    extra compiled shape per epoch tail) — unless ``pad_tail``, which
    appends ALL-PAD microbatches (collator.all_pad_like: zero grads, zero
    sample size, zero metric counts) so every group has leading dim k and
    the scan step compiles exactly once per bucket signature. FairSeq
    counts a short tail as one full optimizer update
    (fairseq/trainer.py update-freq semantics); the padded group's update
    is bit-identical to the short group's."""
    import numpy as np

    from multimodaldiscussiontransformer_tpu.data.collator import (
        all_pad_like,
        pad_batch_to_shapes,
    )

    def flush(buf):
        if len(buf) == 1:
            return {key: v[None] for key, v in buf[0].items()}
        shapes = {
            key: tuple(
                max(np.asarray(b[key]).shape[i] for b in buf)
                for i in range(np.asarray(buf[0][key]).ndim)
            )
            for key in buf[0]
        }
        if any(np.asarray(b[key]).shape != shapes[key] for b in buf for key in shapes):
            buf = [pad_batch_to_shapes(b, shapes) for b in buf]
        return {key: np.stack([b[key] for b in buf]) for key in buf[0]}

    buf = []
    for b in batches:
        buf.append(b.asdict() if hasattr(b, "asdict") else b)
        if len(buf) == k:
            yield flush(buf)
            buf = []
    if buf:
        if pad_tail and len(buf) < k:
            pad = all_pad_like(buf[0])
            buf.extend(pad for _ in range(k - len(buf)))
        yield flush(buf)


def cast_images_for_transfer(host: dict, dtype) -> dict:
    """Cast the float image buffer to the model's compute dtype ON HOST.

    The ViT tower's first op casts pixels to the compute dtype anyway
    (models/vit.py patch embedding under ``dtype=bfloat16``), so casting
    before ``device_put`` is numerically IDENTICAL for a bf16 model while
    halving the dominant H2D payload (the image buffer is
    ``IMG_CAP x 3 x 224 x 224`` f32 = 38.5 MB/batch at canonical
    capacities vs ~1 MB for everything else; the reference hides the
    equivalent latency behind 8 loader workers, run_train.sh:31).
    No-op when there is no float image buffer."""
    if dtype is None:
        return host
    import numpy as np

    imgs = host.get("images")
    if imgs is None or not np.issubdtype(np.asarray(imgs).dtype, np.floating):
        return host
    out = dict(host)
    out["images"] = np.asarray(imgs).astype(dtype)
    return out


def prefetch_to_device(batches, mesh, depth: int = 2, image_dtype=None,
                       put_fn=None):
    """Convenience: iterate device-sharded batches with prefetching.

    ``image_dtype``: optional host-side transfer cast for the image buffer
    (see ``cast_images_for_transfer``).

    ``put_fn``: host dict -> device batch placement override. Defaults to
    ``shard_batch(mesh, .)`` (single-process: all devices addressable); a
    multi-process Trainer passes ``parallel.input.put_host_local`` so each
    host stages only its slice of the global batch.

    The returned object is a context-managed iterable; breaking out of the
    loop (or an exception) shuts the worker thread down."""
    from multimodaldiscussiontransformer_tpu.parallel.mesh import shard_batch

    put = put_fn if put_fn is not None else (lambda h: shard_batch(mesh, h))
    return ThreadedPrefetcher(
        batches,
        lambda h: put(cast_images_for_transfer(h, image_dtype)),
        depth,
    )
