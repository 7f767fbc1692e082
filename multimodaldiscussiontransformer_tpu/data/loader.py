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
    """

    def __init__(
        self,
        batches: Iterator[Any],
        put_fn: Callable[[dict], Any],
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None

        def work():
            try:
                for b in batches:
                    host = b.asdict() if hasattr(b, "asdict") else b
                    self._q.put(put_fn(host))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch_to_device(batches, mesh, depth: int = 2):
    """Convenience: iterate device-sharded batches with prefetching."""
    from multimodaldiscussiontransformer_tpu.parallel.mesh import shard_batch

    return iter(ThreadedPrefetcher(batches, lambda h: shard_batch(mesh, h), depth))
