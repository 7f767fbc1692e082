"""Tracing / profiling utilities (SURVEY.md §5).

The reference has no in-repo profiling (only nvidia tools pinned in its conda
env). The TPU-native story: ``jax.profiler`` traces viewable in
Perfetto/XProf, per-phase ``jax.named_scope`` annotations, and a lightweight
step-timing context for quick throughput numbers without a trace server.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace for the enclosed block:

        with profiling.trace("/tmp/mdt_trace"):
            state, logs = train_step(state, batch)

    Open the resulting directory with XProf/TensorBoard or Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling server for on-demand capture from XProf."""
    import jax

    return jax.profiler.start_server(port)


@contextlib.contextmanager
def named_scope(name: str) -> Iterator[None]:
    """Annotate a region of a jitted function for trace readability."""
    import jax

    with jax.named_scope(name):
        yield


class StepTimer:
    """Blocking step timer: wall-clock + items/sec, with warmup discard.

    Usage:
        timer = StepTimer(warmup=3)
        for batch in batches:
            with timer.step(items=batch.num_graphs):
                state, logs = train_step(state, batch)
            jax.block_until_ready(logs["loss"])
        print(timer.summary())
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._times = []
        self._items = []
        self._n = 0

    @contextlib.contextmanager
    def step(self, items: int = 1) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self._times.append(dt)
            self._items.append(items)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        total_t = sum(self._times)
        total_items = sum(self._items)
        return {
            "steps": len(self._times),
            "mean_step_s": total_t / len(self._times),
            "items_per_sec": total_items / total_t if total_t else 0.0,
        }


def memory_stats() -> Optional[Dict[str, int]]:
    """Per-device HBM stats when the backend exposes them."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    return stats() if callable(stats) else None
