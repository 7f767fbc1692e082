"""Metric aggregation with the reference's summable-logging contract.

FairSeq sums per-worker ``logging_outputs`` across data-parallel workers and
across the logging interval before ``reduce_metrics`` computes derived
metrics (hatespeech_loss.py:133-182). Under SPMD jit the per-batch logging
outputs are already global sums (XLA reduces across shards), so the host
aggregator only sums across steps and applies the same reduction math.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np


class MetricAccumulator:
    """Sums logging outputs across steps; reduces on demand.

    ``update`` NEVER touches device values: it only stashes the logging
    dict, and ``reduce`` materializes the whole window with ONE batched
    ``jax.device_get``. The eager ``float(np.asarray(v))`` per step per key
    this replaces was the product fit loop's hidden fence — profiled at
    ~1.8 s/update over the tunneled chip (8 blocking D2H round-trips per
    update; tools/trace_breakdown.py, TRACE_r04.json), the whole
    bench-vs-CLI throughput gap."""

    # Each pending record holds one set of small device buffers; the window
    # is normally bounded by log_interval (fit folds every reduce()), but a
    # very long evaluate() sweep or a huge log_interval would otherwise
    # accumulate unboundedly — past this cap the window folds into host
    # sums early (one batched device_get per MAX_PENDING steps).
    MAX_PENDING = 4096

    def __init__(self, reduce_fn: Callable[[Dict[str, Any]], Dict[str, float]]):
        self._reduce_fn = reduce_fn
        self._pending: List[Dict[str, Any]] = []
        self._sums: Dict[str, float] = {}
        self._n_steps = 0

    def update(self, logging_output: Dict[str, Any]) -> None:
        self._pending.append(logging_output)
        self._n_steps += 1
        if len(self._pending) >= self.MAX_PENDING:
            self._fold()

    def _fold(self) -> None:
        """Materialize the pending window into host-side sums."""
        if not self._pending:
            return
        import jax

        window = jax.device_get(self._pending)  # one transfer, all steps
        self._pending = []
        for rec in window:
            for k, v in rec.items():
                self._sums[k] = self._sums.get(k, 0.0) + float(np.asarray(v))

    def reduce(self) -> Dict[str, float]:
        if not self._pending and not self._sums:
            return {}
        self._fold()
        out = self._reduce_fn(self._sums)
        out["steps_in_window"] = self._n_steps
        return out

    def reset(self) -> None:
        self._pending = []
        self._sums = {}
        self._n_steps = 0


class MetricsWriter:
    """Host-side metrics sink: JSONL always; W&B and/or TensorBoard when
    configured (the reference's --wandb-project, run_train.sh:17-19,56,
    and fairseq-train's --tensorboard-logdir surface, SURVEY.md §2.3)."""

    def __init__(
        self,
        save_dir: str,
        wandb_project: Optional[str] = None,
        config: Optional[dict] = None,
        tensorboard_logdir: Optional[str] = None,
    ):
        import os

        os.makedirs(save_dir, exist_ok=True)
        self._path = os.path.join(save_dir, "metrics.jsonl")
        self._wandb = None
        if wandb_project:
            try:
                import wandb  # noqa: F401

                self._wandb = wandb.init(project=wandb_project, config=config or {})
            except Exception:
                self._wandb = None
        self._tb = None
        if tensorboard_logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=tensorboard_logdir)
            except Exception:
                self._tb = None

    def write(self, split: str, step: int, metrics: Dict[str, float]) -> None:
        import json

        rec = {"split": split, "step": step, **metrics}
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log({f"{split}/{k}": v for k, v in metrics.items()}, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(f"{split}/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass  # non-scalar extras stay JSONL-only

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()


class NullMetricsWriter:
    """Sink for non-zero ranks on multi-process runs: every process runs
    the same loop (metrics are replicated global values), but only process
    0 may write — concurrent appends to one metrics.jsonl interleave."""

    def write(self, split: str, step: int, metrics) -> None:
        pass

    def close(self) -> None:
        pass
