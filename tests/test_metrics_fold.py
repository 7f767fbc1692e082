"""MetricAccumulator window-fold semantics (train/metrics.py).

Round-5 ADVICE fix: the deferred-readback window holds device buffers until
``reduce``; past ``MAX_PENDING`` records it must fold into host sums early
(bounding memory on very long evaluate() sweeps) with bit-identical
reduction results.
"""

from __future__ import annotations

import numpy as np

from multimodaldiscussiontransformer_tpu.train.metrics import (
    MetricAccumulator,
)


def _reduce(agg):
    return {"loss": float(agg["loss"]), "n": float(agg["n"])}


def test_fold_cap_bounds_pending_and_preserves_sums(monkeypatch):
    monkeypatch.setattr(MetricAccumulator, "MAX_PENDING", 16)
    acc = MetricAccumulator(_reduce)
    oracle = MetricAccumulator(_reduce)  # default huge cap: one-shot path
    for i in range(100):
        rec = {"loss": np.float32(0.5 * i), "n": np.int32(1)}
        acc.update(dict(rec))
        oracle.update(dict(rec))
        assert len(acc._pending) < 16
    a, b = acc.reduce(), oracle.reduce()
    assert a == b
    assert a["n"] == 100.0
    assert a["steps_in_window"] == 100
    # reset clears both the pending window and the folded sums
    acc.reset()
    assert acc.reduce() == {}


def test_reduce_is_idempotent_until_reset():
    acc = MetricAccumulator(_reduce)
    acc.update({"loss": np.float32(2.0), "n": np.int32(1)})
    first = acc.reduce()
    second = acc.reduce()  # pending already folded; sums retained
    assert first == second
