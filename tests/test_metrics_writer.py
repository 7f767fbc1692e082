"""MetricsWriter sinks: JSONL always; TensorBoard when configured
(fairseq-train --tensorboard-logdir surface, SURVEY.md §2.3)."""

import json
import os

from multimodaldiscussiontransformer_tpu.train.metrics import MetricsWriter


def test_jsonl_sink(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write("train", 1, {"loss": 0.5, "accuracy": 0.9})
    w.write("valid", 1, {"loss": 0.6})
    w.close()
    recs = [
        json.loads(line)
        for line in open(tmp_path / "metrics.jsonl").read().splitlines()
    ]
    assert recs[0] == {"split": "train", "step": 1, "loss": 0.5, "accuracy": 0.9}
    assert recs[1]["split"] == "valid"


def test_tensorboard_sink(tmp_path):
    tb_dir = str(tmp_path / "tb")
    w = MetricsWriter(str(tmp_path), tensorboard_logdir=tb_dir)
    if w._tb is None:  # tensorboard genuinely unavailable in this env
        import pytest

        pytest.skip("torch.utils.tensorboard unavailable")
    w.write("train", 3, {"loss": 1.25, "note": "non-scalar stays jsonl-only"})
    w.close()
    events = [
        f for f in os.listdir(tb_dir) if f.startswith("events.out.tfevents")
    ]
    assert events, os.listdir(tb_dir)
    # the scalar actually landed in the event file
    data = open(os.path.join(tb_dir, events[0]), "rb").read()
    assert b"train/loss" in data
