"""Comment-only baseline tests (tiny tower, synthetic comments)."""

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import BertTowerConfig
from multimodaldiscussiontransformer_tpu.experiments.comment_only import text_bert


def tiny_cfg(**kw):
    tower = BertTowerConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=32,
    )
    base = dict(
        lr=1e-3, batch_size=8, max_steps=60, warmup_steps=2, eval_steps=20,
        max_length=16, tower=tower,
    )
    base.update(kw)
    return text_bert.TextBertConfig(**base)


def synthetic_comments(n, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n).astype(np.int32)
    ids = np.zeros((n, 16), np.int32)
    mask = np.ones((n, 16), np.int32)
    for i in range(n):
        # class-dependent token distribution so the task is learnable
        lo, hi = (1, 64) if labels[i] == 0 else (64, 127)
        ids[i] = rng.integers(lo, hi, 16)
    return {
        "input_ids": ids,
        "token_type_ids": np.zeros_like(ids),
        "attention_mask": mask,
        "label": labels,
    }


def test_train_baseline_and_metrics(tmp_path):
    cfg = tiny_cfg(output_dir=str(tmp_path))
    train = synthetic_comments(64, 0)
    valid = synthetic_comments(32, 1)
    params, best, logits = text_bert.train(cfg, train, valid, log_fn=lambda s: None)
    assert logits.shape == (32, 2)
    assert best["accuracy"] > 0.6  # separable synthetic task
    for k in ("accuracy", "precision", "recall", "f1", "auc"):
        assert k in best

    text_bert.save_predictions(str(tmp_path), logits, valid["label"])
    import pandas as pd

    df = pd.read_parquet(tmp_path / "predictions.parquet")
    assert len(df) == 32


def test_compute_metrics_auc():
    """AUC rank-statistic matches sklearn on a small case."""
    logits = np.asarray(
        [[0.1, 0.9], [0.8, 0.2], [0.4, 0.6], [0.7, 0.3], [0.45, 0.55]]
    )
    labels = np.asarray([1, 0, 1, 0, 0])
    m = text_bert.compute_metrics(logits, labels)
    try:
        from sklearn.metrics import roc_auc_score

        x = np.exp(logits)
        probas = (x / x.sum(-1, keepdims=True))[:, 1]
        expected = roc_auc_score(labels, probas)
        np.testing.assert_allclose(m["auc"], expected, rtol=1e-9)
    except ImportError:
        np.testing.assert_allclose(m["auc"], 1.0, rtol=1e-9)
