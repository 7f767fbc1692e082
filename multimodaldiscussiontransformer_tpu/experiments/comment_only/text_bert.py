"""Comment-only BERT baseline: per-comment text classification.

JAX re-provision of the reference baseline runner
(Comment-Only Experiments/src/text_bert.py:27-80 + HF Trainer): fine-tunes a
full BERT sequence classifier on per-comment parquet splits.

Recipe parity (text_bert.py:31-48, exp_configs.py:18-29): lr 3e-5, batch 48,
5000 max steps, 400 warmup, weight decay 0.01, eval every 500 steps,
metric-for-best = accuracy, metrics = accuracy/precision/recall/F1/AUC
(utils.py:10-23 — sklearn-equivalent math implemented with numpy),
predictions saved to ``predictions.parquet`` (text_bert.py:70-80).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import BertTowerConfig


@dataclass
class TextBertConfig:
    lr: float = 3e-5
    batch_size: int = 48
    max_steps: int = 5000
    warmup_steps: int = 400
    weight_decay: float = 0.01
    eval_steps: int = 500
    max_length: int = 100
    num_labels: int = 2
    seed: int = 0
    output_dir: str = "comment_only_out"
    tower: BertTowerConfig = None

    def __post_init__(self):
        if self.tower is None:
            self.tower = BertTowerConfig()


class BertTextClassifier:
    """Full BERT tower + pooler + classifier as one flax module bundle."""

    def __init__(self, cfg: TextBertConfig, dtype="float32"):
        import jax.numpy as jnp
        from flax import linen as nn

        from multimodaldiscussiontransformer_tpu.models.bert import (
            BertBottomTower,
            BertPooler,
        )

        tower_cfg = cfg.tower

        class _Classifier(nn.Module):
            @nn.compact
            def __call__(self, input_ids, token_type_ids, attention_mask, deterministic=True):
                h = BertBottomTower(
                    tower_cfg, tower_cfg.num_hidden_layers, name="bert"
                )(input_ids, token_type_ids, attention_mask, deterministic)
                pooled = BertPooler(tower_cfg.hidden_size, name="pooler")(h)
                pooled = nn.Dropout(tower_cfg.hidden_dropout_prob)(
                    pooled, deterministic=deterministic
                )
                return nn.Dense(cfg.num_labels, name="classifier")(pooled)

        self.cfg = cfg
        self.module = _Classifier()

    def init(self, rng, batch):
        return self.module.init(
            rng, batch["input_ids"], batch["token_type_ids"],
            batch["attention_mask"], deterministic=True,
        )

    def load_hf(self, params, bert_sd):
        """Import a full HF BertForSequenceClassification state dict."""
        import jax

        from multimodaldiscussiontransformer_tpu.utils import hf_import as hfi

        host = jax.device_get(params)
        p = host["params"]
        p["bert"]["embeddings"] = hfi.bert_embeddings_params(bert_sd, "bert.embeddings")
        for i in range(self.cfg.tower.num_hidden_layers):
            p["bert"][f"layer_{i}"] = hfi.bert_layer_params(
                bert_sd, f"bert.encoder.layer.{i}"
            )
        p["pooler"] = {"dense": hfi._linear(bert_sd, "bert.pooler.dense")}
        if "classifier.weight" in bert_sd:
            p["classifier"] = hfi._linear(bert_sd, "classifier")
        return host


def compute_metrics(logits: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """accuracy / precision / recall / F1 (binary) / AUC — numpy equivalent
    of the sklearn math in Comment-Only utils.py:10-23."""
    preds = logits.argmax(-1)
    labels = np.asarray(labels)
    tp = float(((preds == 1) & (labels == 1)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    acc = float((preds == labels).mean()) if len(labels) else 0.0
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    # AUC via rank statistic over softmax probabilities (utils.py:17-21)
    x = np.exp(logits - logits.max(-1, keepdims=True))
    probas = (x / x.sum(-1, keepdims=True))[:, 1]
    pos = probas[labels == 1]
    neg = probas[labels == 0]
    if len(pos) and len(neg):
        order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(order) + 1)
        # average ranks for ties
        concat = np.concatenate([neg, pos])
        sorted_vals = concat[order]
        i = 0
        while i < len(sorted_vals):
            j = i
            while j + 1 < len(sorted_vals) and sorted_vals[j + 1] == sorted_vals[i]:
                j += 1
            if j > i:
                avg = ranks[order[i : j + 1]].mean()
                ranks[order[i : j + 1]] = avg
            i = j + 1
        auc = (ranks[len(neg):].sum() - len(pos) * (len(pos) + 1) / 2) / (
            len(pos) * len(neg)
        )
    else:
        auc = 0.0
    return {"accuracy": acc, "precision": p, "recall": r, "f1": f1, "auc": float(auc)}


def load_parquet_split(data_dir: str, split: int) -> Tuple[Any, Any]:
    """The reference split layout (dataset_loader.py:9-15)."""
    import pandas as pd

    train = pd.read_parquet(
        os.path.join(
            data_dir, f"HatefulDiscussions_dataset_train-split-{split}.parquet"
        )
    )
    valid = pd.read_parquet(
        os.path.join(
            data_dir, f"HatefulDiscussions_dataset_test-split-{split}.parquet"
        )
    )
    return train, valid


def tokenize_frame(df, tokenizer, max_length: int):
    toks = tokenizer(list(df["text"]), max_length=max_length)
    return {
        "input_ids": toks["input_ids"],
        "token_type_ids": toks["token_type_ids"],
        "attention_mask": toks["attention_mask"],
        "label": np.asarray(df["label"], np.int32),
    }


def train(
    cfg: TextBertConfig,
    train_data: Dict[str, np.ndarray],
    valid_data: Dict[str, np.ndarray],
    hf_state_dict=None,
    log_fn=print,
) -> Tuple[Any, Dict[str, float], np.ndarray]:
    """Returns (params, best valid metrics, final valid logits)."""
    import jax
    import jax.numpy as jnp
    import optax

    model = BertTextClassifier(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    n = len(train_data["label"])
    bs = min(cfg.batch_size, n)

    def slice_batch(data, idx):
        return {k: jnp.asarray(v[idx]) for k, v in data.items()}

    first = slice_batch(train_data, np.arange(bs))
    params = model.init(rng, first)
    if hf_state_dict is not None:
        params = model.load_hf(params, hf_state_dict)

    sched = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)

    def lr(step):
        warm = sched(step)
        frac = jnp.clip(
            1 - (step - cfg.warmup_steps) / max(cfg.max_steps - cfg.warmup_steps, 1),
            0.0, 1.0,
        )
        return jnp.where(step < cfg.warmup_steps, warm, cfg.lr * frac)

    tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch, rng):
        def loss_fn(p):
            logits = model.module.apply(
                p, batch["input_ids"], batch["token_type_ids"],
                batch["attention_mask"], deterministic=False,
                rngs={"dropout": rng},
            )
            labels = batch["label"].astype(jnp.int32)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def predict_fn(params, batch):
        return model.module.apply(
            params, batch["input_ids"], batch["token_type_ids"],
            batch["attention_mask"], deterministic=True,
        )

    def predict_all(params, data):
        logits = []
        m = len(data["label"])
        for s in range(0, m, bs):
            idx = np.arange(s, min(s + bs, m))
            if len(idx) < bs:  # pad to batch shape, then trim
                pad_idx = np.concatenate([idx, np.full(bs - len(idx), idx[-1])])
                out = np.asarray(predict_fn(params, slice_batch(data, pad_idx)))
                logits.append(out[: len(idx)])
            else:
                logits.append(np.asarray(predict_fn(params, slice_batch(data, idx))))
        return np.concatenate(logits)

    best = {"accuracy": -1.0}
    best_params = params
    order_rng = np.random.RandomState(cfg.seed)
    perm = order_rng.permutation(n)
    pos = 0
    for step in range(1, cfg.max_steps + 1):
        if pos + bs > n:
            perm = order_rng.permutation(n)
            pos = 0
        idx = perm[pos : pos + bs]
        pos += bs
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss = step_fn(
            params, opt_state, slice_batch(train_data, idx), step_rng
        )
        if step % cfg.eval_steps == 0 or step == cfg.max_steps:
            logits = predict_all(params, valid_data)
            metrics = compute_metrics(logits, valid_data["label"])
            log_fn(f"step {step}: loss {float(loss):.4f} valid {metrics}")
            if metrics["accuracy"] > best["accuracy"]:
                best = metrics
                best_params = jax.device_get(params)
    final_logits = predict_all(best_params, valid_data)
    return best_params, best, final_logits


def save_predictions(output_dir: str, logits: np.ndarray, labels: np.ndarray) -> None:
    """predictions.parquet with y_pred/y_true (text_bert.py:74-80)."""
    import pandas as pd

    os.makedirs(output_dir, exist_ok=True)
    pd.DataFrame(
        {"y_pred": list(logits), "y_true": list(np.asarray(labels))}
    ).to_parquet(os.path.join(output_dir, "predictions.parquet"))
