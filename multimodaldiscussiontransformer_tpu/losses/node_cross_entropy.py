"""Class-weighted node cross-entropy for hate-speech classification.

Re-implements ``GraphPredictionNodeCrossEntropy``
(mDT/src/criterions/hatespeech_loss.py:40-182) on static label-capacity
buffers: the reference gathers ``logits = comment_embeddings[y_mask]``
dynamically (line 95); here labelled nodes were gathered host-side into a
fixed ``(L,)`` buffer by the collator, with ``y_node -> C`` indices and a
``y_slot_mask`` marking real slots. Masked slots contribute exactly zero to
the loss and every confusion count.

Loss math (hatespeech_loss.py:113-118): sum-reduced cross-entropy with class
weights ``[negative_weight, positive_weight]``; ``sample_size`` = number of
labelled nodes, used by the trainer as the gradient denominator.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.registry import register_criterion


def node_cross_entropy_loss(
    logits_all: jnp.ndarray,  # (C, K) per-node logits from the model
    y: jnp.ndarray,  # (L,) int labels
    y_node: jnp.ndarray,  # (L,) node-slot indices into C (pad -> C)
    y_slot_mask: jnp.ndarray,  # (L,) bool
    positive_weight: float = 1.0,
    negative_weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (summed loss, sample_size, summable logging_output)."""
    # gather labelled-node logits; padded slots read zeros and are masked out
    logits = logits_all.at[y_node].get(mode="fill", fill_value=0).astype(jnp.float32)
    y = y.astype(jnp.int32)
    mask = y_slot_mask.astype(jnp.float32)

    # weighted CE, sum reduction (hatespeech_loss.py:113-118); torch's
    # weighted cross_entropy multiplies each sample's NLL by weight[target]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, y[:, None], axis=-1)[:, 0]
    class_weights = jnp.asarray([negative_weight, positive_weight], jnp.float32)
    w = class_weights[jnp.clip(y, 0, 1)]
    loss = jnp.sum(nll * w * mask)

    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == y) & y_slot_mask
    sample_size = jnp.sum(y_slot_mask.astype(jnp.int32))

    logging_output = {
        "loss": loss,
        "sample_size": sample_size,
        "nsentences": sample_size,
        "ncorrect": jnp.sum(correct.astype(jnp.int32)),
        "num_positive_correct": jnp.sum((correct & (pred == 1)).astype(jnp.int32)),
        "total_positive": jnp.sum(((y == 1) & y_slot_mask).astype(jnp.int32)),
        "num_pred_positive": jnp.sum(((pred == 1) & y_slot_mask).astype(jnp.int32)),
    }
    return loss, sample_size, logging_output


def reduce_node_metrics(agg: Dict[str, Any]) -> Dict[str, float]:
    """Accuracy / precision / recall / F1 from *summed* confusion counts —
    identical math to ``reduce_metrics`` (hatespeech_loss.py:133-173),
    including the divide-by-zero guards."""
    sample_size = float(agg["sample_size"])
    out = {"loss": float(agg["loss"]) / max(sample_size, 1.0)}
    tp = float(agg["num_positive_correct"])
    total_pos = float(agg["total_positive"])
    pred_pos = float(agg["num_pred_positive"])
    recall = 0.0 if total_pos == 0 else tp / total_pos
    precision = 0.0 if pred_pos == 0 else tp / pred_pos
    f1 = (
        0.0
        if (precision == 0 and recall == 0)
        else 2 * precision * recall / (precision + recall)
    )
    out["accuracy"] = float(agg["ncorrect"]) / max(sample_size, 1.0)
    out["recall"] = recall
    out["precision"] = precision
    out["f1"] = f1
    return out


@register_criterion("node_cross_entropy")
class NodeCrossEntropyCriterion:
    """Registry wrapper preserving the reference criterion name
    (hatespeech_loss.py:40-42)."""

    def __init__(self, positive_weight: float = 1.0, negative_weight: float = 1.0):
        self.positive_weight = positive_weight
        self.negative_weight = negative_weight

    def __call__(self, output, batch):
        return node_cross_entropy_loss(
            output.logits,
            batch["y"],
            batch["y_node"],
            batch["y_slot_mask"],
            self.positive_weight,
            self.negative_weight,
        )

    reduce_metrics = staticmethod(reduce_node_metrics)
    logging_outputs_can_be_summed = staticmethod(lambda: True)
