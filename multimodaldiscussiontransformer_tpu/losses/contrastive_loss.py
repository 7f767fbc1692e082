"""Contrastive loss over global discussion embeddings.

Re-implements ``GraphContrastiveLoss``
(mDT/src/criterions/contrastive_loss.py:52-227): BCE-with-logits on a scaled
cosine-similarity matrix of the per-discussion global embeddings, where
same-community pairs are positives, polar-opposite communities (``hard_y``)
are hard negatives, remaining pairs are soft negatives with a fixed or
adaptive weight, and the diagonal is zero-weighted.

The (B, B) similarity matrix is static-shape (batches are always full under
drop_last), so the whole criterion jit-compiles to one fused XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.registry import register_criterion


def contrastive_loss(
    embeddings: jnp.ndarray,  # (B, D) global discussion embeddings
    y: jnp.ndarray,  # (B,) community labels
    hard_y: jnp.ndarray,  # (B,) polar-opposite community labels
    soft_negative_weight: float = 0.0,
    adaptive_soft_negative_weight: bool = True,
    multiplication_scale: float = 20.0,
    valid: jnp.ndarray = None,  # (B,) bool — False for padded eval graphs
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (summed loss, sample_size, summable logging_output).

    ``valid`` masks batch-padding graphs (collator ``pad_to_graphs``) out of
    every pair term and every summed metric; with all-True it is exactly the
    reference computation (the reference never sees partial batches because
    its contrastive loader drops last)."""
    emb = embeddings.astype(jnp.float32)
    normed = emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
    )
    sim = normed @ normed.T * multiplication_scale  # (B, B)

    y = y.astype(jnp.float32)
    hard_y = hard_y.astype(jnp.float32)
    b_full = sim.shape[0]
    if valid is None:
        valid = jnp.ones((b_full,), bool)
    pair_valid = valid[:, None] & valid[None, :]
    # target[i, j] = 1 iff discussions i and j share a community
    # (contrastive_loss.py:117-120: targets.unsqueeze(1).eq(targets))
    target = ((y[:, None] == y[None, :]) & pair_valid).astype(jnp.float32)
    hard_target = (
        (hard_y[:, None] == y[None, :]) & pair_valid
    ).astype(jnp.float32)

    soft_labels = (target == 0) & (hard_target == 0) & pair_valid
    if adaptive_soft_negative_weight:
        # per-row weight: hard pairs / soft pairs * 2 (contrastive_loss.py:129-134)
        num_hard = jnp.sum(
            ((target == 1) | (hard_target == 1)).astype(jnp.float32), axis=1
        )
        soft_count = jnp.maximum(jnp.sum(soft_labels.astype(jnp.float32), axis=1), 1.0)
        extra_weight = (num_hard / soft_count * 2.0)[:, None]
    else:
        extra_weight = jnp.asarray(soft_negative_weight, jnp.float32)

    weight = jnp.where(soft_labels, extra_weight, 1.0)
    weight = jnp.where(pair_valid, weight, 0.0)
    eye = jnp.eye(b_full, dtype=bool)
    weight = jnp.where(eye, 0.0, weight)  # contrastive_loss.py:145-147

    # BCE with logits, sum reduction, elementwise weights
    # (contrastive_loss.py:160-165)
    per_pair = (
        jnp.maximum(sim, 0.0) - sim * target + jnp.log1p(jnp.exp(-jnp.abs(sim)))
    )
    loss = jnp.sum(per_pair * weight)

    n_valid = jnp.sum(valid.astype(jnp.int32))
    sim_count = n_valid * n_valid

    # sample metrics (contrastive_loss.py:150-157) — note the reference
    # compares the (B, B) prediction matrix against the (B,) label vector
    # with broadcasting; reproduced verbatim (restricted to valid pairs)
    pred = jnp.round(jax.nn.sigmoid(sim))
    ncorrect = jnp.sum(((pred == y[None, :]) & pair_valid).astype(jnp.int32))
    num_positive_correct = jnp.sum(
        ((pred == y[None, :]) & (pred == 1) & pair_valid).astype(jnp.int32)
    )
    total_positive = jnp.sum(((y == 1) & valid).astype(jnp.int32))
    pred_positive = jnp.sum(((pred == 1) & pair_valid).astype(jnp.int32))

    logging_output = {
        "loss": loss,
        "sample_size": sim_count,
        "nsentences": sim_count,
        "ncorrect": ncorrect,
        "positive_correct": num_positive_correct,
        "total_positive": total_positive,
        "pred_positive": pred_positive,
    }
    return loss, sim_count, logging_output


def reduce_contrastive_metrics(agg: Dict[str, Any]) -> Dict[str, float]:
    """Percent-scaled accuracy / precision / recall from summed counts
    (contrastive_loss.py:182-218)."""
    sample_size = max(float(agg["sample_size"]), 1.0)
    out = {"loss": float(agg["loss"]) / sample_size}
    out["accuracy"] = 100.0 * float(agg["ncorrect"]) / sample_size
    pred_pos = float(agg["pred_positive"])
    total_pos = float(agg["total_positive"])
    tp = float(agg["positive_correct"])
    out["precision"] = 100.0 * tp / pred_pos if pred_pos else 0.0
    out["recall"] = 100.0 * tp / total_pos if total_pos else 0.0
    return out


@register_criterion("contrastive_loss")
class ContrastiveCriterion:
    """Registry wrapper preserving the reference criterion name
    (contrastive_loss.py:52)."""

    def __init__(
        self,
        soft_negative_weight: float = 0.0,
        adaptive_soft_negative_weight: bool = True,
        multiplication_scale: float = 20.0,
    ):
        if adaptive_soft_negative_weight and soft_negative_weight != 0:
            raise ValueError(
                "adaptive_soft_negative_weight and soft_negative_weight are "
                "mutually exclusive"  # contrastive_loss.py:68-74
            )
        self.soft_negative_weight = soft_negative_weight
        self.adaptive_soft_negative_weight = adaptive_soft_negative_weight
        self.multiplication_scale = multiplication_scale

    def __call__(self, output, batch):
        # pad graphs (collator pad_to_graphs) have no real node rows
        grid_mask = batch.get("grid_mask")
        valid = grid_mask.any(-1) if grid_mask is not None else None
        return contrastive_loss(
            output.global_embedding,
            batch["y"],
            batch["hard_y"],
            self.soft_negative_weight,
            self.adaptive_soft_negative_weight,
            self.multiplication_scale,
            valid=valid,
        )

    reduce_metrics = staticmethod(reduce_contrastive_metrics)
    logging_outputs_can_be_summed = staticmethod(lambda: True)
