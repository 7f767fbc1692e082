"""Optimizer recipe matching the canonical reference run.

Reference flags (mDT/experiments/hateful_discussions/run_train.sh:37-65):
``--optimizer adam --adam-betas '(0.9, 0.999)' --adam-eps 1e-8
--weight-decay 0.01 --lr-scheduler polynomial_decay --lr 3e-5
--end-learning-rate 3e-7 --warmup-updates 3246 --total-num-update 10820
--update-freq 3 --clip-norm 0``.

FairSeq's adam applies *decoupled* weight decay (AdamW semantics) and its
``polynomial_decay`` scheduler does linear warmup 0 -> lr then polynomial
decay to ``end_learning_rate`` at ``total_num_update``; both reproduced with
optax. ``--freeze-initial-encoders`` (run_train.sh:53) freezes the bottom
BERT/ViT towers but not the poolers/classifier
(multigraphormer_graph_encoder.py:223-228) — implemented as an optax
multi_transform over param-path labels, plus the corresponding
``update_freq`` gradient accumulation via ``optax.MultiSteps``
(the FairSeq trainer divides accumulated grads by the number of microbatches;
MultiSteps averages, matching because the loss is already normalized
per-step by sample_size).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax

from multimodaldiscussiontransformer_tpu.core.config import OptimConfig

# param-path prefixes frozen by --freeze-initial-encoders
FROZEN_PREFIXES = ("graph_encoder/text_model", "graph_encoder/vit_model")


def polynomial_decay_schedule(
    lr: float,
    end_lr: float,
    warmup_updates: int,
    total_num_update: int,
    power: float = 1.0,
) -> Callable:
    """FairSeq ``polynomial_decay``: linear warmup then polynomial decay."""

    def schedule(step):
        import jax.numpy as jnp

        # 1-based update counting: the k-th optimizer step uses the lr
        # FairSeq reports after update k (never an lr-0 first step)
        step = jnp.asarray(step, jnp.float32) + 1.0
        warmup = jnp.asarray(max(warmup_updates, 1), jnp.float32)
        total = jnp.asarray(max(total_num_update, 1), jnp.float32)
        warm_lr = lr * step / warmup
        frac = jnp.clip(
            (total - step) / jnp.maximum(total - warmup, 1.0), 0.0, 1.0
        )
        decay_lr = end_lr + (lr - end_lr) * frac**power
        return jnp.where(step < warmup_updates, warm_lr, decay_lr)

    return schedule


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "name", p))))
    return "/".join(parts)


def trainable_mask(params: Any, freeze_initial_encoders: bool) -> Any:
    """Label pytree: 'train' / 'freeze' per param leaf."""

    def label(path, _leaf):
        if freeze_initial_encoders and any(
            fp in _path_str(path) for fp in FROZEN_PREFIXES
        ):
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    cfg: OptimConfig,
    params: Any,
    freeze_initial_encoders: bool = False,
    schedule: Optional[Callable] = None,
    wrap_multisteps: bool = True,
) -> optax.GradientTransformation:
    sched = schedule or polynomial_decay_schedule(
        cfg.lr, cfg.end_learning_rate, cfg.warmup_updates,
        cfg.total_num_update, cfg.power,
    )
    adamw = optax.adamw(
        learning_rate=sched,
        b1=cfg.adam_betas[0],
        b2=cfg.adam_betas[1],
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )
    chain = [adamw]
    if cfg.clip_norm and cfg.clip_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(cfg.clip_norm))
    tx = optax.chain(*chain)
    labels = trainable_mask(params, freeze_initial_encoders)
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
    if cfg.update_freq > 1 and wrap_multisteps:
        # scan_microbatches accumulates inside the train step instead
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.update_freq)
    return tx
