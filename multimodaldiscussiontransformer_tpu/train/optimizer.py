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
import jax.numpy as jnp
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


def scale_by_adam_bf16_state(
    b1: float, b2: float, eps: float
) -> optax.GradientTransformation:
    """Adam moment tracking with bfloat16-STORED m/v, f32 math.

    The optimizer phase is HBM-bandwidth-bound on TPU (elementwise over
    every parameter); storing the two moment tensors in bf16 halves their
    read+write traffic and their footprint. Each update upcasts the
    moments to f32 in-register, applies the standard Adam recurrences and
    bias correction in f32, and downcasts the new moments once — so the
    only precision loss is the bf16 quantization of the STORED moments
    between steps (<=2^-9 relative), not of the update math itself.

    State is an ``optax.ScaleByAdamState`` (same structure as
    ``optax.scale_by_adam``, bf16 leaves) so checkpoint trees keep the
    familiar layout."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros(p.shape, jnp.bfloat16)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), cf)
        bc2 = 1.0 - jnp.power(jnp.float32(b2), cf)
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates,
        )
        nu32 = jax.tree.map(
            lambda n, g: b2 * n.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates,
        )
        out = jax.tree.map(
            lambda m, n: (m / bc1) / (jnp.sqrt(n / bc2) + eps), mu32, nu32
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(jnp.bfloat16), mu32),
            nu=jax.tree.map(lambda n: n.astype(jnp.bfloat16), nu32),
        )
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


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


# Shared freeze semantics for every train-step builder (scan and non-scan
# must never diverge — the step builders in train/trainer.py both route
# through these):


def freeze_stop_gradients(params: Any, labels: Any) -> Any:
    """Frozen bottom towers (--freeze-initial-encoders, run_train.sh:53)
    carry NO gradient: stop_gradient at the leaves makes autodiff treat the
    whole frozen compute as constant at trace time — no weight grads, no
    cotangent flow below the lowest trainable layer, exactly like the
    reference's requires_grad=False modules."""
    return jax.tree.map(
        lambda p, l: jax.lax.stop_gradient(p) if l == "freeze" else p,
        params, labels,
    )


def apply_updates_trainable(params: Any, updates: Any, labels: Any) -> Any:
    """optax.apply_updates, skipping frozen leaves (no zero-add traffic)."""
    return jax.tree.map(
        lambda p, u, l: p if l == "freeze" else p + u.astype(p.dtype),
        params, updates, labels,
    )


def trainable_gnorm(grads: Any, labels: Any) -> jnp.ndarray:
    """FairSeq reports gnorm over grad-carrying params only (frozen modules
    have requires_grad=False and contribute nothing)."""
    return jax.lax.stop_gradient(
        jnp.sqrt(
            sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g, l in zip(jax.tree.leaves(grads), jax.tree.leaves(labels))
                if l == "train"
            )
        )
    )


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
    if cfg.bf16_adam_state:
        # same transform chain as optax.adamw, with bf16-stored moments
        adamw = optax.chain(
            scale_by_adam_bf16_state(
                cfg.adam_betas[0], cfg.adam_betas[1], cfg.adam_eps
            ),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(sched),
        )
    else:
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
