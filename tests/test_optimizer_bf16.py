"""bf16-stored Adam state (train/optimizer.py::scale_by_adam_bf16_state):
update math matches optax.adamw within bf16 quantization of the stored
moments, the state really is bf16, and a full train step runs with
OptimConfig.bf16_adam_state."""

import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp
import optax

from multimodaldiscussiontransformer_tpu.core.config import OptimConfig
from multimodaldiscussiontransformer_tpu.train.optimizer import (
    make_optimizer,
    polynomial_decay_schedule,
    scale_by_adam_bf16_state,
)


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.standard_normal((16, 16)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((16,)), jnp.float32),
    }


def test_bf16_adam_matches_f32_adam_loosely():
    """10 updates with shared grads: the bf16-state trajectory tracks the
    f32 optax.scale_by_adam trajectory. Bound: each stored moment carries
    <=2^-9 relative quantization per step; through sqrt + the m/v ratio
    that is ~<=3*2^-9 per-update relative error, amplified at most
    mildly by accumulation over 10 steps -> rtol 0.05 with an atol floor
    at the scale of tiny updates."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    lowp = scale_by_adam_bf16_state(b1, b2, eps)
    ref = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
    params = _params()
    s_l, s_r = lowp.init(params), ref.init(params)
    rng = np.random.default_rng(1)
    for _ in range(10):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape) * 1e-3, jnp.float32
            ),
            params,
        )
        u_l, s_l = lowp.update(grads, s_l)
        u_r, s_r = ref.update(grads, s_r)
    for a, b in zip(jax.tree.leaves(u_l), jax.tree.leaves(u_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.05, atol=1e-3
        )


def test_bf16_adam_state_dtype_and_structure():
    lowp = scale_by_adam_bf16_state(0.9, 0.999, 1e-8)
    state = lowp.init(_params())
    assert isinstance(state, optax.ScaleByAdamState)
    for leaf in jax.tree.leaves(state.mu) + jax.tree.leaves(state.nu):
        assert leaf.dtype == jnp.bfloat16
    # footprint really halves vs f32 moments
    f32_bytes = sum(l.size * 4 for l in jax.tree.leaves(_params()))
    lp_bytes = sum(
        l.size * l.dtype.itemsize
        for l in jax.tree.leaves(state.mu) + jax.tree.leaves(state.nu)
    )
    assert lp_bytes == f32_bytes


def test_make_optimizer_bf16_flag_full_chain():
    """make_optimizer(bf16_adam_state=True) — the full chain (adam + decay
    + lr schedule, multi_transform labels) produces updates close to the
    f32 chain and keeps moments bf16."""
    cfg = OptimConfig(
        lr=1e-3, warmup_updates=1, total_num_update=100, update_freq=1
    )
    params = _params(2)
    sched = polynomial_decay_schedule(
        cfg.lr, cfg.end_learning_rate, cfg.warmup_updates,
        cfg.total_num_update, cfg.power,
    )
    tx_lp = make_optimizer(
        dc.replace(cfg, bf16_adam_state=True), params, schedule=sched
    )
    tx_f32 = make_optimizer(cfg, params, schedule=sched)
    s_lp, s_f32 = tx_lp.init(params), tx_f32.init(params)
    grads = jax.tree.map(lambda p: 0.01 * jnp.ones_like(p), params)
    for _ in range(3):
        u_lp, s_lp = tx_lp.update(grads, s_lp, params)
        u_f32, s_f32 = tx_f32.update(grads, s_f32, params)
    for a, b in zip(jax.tree.leaves(u_lp), jax.tree.leaves(u_f32)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.05, atol=1e-8
        )
    moment_leaves = [
        l
        for l in jax.tree.leaves(s_lp)
        if hasattr(l, "dtype") and l.dtype == jnp.bfloat16
    ]
    assert moment_leaves, "bf16 moments not found in chain state"


def test_train_step_with_bf16_adam_state():
    """End-to-end: a Trainer step with bf16_adam_state on a tiny model —
    finite decreasing loss over 3 updates on one batch."""
    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        TaskConfig,
        TrainConfig,
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_dataset,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    img = (3, 32, 32)
    cfg = TrainConfig(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=4, max_text_len=16, node_buckets=(8,),
            node_capacity_buckets=(32,), image_capacity_buckets=(8,),
            label_capacity_buckets=(16,),
        ),
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=10, update_freq=1,
            bf16_adam_state=True,
        ),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        fast_dropout_rng=False,
        dp_size=1,
    )
    trainer = Trainer(cfg, image_shape=img)
    ds = synthetic_dataset(
        num_graphs=8, seed=0, seq_len=16, vocab_size=128,
        image_shape=img, max_nodes=8,
    )
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())
    step = trainer._make_train_step()
    losses = []
    with trainer.mesh:
        jb = shard_batch(trainer.mesh, batch.asdict())
        for _ in range(3):
            state, logs = step(state, jb)
            losses.append(
                float(logs["loss"]) / max(float(logs["sample_size"]), 1.0)
            )
    assert all(np.isfinite(x) for x in losses), losses
    assert losses[-1] < losses[0], losses
