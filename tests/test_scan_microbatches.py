"""Scan-accumulated gradient accumulation (OptimConfig.scan_microbatches):
FairSeq-exact update math (grads of summed losses / total sample size) and
fit-loop integration."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.loader import stack_microbatches
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import (
    make_mesh,
    shard_stacked_batch,
)
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)


def make_cfg(**kw):
    base = dict(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=4,
            max_text_len=16,
            node_buckets=(8,),
            node_capacity_buckets=(64,),
            image_capacity_buckets=(16,),
            label_capacity_buckets=(32,),
        ),
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=20, update_freq=3,
            scan_microbatches=True,
        ),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        log_interval=100,
        validate_interval_updates=0,
        # keep the equivalence check deterministic-friendly
        fast_dropout_rng=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_scan_step_matches_manual_fairseq_math():
    """One scan step over 3 stacked microbatches must equal: grads of the
    SUMMED losses accumulated across the microbatches, divided by the
    TOTAL sample size, applied once through the base optimizer."""
    import dataclasses

    base_model = tiny_model_config(
        dropout=0.0, attention_dropout=0.0, act_dropout=0.0
    )
    cfg = make_cfg(
        model=base_model.replace(
            text_tower=dataclasses.replace(
                base_model.text_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
            image_tower=dataclasses.replace(
                base_model.image_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
        ),
    )
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=40, seed=0, **SYN)
    batches = list(trainer.train_batches(ds, epoch=1))[:3]
    state = trainer.init_state(batches[0].asdict())
    step = trainer._make_train_step_scan()

    # manual reference FIRST — the jitted step donates (and deletes) state
    model, criterion = trainer.model, trainer.criterion

    def loss_fn(params, b):
        out = model.apply(params, b, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        loss, ssz, _ = criterion(out, b)
        return loss, ssz

    gacc = jax.tree.map(jnp.zeros_like, state.params)
    total = 0.0
    for b in batches:
        jb1 = {k: jnp.asarray(v) for k, v in b.asdict().items()}
        (loss, ssz), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, jb1
        )
        gacc = jax.tree.map(jnp.add, gacc, grads)
        total += float(ssz)
    grads = jax.tree.map(lambda g: g / max(total, 1.0), gacc)
    updates, _ = trainer.tx.update(grads, state.opt_state, state.params)
    params_ref = jax.tree.map(
        lambda p, u: p + u.astype(p.dtype), state.params, updates
    )
    params_ref = jax.device_get(params_ref)

    stacked = next(iter(stack_microbatches(iter(batches), 3)))
    with trainer.mesh:
        jb = shard_stacked_batch(trainer.mesh, stacked)
        new_state, logs = step(state, jb)

    ref_leaves = jax.tree.leaves(params_ref)
    got_leaves = jax.tree.leaves(jax.device_get(new_state.params))
    for a, b in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-5,
        )
    assert int(new_state.step) == 3
    assert np.isfinite(float(logs["loss"]))


def test_fit_with_scan_microbatches(tmp_path):
    cfg = make_cfg(save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=60, seed=1, **SYN)
    state = trainer.fit(ds, max_epoch=2)
    # microstep counter advanced in units of consumed microbatches
    assert int(state.step) > 0
    metrics = trainer.evaluate(state, ds, "valid")
    assert np.isfinite(metrics["loss"])


def test_stack_microbatches_shapes_and_tail():
    ds = synthetic_dataset(num_graphs=20, seed=2, **SYN)
    cfg = make_cfg()
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    batches = list(trainer.train_batches(ds, epoch=1))
    groups = list(stack_microbatches(iter(batches), 3))
    ks = [g["idx"].shape[0] for g in groups]
    assert sum(ks) == len(batches)
    assert all(x == 3 for x in ks[:-1])
