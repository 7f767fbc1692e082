"""End-to-end training tests on synthetic data over the virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)


def tiny_train_cfg(**kw):
    base = dict(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=8,
            max_text_len=16,
            node_buckets=(8, 16),
            node_capacity_buckets=(64, 128),
            image_capacity_buckets=(0, 8, 16, 32),
            label_capacity_buckets=(16, 32, 64),
        ),
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=20, update_freq=1
        ),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        validate_interval_updates=0,
        log_interval=100,
        positive_weight=1.5,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_step_runs_and_loss_drops(tmp_path):
    cfg = tiny_train_cfg(save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=48, seed=0, **SYN)

    batches = list(trainer.train_batches(ds, epoch=1))
    assert batches, "expected at least one full batch"
    state = trainer.init_state(batches[0].asdict())
    step = trainer._make_train_step()

    losses = []
    with trainer.mesh:
        for _ in range(6):
            for b in batches:
                from multimodaldiscussiontransformer_tpu.parallel.mesh import shard_batch

                jb = shard_batch(trainer.mesh, b.asdict())
                state, logs = step(state, jb)
                losses.append(
                    float(logs["loss"]) / max(float(logs["sample_size"]), 1)
                )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not drop: {losses[0]} -> {losses[-1]}"
    assert int(state.step) == len(losses)


def test_fit_and_evaluate(tmp_path):
    cfg = tiny_train_cfg(save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=24, seed=1, **SYN)
    state = trainer.fit(ds, max_epoch=1)
    metrics = trainer.evaluate(state, ds, "valid")
    for key in ("loss", "accuracy", "recall", "precision", "f1"):
        assert key in metrics
        assert np.isfinite(metrics[key])


def test_contrastive_training(tmp_path):
    cfg = tiny_train_cfg(
        save_dir=str(tmp_path / "ckpt"),
        task="contrastive_learning",
        criterion="contrastive_loss",
    )
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=48, seed=2, contrastive=True, **SYN)
    state = trainer.fit(ds, max_epoch=1)
    assert int(state.step) > 0
    metrics = trainer.evaluate(state, ds, "valid")
    assert np.isfinite(metrics["loss"])


def test_freeze_initial_encoders():
    """Frozen bottom-tower params must not move; fusion/head params must."""
    cfg = tiny_train_cfg()
    assert cfg.model.freeze_initial_encoders
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=16, seed=3, **SYN)
    batches = list(trainer.train_batches(ds, epoch=1))
    state0 = trainer.init_state(batches[0].asdict())
    p0 = jax.device_get(state0.params)
    step = trainer._make_train_step()
    with trainer.mesh:
        from multimodaldiscussiontransformer_tpu.parallel.mesh import shard_batch

        state1, _ = step(state0, shard_batch(trainer.mesh, batches[0].asdict()))
    p1 = jax.device_get(state1.params)

    frozen_same = []
    trained_moved = []

    def walk(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], path + "/" + k)
        else:
            same = np.allclose(a, b)
            if "/text_model/" in path or "/vit_model/" in path:
                frozen_same.append(same)
            elif "node_classifier" in path:
                trained_moved.append(not same)

    walk(p0["params"], p1["params"])
    assert frozen_same and all(frozen_same)
    assert trained_moved and any(trained_moved)


def test_freeze_skips_frozen_backward_compute():
    """--freeze-initial-encoders must actually ELIDE the bottom-tower
    backward, not just zero its updates: the reference's frozen modules
    have requires_grad=False so torch never computes their grads
    (multigraphormer_graph_encoder.py:223-228); the train step mirrors
    that with per-leaf stop_gradient, which removes the frozen weight
    grads and all cotangent flow below the lowest trainable layer at
    trace time. Pinned via XLA compiled-FLOPs cost analysis: the frozen
    step must cost measurably less than the unfrozen one."""
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import shard_batch

    buckets = dict(
        node_buckets=(8,), node_capacity_buckets=(16,),
        image_capacity_buckets=(4,), label_capacity_buckets=(8,),
    )
    items = synthetic_batch_items(
        2, seed=0, min_nodes=4, max_nodes=8, seq_len=16,
        vocab_size=128, image_prob=0.5, image_shape=IMG,
    )
    b = collate(items, spatial_pos_max=5, image_shape=IMG, **buckets).asdict()

    def compiled_flops(freeze):
        cfg = tiny_train_cfg(
            model=tiny_model_config().replace(
                freeze_initial_encoders=freeze
            ),
            data=DataConfig(batch_size=2, max_text_len=16, **buckets),
        )
        trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
        state = trainer.init_state(b)
        step = trainer._make_train_step()
        with trainer.mesh:
            comp = step.lower(state, shard_batch(trainer.mesh, b)).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    f_frozen = compiled_flops(True)
    f_unfrozen = compiled_flops(False)
    # bottom towers are 2 of 4 layers per tower in the tiny config; their
    # weight grads + cotangents are a double-digit share of the backward
    assert f_frozen < 0.95 * f_unfrozen, (f_frozen, f_unfrozen)


def test_remat_policies_match_no_remat():
    """remat (any policy) is a pure memory/recompute trade: loss and grads
    must equal the no-remat values exactly (jax.checkpoint recomputes the
    same program; this pins the remat_policy plumbing in models/mdt.py)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.core.config import (
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel

    base = tiny_model_config()
    base = base.replace(
        text_tower=dc.replace(
            base.text_tower,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        image_tower=dc.replace(
            base.image_tower,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
    )
    items = synthetic_batch_items(
        2, seed=0, min_nodes=4, max_nodes=8, seq_len=16,
        vocab_size=128, image_prob=0.5, image_shape=IMG,
    )
    b = collate(
        items, spatial_pos_max=5, node_buckets=(8,),
        node_capacity_buckets=(16,), image_capacity_buckets=(4,),
        label_capacity_buckets=(8,), image_shape=IMG,
    ).asdict()
    jb = {k: jnp.asarray(v) for k, v in b.items()}

    def loss_and_grads(cfg):
        model = MDTModel(cfg)
        params = model.init(jax.random.PRNGKey(0), jb, deterministic=True)

        def loss_fn(p):
            out = model.apply(
                p, jb, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out.logits.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss_fn))(params)

    ref_loss, ref_grads = loss_and_grads(base.replace(remat=False))
    for policy in ("full", "dots", "dots_saveable"):
        loss, grads = loss_and_grads(
            base.replace(remat=True, remat_policy=policy)
        )
        np.testing.assert_allclose(
            float(loss), float(ref_loss), rtol=1e-6, err_msg=policy
        )
        for a, r in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-6,
                err_msg=policy,
            )


def test_tp_sharding_matches_dp_only():
    """2-way tensor parallel must match the dp-only result (same params,
    same batch -> same loss) within float tolerance."""
    cfg = tiny_train_cfg()
    ds = synthetic_dataset(num_graphs=16, seed=4, **SYN)

    t_dp = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    batches = list(t_dp.train_batches(ds, epoch=1))
    state = t_dp.init_state(batches[0].asdict())
    ev_dp = t_dp._make_eval_step()

    t_tp = Trainer(cfg, mesh=make_mesh(2, 2), image_shape=IMG)
    t_tp.tx = t_dp.tx
    ev_tp = t_tp._make_eval_step()

    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        shard_batch,
        shard_params,
    )

    b = batches[0].asdict()
    with t_dp.mesh:
        logs_dp = ev_dp(state.params, shard_batch(t_dp.mesh, b))
    params_tp = shard_params(t_tp.mesh, jax.device_get(state.params))
    with t_tp.mesh:
        logs_tp = ev_tp(params_tp, shard_batch(t_tp.mesh, b))
    np.testing.assert_allclose(
        float(logs_dp["loss"]), float(logs_tp["loss"]), rtol=2e-4
    )


def test_fsdp_matches_dp_only():
    """ZeRO-3-style param sharding over dp (cfg.fsdp) must be numerically
    identical to replicated params: same params, same batch -> same eval
    loss; params/optimizer state actually sharded over dp."""
    from jax.sharding import PartitionSpec as P

    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        param_sharding,
        shard_batch,
    )

    cfg = tiny_train_cfg()
    ds = synthetic_dataset(num_graphs=48, seed=7, **SYN)

    t_rep = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    batches = list(t_rep.train_batches(ds, epoch=1))
    state = t_rep.init_state(batches[0].asdict())
    ev_rep = t_rep._make_eval_step()

    cfg_fsdp = tiny_train_cfg(fsdp=True)
    t_f = Trainer(cfg_fsdp, mesh=make_mesh(4, 1), image_shape=IMG)
    t_f.tx = t_rep.tx
    ev_f = t_f._make_eval_step()

    shardings = param_sharding(t_f.mesh, state.params, fsdp=True)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(spec != P() for spec in specs), "no param was dp-sharded"
    params_f = jax.tree.map(jax.device_put, state.params, shardings)

    b = batches[0].asdict()
    with t_rep.mesh:
        logs_rep = jax.device_get(
            ev_rep(state.params, shard_batch(t_rep.mesh, b))
        )
    with t_f.mesh:
        logs_f = jax.device_get(ev_f(params_f, shard_batch(t_f.mesh, b)))
    np.testing.assert_allclose(
        float(logs_rep["loss"]), float(logs_f["loss"]), rtol=2e-4
    )

    # and one train step runs with sharded params + sharded opt state
    state_f = t_f.init_state(batches[0].asdict())
    opt_specs = {
        getattr(s.sharding, "spec", P())
        for s in jax.tree.leaves(state_f.opt_state)
        if hasattr(s, "sharding")
    }
    assert any(spec != P() for spec in opt_specs), "optimizer state replicated"
    step = t_f._make_train_step()
    with t_f.mesh:
        state_f, logs = step(state_f, shard_batch(t_f.mesh, b))
    assert np.isfinite(float(logs["loss"]))
