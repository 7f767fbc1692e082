"""Orbax checkpointing + transform tests: save/restore round-trip,
reset-optimizer restore, contrastive -> node-prediction head reset."""

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
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh, shard_batch
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer
from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
    Checkpointer,
    reset_classifier_head,
    restore_params_into_state,
)

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)


def make_trainer(tmp_path, **kw):
    cfg = TrainConfig(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=4, max_text_len=16,
            node_buckets=(8, 16), node_capacity_buckets=(32, 64),
            image_capacity_buckets=(0, 8, 16), label_capacity_buckets=(16, 32),
        ),
        optim=OptimConfig(lr=1e-3, warmup_updates=2, total_num_update=20, update_freq=1),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        save_dir=str(tmp_path / "ckpt"),
        **kw,
    )
    return Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)


def tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_save_restore_roundtrip(tmp_path):
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=8, seed=0, **SYN)
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())
    step = trainer._make_train_step()
    with trainer.mesh:
        state, _ = step(state, shard_batch(trainer.mesh, batch.asdict()))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, 1)
    ckpt.wait()
    assert ckpt.latest_step() == 1

    state2 = trainer.init_state(batch.asdict())
    restored = ckpt.restore(state2)
    resumed = restore_params_into_state(trainer, state2, restored, False)
    assert int(resumed.step) == 1
    assert tree_equal(resumed.params, jax.device_get(state.params))
    ckpt.close()


def test_reset_optimizer_restore(tmp_path):
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=8, seed=1, **SYN)
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())
    step = trainer._make_train_step()
    with trainer.mesh:
        state, _ = step(state, shard_batch(trainer.mesh, batch.asdict()))
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, 1)
    ckpt.wait()

    state2 = trainer.init_state(batch.asdict())
    restored = ckpt.restore(state2)
    reset = restore_params_into_state(trainer, state2, restored, True)
    # params restored, step back to zero (fresh optimizer)
    assert int(reset.step) == 0
    assert tree_equal(reset.params, jax.device_get(state.params))
    ckpt.close()


def test_head_reset_transform(tmp_path):
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=8, seed=2, **SYN)
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())
    params = jax.device_get(state.params)
    new = reset_classifier_head(params, jax.random.PRNGKey(7))

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    old_k = get(params, ("params", "node_classifier", "kernel"))
    new_k = get(new, ("params", "node_classifier", "kernel"))
    assert not np.allclose(old_k, new_k)
    assert np.allclose(get(new, ("params", "node_classifier", "bias")), 0.0)
    # everything else untouched
    assert np.allclose(
        get(params, ("params", "text_pooler", "dense", "kernel")),
        get(new, ("params", "text_pooler", "dense", "kernel")),
    )


def test_restore_checkpoint_missing_new_fields(tmp_path):
    """Checkpoints saved before TrainState grew a field must still restore
    (structure-free fallback + field-level defaults)."""
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=8, seed=5, **SYN)
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())

    # simulate an old checkpoint: save a dict WITHOUT the epoch field
    old_style = {
        "step": np.asarray(3, np.int32),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "rng": np.asarray(jax.device_get(state.rng)),
    }
    ckpt = Checkpointer(str(tmp_path / "old"))
    ckpt.save(old_style, 3)
    ckpt.wait()
    restored = ckpt.restore(state)  # structure mismatch -> raw fallback
    resumed = restore_params_into_state(trainer, state, restored, False)
    assert int(resumed.step) == 3
    assert int(resumed.epoch) == 0  # default preserved
    ckpt.close()


def test_mid_epoch_resume_skips_consumed_batches(tmp_path):
    """Resuming mid-epoch must not replay already-trained batches."""
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=16, seed=6, **SYN)  # 12 train -> 3 bpe
    batches = list(trainer.train_batches(ds, epoch=1))
    bpe = len(batches)
    assert bpe >= 2
    state = trainer.init_state(batches[0].asdict())

    # simulate: 1 microbatch consumed in epoch 1 (epoch field still 0)
    state = state.replace(step=jnp.asarray(1, jnp.int32))
    seen = []
    orig_step = trainer._make_train_step()

    def counting_step(st, jb):
        seen.append(int(np.asarray(jb["idx"])[0]))
        return orig_step(st, jb)

    trainer._train_step = counting_step
    trainer.fit(ds, state=state, max_epoch=1)
    # the first batch of epoch 1 (already consumed) must be skipped
    first_epoch_batches = [int(b.idx[0]) for b in trainer.train_batches(ds, 1)]
    assert seen[0] != first_epoch_batches[0]
    assert len(seen) == bpe - 1
