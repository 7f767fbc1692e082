"""Two-stage workflow: contrastive pre-train -> node-prediction fine-tune
with checkpoint restore, optimizer reset, and classifier head transfer — the
reference's canonical training story (run_train.sh:57-63 restore +
reset-optimizer from a contrastive checkpoint; node_prediction.py:44-54
head-reset intent)."""

import numpy as np
import jax

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.core.registry import TASKS
from multimodaldiscussiontransformer_tpu.core import registry
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
    Checkpointer,
    restore_params_into_state,
)

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)


def base_cfg(tmp_path, **kw):
    d = dict(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=4, max_text_len=16,
            node_buckets=(8, 16), node_capacity_buckets=(32, 64),
            image_capacity_buckets=(0, 8, 16), label_capacity_buckets=(16, 32),
        ),
        optim=OptimConfig(lr=1e-3, warmup_updates=2, total_num_update=20, update_freq=1),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        validate_interval_updates=0,
        log_interval=100,
        save_dir=str(tmp_path / "stage1"),
        dp_size=2,
        tp_size=1,
    )
    d.update(kw)
    return TrainConfig(**d)


def test_contrastive_then_finetune(tmp_path):
    registry.populate()

    # ---- stage 1: contrastive pre-train ----
    cfg1 = base_cfg(
        tmp_path, task="contrastive_learning", criterion="contrastive_loss"
    )
    task1 = TASKS.get("contrastive_learning")(cfg1)
    trainer1 = task1.build_trainer(image_shape=IMG)
    ds1 = synthetic_dataset(num_graphs=24, seed=0, contrastive=True, **SYN)
    state1 = trainer1.fit(ds1, max_epoch=1)
    ckpt1 = Checkpointer(cfg1.save_dir)
    ckpt1.save(state1, int(state1.step))
    ckpt1.wait()
    ckpt1.close()
    pretrained = jax.device_get(state1.params)

    # ---- stage 2: node prediction from the contrastive checkpoint ----
    cfg2 = base_cfg(
        tmp_path, task="node_prediction", criterion="node_cross_entropy",
        save_dir=str(tmp_path / "stage2"),
        restore_file=cfg1.save_dir, reset_optimizer=True,
    )
    task2 = TASKS.get("node_prediction")(cfg2)
    trainer2 = task2.build_trainer(image_shape=IMG)
    ds2 = synthetic_dataset(num_graphs=24, seed=1, contrastive=False, **SYN)

    first = next(iter(trainer2.train_batches(ds2, epoch=1)))
    state2 = trainer2.init_state(first.asdict())
    restore_ckpt = Checkpointer(cfg2.restore_file)
    restored = restore_ckpt.restore(state2)
    restore_ckpt.close()
    assert restored is not None

    # head transfer: fresh classifier, pretrained everything else
    new_params = task2.transfer_from_contrastive(
        jax.device_get(
            restored["params"] if isinstance(restored, dict) else restored.params
        ),
        seed=0,
    )
    state2 = trainer2.load_params(state2, new_params)
    assert int(state2.step) == 0  # reset-optimizer semantics

    def leaf(tree, *path):
        for kk in path:
            tree = tree[kk]
        return np.asarray(tree)

    got = jax.device_get(state2.params)
    # classifier re-initialized, towers transferred
    assert not np.allclose(
        leaf(got, "params", "node_classifier", "kernel"),
        leaf(pretrained, "params", "node_classifier", "kernel"),
    )
    assert np.allclose(
        leaf(got, "params", "graph_encoder", "bottle_neck"),
        leaf(pretrained, "params", "graph_encoder", "bottle_neck"),
    )

    # fine-tune runs and produces classification metrics
    state2 = trainer2.fit(ds2, state=state2, max_epoch=1)
    metrics = trainer2.evaluate(state2, ds2, "valid")
    assert np.isfinite(metrics["loss"])
    assert "f1" in metrics


def test_two_stage_rehearsal_script(tmp_path):
    """The one-command rehearsal (raw JSON -> splits -> ingest -> contrastive
    pre-train -> transfer -> fine-tune -> test F1) runs green at CI scale and
    returns real metrics (VERDICT r1 item 6)."""
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.two_stage import (
        run,
    )

    result = run(
        str(tmp_path / "rehearsal"),
        n_trees=40,
        seed=0,
        stage1_updates=2,
        stage2_updates=6,
        max_length=16,
        dp_size=2,
    )
    for key in ("loss", "accuracy", "recall", "precision", "f1"):
        assert key in result and np.isfinite(result[key]), result
