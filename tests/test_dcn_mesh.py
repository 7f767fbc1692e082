"""Multi-slice (DCN) mesh: data parallelism across slices over DCN.

The reference scales only via single-host DDP (run_train.sh:52); the
TPU-native production story adds multi-slice pods (SURVEY.md §2.4 comm row
"DCN for multi-slice"): an outermost ``dcn`` mesh axis over which the batch
shards jointly with ``dp`` while params replicate per slice, so fsdp/tp/sp
collectives ride intra-slice ICI and only the once-per-step grad
all-reduce crosses DCN. On CPU the 8 virtual devices stand in for 2 slices
x 4 chips."""

import dataclasses as dc

import jax
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import (
    batch_sharding,
    data_axes,
    data_parallel_size,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
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


def test_make_mesh_dcn_geometry():
    m = make_mesh(dp_size=2, tp_size=2, num_slices=2)
    assert m.axis_names == ("dcn", "dp", "tp")
    assert dict(m.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    assert data_axes(m) == ("dcn", "dp")
    assert data_parallel_size(m) == 4

    # dp_size=-1 means per-slice dp
    m2 = make_mesh(dp_size=-1, tp_size=2, num_slices=2)
    assert dict(m2.shape) == {"dcn": 2, "dp": 2, "tp": 2}

    # sp nests innermost, inside the slice
    m3 = make_mesh(dp_size=-1, tp_size=1, sp_size=2, num_slices=2)
    assert m3.axis_names == ("dcn", "dp", "tp", "sp")
    assert dict(m3.shape) == {"dcn": 2, "dp": 2, "tp": 1, "sp": 2}

    # slice grouping is contiguous when the backend reports no slice_index:
    # slice 0 must hold the first half of the device list
    devs = jax.devices()
    assert list(np.asarray(m.devices)[0].flatten()) == devs[:4]

    with pytest.raises(ValueError):
        make_mesh(dp_size=-1, num_slices=3)  # 8 devices not divisible


def test_dcn_batch_shards_over_both_axes():
    m = make_mesh(dp_size=2, tp_size=2, num_slices=2)
    batch = {
        "input_ids": np.zeros((16, 16), np.int32),
        "nsamples": np.asarray(4, np.int32),
        "odd": np.zeros((3, 2), np.float32),  # not divisible by 4
    }
    with pytest.warns(UserWarning, match="not divisible"):
        specs = batch_sharding(m, batch)
    assert specs["input_ids"].spec == P(("dcn", "dp"), None)
    assert specs["nsamples"].spec == P()
    assert specs["odd"].spec == P()


def test_dcn_params_replicate_across_slices_fsdp_within():
    """fsdp shards weights over the intra-slice dp axis only — each slice
    keeps a full replica (the DCN link never carries fsdp all-gathers)."""
    m = make_mesh(dp_size=2, tp_size=2, num_slices=2)
    params = {"w": np.zeros((8, 4), np.float32), "b": np.zeros((4,), np.float32)}
    specs = param_sharding(m, params, fsdp=True)
    assert "dcn" not in jax.tree.leaves(
        {k: [a for a in s.spec if a] for k, s in specs.items()}
    )
    assert specs["w"].spec == P("dp", None)


def test_dcn_eval_matches_dp_only():
    """2-slice x (dp=2, tp=2) must match the single-device result (same
    params, same batch -> same loss) within float tolerance."""
    cfg = tiny_train_cfg()
    ds = synthetic_dataset(num_graphs=16, seed=11, **SYN)

    t_ref = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    batches = list(t_ref.train_batches(ds, epoch=1))
    state = t_ref.init_state(batches[0].asdict())
    ev_ref = t_ref._make_eval_step()

    cfg_dcn = dc.replace(
        cfg,
        num_slices=2,
        dp_size=2,
        tp_size=2,
        # global (not per-replica) batch so both trainers see batch 8
        data=dc.replace(cfg.data, batch_size_is_per_replica=False),
    )
    t_dcn = Trainer(cfg_dcn, image_shape=IMG)
    assert dict(t_dcn.mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    assert t_dcn.global_batch_size == t_ref.global_batch_size
    t_dcn.tx = t_ref.tx
    ev_dcn = t_dcn._make_eval_step()

    b = batches[0].asdict()
    with t_ref.mesh:
        logs_ref = ev_ref(state.params, shard_batch(t_ref.mesh, b))
    params_dcn = shard_params(
        t_dcn.mesh, jax.device_get(state.params), fsdp=False
    )
    with t_dcn.mesh:
        logs_dcn = ev_dcn(params_dcn, shard_batch(t_dcn.mesh, b))
    np.testing.assert_allclose(
        float(logs_ref["loss"]), float(logs_dcn["loss"]), rtol=2e-4
    )


def test_dcn_train_step_runs_and_loss_drops():
    """One full training flow on the 2-slice mesh: grads reduce over
    (dcn, dp) via GSPMD, loss decreases, params stay replicated per slice."""
    cfg = tiny_train_cfg(num_slices=2, dp_size=2, tp_size=1, fsdp=True)
    # per-replica batch 8 x (dcn 2 x dp 2) = global 32: needs a corpus
    # whose train split holds at least one full global batch
    cfg = dc.replace(cfg, data=dc.replace(cfg.data, batch_size=4))
    trainer = Trainer(cfg, image_shape=IMG)
    assert trainer.global_batch_size == 16
    ds = synthetic_dataset(num_graphs=48, seed=3, **SYN)

    batches = list(trainer.train_batches(ds, epoch=1))
    assert batches
    state = trainer.init_state(batches[0].asdict())
    step = trainer._make_train_step()

    losses = []
    with trainer.mesh:
        for _ in range(4):
            for b in batches:
                jb = shard_batch(trainer.mesh, b.asdict())
                state, logs = step(state, jb)
                losses.append(float(logs["loss"]) / max(float(logs["sample_size"]), 1.0))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-len(batches):]) < np.mean(losses[: len(batches)])
