"""Combined dp×sp TRAINING through ``Trainer.fit`` (VERDICT r3 weak #7).

SP was previously verified on pure-sp meshes only; a real pod composes
batch parallelism with the ring. This trains on a ``make_mesh(2, 1, 4)``
mesh (dp=2 × sp=4 over 8 virtual CPU devices) with scan accumulation ON
and pins the resulting parameters and eval loss against the identical run
on a single device — the ring + dp-psum + scan-accumulation composition
must reproduce the single-device math.

Reference surface: SURVEY §2.4 sequence-parallel row; the reference has no
SP at all (its scaling story is tree pruning, 3-prune-trees.py:16-39).
"""

import jax
import numpy as np
import pytest

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    synthetic_dataset,
)
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

IMG = (3, 32, 32)
N_MAX = 127  # S = 128 per graph, sharded 32/device over sp=4


def _cfg(tmp_path, tag):
    return TrainConfig(
        model=tiny_model_config(
            dropout=0.0, attention_dropout=0.0, act_dropout=0.0,
        ).replace(sequence_parallel=True),
        data=DataConfig(
            batch_size=2,
            batch_size_is_per_replica=False,
            max_text_len=16,
            node_buckets=(N_MAX,),
            node_capacity_buckets=(256,),
            image_capacity_buckets=(8,),
            label_capacity_buckets=(64,),
        ),
        optim=OptimConfig(
            lr=1e-3, warmup_updates=1, total_num_update=10,
            update_freq=2, scan_microbatches=True,
        ),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=3),
        save_dir=str(tmp_path / tag),
        max_epoch=1,
        log_interval=1,
    )


def _dataset():
    return synthetic_dataset(
        num_graphs=10, seed=3, seq_len=16, vocab_size=128, image_shape=IMG,
        max_nodes=N_MAX, min_nodes=60,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_sp_fit_matches_single_device(tmp_path):
    ds = _dataset()

    # dp=2 x sp=4 through Trainer.fit, ring dispatch counted (non-vacuity)
    from multimodaldiscussiontransformer_tpu.ops import ring_attention as ra

    calls = []
    orig = ra.ring_tree_attention_dispatch

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    mesh = make_mesh(2, 1, 4)
    trainer = Trainer(_cfg(tmp_path, "dpsp"), mesh=mesh, image_shape=IMG)
    ra.ring_tree_attention_dispatch = counting
    try:
        state = trainer.fit(ds, max_updates=2, log_fn=lambda s: None)
    finally:
        ra.ring_tree_attention_dispatch = orig
    assert calls, "dp x sp fit did not route through the ring dispatch"
    assert int(jax.device_get(state.step)) == 4  # 2 updates x uf 2
    metrics = trainer.evaluate(state, ds, split="test")
    assert np.isfinite(metrics["loss"])

    # single-device oracle, identical config/seed/data
    solo_mesh = make_mesh(1, 1, devices=[jax.devices()[0]])
    solo = Trainer(_cfg(tmp_path, "solo"), mesh=solo_mesh, image_shape=IMG)
    solo_state = solo.fit(ds, max_updates=2, log_fn=lambda s: None)
    solo_metrics = solo.evaluate(solo_state, ds, split="test")

    np.testing.assert_allclose(
        metrics["loss"], solo_metrics["loss"], rtol=2e-4, atol=1e-6
    )
    # Two-tier parameter comparison (the discipline established in
    # tests/test_scan_microbatches.py): adam normalizes every coordinate's
    # step to ~lr, so a reassociation-level gradient difference (ring /
    # dp-psum summation order, ~1e-7 on float32) deflects near-zero-gradient
    # coordinates by O(lr * noise_fraction) — measured max 5e-5 here after
    # 2 updates at lr=1e-3, which says nothing about correctness (the eval
    # loss above matches at rtol 2e-4). Bound: every element within 12.5%
    # of ONE adam step (2.5e-4), and the overwhelming majority at
    # float32-accumulation tolerance.
    a = jax.tree.leaves(jax.device_get(state.params))
    b = jax.tree.leaves(jax.device_get(solo_state.params))
    assert len(a) == len(b)
    total = outside = 0
    for x, y in zip(a, b):
        d = np.abs(
            np.asarray(x, np.float32) - np.asarray(y, np.float32)
        )
        assert d.max() < 2.5e-4, d.max()
        total += d.size
        outside += int((d > 3e-5).sum())
    assert outside / total < 0.02, (outside, total)
