"""--profile-trace: the fit loop captures a jax.profiler device trace of a
few steady-state updates (SURVEY.md §5 tracing row) without disturbing
training."""

import glob
import os

import numpy as np

from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from tests.test_checkpoints import IMG, SYN


def test_fit_writes_profiler_trace(tmp_path):
    import dataclasses

    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        OptimConfig,
        TaskConfig,
        TrainConfig,
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    trace_dir = str(tmp_path / "trace")
    cfg = TrainConfig(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=4, max_text_len=16,
            node_buckets=(8, 16), node_capacity_buckets=(32, 64),
            image_capacity_buckets=(0, 8, 16), label_capacity_buckets=(16, 32),
        ),
        optim=OptimConfig(lr=1e-3, warmup_updates=2, total_num_update=20,
                          update_freq=1),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        save_dir=str(tmp_path / "ckpt"),
        profile_trace_dir=trace_dir,
        profile_trace_start=1,
        profile_trace_steps=1,
        log_interval=1,
        validate_interval_updates=0,
    )
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=16, seed=0, **SYN)
    msgs = []
    state = trainer.fit(ds, max_updates=3, log_fn=msgs.append)
    assert int(np.asarray(state.step)) == 3  # training unaffected
    assert any("profile trace written" in m for m in msgs), msgs
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb (+ perfetto)
    found = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True) + glob.glob(
        os.path.join(trace_dir, "**", "*.pb*"), recursive=True
    )
    assert found, list(os.walk(trace_dir))
