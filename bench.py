"""Benchmark: canonical full-mDT training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: discussions/sec/chip for the canonical training configuration
(full mDT — 8 fusion layers, 4 bottleneck tokens, graph/fusion stacks 2/2,
d=768, batch 12, 100-token comments, 224^2 images on ~25% of nodes;
run_train.sh:37-65).

Baseline: the reference publishes no numbers (BASELINE.md). The pinned
reference estimate is derived from its own budget: 10,820 updates x
batch 12 x update-freq 3 = 389,520 discussion graphs inside the 10 h SLURM
wall-clock (run_train.sh:3,44,65,62) -> ~10.8 discussions/sec on an
A100-class GPU. ``vs_baseline`` = measured / 10.8 until a reference re-run
pins the true number.
"""

from __future__ import annotations

import json
import time

BASELINE_DISCUSSIONS_PER_SEC = 10.8  # see module docstring

# canonical-shaped synthetic workload
BATCH = 12
MAX_NODES = 32
NODE_CAP = 256
IMG_CAP = 64
LABEL_CAP = 128
SEQ = 100
STEPS = 20
WARMUP = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.core.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        OptimConfig,
        TaskConfig,
        TrainConfig,
    )
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        data=DataConfig(
            batch_size=BATCH,
            node_buckets=(MAX_NODES,),
            node_capacity_buckets=(NODE_CAP,),
            image_capacity_buckets=(IMG_CAP,),
            label_capacity_buckets=(LABEL_CAP,),
        ),
        optim=OptimConfig(update_freq=1),
        task_cfg=TaskConfig(dataset_name="synthetic"),
        dp_size=1,
        tp_size=1,
    )
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)

    items = synthetic_batch_items(
        BATCH,
        seed=0,
        min_nodes=8,
        max_nodes=MAX_NODES,
        seq_len=SEQ,
        vocab_size=cfg.model.text_tower.vocab_size,
        image_prob=0.25,
        image_shape=(3, 224, 224),
    )
    batch = collate(
        items,
        spatial_pos_max=cfg.task_cfg.spatial_pos_max,
        node_buckets=(MAX_NODES,),
        node_capacity_buckets=(NODE_CAP,),
        image_capacity_buckets=(IMG_CAP,),
        label_capacity_buckets=(LABEL_CAP,),
    )

    state = trainer.init_state(batch.asdict())
    step = trainer._make_train_step()

    # median of several timing windows — the tunneled single-chip setup has
    # visible run-to-run variance
    window_rates = []
    with mesh:
        jb = shard_batch(mesh, batch.asdict())
        for _ in range(WARMUP):
            state, logs = step(state, jb)
        jax.block_until_ready(logs["loss"])
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                state, logs = step(state, jb)
            jax.block_until_ready(logs["loss"])
            window_rates.append(BATCH * STEPS / (time.perf_counter() - t0))

    discussions_per_sec = sorted(window_rates)[len(window_rates) // 2]
    print(
        json.dumps(
            {
                "metric": "train_throughput_full_mdt",
                "value": round(discussions_per_sec, 3),
                "unit": "discussions/sec/chip",
                "vs_baseline": round(
                    discussions_per_sec / BASELINE_DISCUSSIONS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
