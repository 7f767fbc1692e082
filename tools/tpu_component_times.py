"""Component-level timing of the canonical train step (VERDICT r1 item 8).

Times, on the attached chip: text-tower fwd+bwd alone, image-tower fwd+bwd
alone, graph+fusion glue (full loss minus towers, by subtraction), the full
loss fwd+bwd, and the optimizer update — to direct the perf work at the
actual top consumers. Prints one JSON line with the breakdown.

    python tools/tpu_component_times.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, MAX_NODES, NODE_CAP, IMG_CAP, LABEL_CAP, SEQ = 12, 32, 256, 64, 128, 100


def timed(fn, fence, n=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n


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
    from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh, shard_batch
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
        dp_size=1, tp_size=1,
    )
    cfg = cfg.replace(model=cfg.model.replace(remat=False))
    mesh = make_mesh(1, 1, devices=[jax.devices()[0]])
    trainer = Trainer(cfg, mesh=mesh)
    items = synthetic_batch_items(
        BATCH, seed=0, min_nodes=8, max_nodes=MAX_NODES, seq_len=SEQ,
        vocab_size=cfg.model.text_tower.vocab_size, image_prob=0.25,
        image_shape=(3, 224, 224),
    )
    host = collate(
        items, spatial_pos_max=cfg.task_cfg.spatial_pos_max,
        node_buckets=(MAX_NODES,), node_capacity_buckets=(NODE_CAP,),
        image_capacity_buckets=(IMG_CAP,), label_capacity_buckets=(LABEL_CAP,),
    ).asdict()

    state = trainer.init_state(host)
    model, criterion, tx = trainer.model, trainer.criterion, trainer.tx
    rng = jax.random.PRNGKey(0)

    def fence(x):
        jax.block_until_ready(jax.device_get(jax.tree.leaves(x)[0]))

    results = {}
    with mesh:
        jb = shard_batch(mesh, host)
        params = state.params

        # full loss fwd+bwd (no optimizer)
        def loss_fn(p):
            out = model.apply(p, jb, deterministic=False, rngs={"dropout": rng})
            loss, ssz, _ = criterion(out, jb)
            return loss / jnp.maximum(ssz.astype(jnp.float32), 1.0)

        grad_full = jax.jit(jax.grad(loss_fn))
        results["loss_fwd_bwd"] = timed(lambda: grad_full(params), fence)

        # forward only (deterministic)
        fwd = jax.jit(lambda p: model.apply(p, jb, deterministic=True).logits)
        results["fwd_only"] = timed(lambda: fwd(params), fence)

        # text tower alone, fwd+bwd wrt its params
        def text_loss(p):
            h = model.apply(
                p, jb["input_ids"], jb["token_type_ids"], jb["attention_mask"],
                True, method=lambda m, *a: m.graph_encoder.text_model(*a),
            )
            return jnp.sum(h.astype(jnp.float32) ** 2)

        grad_text = jax.jit(jax.grad(text_loss))
        results["text_bottom_fwd_bwd"] = timed(lambda: grad_text(params), fence)

        # image tower alone
        if cfg.model.use_image_tower:
            def vit_loss(p):
                h = model.apply(
                    p, jb["images"], True,
                    method=lambda m, *a: m.graph_encoder.vit_model(*a),
                )
                return jnp.sum(h.astype(jnp.float32) ** 2)

            grad_vit = jax.jit(jax.grad(vit_loss))
            results["vit_bottom_fwd_bwd"] = timed(lambda: grad_vit(params), fence)

        # full optimizer step (loss+grad+adam)
        step = trainer._make_train_step()
        s = state
        for _ in range(3):
            s, logs = step(s, jb)
        fence(logs["loss"])
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            s, logs = step(s, jb)
        fence(logs["loss"])
        results["full_step"] = (time.perf_counter() - t0) / n

        # input pipeline: steps driven through the threaded prefetch loader
        # (fresh host collation + device_put per step) vs pre-staged batches
        # — if rates match, "the TPU never waits on input" holds
        from multimodaldiscussiontransformer_tpu.data.loader import (
            ThreadedPrefetcher,
        )

        def host_batches(n):
            for i in range(n):
                items = synthetic_batch_items(
                    BATCH, seed=100 + i, min_nodes=8, max_nodes=MAX_NODES,
                    seq_len=SEQ,
                    vocab_size=cfg.model.text_tower.vocab_size,
                    image_prob=0.25, image_shape=(3, 224, 224),
                )
                yield collate(
                    items, spatial_pos_max=cfg.task_cfg.spatial_pos_max,
                    node_buckets=(MAX_NODES,),
                    node_capacity_buckets=(NODE_CAP,),
                    image_capacity_buckets=(IMG_CAP,),
                    label_capacity_buckets=(LABEL_CAP,),
                )

        n_piped = 20
        pf = ThreadedPrefetcher(
            host_batches(n_piped), lambda hb: shard_batch(mesh, hb), depth=2
        )
        it = iter(pf)
        first = next(it)  # let the worker warm up
        s, logs = step(s, first)
        fence(logs["loss"])
        t0 = time.perf_counter()
        n_run = 0
        for db in it:
            s, logs = step(s, db)
            n_run += 1
        fence(logs["loss"])
        results["full_step_prefetched_input"] = (
            time.perf_counter() - t0
        ) / max(n_run, 1)

    results = {k: round(v * 1000, 2) for k, v in results.items()}
    results["optimizer_overhead_ms"] = round(
        results["full_step"] - results["loss_fwd_bwd"], 2
    )
    results["input_pipeline_overhead_ms"] = round(
        results["full_step_prefetched_input"] - results["full_step"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
