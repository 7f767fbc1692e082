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

    # grad-only sections run with bare params (no adam state resident —
    # the no-remat activations + params + grads + m/v would exceed HBM)
    model, criterion = trainer.model, trainer.criterion
    rng = jax.random.PRNGKey(0)

    def fence(x):
        jax.block_until_ready(jax.device_get(jax.tree.leaves(x)[0]))

    import gc

    results = {}
    with mesh:
        jb = shard_batch(mesh, host)
        jh = {k: __import__("jax").numpy.asarray(v) for k, v in host.items()}
        params = jax.jit(model.init, static_argnames=("deterministic",))(
            jax.random.PRNGKey(cfg.seed), jh, deterministic=True
        )
        del jh

        # full loss fwd+bwd (no optimizer) — same freeze semantics as the
        # product train step (frozen bottom towers carry no gradient)
        from multimodaldiscussiontransformer_tpu.train.optimizer import (
            trainable_mask,
        )

        def loss_fn(p):
            labels = trainable_mask(p, cfg.model.freeze_initial_encoders)
            p = jax.tree.map(
                lambda x, l: jax.lax.stop_gradient(x) if l == "freeze" else x,
                p, labels,
            )
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

        # full optimizer step (loss+grad+adam); build adam state only now
        del params
        gc.collect()
        state = trainer.init_state(host)
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

        # pre-built host content variants: the worker thread's job is
        # collate-output staging + H2D, which is what overlaps with compute
        # in real training (npz load + collate is ~0.03-0.1 s/batch; the
        # 0.3+ s/batch of *synthetic content generation* is a fixture cost
        # real data never pays and is excluded here)
        import numpy as np

        vocab = cfg.model.text_tower.vocab_size
        variants = []
        for i in range(4):
            rng = np.random.RandomState(1000 + i)
            b = dict(host)
            b["input_ids"] = np.where(
                host["attention_mask"] > 0,
                rng.randint(1000, vocab, host["input_ids"].shape).astype(
                    host["input_ids"].dtype
                ),
                host["input_ids"],
            )
            b["images"] = rng.randn(*host["images"].shape).astype(np.float32)
            variants.append(b)

        def host_batches(n):
            for i in range(n):
                yield variants[i % len(variants)]

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
