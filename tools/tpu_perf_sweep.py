"""Perf sweep over canonical-train-step variants on the real TPU.

Profiles the levers that change step time without changing numerics-per-
example (VERDICT r1 items 3/8): remat on/off, Pallas tree attention on/off,
node-bucket size. Prints one JSON line per variant:
{"variant", "steps_per_sec", "disc_per_sec", "mfu", "flops_per_step"}.

Usage: python tools/tpu_perf_sweep.py [--variants remat,noremat,...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(
    name: str,
    *,
    remat: bool,
    use_pallas: bool,
    max_nodes: int = 32,
    node_cap: int = 256,
    img_cap: int = 64,
    label_cap: int = 128,
    batch: int = 12,
    seq: int = 100,
    min_window_sec: float = 12.0,
    update_freq: int = 1,
    tower_pallas: bool = False,  # matches the measured product default
    bf16_adam: bool = False,
    remat_policy: str = "full",
    scan_layers: bool = False,
):
    import jax

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
    from multimodaldiscussiontransformer_tpu.utils.flops import (
        peak_flops,
        train_step_flops,
    )

    cfg = TrainConfig(
        data=DataConfig(
            batch_size=batch,
            node_buckets=(max_nodes,),
            node_capacity_buckets=(node_cap,),
            image_capacity_buckets=(img_cap,),
            label_capacity_buckets=(label_cap,),
        ),
        optim=OptimConfig(update_freq=update_freq),
        task_cfg=TaskConfig(dataset_name="synthetic"),
        dp_size=1,
        tp_size=1,
    )
    import dataclasses as _towers_dc

    cfg = cfg.replace(
        model=cfg.model.replace(
            remat=remat,
            remat_policy=remat_policy,
            scan_layers=scan_layers,
            use_pallas_attention=use_pallas,
            text_tower=_towers_dc.replace(
                cfg.model.text_tower, use_pallas_attention=tower_pallas
            ),
            image_tower=_towers_dc.replace(
                cfg.model.image_tower, use_pallas_attention=tower_pallas
            ),
        ),
        optim=_towers_dc.replace(cfg.optim, bf16_adam_state=bf16_adam),
    )
    if name.startswith("nodropout"):
        # diagnostic: bounds the total cost of dropout (mask generation +
        # masked math) in the train step
        import dataclasses as _dc

        cfg = cfg.replace(
            model=cfg.model.replace(
                dropout=0.0, attention_dropout=0.0, act_dropout=0.0,
                text_tower=_dc.replace(
                    cfg.model.text_tower,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                ),
                image_tower=_dc.replace(
                    cfg.model.image_tower,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                ),
            )
        )
    device = jax.devices()[0]
    peak = peak_flops(device.device_kind)

    mesh = make_mesh(1, 1, devices=[device])
    trainer = Trainer(cfg, mesh=mesh)
    items = synthetic_batch_items(
        batch, seed=0, min_nodes=max(2, max_nodes // 4), max_nodes=max_nodes,
        seq_len=seq, vocab_size=cfg.model.text_tower.vocab_size,
        image_prob=0.25, image_shape=(3, 224, 224),
    )
    host = collate(
        items,
        spatial_pos_max=cfg.task_cfg.spatial_pos_max,
        node_buckets=(max_nodes,),
        node_capacity_buckets=(node_cap,),
        image_capacity_buckets=(img_cap,),
        label_capacity_buckets=(label_cap,),
    ).asdict()

    # FLOPs from the ACTUAL collated capacities (the bucket ladder rounds up
    # past its last entry when the batch's real node count exceeds it)
    flops = train_step_flops(
        cfg.model,
        batch=batch,
        node_capacity=host["input_ids"].shape[0],
        image_capacity=host["images"].shape[0],
        seq_len=host["input_ids"].shape[1],
        max_nodes=host["in_degree"].shape[1],
    )

    state = trainer.init_state(host)
    # update_freq>1 with the (default) scan_microbatches accumulation runs
    # ONE jitted step per optimizer update consuming k stacked microbatches
    # — the real product path (trainer.fit routes the same way)
    scan_mode = cfg.optim.scan_microbatches and update_freq > 1
    if scan_mode:
        import numpy as _np

        from multimodaldiscussiontransformer_tpu.parallel.mesh import (
            shard_stacked_batch,
        )

        step = trainer._make_train_step_scan()
        stacked = {
            k: _np.stack([v] * update_freq) for k, v in host.items()
        }
    else:
        step = trainer._make_train_step()
    discussions_per_step = batch * (update_freq if scan_mode else 1)
    with mesh:
        jb = (
            shard_stacked_batch(mesh, stacked)
            if scan_mode else shard_batch(mesh, host)
        )
        for _ in range(3):
            state, logs = step(state, jb)
        loss0 = float(jax.device_get(logs["loss"]))
        assert math.isfinite(loss0), loss0
        # calibrate
        t0 = time.perf_counter()
        for _ in range(5):
            state, logs = step(state, jb)
        float(jax.device_get(logs["loss"]))
        cal = 5 / (time.perf_counter() - t0)
        n = max(10, int(math.ceil(min_window_sec * cal)))
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, jb)
        float(jax.device_get(logs["loss"]))
        rate = n / (time.perf_counter() - t0)

    out = {
        "variant": name,
        "steps_per_sec": round(rate, 4),
        "disc_per_sec": round(rate * discussions_per_step, 2),
        "mfu": round(
            flops["train_total"]
            * (update_freq if scan_mode else 1)
            * rate
            / peak,
            4,
        ),
        "flops_per_step": round(flops["train_total"]),
        "max_nodes": max_nodes,
    }
    print(json.dumps(out), flush=True)
    return out


VARIANTS = {
    "baseline_remat": dict(remat=True, use_pallas=False),
    "noremat": dict(remat=False, use_pallas=False),
    # run rbg_noremat in its own process: flips the global PRNG impl
    "rbg_noremat": dict(remat=False, use_pallas=False),
    "nodropout_noremat": dict(remat=False, use_pallas=True),
    # the canonical recipe accumulates 3 microbatches per optimizer update
    # (run_train.sh:65) — measures optax.MultiSteps overhead
    "uf3_noremat": dict(remat=False, use_pallas=True, update_freq=3),
    "pallas_remat": dict(remat=True, use_pallas=True),
    "pallas_noremat": dict(remat=False, use_pallas=True),
    # tower (BERT/ViT) fused attention A/B (ops/masked_attention.py):
    # towers_xla keeps the graph kernel ON and only flips the towers
    "towers_xla_noremat": dict(remat=False, use_pallas=True,
                               tower_pallas=False),
    "towers_pallas_noremat": dict(remat=False, use_pallas=True,
                                  tower_pallas=True),
    # bf16-stored adam m/v (train/optimizer.py::scale_by_adam_bf16_state)
    "bf16adam_noremat": dict(remat=False, use_pallas=True,
                             tower_pallas=True, bf16_adam=True),
    "big_nodes128": dict(remat=True, use_pallas=False, max_nodes=128,
                         node_cap=512, label_cap=256),
    # does Nmax=128 fit without remat now that the frozen towers' backward
    # (and the XLA liveness it implied) is elided? (OOM is caught+reported)
    "big_nodes128_noremat": dict(remat=False, use_pallas=True, max_nodes=128,
                                 node_cap=512, label_cap=256),
    # selective remat: keep matmul outputs, recompute only elementwise ops
    "big_nodes128_dots": dict(remat=True, use_pallas=True, max_nodes=128,
                              node_cap=512, label_cap=256,
                              remat_policy="dots_saveable"),
    "big_nodes128_dotsnb": dict(remat=True, use_pallas=True, max_nodes=128,
                                node_cap=512, label_cap=256,
                                remat_policy="dots"),
    # tunnel-helper fallbacks: the Nmax=128 Pallas+dots programs trip the
    # remote-compile helper's large-payload failure (HTTP 500); these
    # smaller/XLA-attention variants keep the selective-remat A/B
    # measurable on the chip
    "big_nodes128_dots_xla": dict(remat=True, use_pallas=False,
                                  max_nodes=128, node_cap=512,
                                  label_cap=256,
                                  remat_policy="dots_saveable"),
    "canon_remat": dict(remat=True, use_pallas=True),
    "canon_dots": dict(remat=True, use_pallas=True,
                       remat_policy="dots_saveable"),
    "canon_dotsnb": dict(remat=True, use_pallas=True, remat_policy="dots"),
    # the real-recipe accumulation path: scan over 3 stacked microbatches
    # per optimizer update (run_train.sh:65)
    "uf3_scan_noremat": dict(remat=False, use_pallas=True, update_freq=3),
    "big_nodes128_pallas": dict(remat=True, use_pallas=True, max_nodes=128,
                                node_cap=512, label_cap=256),
    # one batch-36 step IS the canonical recipe's optimizer update: the
    # scan path computes sum-of-grads / total-sample-size over 3 stacked
    # microbatches of 12 (run_train.sh:44,65); a single batch of the same
    # 36 graphs computes the identical quantity (modulo f32 reassociation)
    # in one 3x-larger program — better MXU tiling, fewer per-step
    # overheads, no trajectory change
    "batch36_uf1": dict(remat=False, use_pallas=True, bf16_adam=True,
                        batch=36, node_cap=768, img_cap=192, label_cap=384),
    # intermediate per-program batches: batch36 trips the tunnel's
    # large-payload remote-compile 500 — find where the limit sits and
    # whether bigger programs raise the forward ceiling at all
    "batch18_uf1": dict(remat=False, use_pallas=True, bf16_adam=True,
                        batch=18, node_cap=384, img_cap=96, label_cap=192),
    "batch24_uf1": dict(remat=False, use_pallas=True, bf16_adam=True,
                        batch=24, node_cap=512, img_cap=128, label_cap=256),
    "batch36_uf1_dots": dict(remat=True, remat_policy="dots_saveable",
                             use_pallas=True, bf16_adam=True, batch=36,
                             node_cap=768, img_cap=192, label_cap=384),
    # apples-to-apples for the above: the shipped recipe path w/ bf16 adam
    "uf3_scan_bf16adam": dict(remat=False, use_pallas=True, bf16_adam=True,
                              update_freq=3),
    # Nmax=96 interpolation point (VERDICT r3 #3): fresh Nmax=128 compiles
    # 500 in the tunnel helper; 96 is the largest shape with a chance of a
    # fresh compile, bracketing the big-tree remat-policy A/B
    "big_nodes96_pallas": dict(remat=True, use_pallas=True, max_nodes=96,
                               node_cap=384, label_cap=192),
    "big_nodes96_dots": dict(remat=True, use_pallas=True, max_nodes=96,
                             node_cap=384, label_cap=192,
                             remat_policy="dots_saveable"),
    "big_nodes96_noremat": dict(remat=False, use_pallas=True, max_nodes=96,
                                node_cap=384, label_cap=192),
    # ---- round-5 layer-scan A/Bs (VERDICT r4 #1/#2/#3): nn.scan over the
    # uniform interleave pairs + tower stacks shrinks the compiled program
    # ~4x — the lever aimed at the tunnel's fresh-big-shape compile 500s
    # (BIGTREE_SWEEP_r04) and the batch-36 forward-ceiling block ----
    "scan_canon_uf3": dict(remat=False, use_pallas=True, bf16_adam=True,
                           update_freq=3, scan_layers=True),
    "scan_big128_full": dict(remat=True, use_pallas=True, max_nodes=128,
                             node_cap=512, label_cap=256, scan_layers=True),
    "scan_big128_names": dict(remat=True, use_pallas=True, max_nodes=128,
                              node_cap=512, label_cap=256, scan_layers=True,
                              remat_policy="names"),
    "scan_big128_dots": dict(remat=True, use_pallas=True, max_nodes=128,
                             node_cap=512, label_cap=256, scan_layers=True,
                             remat_policy="dots_saveable"),
    "scan_big128_noremat": dict(remat=False, use_pallas=True, max_nodes=128,
                                node_cap=512, label_cap=256,
                                scan_layers=True),
    "scan_big96_full": dict(remat=True, use_pallas=True, max_nodes=96,
                            node_cap=384, label_cap=192, scan_layers=True),
    "scan_big96_names": dict(remat=True, use_pallas=True, max_nodes=96,
                             node_cap=384, label_cap=192, scan_layers=True,
                             remat_policy="names"),
    "scan_big96_dots": dict(remat=True, use_pallas=True, max_nodes=96,
                            node_cap=384, label_cap=192, scan_layers=True,
                            remat_policy="dots_saveable"),
    "scan_big96_noremat": dict(remat=False, use_pallas=True, max_nodes=96,
                               node_cap=384, label_cap=192,
                               scan_layers=True),
    # noremat-via-accumulation: split the big-tree batch into scan-
    # accumulated microbatches so each microbatch's activations die after
    # its backward — noremat (the fastest per-FLOP regime, canonical +2-3
    # pts over selective remat) inside 16G HBM without any recompute tax.
    # Same effective batch per optimizer update (12 = 6x2 = 4x3), identical
    # FairSeq accumulation semantics (run_train.sh:65 runs uf=3 anyway).
    "big128_b6_uf2_noremat": dict(remat=False, use_pallas=True,
                                  max_nodes=128, batch=6, update_freq=2,
                                  node_cap=256, img_cap=32, label_cap=128),
    "big128_b4_uf3_noremat": dict(remat=False, use_pallas=True,
                                  max_nodes=128, batch=4, update_freq=3,
                                  node_cap=192, img_cap=32, label_cap=96),
    "scan_big128_b6_uf2_noremat": dict(remat=False, use_pallas=True,
                                       max_nodes=128, batch=6,
                                       update_freq=2, node_cap=256,
                                       img_cap=32, label_cap=128,
                                       scan_layers=True),
    "big96_b6_uf2_noremat": dict(remat=False, use_pallas=True,
                                 max_nodes=96, batch=6, update_freq=2,
                                 node_cap=192, img_cap=32, label_cap=96),
    # flash-regime analogue is impossible (batch already 1) — remat ladder
    # only there (bench.py flash bucket)
    # diagnostic: a FRESH canonical-scale noremat program (novel node_cap
    # so no cache hit). r5 sweep pattern: scan+remat compiles fresh at
    # 96/128 while every noremat/batch36 fresh compile 500s — if this
    # small fresh noremat program 500s too, the tunnel's fresh-compile
    # path is degraded for a program CLASS (not payload size); if it
    # compiles, size x structure both matter.
    "fresh_canon_noremat_cap288": dict(remat=False, use_pallas=True,
                                       node_cap=288),
    # flash-regime remat ladder (S=769 giant tree, batch 1): bench picks
    # scan+full (38.4% MFU, BENCH r5); is the lighter "names" save-set or
    # even noremat (activations ~3x canonical; may fit 16G at batch 1)
    # better here?
    "flash_names_scan": dict(remat=True, remat_policy="names",
                             use_pallas=True, batch=1, max_nodes=768,
                             node_cap=768, img_cap=16, label_cap=256,
                             scan_layers=True, min_window_sec=8.0),
    "flash_noremat_scan": dict(remat=False, use_pallas=True, batch=1,
                               max_nodes=768, node_cap=768, img_cap=16,
                               label_cap=256, scan_layers=True,
                               min_window_sec=8.0),
    "fresh_canon_names_cap288": dict(remat=True, remat_policy="names",
                                     use_pallas=True, node_cap=288),
    "scan_big128_namesheavy": dict(remat=True, use_pallas=True,
                                   max_nodes=128, node_cap=512,
                                   label_cap=256, scan_layers=True,
                                   remat_policy="names_heavy"),
    "scan_big96_namesheavy": dict(remat=True, use_pallas=True, max_nodes=96,
                                  node_cap=384, label_cap=192,
                                  scan_layers=True,
                                  remat_policy="names_heavy"),
    "flash_namesheavy_scan": dict(remat=True, remat_policy="names_heavy",
                                  use_pallas=True, batch=1, max_nodes=768,
                                  node_cap=768, img_cap=16, label_cap=256,
                                  scan_layers=True, min_window_sec=8.0),
    # unscanned "names" rung completes the remat ladder at 128
    "big_nodes128_names": dict(remat=True, use_pallas=True, max_nodes=128,
                               node_cap=512, label_cap=256,
                               remat_policy="names"),
    "big_nodes96_names": dict(remat=True, use_pallas=True, max_nodes=96,
                              node_cap=384, label_cap=192,
                              remat_policy="names"),
    # batch-36-as-one-program retry under layer-scan (forward-ceiling
    # raiser, previously compile-blocked by payload size)
    "scan_batch36_uf1": dict(remat=False, use_pallas=True, bf16_adam=True,
                             batch=36, node_cap=768, img_cap=192,
                             label_cap=384, scan_layers=True),
    "scan_batch36_dots": dict(remat=True, remat_policy="dots_saveable",
                              use_pallas=True, bf16_adam=True, batch=36,
                              node_cap=768, img_cap=192, label_cap=384,
                              scan_layers=True),
    "scan_batch36_names": dict(remat=True, remat_policy="names",
                               use_pallas=True, bf16_adam=True, batch=36,
                               node_cap=768, img_cap=192, label_cap=384,
                               scan_layers=True),
    "big_nodes256": dict(remat=True, use_pallas=False, max_nodes=256,
                         node_cap=512, label_cap=256, batch=8,
                         min_window_sec=8.0),
    "big_nodes256_pallas": dict(remat=True, use_pallas=True, max_nodes=256,
                                node_cap=512, label_cap=256, batch=8,
                                min_window_sec=8.0),
}


def main() -> None:
    from multimodaldiscussiontransformer_tpu.core.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="baseline_remat,noremat")
    a = p.parse_args()
    if "rbg" in a.variants:
        # hardware-RNG dropout masks instead of threefry (numerics: different
        # but equally-distributed masks; the model is dropout-heavy)
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")
    for name in a.variants.split(","):
        try:
            run_variant(name, **VARIANTS[name])
        except Exception as e:  # keep sweeping past OOM/compile failures
            print(json.dumps({"variant": name, "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
