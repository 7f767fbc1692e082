"""Scale dress rehearsal of the FULL data path (VERDICT r3 next-round #1).

The real HatefulDiscussions run is 33,192 trees exploding to ~one graph
copy per labelled node (hateful_discussions.py:107,196-232) under a 10 h
budget (run_train.sh:3). The raw dumps and real tower weights are
unreachable from this environment, so this driver proves the
ingest -> npz corpus -> lazy loader -> trainer chain HOLDS at 10^4-10^5
graph copies on a synthetic corpus of the same shape:

1. generate N raw-JSON trees (reference schema; heavy-tailed sizes, root
   images at 224^2 inherited down the tree exactly like the reference's
   collapse rule);
2. ``ingest.process(workers>0)`` -> graph-<k>.npz + idx files + tree map
   (wall-clock, RSS, file count, bytes, copies/sec recorded);
3. lazy dataset construction + the per-epoch length-grouping scan
   (NpzItemLoader.text_length cheap probe);
4. loader keep-up probe: host-side batch production rate (collate +
   length grouping + lazy npz loads, Grain workers) vs the device step
   time — the number that says whether input starves the chip;
5. stage 1 contrastive pre-train over the LAZY per-tree corpus
   (``contrastive_dataset_from_ingest`` — no re-tokenization);
6. transfer (head + optimizer reset) + stage 2 fine-tune (length-grouped,
   Grain workers) + test F1.

Every phase records wall-clock and peak RSS (VmHWM + children);
the result is ONE JSON artifact (default SCALE_r04.json).

Run (defaults take a few hours on a 1-core box; scale --trees down for a
probe):

    python tools/scale_rehearsal.py --out /tmp/scale_r04 --trees 8000 \
        --workers 3 --artifact SCALE_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_gb() -> dict:
    hwm = 0.0
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                hwm = float(line.split()[1]) / 1e6  # kB -> GB
    child = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    return {"rss_hwm_gb": round(hwm, 3), "children_rss_hwm_gb": round(child, 3)}


class Phase:
    def __init__(self, report: dict, name: str):
        self.report, self.name = report, name

    def __enter__(self):
        print(f"[scale] >>> {self.name}", flush=True)
        self.t0 = time.perf_counter()
        self.rec = self.report.setdefault(self.name, {})
        return self.rec

    def __exit__(self, et, ev, tb):
        self.rec["wall_s"] = round(time.perf_counter() - self.t0, 1)
        self.rec.update(_rss_gb())
        print(f"[scale] <<< {self.name}: {json.dumps(self.rec)}", flush=True)


def _dir_stats(path: str) -> dict:
    n, total = 0, 0
    with os.scandir(path) as it:
        for e in it:
            if e.is_file():
                n += 1
                total += e.stat().st_size
    return {"files": n, "bytes_gb": round(total / 1e9, 3)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", required=True)
    p.add_argument("--trees", type=int, default=8000)
    p.add_argument("--workers", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image-px", type=int, default=224)
    p.add_argument("--image-prob", type=float, default=0.12)
    p.add_argument("--max-length", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=12)
    p.add_argument("--num-loader-workers", type=int, default=2)
    p.add_argument("--stage1-updates", type=int, default=80)
    p.add_argument("--stage2-updates", type=int, default=250)
    p.add_argument("--probe-batches", type=int, default=40)
    p.add_argument("--artifact", default=os.path.join(REPO, "SCALE_r04.json"))
    args = p.parse_args(argv)

    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import numpy as np

    from multimodaldiscussiontransformer_tpu.core import registry
    from multimodaldiscussiontransformer_tpu.core.config import (
        BertTowerConfig,
        DataConfig,
        OptimConfig,
        TaskConfig,
        TrainConfig,
        ViTTowerConfig,
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.core.registry import TASKS
    from multimodaldiscussiontransformer_tpu.data.tokenizer import (
        BertWordPieceTokenizer,
    )
    from multimodaldiscussiontransformer_tpu.data_prep.splits import make_splits
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions import (
        two_stage,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
        create_hatespeech_dataset,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        process,
    )
    from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
        Checkpointer,
        reset_classifier_head,
    )

    registry.populate()
    report: dict = {
        "config": {
            k: getattr(args, k)
            for k in ("trees", "workers", "seed", "image_px", "image_prob",
                      "max_length", "batch_size", "num_loader_workers",
                      "stage1_updates", "stage2_updates")
        },
        "reference_scale": {
            "real_corpus_trees": 33192,
            "note": "hateful_discussions.py:107 — one graph copy per "
                    "labelled node; run_train.sh:3 10h budget",
        },
    }
    out = args.out
    os.makedirs(out, exist_ok=True)

    # 1. raw corpus ---------------------------------------------------------
    def comment_dist(rng):
        # heavy tail: mostly small trees (mean ~7, like the pruned real
        # corpus), a genuine tail up to 60 comments
        return int(min(3 + rng.pareto(1.8) * 3, 60))

    with Phase(report, "generate") as rec:
        paths = two_stage.generate_mini_corpus(
            out, n_trees=args.trees, seed=args.seed,
            image_prob=args.image_prob, image_px=args.image_px,
            label_mode="text", image_style="smooth",
            comment_dist=comment_dist,
        )
        rec["trees"] = args.trees
        rec.update(
            {"images_" + k: v
             for k, v in _dir_stats(os.path.join(out, "images")).items()}
        )
    communities = json.load(open(paths["communities"]))
    os.environ["MDT_BERT_VOCAB"] = paths["vocab"]
    tokenizer = BertWordPieceTokenizer(paths["vocab"])

    # 2. splits -------------------------------------------------------------
    split_dir = os.path.join(out, "splits")
    with Phase(report, "splits"):
        make_splits(paths["raw"], split_dir, n_splits=1, seed=args.seed)

    # 3. ingest (the reference's one-time process(), parallel) --------------
    data_root = os.path.join(out, "data")
    with Phase(report, "ingest") as rec:
        from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
            IngestStats,
        )

        sink = IngestStats()
        t0 = time.perf_counter()
        n_copies = process(
            paths["raw"], data_root,
            train_idx_file=os.path.join(split_dir, "train-idx.txt"),
            test_idx_file=os.path.join(split_dir, "test-idx.txt"),
            tokenizer_name="bert-base-uncased",  # resolves via MDT_BERT_VOCAB
            image_root=out, max_length=args.max_length,
            image_size=args.image_px, log_every=2000, workers=args.workers,
            stats_sink=sink,
        )
        dt = time.perf_counter() - t0
        rec["graph_copies"] = n_copies
        rec["trees_per_sec"] = round(args.trees / dt, 2)
        rec["copies_per_sec"] = round(n_copies / dt, 2)
        # per-phase breakdown (round-5 instrumentation; worker-summed, so
        # can exceed wall on a pool) + the r4 baseline for the speedup claim
        rec["phase_seconds"] = sink.phase_seconds()
        rec["r4_baseline_trees_per_sec"] = 3.32  # SCALE_r04.json, same box
        rec.update(_dir_stats(os.path.join(data_root, "processed")))

    # 4. lazy dataset + length-grouping scan --------------------------------
    with Phase(report, "dataset_load") as rec:
        ds = create_hatespeech_dataset(root=data_root, seed=args.seed)
        rec["items"] = len(ds)
        rec["train"] = len(ds.train_idx)
        rec["test"] = len(ds.test_idx)
    with Phase(report, "length_scan") as rec:
        t0 = time.perf_counter()
        lens = [ds.text_length(int(i)) for i in ds.train_idx]
        rec["items_per_sec"] = round(len(lens) / (time.perf_counter() - t0))
        rec["len_min_max"] = [int(min(lens)), int(max(lens))]

    # model/data config: tiny towers (the model is not under test; the data
    # path is) at REAL image geometry
    model_cfg = tiny_model_config().replace(
        # canonical-size degree tables: the corpus's heavy tail must not
        # saturate (masked_embed clips since round 4; canonical tables 512)
        num_in_degree=512,
        num_out_degree=512,
        text_tower=BertTowerConfig(
            vocab_size=tokenizer.vocab_size, hidden_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=max(64, args.max_length),
        ),
        image_tower=ViTTowerConfig(
            image_size=args.image_px, patch_size=32, hidden_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=128,
        ),
    )
    img_shape = (3, args.image_px, args.image_px)
    data_cfg = DataConfig(
        batch_size=args.batch_size,
        max_text_len=args.max_length,
        text_len_buckets=(args.max_length,),
        node_buckets=(16, 32, 64),
        node_capacity_buckets=(256, 512, 1024),
        image_capacity_buckets=(0, 16, 64, 256, 1024),
        label_capacity_buckets=(64, 128, 256, 512),
        length_grouped=True,
        num_workers=args.num_loader_workers,
    )
    task_cfg = TaskConfig(dataset_name="hateful_discussions", seed=args.seed)

    # 5. loader keep-up probe (host batch production vs device step) --------
    cfg2 = TrainConfig(
        model=model_cfg, data=data_cfg,
        optim=OptimConfig(lr=1e-3, warmup_updates=10,
                          total_num_update=max(args.stage2_updates, 1),
                          update_freq=1),
        task_cfg=task_cfg, task="node_prediction",
        criterion="node_cross_entropy", positive_weight=1.5,
        save_dir=os.path.join(out, "stage2"), log_interval=20,
        validate_interval_updates=0, dp_size=1, tp_size=1,
    )
    trainer2 = TASKS.get("node_prediction")(cfg2).build_trainer(
        image_shape=img_shape
    )
    with Phase(report, "loader_probe") as rec:
        it = iter(trainer2.train_batches(ds, epoch=1))
        first = next(it)  # pulls worker startup out of the steady-state rate
        t0 = time.perf_counter()
        n = 0
        for b in it:
            n += 1
            if n >= args.probe_batches:
                break
        dt = time.perf_counter() - t0
        rec["host_batches_per_sec"] = round(n / dt, 3)
        rec["host_discussions_per_sec"] = round(n * args.batch_size / dt, 2)
        rec["host_sec_per_batch"] = round(dt / max(n, 1), 4)

        # device step time on this backend, same batch shape
        state_probe = trainer2.init_state(first.asdict())
        step = trainer2._make_train_step()
        jb = trainer2._put_batch(first.asdict())
        import jax

        with trainer2.mesh:
            state_probe, logs = step(state_probe, jb)  # compile
            float(jax.device_get(logs["loss"]))
            t0 = time.perf_counter()
            for _ in range(5):
                state_probe, logs = step(state_probe, jb)
            float(jax.device_get(logs["loss"]))
        rec["device_sec_per_step"] = round((time.perf_counter() - t0) / 5, 4)
        rec["loader_keeps_up"] = bool(
            rec["host_sec_per_batch"] < rec["device_sec_per_step"]
        )
        del state_probe, step, jb

    # 5b. loader workers -> throughput curve, stated against the REAL
    # on-chip step rate (VERDICT r4 weak #3: the honest comparison is host
    # collation vs the 65 disc/s chip step, not vs the CPU device step)
    with Phase(report, "loader_workers_curve") as rec:
        import dataclasses as _dc

        ONCHIP = 65.1  # BENCH_r04 canonical train disc/s on the v5e chip
        rec["onchip_disc_per_sec_ref"] = ONCHIP
        curve = {}
        for w in (0, 1, 2, 4):
            cfgw = cfg2.replace(data=_dc.replace(data_cfg, num_workers=w))
            tw = TASKS.get("node_prediction")(cfgw).build_trainer(
                image_shape=img_shape
            )
            itw = iter(tw.train_batches(ds, epoch=1))
            next(itw)  # worker startup out of the steady-state window
            t0 = time.perf_counter()
            n = 0
            for _ in itw:
                n += 1
                if n >= args.probe_batches:
                    break
            curve[str(w)] = round(
                n * args.batch_size / (time.perf_counter() - t0), 2
            )
        rec["host_disc_per_sec_by_workers"] = curve
        rec["keeps_up_vs_onchip"] = {
            k: bool(v > ONCHIP) for k, v in curve.items()
        }
        rec["note"] = (
            "nproc=1 box: >1 worker contends with the consumer process; "
            "the curve's slope is what a multi-core host buys"
        )

    # 6. stage 1: contrastive over the LAZY per-tree corpus -----------------
    contr_ds = two_stage.contrastive_dataset_from_ingest(
        data_root, communities, seed=args.seed
    )
    cfg1 = TrainConfig(
        model=model_cfg, data=data_cfg,
        optim=OptimConfig(lr=1e-3, warmup_updates=5,
                          total_num_update=max(args.stage1_updates, 1),
                          update_freq=1),
        task_cfg=task_cfg, task="contrastive_learning",
        criterion="contrastive_loss",
        save_dir=os.path.join(out, "stage1"), log_interval=20,
        validate_interval_updates=0, dp_size=1, tp_size=1,
    )
    with Phase(report, "stage1_contrastive") as rec:
        rec["corpus_trees"] = len(contr_ds)
        trainer1 = TASKS.get("contrastive_learning")(cfg1).build_trainer(
            image_shape=img_shape
        )
        t0 = time.perf_counter()
        state1 = trainer1.fit(contr_ds, max_epoch=1000,
                              max_updates=args.stage1_updates)
        rec["updates"] = args.stage1_updates
        rec["updates_per_sec"] = round(
            args.stage1_updates / (time.perf_counter() - t0), 3
        )
        ckpt1 = Checkpointer(cfg1.save_dir)
        ckpt1.save(state1, int(state1.step))
        ckpt1.wait()

    # 7. transfer + stage 2 fine-tune --------------------------------------
    import jax

    with Phase(report, "transfer"):
        first = next(iter(trainer2.train_batches(ds, epoch=1)))
        state2 = trainer2.init_state(first.asdict())
        restored = ckpt1.restore_raw()
        ckpt1.close()
        params = (
            restored["params"] if isinstance(restored, dict)
            else restored.params
        )
        params = reset_classifier_head(
            params, jax.random.PRNGKey(args.seed + 17)
        )
        state2 = trainer2.load_params(state2, params)

    with Phase(report, "stage2_finetune") as rec:
        t0 = time.perf_counter()
        state2 = trainer2.fit(ds, state=state2, max_epoch=1000,
                              max_updates=args.stage2_updates)
        rec["updates"] = args.stage2_updates
        rec["updates_per_sec"] = round(
            args.stage2_updates / (time.perf_counter() - t0), 3
        )

    with Phase(report, "eval") as rec:
        metrics = trainer2.evaluate(state2, ds, "test")
        rec.update({k: round(float(v), 4) for k, v in metrics.items()})

    report["total_wall_s"] = round(
        sum(v.get("wall_s", 0) for v in report.values()
            if isinstance(v, dict)), 1
    )
    with open(args.artifact, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[scale] wrote {args.artifact}")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
