"""Benchmark: canonical full-mDT training + inference throughput, one chip.

Prints ONE JSON line whose primary keys are
``{"metric", "value", "unit", "vs_baseline"}`` plus credibility fields:
analytic ``flops_per_step``, ``mfu`` against the chip's bf16 peak, the
loss series across the timed window, and an inference-throughput metric
(the north star is train + infer, BASELINE.json).

Measurement rules (VERDICT.md round-1 items 2/9):
- a distinct pre-staged device batch per step (no single-batch reuse);
- the timing window is fenced by a host readback of the final step's loss
  -- the train step chains through ``state``, so reading step N's loss
  forces execution of all N steps even if ``block_until_ready`` on the
  tunneled PJRT plugin were a no-op;
- the loss series across the window is asserted finite and non-constant;
- windows are >= ``MIN_WINDOW_SEC`` wall-clock each, 3 windows, median;
- if implied MFU exceeds the chip's bf16 peak the harness re-times with a
  per-step host readback (dispatch-only timing cannot survive that) and
  reports the conservative number.

Metric: discussions/sec/chip for the canonical training configuration
(full mDT -- 8 fusion layers, 4 bottleneck tokens, graph/fusion stacks 2/2,
d=768, batch 12 x update-freq 3 through the scan accumulation path (the
recipe's real optimizer cadence), 100-token comments, 224^2 images on ~25%
of nodes; reference run_train.sh:37-65).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
pinned estimate derives from its own budget: 10,820 updates x batch 12 x
update-freq 3 = 389,520 discussion graphs inside the 10 h SLURM wall-clock
(run_train.sh:3,44,65,62) -> ~10.8 discussions/sec on an A100-class GPU.
``vs_baseline`` = measured / 10.8 until a reference re-run pins the truth.
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
N_BATCHES = 8  # distinct pre-staged batches, cycled
WARMUP = 3
N_WINDOWS = 3
MIN_WINDOW_SEC = 30.0


def _build(cfg, mesh):
    """N_BATCHES distinct batches with ONE shape signature.

    Distinct shapes would mean distinct compiled programs (minutes each over
    the tunnel) polluting the timing windows, so batch 0 fixes the
    signature and the rest are shape-preserving reshuffles of its content
    (fresh token ids / images / biases per step, same buffers)."""
    import numpy as np

    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )

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
    base = collate(
        items,
        spatial_pos_max=cfg.task_cfg.spatial_pos_max,
        node_buckets=(MAX_NODES,),
        node_capacity_buckets=(NODE_CAP,),
        image_capacity_buckets=(IMG_CAP,),
        label_capacity_buckets=(LABEL_CAP,),
    ).asdict()

    batches = [base]
    vocab = cfg.model.text_tower.vocab_size
    for seed in range(1, N_BATCHES):
        rng = np.random.RandomState(seed)
        b = dict(base)
        ids = base["input_ids"]
        b["input_ids"] = np.where(
            base["attention_mask"] > 0,
            rng.randint(1000, vocab, ids.shape).astype(ids.dtype),
            ids,
        )
        b["images"] = rng.randn(*base["images"].shape).astype(np.float32)
        b["y"] = np.where(
            base["y_slot_mask"],
            rng.randint(0, 2, base["y"].shape).astype(base["y"].dtype),
            base["y"],
        )
        batches.append(b)
    return batches


def _loss_value(logs) -> float:
    """Host readback of the step loss -- the fence for the timing window."""
    import jax

    return float(jax.device_get(logs["loss"]))


def _timed_window(step, state, device_batches, n_steps, per_step_sync=False):
    """Run ``n_steps`` chained steps over cycled distinct batches; returns
    (state, rate_steps_per_sec, losses). Fenced by host readback."""
    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, logs = step(state, device_batches[i % len(device_batches)])
        if per_step_sync:
            losses.append(_loss_value(logs))
    if not per_step_sync:
        losses.append(_loss_value(logs))  # forces the whole chain
    dt = time.perf_counter() - t0
    return state, n_steps / dt, losses


def main() -> None:
    import math

    import jax

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
            batch_size=BATCH,
            node_buckets=(MAX_NODES,),
            node_capacity_buckets=(NODE_CAP,),
            image_capacity_buckets=(IMG_CAP,),
            label_capacity_buckets=(LABEL_CAP,),
        ),
        # bf16-stored adam m/v: +4% measured (v5e sweep bf16adam_noremat),
        # the reference recipe's --fp16-era lever (run_train.sh:45); a
        # product flag (--bf16-adam-state), opt-in because FairSeq's plain
        # --fp16 keeps f32 adam stats.
        # update_freq=3 IS the canonical recipe (run_train.sh:65): the scan
        # path accumulates 3 microbatches per optimizer update in one
        # program — measured FASTER than uf=1 as well (the update
        # amortizes; v5e sweep uf3_scan_bf16adam 65.0 vs 63.3 disc/s)
        optim=OptimConfig(update_freq=3, bf16_adam_state=True),
        task_cfg=TaskConfig(dataset_name="synthetic"),
        dp_size=1,
        tp_size=1,
    )
    device = jax.devices()[0]
    chip = device.device_kind
    peak = peak_flops(chip)

    mesh = make_mesh(1, 1, devices=[device])
    trainer = Trainer(cfg, mesh=mesh)
    host_batches = _build(cfg, mesh)
    # FLOPs from the ACTUAL collated capacities
    flops = train_step_flops(
        cfg.model,
        batch=BATCH,
        node_capacity=host_batches[0]["input_ids"].shape[0],
        image_capacity=host_batches[0]["images"].shape[0],
        seq_len=host_batches[0]["input_ids"].shape[1],
        max_nodes=host_batches[0]["in_degree"].shape[1],
    )

    state = trainer.init_state(host_batches[0])
    # the canonical recipe's accumulation path: one jitted scan step per
    # optimizer update consuming UPDATE_FREQ stacked microbatches
    # (run_train.sh:65; trainer.fit routes the same way)
    import numpy as np

    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        shard_stacked_batch,
    )

    uf = cfg.optim.update_freq
    step = trainer._make_train_step_scan()
    host_groups = [
        {
            k: np.stack([host_batches[(j + m) % N_BATCHES][k] for m in range(uf)])
            for k in host_batches[0]
        }
        for j in range(N_BATCHES)
    ]

    all_losses = []
    with mesh:
        device_batches = [shard_stacked_batch(mesh, g) for g in host_groups]
        for i in range(WARMUP):
            state, logs = step(state, device_batches[i % N_BATCHES])
        warm_loss = _loss_value(logs)
        assert math.isfinite(warm_loss), f"non-finite warmup loss {warm_loss}"

        # calibrate steps/window for >= MIN_WINDOW_SEC wall-clock
        state, cal_rate, _ = _timed_window(step, state, device_batches, 5)
        steps_per_window = max(10, int(math.ceil(MIN_WINDOW_SEC * cal_rate)))

        window_rates = []
        for _ in range(N_WINDOWS):
            state, rate, losses = _timed_window(
                step, state, device_batches, steps_per_window
            )
            window_rates.append(rate)
            all_losses.extend(losses)

        steps_per_sec = sorted(window_rates)[N_WINDOWS // 2]
        # one scan step = uf microbatches = one optimizer update
        mfu = flops["train_total"] * uf * steps_per_sec / peak
        timing_mode = "chained-readback"
        if mfu > 1.0:
            # dispatch-only timing slipped through: re-time with a per-step
            # host sync, which no async runtime can fake
            timing_mode = "per-step-sync"
            state, steps_per_sec, losses = _timed_window(
                step, state, device_batches, steps_per_window,
                per_step_sync=True,
            )
            all_losses.extend(losses)
            mfu = flops["train_total"] * uf * steps_per_sec / peak

        # loss series must be finite and actually moving
        assert all(math.isfinite(v) for v in all_losses), all_losses
        assert len(set(round(v, 6) for v in all_losses)) > 1 or len(all_losses) < 2, (
            f"loss frozen across windows: {all_losses}"
        )

        # inference throughput: deterministic forward, same canonical shapes
        import jax.numpy as jnp

        model = trainer.model
        infer = jax.jit(
            lambda p, b: model.apply(p, b, deterministic=True).logits
        )
        device_singles = [shard_batch(mesh, b) for b in host_batches]
        logits = infer(state.params, device_singles[0])
        float(jax.device_get(logits[0, 0]))  # compile + fence
        state_params = state.params
        t0 = time.perf_counter()
        n_inf = max(30, int(steps_per_sec * uf * 3) * 3)
        for i in range(n_inf):
            logits = infer(state_params, device_singles[i % N_BATCHES])
        float(jax.device_get(logits[0, 0]))
        infer_rate = n_inf / (time.perf_counter() - t0)
        infer_mfu = flops["infer_total"] * infer_rate / peak
        if infer_mfu > 1.0:
            t0 = time.perf_counter()
            for i in range(n_inf):
                logits = infer(state_params, device_singles[i % N_BATCHES])
                float(jax.device_get(logits[0, 0]))
            infer_rate = n_inf / (time.perf_counter() - t0)
            infer_mfu = flops["infer_total"] * infer_rate / peak

    # free the CANONICAL state (params + adam) before the parity run: two
    # optimizer states plus remat-off activations exceed v5e HBM (measured:
    # RESOURCE_EXHAUSTED cascading into every later section)
    import gc

    del state, device_singles, logits, state_params, step, trainer
    gc.collect()

    # PARITY-DEFAULT secondary number (VERDICT r3 weak #1): the canonical
    # section above uses bf16_adam_state=True (a documented ~4% lever,
    # recorded in config_deltas below) while the product default is False
    # for exact-recipe parity (core/config.py:391). Measure the
    # default-config product too so the artifact never overstates it.
    # Runs in its OWN FRAME so an HBM failure cannot leak its state into
    # the later sections through surviving locals.
    def _measure_parity():
        parity_cfg = cfg.replace(
            optim=OptimConfig(update_freq=3, bf16_adam_state=False)
        )
        parity_trainer = Trainer(parity_cfg, mesh=mesh)
        parity_state = parity_trainer.init_state(host_batches[0])
        parity_step = parity_trainer._make_train_step_scan()
        with mesh:
            for i in range(WARMUP):
                parity_state, plogs = parity_step(
                    parity_state, device_batches[i % N_BATCHES]
                )
            assert math.isfinite(_loss_value(plogs))
            parity_state, prate, plosses = _timed_window(
                parity_step, parity_state, device_batches,
                max(10, int(math.ceil(MIN_WINDOW_SEC * steps_per_sec))),
            )
        assert all(math.isfinite(v) for v in plosses)
        return {
            "parity_default_value": round(prate * uf * BATCH, 3),
            "parity_default_mfu": round(
                flops["train_total"] * uf * prate / peak, 4
            ),
        }

    try:
        parity = _measure_parity()
    except Exception as e:
        parity = {"parity_default_error": repr(e)[:800]}
    gc.collect()

    # free the staged canonical batches before the big-tree bucket — they
    # would otherwise share HBM with the (much larger) big-tree activations
    del device_batches
    gc.collect()

    # big-tree bucket (VERDICT r1 weak 7): canonical batch at Nmax=128 — the
    # regime where the fused tree-attention kernel matters — one short
    # fenced window
    big = {}
    # remat POLICY ladder (VERDICT r3 weak #2): dots_saveable measured +4.3%
    # over full remat at canonical shapes; try it first at Nmax=128, fall
    # back to the known-cached full-remat program if the tunnel's
    # large-payload fresh-compile 500 blocks it (TODO.md batch36 entry) —
    # the artifact records which policy actually ran, plus the blocked error.
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )

    BIG_NODES, BIG_CAP, BIG_LCAP = 128, 512, 256

    def _measure_bigtree(big_policy, scan=False):
        big_cfg = cfg.replace(
            data=DataConfig(
                batch_size=BATCH,
                node_buckets=(BIG_NODES,),
                node_capacity_buckets=(BIG_CAP,),
                image_capacity_buckets=(IMG_CAP,),
                label_capacity_buckets=(BIG_LCAP,),
            ),
            # this shape needs ~24G of activations without remat (v5e
            # has 16G HBM) — exactly the remat trade-off's target regime
            model=cfg.model.replace(
                remat=True, remat_policy=big_policy, scan_layers=scan
            ),
            optim=OptimConfig(update_freq=1, bf16_adam_state=True),
        )
        big_trainer = Trainer(big_cfg, mesh=mesh)
        big_items = synthetic_batch_items(
            BATCH, seed=0, min_nodes=32, max_nodes=BIG_NODES, seq_len=SEQ,
            vocab_size=big_cfg.model.text_tower.vocab_size, image_prob=0.1,
            image_shape=(3, 224, 224),
        )
        big_host = collate(
            big_items, spatial_pos_max=big_cfg.task_cfg.spatial_pos_max,
            node_buckets=(BIG_NODES,), node_capacity_buckets=(BIG_CAP,),
            image_capacity_buckets=(IMG_CAP,),
            label_capacity_buckets=(BIG_LCAP,),
        ).asdict()
        big_flops = train_step_flops(
            big_cfg.model,
            batch=BATCH,
            node_capacity=big_host["input_ids"].shape[0],
            image_capacity=big_host["images"].shape[0],
            seq_len=big_host["input_ids"].shape[1],
            max_nodes=big_host["in_degree"].shape[1],
        )
        big_state = big_trainer.init_state(big_host)
        big_step = big_trainer._make_train_step()
        with mesh:
            bjb = shard_batch(mesh, big_host)
            for _ in range(2):
                big_state, blogs = big_step(big_state, bjb)
            _loss_value(blogs)
            big_state, rate, blosses = _timed_window(
                big_step, big_state, [bjb], 8
            )
        assert all(math.isfinite(v) for v in blosses)
        return dict(
            bigtree_nmax=BIG_NODES,
            bigtree_throughput=round(rate * BATCH, 3),
            bigtree_mfu=round(big_flops["train_total"] * rate / peak, 4),
            bigtree_remat_policy=big_policy,
            bigtree_scan_layers=scan,
        )

    # ladder (round 5, ordered by the measured sweep — BIGTREE_SWEEP_r05):
    # scan+full compiles fresh and wins (41.35% MFU at Nmax=128 vs 39.38%
    # unscanned full in r4); names ties; dots_saveable/noremat 500 on this
    # tunnel even under scan, so they are not attempted here. Last rung is
    # the r4 known-good unscanned full-remat program.
    for big_policy, big_scan in (
        ("full", True),
        ("names", True),
        ("full", False),
    ):
        try:
            # own frame: an HBM/compile failure frees its state on raise
            big.update(_measure_bigtree(big_policy, big_scan))
            gc.collect()
            break
        except Exception as e:  # headline must survive big-tree issues
            tag = ("scan_" if big_scan else "") + big_policy
            big[f"bigtree_{tag}_error"] = repr(e)[:400]
            gc.collect()

    # flash bucket (VERDICT r2 weak 7): ONE giant tree past the flash
    # threshold (S = Nmax+1 = 769 >= _FLASH_MIN_S = 513,
    # ops/tree_attention.py) trained with attention dropout ON — the
    # streaming forward + three-pass streaming backward + tile-regenerated
    # dropout masks are the whole hot path, and the (S, S) probs never
    # materialize in any pass
    flash = {}
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_item,
    )
    import numpy as _np

    FLASH_NODES = 768  # S = 769

    def _measure_flash(flash_policy, scan=False):
        flash_cfg = cfg.replace(
            data=DataConfig(
                batch_size=1,
                node_buckets=(FLASH_NODES,),
                node_capacity_buckets=(FLASH_NODES,),
                image_capacity_buckets=(16,),
                label_capacity_buckets=(256,),
            ),
            model=cfg.model.replace(
                remat=True, remat_policy=flash_policy, scan_layers=scan
            ),
            optim=OptimConfig(update_freq=1, bf16_adam_state=True),
        )
        flash_trainer = Trainer(flash_cfg, mesh=mesh)
        flash_item = synthetic_item(
            idx=0, num_nodes=FLASH_NODES, rng=_np.random.default_rng(0),
            seq_len=SEQ, vocab_size=flash_cfg.model.text_tower.vocab_size,
            image_prob=0.01, image_shape=(3, 224, 224),
        )
        flash_host = collate(
            [flash_item],
            spatial_pos_max=flash_cfg.task_cfg.spatial_pos_max,
            node_buckets=(FLASH_NODES,),
            node_capacity_buckets=(FLASH_NODES,),
            image_capacity_buckets=(16,), label_capacity_buckets=(256,),
        ).asdict()
        flash_flops = train_step_flops(
            flash_cfg.model,
            batch=1,
            node_capacity=flash_host["input_ids"].shape[0],
            image_capacity=flash_host["images"].shape[0],
            seq_len=flash_host["input_ids"].shape[1],
            max_nodes=flash_host["in_degree"].shape[1],
        )
        flash_state = flash_trainer.init_state(flash_host)
        flash_step = flash_trainer._make_train_step()
        with mesh:
            fjb = shard_batch(mesh, flash_host)
            for _ in range(2):
                flash_state, flogs = flash_step(flash_state, fjb)
            _loss_value(flogs)
            flash_state, frate, flosses = _timed_window(
                flash_step, flash_state, [fjb], 8
            )
        assert all(math.isfinite(v) for v in flosses)
        return dict(
            flash_s=FLASH_NODES + 1,
            flash_throughput=round(frate, 3),
            flash_unit="giant-discussions/sec/chip",
            flash_mfu=round(
                flash_flops["train_total"] * frate / peak, 4
            ),
            flash_remat_policy=flash_policy,
            flash_scan_layers=scan,
        )

    # flash ladder: scan+names and scan+full tie at this bucket's shapes
    # (38.3 vs 38.4% MFU, r5 reruns — the bucket is tower-FLOP-dominated
    # and lightly imaged); the denser-image sweep variant of the same
    # regime measures names at 40.3% (flash_names_scan). noremat 500s
    # (program size).
    for flash_policy, flash_scan in (
        ("names", True),
        ("full", True),
        ("full", False),
    ):
        try:
            flash.update(_measure_flash(flash_policy, flash_scan))
            gc.collect()
            break
        except Exception as e:
            tag = ("scan_" if flash_scan else "") + flash_policy
            flash[f"flash_{tag}_error"] = repr(e)[:400]
            gc.collect()

    # contrastive stage-1 bucket (VERDICT r4 missing #3): the two-stage
    # recipe's pre-training criterion (reference contrastive_loss.py:52-227,
    # restored at run_train.sh:57-58) at the canonical geometry and cadence
    # — roughly half the published workflow's compute, previously unbenched
    contrastive = {}

    def _measure_contrastive():
        con_cfg = cfg.replace(
            task="contrastive_learning",
            criterion="contrastive_loss",
            optim=OptimConfig(update_freq=3, bf16_adam_state=True),
        )
        con_trainer = Trainer(con_cfg, mesh=mesh)
        con_items = synthetic_batch_items(
            BATCH, seed=0, min_nodes=8, max_nodes=MAX_NODES, seq_len=SEQ,
            vocab_size=con_cfg.model.text_tower.vocab_size, image_prob=0.25,
            image_shape=(3, 224, 224), contrastive=True,
        )
        con_host = collate(
            con_items, spatial_pos_max=con_cfg.task_cfg.spatial_pos_max,
            node_buckets=(MAX_NODES,), node_capacity_buckets=(NODE_CAP,),
            image_capacity_buckets=(IMG_CAP,),
            label_capacity_buckets=(LABEL_CAP,), contrastive=True,
        ).asdict()
        con_flops = train_step_flops(
            con_cfg.model,
            batch=BATCH,
            node_capacity=con_host["input_ids"].shape[0],
            image_capacity=con_host["images"].shape[0],
            seq_len=con_host["input_ids"].shape[1],
            max_nodes=con_host["in_degree"].shape[1],
        )
        con_state = con_trainer.init_state(con_host)
        con_step = con_trainer._make_train_step_scan()
        con_stacked = {
            k: np.stack([v] * cfg.optim.update_freq)
            for k, v in con_host.items()
        }
        with mesh:
            cjb = shard_stacked_batch(mesh, con_stacked)
            for _ in range(2):
                con_state, clogs = con_step(con_state, cjb)
            _loss_value(clogs)
            con_state, crate, closses = _timed_window(
                con_step, con_state, [cjb], 12
            )
        assert all(math.isfinite(v) for v in closses)
        return dict(
            contrastive_throughput=round(crate * uf * BATCH, 3),
            contrastive_unit="discussions/sec/chip",
            contrastive_mfu=round(
                con_flops["train_total"] * uf * crate / peak, 4
            ),
        )

    try:
        contrastive.update(_measure_contrastive())
        gc.collect()
    except Exception as e:
        contrastive["contrastive_error"] = repr(e)[:400]
        gc.collect()

    discussions_per_sec = steps_per_sec * uf * BATCH
    print(
        json.dumps(
            {
                "metric": "train_throughput_full_mdt",
                "value": round(discussions_per_sec, 3),
                "unit": "discussions/sec/chip",
                "vs_baseline": round(
                    discussions_per_sec / BASELINE_DISCUSSIONS_PER_SEC, 3
                ),
                # the baseline is DERIVED, not measured (VERDICT r4 #1/#6):
                # the reference publishes no throughput; 10.8 disc/s comes
                # from its own budget (10,820 updates x batch 12 x uf 3
                # inside the 10 h SLURM wall-clock, run_train.sh:3,44,62,65).
                # A reference re-run on a real A100 would replace it
                # (BASELINE.md documents the one-command procedure).
                "baseline_provenance": (
                    "derived: 10820 updates x 36 disc / 10h SLURM budget "
                    "(run_train.sh) ~= 10.8 disc/s on A100; not a "
                    "measured number"
                ),
                "chip": chip,
                "peak_flops_assumed": peak,
                "update_freq": uf,
                "flops_per_step": round(flops["train_total"] * uf),
                "mfu": round(mfu, 4),
                "timing_mode": timing_mode,
                "window_steps": steps_per_window,
                "window_rates_steps_per_sec": [
                    round(r, 3) for r in window_rates
                ],
                "loss_first_last": [
                    round(all_losses[0], 5),
                    round(all_losses[-1], 5),
                ],
                "infer_throughput": round(infer_rate * BATCH, 3),
                "infer_unit": "discussions/sec/chip",
                "infer_mfu": round(infer_mfu, 4),
                # every knob the headline sections set away from the
                # product's TrainConfig defaults, so the artifact is
                # self-describing (VERDICT r3 weak #1). The parity_default_*
                # keys above measure the untouched-default product.
                "config_deltas_from_product_defaults": {
                    "optim.bf16_adam_state": True,
                    "optim.update_freq": uf,
                    "data.node_buckets": [MAX_NODES],
                    "data.node_capacity_buckets": [NODE_CAP],
                    "bigtree.model.remat": True,
                    "bigtree.model.remat_policy": big.get(
                        "bigtree_remat_policy"
                    ),
                    "flash.model.remat": True,
                    "flash.model.remat_policy": flash.get(
                        "flash_remat_policy"
                    ),
                    "bigtree.model.scan_layers": big.get(
                        "bigtree_scan_layers"
                    ),
                    "flash.model.scan_layers": flash.get(
                        "flash_scan_layers"
                    ),
                },
                **parity,
                **big,
                **flash,
                **contrastive,
            }
        )
    )


if __name__ == "__main__":
    main()
