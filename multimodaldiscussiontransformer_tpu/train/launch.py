"""Training CLI — flag-for-flag mirror of the reference ``fairseq-train``
launch surface (mDT/experiments/hateful_discussions/run_train.sh:28-65).

Example (the canonical run, ``bash run_train.sh 8 4 5 2 2 0``):

    python -m multimodaldiscussiontransformer_tpu.train.launch \
        --task node_prediction --criterion node_cross_entropy \
        --arch multi_graphormer_base --dataset-name hateful_discussions \
        --num-fusion-layers 8 --num-bottleneck-tokens 4 --spatial-pos-max 5 \
        --num-graph-stack 2 --num-fusion-stack 2 --split 0 \
        --lr 3e-5 --end-learning-rate 3e-7 --warmup-updates 3246 \
        --total-num-update 10820 --batch-size 12 --update-freq 3 \
        --max-epoch 37 --positive-weight 1.5 --freeze-initial-encoders \
        --save-dir ckpts/run0

Quick smoke run without the real dataset:

    python -m multimodaldiscussiontransformer_tpu.train.launch --synthetic \
        --max-updates 4 --batch-size 4 --tiny

The reference's ``--fp16`` becomes ``--dtype bfloat16`` (the TPU-native
mixed-precision policy); ``--restore-file`` + ``--reset-optimizer`` map to
the Orbax restore path with the contrastive->node-prediction head-reset
transform applied for task transfer.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    # task / criterion / arch (run_train.sh:33-36)
    p.add_argument("--task", default="node_prediction",
                   choices=["node_prediction", "contrastive_learning"])
    p.add_argument("--criterion", default="node_cross_entropy")
    p.add_argument("--arch", default="multi_graphormer_base")
    p.add_argument("--user-dir", default="",
                   help="fairseq --user-dir (run_train.sh:29): import this "
                        "directory as a user module before building, so "
                        "its register_* decorators fire")
    p.add_argument("--user-data-dir", default="")
    p.add_argument("--dataset-name", default="hateful_discussions")
    p.add_argument("--data-root", default=None,
                   help="processed dataset root (MDT_DATA_ROOT)")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--split", type=int, default=0)
    p.add_argument("--seed", type=int, default=1)
    # model geometry (run_train.sh:47-54). The underscore spellings are
    # the reference model's own add_args surface
    # (multi_modal_discussion_transformer.py:70-93,155) — accepted as
    # aliases so the reference launch script works after only swapping
    # `fairseq-train` for this module
    p.add_argument("--num-fusion-layers", "--num_fusion_layers",
                   type=int, default=8)
    p.add_argument("--num-bottleneck-tokens", "--num_bottleneck_tokens",
                   type=int, default=4)
    p.add_argument("--num-graph-stack", "--num_graph_stack",
                   type=int, default=2)
    p.add_argument("--num-fusion-stack", "--num_fusion_stack",
                   type=int, default=2)
    p.add_argument("--spatial-pos-max", type=int, default=5)
    p.add_argument("--max-nodes", type=int, default=10000,
                   help="hard per-graph node bound (run_train.sh:64); "
                        "graphs past it fail loudly at collation")
    p.add_argument("--encoder-embed-dim", type=int, default=768)
    p.add_argument("--encoder-ffn-embed-dim", type=int, default=768)
    p.add_argument("--encoder-attention-heads", type=int, default=12)
    p.add_argument("--encoder-layers", type=int, default=12)
    # graph-block knobs from the reference model's add_args surface
    # (multi_modal_discussion_transformer.py:33-158); None/absent = keep
    # the arch preset's value (base_architecture layering, lines 290-344)
    p.add_argument("--activation-fn", default=None,
                   help="graph-block FFN activation (reference/arch "
                        "default gelu; relu, gelu_fast, tanh, ...)")
    p.add_argument("--pre-layernorm", action="store_true", default=None,
                   help="pre-LN graph blocks instead of the default "
                        "post-LN")
    p.add_argument("--encoder-normalize-before", action="store_true",
                   default=None,
                   help="final LayerNorm before the graph stacks "
                        "(arch default on)")
    p.add_argument("--apply-graphormer-init", action="store_true",
                   default=None,
                   help="model-wide normal(0.02) Linear/Embedding re-init "
                        "(clobbers pretrained towers; reference default "
                        "off)")
    # regularization (run_train.sh:37). Defaults resolve in
    # config_from_args: reference values (0.4/0.3/0.3) for real archs,
    # the preset's own values under --tiny — but an EXPLICIT flag always
    # wins, towers included (--tiny used to ignore these silently)
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--attention-dropout", type=float, default=None)
    p.add_argument("--act-dropout", type=float, default=None)
    # optimization (run_train.sh:38-44,65)
    p.add_argument("--optimizer", default="adam", choices=["adam"],
                   help="fairseq --optimizer surface; adam is the only "
                        "optimizer the reference recipe uses "
                        "(run_train.sh:38)")
    p.add_argument("--lr-scheduler", default="polynomial_decay",
                   choices=["polynomial_decay"],
                   help="fairseq --lr-scheduler surface (run_train.sh:39)")
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--end-learning-rate", type=float, default=3e-7)
    p.add_argument("--power", type=float, default=1.0)
    p.add_argument("--warmup-updates", type=int, default=3246)
    p.add_argument("--total-num-update", type=int, default=10820)
    p.add_argument("--adam-eps", type=float, default=1e-8)
    p.add_argument("--adam-betas", default="(0.9, 0.999)",
                   help="adam (beta1, beta2), fairseq tuple syntax "
                        "(run_train.sh:38 --adam-betas '(0.9, 0.999)')")
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--clip-norm", type=float, default=0.0)
    p.add_argument("--batch-size", type=int, default=12)
    p.add_argument("--required-batch-size-multiple", type=int, default=1,
                   help="fairseq surface (run_train.sh:44): batch size "
                        "must be a multiple of this (static TPU batches "
                        "are never rounded silently — violations fail "
                        "loudly at launch)")
    p.add_argument("--update-freq", type=int, default=3)
    p.add_argument("--no-scan-microbatches", action="store_true",
                   default=False,
                   help="accumulate with optax.MultiSteps instead of the "
                        "default in-step lax.scan (FairSeq-exact) path")
    p.add_argument("--bf16-adam-state", action="store_true", default=False,
                   help="store Adam m/v in bfloat16 (f32 math; halves "
                        "optimizer-state HBM traffic — the fp16-era lever, "
                        "run_train.sh:45)")
    p.add_argument("--max-epoch", type=int, default=37)
    p.add_argument("--max-updates", type=int, default=None)
    # precision: the reference's --fp16 (run_train.sh:45)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fp16", action="store_true", default=False,
                   help="fairseq --fp16 (run_train.sh:45), mapped to the "
                        "TPU-native mixed-precision policy: bfloat16 "
                        "compute (fp16 proper has no TPU support and its "
                        "loss-scaling machinery is unnecessary with bf16's "
                        "f32-range exponent)")
    # criterion weights (run_train.sh:59-60)
    p.add_argument("--positive-weight", type=float, default=1.5)
    p.add_argument("--negative-weight", type=float, default=1.0)
    p.add_argument("--soft-negative-weight", type=float, default=0.0)
    p.add_argument("--multiplication-scale", type=float, default=20.0)
    # freezing (run_train.sh:53; the reference spells it with underscores,
    # multi_modal_discussion_transformer.py:155)
    p.add_argument("--freeze-initial-encoders", "--freeze_initial_encoders",
                   action="store_true", default=False)
    # checkpointing (run_train.sh:57-63)
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--restore-file", default=None)
    p.add_argument("--reset-optimizer", action="store_true", default=False)
    p.add_argument("--validate-interval-updates", type=int, default=300)
    # fairseq --save-interval / --save-interval-updates
    p.add_argument("--save-interval", type=int, default=1)
    p.add_argument("--save-interval-updates", type=int, default=0)
    p.add_argument("--no-save", action="store_true", default=False,
                   help="fairseq --no-save: never write checkpoints (also "
                        "disables auto-resume)")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--wandb-project", default=os.environ.get("WANDB_PROJECT"))
    p.add_argument("--tensorboard-logdir", default=None,
                   help="fairseq-train --tensorboard-logdir surface")
    # tracing/profiling (SURVEY §5): capture a device trace of a few
    # steady-state updates, then keep training
    p.add_argument("--profile-trace", default=None,
                   help="directory for a jax.profiler trace "
                        "(XProf/Perfetto) of steady-state train updates")
    p.add_argument("--profile-steps", type=int, default=5)
    # mesh
    p.add_argument("--dp-size", type=int, default=-1)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--sp-size", type=int, default=1,
                   help="sequence-parallel axis size: shard the graph-"
                        "attention node axis over sp chips (ring attention)"
                        " for trees bigger than one chip")
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="shard params + optimizer state over the dp axis")
    p.add_argument("--distributed-world-size", type=int, default=1,
                   help="number of PROCESSES (one per TPU host) — the "
                        "fairseq flag (run_train.sh:52) reinterpreted for "
                        "multi-controller SPMD; 1 = single-process")
    p.add_argument("--distributed-rank", type=int, default=0,
                   help="this process's rank in [0, world-size)")
    p.add_argument("--distributed-init-method", default=None,
                   help="coordinator address, fairseq tcp:// syntax "
                        "(tcp://HOST:PORT or HOST:PORT); required when "
                        "world-size > 1 off-TPU (TPU VMs auto-detect)")
    p.add_argument("--num-slices", type=int, default=1,
                   help="multi-slice pods: outermost dcn mesh axis, data "
                        "parallel across slices over DCN; fsdp/tp/sp stay "
                        "on intra-slice ICI (dp-size is then per slice)")
    # HF initialization (the reference downloads pretrained towers at model
    # build time, multigraphormer_graph_encoder.py:236-245)
    p.add_argument("--hf-init", action="store_true", default=False)
    p.add_argument("--text-encoder", default="bert-base-uncased")
    p.add_argument("--image-encoder", default="google/vit-base-patch16-224")
    # data loading (run_train.sh:31 --num-workers 8)
    p.add_argument("--num-workers", type=int, default=0,
                   help="Grain collation worker processes (0 = in-process "
                        "prefetch thread; the reference's torch DataLoader "
                        "--num-workers surface)")
    # batching (TPU-native additions)
    p.add_argument("--length-grouped", action="store_true", default=False,
                   help="group similar-length discussions per batch")
    p.add_argument("--node-buckets", default=None,
                   help="comma-separated per-graph node-count bucket ladder "
                        "(single entry pins ONE compiled program shape)")
    p.add_argument("--node-capacity-buckets", default=None,
                   help="comma-separated flat text-capacity ladder")
    p.add_argument("--image-capacity-buckets", default=None,
                   help="comma-separated image-capacity ladder")
    p.add_argument("--label-capacity-buckets", default=None,
                   help="comma-separated label-capacity ladder")
    p.add_argument("--text-len-buckets", default=None,
                   help="comma-separated token-length ladder")
    # compute policy (TPU-native additions)
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize fusion+graph blocks (enable for "
                        "bigger-than-HBM configs; costs ~21%% throughput)")
    p.add_argument("--remat-policy", default="full",
                   choices=("full", "dots", "dots_saveable", "names", "names_heavy"),
                   help="what remat saves: full=recompute whole blocks; "
                        "dots/dots_saveable=keep matmul outputs, recompute "
                        "only elementwise ops (cheaper backward, more HBM); "
                        "names=keep only per-layer attention/FFN outputs "
                        "(between full and dots_saveable)")
    p.add_argument("--scan-layers", action="store_true", default=False,
                   help="run the uniform interleave pairs and tower stacks "
                        "as one nn.scan body over stacked params: identical "
                        "numerics, ~4x smaller compiled program (param "
                        "layout changes; checkpoints auto-convert on "
                        "--restore-file + --reset-optimizer)")
    p.add_argument("--use-pallas-attention", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused Pallas tree-attention kernel (default on; "
                        "--no-use-pallas-attention for the XLA path)")
    # evaluation-only (the fairseq-validate entry of the consumed FairSeq
    # CLI family, SURVEY.md §2.3): restore a checkpoint and score splits
    p.add_argument("--eval-only", action="store_true", default=False,
                   help="no training: restore (--restore-file, else "
                        "--save-dir) and evaluate --valid-subset")
    p.add_argument("--valid-subset", default="valid,test",
                   help="comma-separated splits to score with --eval-only")
    p.add_argument("--load-best", action="store_true", default=False,
                   help="evaluate the tracked best checkpoint instead of "
                        "the latest")
    p.add_argument("--predict-output", default=None, metavar="DIR",
                   help="with --eval-only: also write per-node "
                        "predictions-<split>.parquet under DIR (the "
                        "reference's prediction artifact, Comment-Only "
                        "Experiments/src/text_bert.py:68-80)")
    p.add_argument("--average-last", type=int, default=None,
                   help="evaluate the average of the newest K checkpoints "
                        "(scripts/average_checkpoints.py surface)")
    # smoke-run conveniences
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--synthetic-graphs", type=int, default=None,
                   help="synthetic corpus size (default max(4*batch, 32)); "
                        "raise for steady-state throughput measurement")
    p.add_argument("--tiny", action="store_true", default=False,
                   help="tiny model geometry for smoke tests")
    # Vestigial reference flags (accepted or rejected explicitly so a
    # reference launch script never dies with an argparse "unrecognized
    # arguments" error; per-flag decision recorded in MIGRATION.md):
    # all six are dead in every canonical reference run —
    # multi_modal_discussion_transformer.py:109-130 registers the first
    # four but never reads them (share-...-embed raises NotImplementedError
    # at :244-249 when set), and layerdrop/q_noise are module-constructor
    # knobs left at 0 (multigraphormer_graph_encoder.py:64,74).
    p.add_argument("--encoder-learned-pos", action="store_true", default=False,
                   help="vestigial (reference registers it but never reads "
                        "it); accepted and ignored with a warning")
    p.add_argument("--no-token-positional-embeddings", action="store_true",
                   default=False,
                   help="vestigial (reference registers it but never reads "
                        "it); accepted and ignored with a warning")
    p.add_argument("--max-positions", type=int, default=None,
                   help="vestigial (reference registers it but never reads "
                        "it — the node bound is --max-nodes); accepted and "
                        "ignored with a warning")
    p.add_argument("--share-encoder-input-output-embed", action="store_true",
                   default=False,
                   help="rejected: the reference itself raises "
                        "NotImplementedError when set "
                        "(multi_modal_discussion_transformer.py:244-249)")
    p.add_argument("--encoder-layerdrop", type=float, default=0.0,
                   help="0.0 (the reference module default) accepted; "
                        "nonzero rejected — stochastic layer drop is not "
                        "implemented in the reference's canonical runs or "
                        "here")
    p.add_argument("--quant-noise-pq", type=float, default=0.0,
                   help="0.0 (the reference module default) accepted; "
                        "nonzero rejected — quant-noise training is not "
                        "implemented in the reference's canonical runs or "
                        "here")
    return p


def handle_vestigial_flags(args, parser=None) -> None:
    """Accept-and-warn or reject-with-pointer the reference's dead flags
    (VERDICT r3 missing #4). Called from main() right after parsing."""
    def _warn(msg):
        print(f"WARNING: {msg}", file=sys.stderr)

    def _reject(msg):
        if parser is not None:
            parser.error(msg)
        raise SystemExit(2)

    if args.encoder_learned_pos:
        _warn("--encoder-learned-pos is vestigial: the reference registers "
              "it (multi_modal_discussion_transformer.py:114-118) but never "
              "reads it; ignored.")
    if args.no_token_positional_embeddings:
        _warn("--no-token-positional-embeddings is vestigial: the reference "
              "registers it (multi_modal_discussion_transformer.py:119-124) "
              "but never reads it; ignored.")
    if args.max_positions is not None:
        _warn("--max-positions is vestigial: the reference registers it "
              "(multi_modal_discussion_transformer.py:125-130) but never "
              "reads it. The graph-size bound is --max-nodes "
              f"(currently {args.max_nodes}); --max-positions ignored.")
    if args.share_encoder_input_output_embed:
        _reject("--share-encoder-input-output-embed is not implemented: the "
                "reference itself raises NotImplementedError when it is set "
                "(multi_modal_discussion_transformer.py:244-249). Drop the "
                "flag.")
    if args.encoder_layerdrop != 0.0:
        _reject("--encoder-layerdrop != 0 is not implemented: the reference "
                "leaves the module knob at 0 in every canonical run "
                "(multigraphormer_graph_encoder.py:64,127-128). Drop the "
                "flag or use 0.")
    if args.quant_noise_pq != 0.0:
        _reject("--quant-noise-pq != 0 is not implemented: the reference "
                "leaves the module knob at 0 in every canonical run "
                "(multigraphormer_graph_encoder.py:74,110-115). Drop the "
                "flag or use 0.")


def config_from_args(args) -> "TrainConfig":
    if getattr(args, "fp16", False):
        # the reference's mixed-precision flag (run_train.sh:45); bf16 is
        # the TPU equivalent — see the --fp16 help text
        args.dtype = "bfloat16"
    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        ModelConfig,
        OptimConfig,
        TaskConfig,
        TrainConfig,
        tiny_model_config,
    )

    if args.tiny:
        model = tiny_model_config(
            freeze_initial_encoders=args.freeze_initial_encoders,
            dtype="float32",
        )
        # explicit dropout flags override the preset, towers included —
        # NB the tiny preset's towers carry the HF-default 0.1 dropout, so
        # "--tiny --dropout 0 --attention-dropout 0 --act-dropout 0" is how
        # tests get a bit-deterministic train step (required for e.g. the
        # two-process-vs-single-process parity test: the rbg dropout RNG's
        # bit stream is topology-dependent, see TrainConfig.fast_dropout_rng)
        import dataclasses as _dc

        if args.dropout is not None:
            model = model.replace(dropout=args.dropout)
        if args.act_dropout is not None:
            model = model.replace(act_dropout=args.act_dropout)
        if args.attention_dropout is not None:
            model = model.replace(attention_dropout=args.attention_dropout)
        if args.attention_dropout is not None or args.act_dropout is not None:
            tower_kw = {}
            if args.act_dropout is not None:
                tower_kw["hidden_dropout_prob"] = args.act_dropout
            if args.attention_dropout is not None:
                tower_kw["attention_probs_dropout_prob"] = args.attention_dropout
            model = model.replace(
                text_tower=_dc.replace(model.text_tower, **tower_kw),
                image_tower=_dc.replace(model.image_tower, **tower_kw),
            )
    else:
        # resolve the registered architecture preset first (e.g.
        # multi_graphormer_graph_only, multi_graphormer_roberta_clip), then
        # apply the CLI geometry/regularization overrides on top — the
        # reference's base_architecture + CLI-flag layering
        # (multi_modal_discussion_transformer.py:290-344)
        from multimodaldiscussiontransformer_tpu.core import registry
        from multimodaldiscussiontransformer_tpu.core.registry import (
            ARCHITECTURES,
        )

        registry.populate()
        arch_fn = (
            ARCHITECTURES.get(args.arch)
            if args.arch in ARCHITECTURES
            else (lambda **kw: ModelConfig(**kw) if kw else ModelConfig())
        )
        model = arch_fn()
        # the reference rebuilds the HF towers with the model-level dropout
        # flags (build_vit_bert_encoders, multigraphormer_graph_encoder.py:
        # 233-245: hidden_dropout_prob=act_dropout,
        # attention_probs_dropout_prob=attention_dropout)
        import dataclasses as _dc

        # unset dropout flags resolve to the reference recipe defaults
        # (run_train.sh:37)
        if args.dropout is None:
            args.dropout = 0.4
        if args.attention_dropout is None:
            args.attention_dropout = 0.3
        if args.act_dropout is None:
            args.act_dropout = 0.3
        model = model.replace(
            num_bottleneck_tokens=args.num_bottleneck_tokens,
            num_fusion_layers=args.num_fusion_layers,
            num_fusion_stack=args.num_fusion_stack,
            num_graph_stack=args.num_graph_stack,
            encoder_embed_dim=args.encoder_embed_dim,
            encoder_ffn_embed_dim=args.encoder_ffn_embed_dim,
            encoder_attention_heads=args.encoder_attention_heads,
            dropout=args.dropout,
            attention_dropout=args.attention_dropout,
            act_dropout=args.act_dropout,
            freeze_initial_encoders=args.freeze_initial_encoders,
            num_classes=args.num_classes if args.num_classes > 1 else 2,
            dtype=args.dtype,
            remat=args.remat,
            remat_policy=args.remat_policy,
            use_pallas_attention=args.use_pallas_attention,
            text_encoder_name=args.text_encoder,
            image_encoder_name=args.image_encoder,
            text_tower=_dc.replace(
                model.text_tower,
                hidden_dropout_prob=args.act_dropout,
                attention_probs_dropout_prob=args.attention_dropout,
            ),
            image_tower=_dc.replace(
                model.image_tower,
                hidden_dropout_prob=args.act_dropout,
                attention_probs_dropout_prob=args.attention_dropout,
            ),
        )
    # graph-block knobs: explicit flags override the arch preset (tiny
    # included); absent flags keep the preset's values
    if args.activation_fn is not None:
        model = model.replace(activation_fn=args.activation_fn)
    if args.pre_layernorm is not None:
        model = model.replace(pre_layernorm=args.pre_layernorm)
    if args.encoder_normalize_before is not None:
        model = model.replace(
            encoder_normalize_before=args.encoder_normalize_before
        )
    if args.apply_graphormer_init is not None:
        model = model.replace(apply_graphormer_init=args.apply_graphormer_init)
    if args.sp_size > 1:
        # an sp mesh axis is only useful if the model routes its graph
        # attention through the ring — enable it together
        model = model.replace(sequence_parallel=True)
    if args.scan_layers:
        model = model.replace(scan_layers=True)
    if args.remat and not model.remat:
        model = model.replace(remat=True)  # e.g. --tiny --remat
    if args.remat and model.remat_policy != args.remat_policy:
        model = model.replace(remat_policy=args.remat_policy)

    def ladder(spec, default):
        if spec is None:
            return default
        return tuple(int(x) for x in str(spec).split(",") if x.strip())

    data = DataConfig(
        batch_size=args.batch_size,
        length_grouped=args.length_grouped,
        num_workers=args.num_workers,
        node_buckets=ladder(args.node_buckets, DataConfig.node_buckets),
        node_capacity_buckets=ladder(
            args.node_capacity_buckets, DataConfig.node_capacity_buckets
        ),
        image_capacity_buckets=ladder(
            args.image_capacity_buckets, DataConfig.image_capacity_buckets
        ),
        label_capacity_buckets=ladder(
            args.label_capacity_buckets, DataConfig.label_capacity_buckets
        ),
        text_len_buckets=ladder(
            args.text_len_buckets, DataConfig.text_len_buckets
        ),
    )
    if args.tiny:
        # explicit ladder flags still win (e.g. pinning a single program
        # shape for deterministic multi-process tests)
        data = DataConfig(
            batch_size=args.batch_size,
            length_grouped=args.length_grouped,
            num_workers=args.num_workers,
            max_text_len=16,
            node_buckets=ladder(args.node_buckets, (8, 16)),
            node_capacity_buckets=ladder(
                args.node_capacity_buckets, (32, 64, 128)
            ),
            image_capacity_buckets=ladder(
                args.image_capacity_buckets, (0, 8, 16)
            ),
            label_capacity_buckets=ladder(
                args.label_capacity_buckets, (8, 16, 32, 64)
            ),
        )
    return TrainConfig(
        criterion=args.criterion,
        task=args.task,
        arch=args.arch,
        max_epoch=args.max_epoch,
        validate_interval_updates=args.validate_interval_updates,
        save_interval=args.save_interval,
        save_interval_updates=args.save_interval_updates,
        save_dir=args.save_dir,
        profile_trace_dir=args.profile_trace,
        profile_trace_steps=args.profile_steps,
        restore_file=args.restore_file,
        reset_optimizer=args.reset_optimizer,
        seed=args.seed,
        log_interval=args.log_interval,
        positive_weight=args.positive_weight,
        negative_weight=args.negative_weight,
        soft_negative_weight=args.soft_negative_weight,
        multiplication_scale=args.multiplication_scale,
        dp_size=args.dp_size,
        tp_size=args.tp_size,
        sp_size=args.sp_size,
        num_slices=args.num_slices,
        fsdp=args.fsdp,
        optim=OptimConfig(
            lr=args.lr,
            end_learning_rate=args.end_learning_rate,
            warmup_updates=args.warmup_updates,
            total_num_update=args.total_num_update,
            adam_eps=args.adam_eps,
            adam_betas=tuple(
                float(x) for x in args.adam_betas.strip("()[] ").split(",")
            ),
            weight_decay=args.weight_decay,
            update_freq=args.update_freq,
            scan_microbatches=not args.no_scan_microbatches,
            bf16_adam_state=args.bf16_adam_state,
            clip_norm=args.clip_norm,
            power=args.power,
        ),
        model=model,
        data=data,
        task_cfg=TaskConfig(
            dataset_name="synthetic" if args.synthetic else args.dataset_name,
            num_classes=args.num_classes,
            spatial_pos_max=args.spatial_pos_max,
            max_nodes=args.max_nodes,
            seed=args.seed,
            user_data_dir=args.user_data_dir,
        ),
    )


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    handle_vestigial_flags(args, parser)

    if (args.required_batch_size_multiple > 1
            and args.batch_size % args.required_batch_size_multiple):
        print(
            f"error: --batch-size {args.batch_size} is not a multiple of "
            f"--required-batch-size-multiple "
            f"{args.required_batch_size_multiple} (static TPU batch shapes "
            f"are never rounded silently)",
            file=sys.stderr,
        )
        return 2
    if args.user_dir:
        # fairseq --user-dir semantics (import_user_module): import the
        # directory as a package so its register_* decorators fire
        import importlib.util as _ilu
        import os.path as _osp

        init = _osp.join(args.user_dir, "__init__.py")
        spec = _ilu.spec_from_file_location(
            _osp.basename(_osp.normpath(args.user_dir)) or "mdt_user_dir",
            init if _osp.exists(init) else None,
            submodule_search_locations=[args.user_dir],
        )
        if spec is not None and spec.loader is not None:
            module = _ilu.module_from_spec(spec)
            sys.modules[spec.name] = module
            spec.loader.exec_module(module)

    if args.distributed_world_size > 1:
        # must run before anything touches a jax backend: the mesh layer
        # then sees all global devices (one process per host, SURVEY §2.4
        # comm row — the fairseq --distributed-world-size surface)
        from multimodaldiscussiontransformer_tpu.parallel import distributed

        addr = args.distributed_init_method
        if addr and addr.startswith("tcp://"):
            addr = addr[len("tcp://"):]
        distributed.initialize(
            coordinator_address=addr,
            num_processes=args.distributed_world_size,
            process_id=args.distributed_rank,
        )
        import jax

        print(
            f"distributed: rank {jax.process_index()}/{jax.process_count()}"
            f", {jax.device_count()} global devices"
        )

    cfg = config_from_args(args)

    from multimodaldiscussiontransformer_tpu.core.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodaldiscussiontransformer_tpu.core import registry
    from multimodaldiscussiontransformer_tpu.core.registry import TASKS
    from multimodaldiscussiontransformer_tpu.train.metrics import MetricsWriter
    from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
        Checkpointer,
        restore_params_into_state,
    )

    registry.populate()
    task = TASKS.get(cfg.task)(cfg)
    cfg = task.cfg

    if args.synthetic:
        img = (3, 32, 32) if args.tiny else (3, 224, 224)
        factory_kwargs = dict(
            num_graphs=(
                args.synthetic_graphs
                if args.synthetic_graphs is not None
                else max(4 * cfg.data.batch_size, 32)
            ),
            seed=cfg.seed,
            contrastive=task.contrastive,
            seq_len=cfg.data.max_text_len,
            vocab_size=cfg.model.text_tower.vocab_size,
            image_shape=img,
            max_nodes=8 if args.tiny else 24,
        )
    else:
        img = (3, cfg.model.image_tower.image_size, cfg.model.image_tower.image_size)
        factory_kwargs = {"split": args.split, "seed": cfg.seed}
        if args.data_root:
            factory_kwargs["root"] = args.data_root
    dataset = task.load_dataset(**factory_kwargs)
    print(
        f"dataset: {len(dataset)} graphs "
        f"(train {len(dataset.train_idx)} / valid {len(dataset.valid_idx)} "
        f"/ test {len(dataset.test_idx)})"
    )

    trainer = task.build_trainer(image_shape=img)
    first = next(iter(trainer.train_batches(dataset, epoch=1)), None)
    if first is None:
        print(
            f"error: the train split yields no batches — "
            f"{len(dataset.train_idx)} train graphs < global batch "
            f"{trainer.global_batch_size} (per-replica "
            f"{cfg.data.batch_size} x {trainer.global_batch_size // max(cfg.data.batch_size, 1)} "
            f"data-parallel replicas) with drop_last; lower --batch-size "
            f"or provide more data",
            file=sys.stderr,
        )
        return 1
    state = trainer.init_state(first.asdict())

    if args.hf_init and not args.tiny:
        from multimodaldiscussiontransformer_tpu.utils import hf_import

        bert_sd, vit_sd = hf_import.state_dicts_from_pretrained(
            cfg.model.text_encoder_name,
            cfg.model.image_encoder_name,
            attention_dropout=cfg.model.attention_dropout,
            hidden_dropout=cfg.model.act_dropout,
        )
        import jax

        params = hf_import.import_towers(
            jax.device_get(state.params), cfg.model, bert_sd, vit_sd
        )
        state = trainer.load_params(state, params)
        print("initialized towers from HF checkpoints")

    if args.eval_only:
        from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
            _get,
            average_checkpoints,
        )

        src = cfg.restore_file or cfg.save_dir
        if args.average_last is not None:
            params = average_checkpoints(src, last_k=args.average_last)
            state = trainer.load_params(state, params)
            print(f"evaluating average of last {args.average_last} "
                  f"checkpoints from {src}")
        else:
            rckpt = Checkpointer(src)
            restored = rckpt.restore(state, best=args.load_best)
            rckpt.close()
            if restored is None:
                print(f"error: no checkpoint under {src}", file=sys.stderr)
                return 1
            state = trainer.load_params(state, _get(restored, "params"))
            print(f"evaluating {'best' if args.load_best else 'latest'} "
                  f"checkpoint from {src}")
        results = {}
        for split in args.valid_subset.split(","):
            split = split.strip()
            if split not in ("valid", "test"):
                print(f"error: unknown split {split!r} (valid,test)",
                      file=sys.stderr)
                return 1
            if not len(getattr(dataset, f"{split}_idx")):
                continue
            results[split] = trainer.evaluate(state, dataset, split)
            print(f"{split}:", json.dumps(results[split]))
            if args.predict_output:
                if trainer.contrastive:
                    print("error: --predict-output needs the node task "
                          "(contrastive targets are per-graph)",
                          file=sys.stderr)
                    return 1
                from multimodaldiscussiontransformer_tpu.train.trainer import (
                    write_predictions,
                )

                os.makedirs(args.predict_output, exist_ok=True)
                # collective under multi-process (every rank enters and
                # returns the full gathered table); only rank 0 writes
                cols = trainer.predict(state, dataset, split)
                if trainer.host_index == 0:
                    out_path = write_predictions(
                        os.path.join(
                            args.predict_output,
                            f"predictions-{split}.parquet",
                        ),
                        cols,
                    )
                    print(f"wrote {len(cols['graph_idx'])} per-node rows "
                          f"-> {out_path}")
        return 0 if results else 1

    ckpt = None if args.no_save else Checkpointer(cfg.save_dir)
    if cfg.restore_file:
        restore_ckpt = Checkpointer(cfg.restore_file)
        restored = restore_ckpt.restore(state)
        if restored is not None:
            if cfg.task == "node_prediction" and cfg.reset_optimizer:
                # contrastive -> node-prediction transfer: head reset intent
                from multimodaldiscussiontransformer_tpu.utils.checkpoints import _get

                new_params = task.transfer_from_contrastive(
                    _get(restored, "params"), seed=cfg.seed
                )
                restored = (
                    {**restored, "params": new_params}
                    if isinstance(restored, dict)
                    else restored.replace(params=new_params)
                )
            state = restore_params_into_state(
                trainer, state, restored, cfg.reset_optimizer
            )
            print(f"restored from {cfg.restore_file}")
    elif ckpt is not None and ckpt.latest_step() is not None:
        restored = ckpt.restore(state)
        state = restore_params_into_state(trainer, state, restored, False)
        print(f"auto-resumed from step {ckpt.latest_step()}")

    import jax as _jax

    if _jax.process_index() == 0:
        writer = MetricsWriter(
            cfg.save_dir, wandb_project=args.wandb_project,
            config=dataclasses.asdict(cfg),
            tensorboard_logdir=args.tensorboard_logdir,
        )
    else:  # concurrent appends to one metrics.jsonl would interleave
        from multimodaldiscussiontransformer_tpu.train.metrics import (
            NullMetricsWriter,
        )

        writer = NullMetricsWriter()
    # Preemption handling (SURVEY §5 failure-detection row): TPU VMs get
    # SIGTERM with a short grace period before the maintenance event. The
    # handler only flips a flag; the train loop checkpoints at the next
    # update boundary and returns, and the auto-resume branch above picks
    # the run back up on the replacement VM.
    import signal

    stop = {"requested": False}

    def _request_stop(signum, frame):
        stop["requested"] = True
        print(f"signal {signum}: finishing current update, then "
              "checkpoint + exit")

    prev_term = signal.signal(signal.SIGTERM, _request_stop)
    try:
        state = trainer.fit(
            dataset,
            state=state,
            max_updates=args.max_updates,
            writer=writer,
            checkpointer=ckpt,
            should_stop=lambda: stop["requested"],
        )
    finally:
        signal.signal(signal.SIGTERM, prev_term)
    if ckpt is not None:
        ckpt.wait()
    if stop["requested"]:
        saved = "checkpoint saved" if ckpt is not None else "no-save"
        print(f"preempted: {saved} at step {int(state.step)}")
        writer.close()
        return 0
    if len(dataset.test_idx):
        test_metrics = trainer.evaluate(state, dataset, "test")
        writer.write("test", int(state.step), test_metrics)
        print("test:", json.dumps(test_metrics))
    writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
