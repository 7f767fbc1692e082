"""Launch-CLI flag parity: the canonical reference invocation must map onto
the exact canonical TrainConfig (run_train.sh:28-65, sample_run.sh:3)."""

import pytest

from multimodaldiscussiontransformer_tpu.train.launch import (
    build_parser,
    config_from_args,
    handle_vestigial_flags,
)

CANONICAL = (
    "--task node_prediction --criterion node_cross_entropy "
    "--arch multi_graphormer_base --dataset-name hateful_discussions "
    "--num-fusion-layers 8 --num-bottleneck-tokens 4 --spatial-pos-max 5 "
    "--num-graph-stack 2 --num-fusion-stack 2 --split 0 "
    "--encoder-embed-dim 768 --encoder-ffn-embed-dim 768 "
    "--encoder-attention-heads 12 --encoder-layers 12 "
    "--dropout 0.4 --attention-dropout 0.3 --act-dropout 0.3 "
    "--lr 3e-5 --end-learning-rate 3e-7 --power 1 "
    "--warmup-updates 3246 --total-num-update 10820 "
    "--adam-eps 1e-8 --weight-decay 0.01 --clip-norm 0 "
    "--batch-size 12 --update-freq 3 --max-epoch 37 "
    "--positive-weight 1.5 --negative-weight 1.0 "
    "--freeze-initial-encoders --validate-interval-updates 300 "
    "--save-dir ckpts/run0"
).split()


def test_canonical_flags_roundtrip():
    args = build_parser().parse_args(CANONICAL)
    cfg = config_from_args(args)
    m, o = cfg.model, cfg.optim
    assert cfg.task == "node_prediction"
    assert cfg.criterion == "node_cross_entropy"
    assert cfg.task_cfg.dataset_name == "hateful_discussions"
    assert cfg.task_cfg.spatial_pos_max == 5
    assert (m.num_fusion_layers, m.num_bottleneck_tokens) == (8, 4)
    assert (m.num_graph_stack, m.num_fusion_stack) == (2, 2)
    assert (m.encoder_embed_dim, m.encoder_ffn_embed_dim) == (768, 768)
    assert m.encoder_attention_heads == 12
    assert (m.dropout, m.attention_dropout, m.act_dropout) == (0.4, 0.3, 0.3)
    assert m.freeze_initial_encoders
    assert m.dtype == "bfloat16"  # the --fp16 equivalent policy
    assert (o.lr, o.end_learning_rate) == (3e-5, 3e-7)
    assert (o.warmup_updates, o.total_num_update) == (3246, 10820)
    assert (o.adam_eps, o.weight_decay, o.clip_norm) == (1e-8, 0.01, 0.0)
    assert (cfg.data.batch_size, o.update_freq) == (12, 3)
    assert cfg.max_epoch == 37
    assert (cfg.positive_weight, cfg.negative_weight) == (1.5, 1.0)
    assert cfg.validate_interval_updates == 300
    # derived geometry: 9 HF layers split -> 5 fusion stacks, 6 graph stacks
    assert m.num_fusion_stacks == 5
    assert m.num_graph_stacks == 6
    assert m.num_bottom_text_layers == 3
    assert m.num_bottom_image_layers == 3


def test_smoke_flags():
    args = build_parser().parse_args(
        ["--synthetic", "--tiny", "--batch-size", "4"]
    )
    cfg = config_from_args(args)
    assert cfg.task_cfg.dataset_name == "synthetic"
    assert cfg.data.batch_size == 4
    assert cfg.model.encoder_embed_dim == 64


def test_graph_block_knob_flags():
    """The reference model's add_args knobs
    (multi_modal_discussion_transformer.py:33-158): absent flags keep the
    arch preset's values; explicit flags override, --tiny included."""
    args = build_parser().parse_args(CANONICAL)
    m = config_from_args(args).model
    assert m.activation_fn == "gelu"       # arch default, line 314
    assert m.encoder_normalize_before      # preset default
    assert not m.pre_layernorm
    assert not m.apply_graphormer_init     # default off, line 312

    args = build_parser().parse_args(
        CANONICAL
        + ["--activation-fn", "relu", "--pre-layernorm",
           "--apply-graphormer-init"]
    )
    m = config_from_args(args).model
    assert m.activation_fn == "relu"
    assert m.pre_layernorm
    assert m.apply_graphormer_init

    args = build_parser().parse_args(
        ["--synthetic", "--tiny", "--activation-fn", "tanh"]
    )
    assert config_from_args(args).model.activation_fn == "tanh"


def test_reference_script_flag_vector_verbatim():
    """The EXACT fairseq-train flag vector from the reference launch script
    (run_train.sh:28-65 with the canonical positional args 8 4 5 2 2 0,
    sample_run.sh:3) must parse — underscore spellings, --fp16,
    --optimizer/--lr-scheduler, --required-batch-size-multiple and all —
    so the script works after only swapping the `fairseq-train` token."""
    argv = [
        "--user-dir", ".",
        "--user-data-dir", "",
        "--num-workers", "8",
        "--dataset-name", "hateful_discussions",
        "--task", "node_prediction",
        "--criterion", "node_cross_entropy",
        "--arch", "multi_graphormer_base",
        "--num-classes", "1",
        "--attention-dropout", "0.3", "--act-dropout", "0.3",
        "--dropout", "0.4",
        "--optimizer", "adam", "--adam-betas", "(0.9, 0.999)",
        "--adam-eps", "1e-8", "--weight-decay", "0.01",
        "--lr-scheduler", "polynomial_decay", "--power", "1",
        "--warmup-updates", "3246", "--total-num-update", "10820",
        "--lr", "3e-5", "--end-learning-rate", "3e-7",
        "--spatial-pos-max", "5",
        "--validate-interval-updates", "300",
        "--batch-size", "12",
        "--required-batch-size-multiple", "1",
        "--fp16",
        "--encoder-layers", "4",
        "--num_bottleneck_tokens", "4",
        "--num_fusion_layers", "8",
        "--num_graph_stack", "2",
        "--num_fusion_stack", "2",
        "--encoder-embed-dim", "768",
        "--distributed-world-size", "1",
        "--encoder-ffn-embed-dim", "768",
        "--encoder-attention-heads", "12",
        "--max-epoch", "37",
        "--wandb-project", "Multi-Modal Discussion Transformer",
        "--save-dir", "./checkpoints-final/x",
        "--restore-file", "/does/not/matter/checkpoint_last.pt",
        "--positive-weight", "1.5",
        "--negative-weight", "1",
        "--freeze_initial_encoders",
        "--split", "0",
        "--reset-optimizer",
        "--max-nodes", "10000",
        "--update-freq", "3",
    ]
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    m = cfg.model
    assert (m.num_fusion_layers, m.num_bottleneck_tokens) == (8, 4)
    assert (m.num_graph_stack, m.num_fusion_stack) == (2, 2)
    assert m.freeze_initial_encoders
    assert m.dtype == "bfloat16"  # --fp16 maps to the bf16 policy
    assert args.fp16 and args.optimizer == "adam"
    assert args.lr_scheduler == "polynomial_decay"
    assert cfg.optim.update_freq == 3
    assert cfg.task_cfg.max_nodes == 10000
    # --fp16 wins over an explicit conflicting --dtype (mixed precision
    # was requested; bf16 IS the TPU mixed-precision policy)
    args2 = build_parser().parse_args(argv + ["--dtype", "float32"])
    assert config_from_args(args2).model.dtype == "bfloat16"


def test_vestigial_flags_accepted_with_warning(capsys):
    """The reference's dead model flags parse (no argparse error) and warn
    (VERDICT r3 missing #4; multi_modal_discussion_transformer.py:109-130,
    MIGRATION.md per-flag table)."""
    parser = build_parser()
    args = parser.parse_args(
        CANONICAL
        + ["--encoder-learned-pos", "--no-token-positional-embeddings",
           "--max-positions", "512", "--encoder-layerdrop", "0.0",
           "--quant-noise-pq", "0.0"]
    )
    handle_vestigial_flags(args, parser)
    err = capsys.readouterr().err
    assert "--encoder-learned-pos is vestigial" in err
    assert "--no-token-positional-embeddings is vestigial" in err
    assert "--max-positions is vestigial" in err and "--max-nodes" in err
    # the config is untouched by the vestigial flags
    cfg = config_from_args(args)
    assert cfg.model.encoder_embed_dim == 768

    # silent when absent / at reference defaults
    args = parser.parse_args(CANONICAL)
    handle_vestigial_flags(args, parser)
    assert capsys.readouterr().err == ""


@pytest.mark.parametrize(
    "flags, pointer",
    [
        (["--share-encoder-input-output-embed"], "NotImplementedError"),
        (["--encoder-layerdrop", "0.1"], "multigraphormer_graph_encoder"),
        (["--quant-noise-pq", "0.5"], "multigraphormer_graph_encoder"),
    ],
)
def test_vestigial_flags_rejected_with_pointer(flags, pointer, capsys):
    """Behavior-changing dead flags are rejected with an explanation, not an
    argparse 'unrecognized arguments' error."""
    parser = build_parser()
    args = parser.parse_args(CANONICAL + flags)
    with pytest.raises(SystemExit) as e:
        handle_vestigial_flags(args, parser)
    assert e.value.code == 2
    assert pointer in capsys.readouterr().err
