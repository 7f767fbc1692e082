"""Single dataclass-based config tree for the whole framework.

Replaces the reference's three overlapping config systems (argparse
`add_args` at mDT/src/models/multi_modal_discussion_transformer.py:33-158,
FairseqDataclass/omegaconf at mDT/src/tasks/task.py:29-113, and raw
`fairseq-train` CLI flags at
mDT/experiments/hateful_discussions/run_train.sh:28-65) with one tree.

Defaults reproduce the canonical published run
(`bash run_train.sh 8 4 5 2 2 0`, sample_run.sh:3):
8 fusion layers, 4 bottleneck tokens, spatial_pos_max 5, graph stack 2,
fusion stack 2, d=768, 12 heads, FFN 768.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class BertTowerConfig:
    """HF ``bert-base-uncased`` geometry (consumed by the reference at
    mDT/src/modules/multigraphormer_graph_encoder.py:241-245)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_token_id: int = 0
    # encoder-swap surface (BASELINE.json "encoder-swap ablation"):
    # RoBERTa uses pad-offset position ids and no token types
    hidden_act: str = "gelu"  # gelu | gelu_new | quick_gelu
    position_offset: int = 0  # RoBERTa: padding_idx + 1 = 2
    use_token_type: bool = True
    # fused Pallas attention for the tower layers (TPU only; off-TPU falls
    # back to XLA transparently). The (B, H, S, S) probs tensor never
    # materializes in HBM in forward OR backward, and attention-prob
    # dropout masks are regenerated in-kernel — the tower analogue of the
    # graph path's ModelConfig.use_pallas_attention. Default OFF: measured
    # 5.6% SLOWER full-step at canonical shapes (S=100, B~256; v5e sweep
    # towers_pallas_noremat 46.8 vs towers_xla 49.5 disc/s) — XLA's big
    # batched matmuls beat the kernel's per-graph grid there; the kernel
    # stays available for memory-bound regimes (huge node capacities where
    # the probs tensor would blow HBM).
    use_pallas_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class ViTTowerConfig:
    """HF ``google/vit-base-patch16-224`` geometry (consumed by the reference
    at mDT/src/modules/multigraphormer_graph_encoder.py:236-240)."""

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    # encoder-swap surface: CLIP-ViT uses QuickGELU, a pre-embedding
    # layernorm, and a bias-free patch conv
    hidden_act: str = "gelu"  # gelu | quick_gelu
    embeddings_layernorm: bool = False
    patch_bias: bool = True
    # fused Pallas attention (see BertTowerConfig.use_pallas_attention —
    # same measured default-OFF rationale)
    use_pallas_attention: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class ModelConfig:
    """Full mDT model geometry.

    Field names follow the reference CLI arg surface
    (multi_modal_discussion_transformer.py:33-158 and
    multigraphormer_graph_encoder.py:43-77)."""

    # graphormer featurizer vocab sizes (mDT/src/tasks/task.py:53-96)
    num_atoms: int = 512 * 9
    num_edges: int = 512 * 3
    num_in_degree: int = 512
    num_out_degree: int = 512
    num_spatial: int = 512
    num_edge_dis: int = 128
    edge_type: str = "multi_hop"
    multi_hop_max_dist: int = 5

    # fusion / graph interleave (run_train.sh:47-54, sample_run.sh:3)
    num_bottleneck_tokens: int = 4
    num_fusion_layers: int = 8
    num_fusion_stack: int = 2
    num_graph_stack: int = 2

    # transformer geometry (run_train.sh:47-54)
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 768
    encoder_attention_heads: int = 12
    encoder_layers: int = 4  # vestigial in reference too (overwritten at
    # multigraphormer_graph_encoder.py:86)

    # regularization (run_train.sh:37)
    dropout: float = 0.4
    attention_dropout: float = 0.3
    act_dropout: float = 0.3

    activation_fn: str = "gelu"
    # graph-only ablation (BASELINE.json configs): drop the image tower and
    # ViT fusion halves entirely — text embeddings + graphormer tree
    # attention only
    use_image_tower: bool = True
    encoder_normalize_before: bool = True
    pre_layernorm: bool = False
    apply_graphormer_init: bool = False
    freeze_initial_encoders: bool = True

    # classifier head
    num_classes: int = 2

    # tower configs
    text_tower: BertTowerConfig = field(default_factory=BertTowerConfig)
    image_tower: ViTTowerConfig = field(default_factory=ViTTowerConfig)
    text_encoder_name: str = "bert-base-uncased"
    image_encoder_name: str = "google/vit-base-patch16-224"

    # --- reference-quirk fidelity switches (SURVEY.md §7 "known quirks") ---
    # The reference constructs len(fusion)+1 graph stacks but, due to the
    # zip/[-1] interplay (multigraphormer_graph_encoder.py:413-446), the
    # second-to-last stack is built yet never executed under canonical args.
    # True  -> reproduce exactly (dead params + skipped stack)
    # False -> run every constructed stack (the "fixed" behavior)
    reproduce_dead_graph_stack: bool = True
    # The reference adds the base attn_bias twice
    # (graphormer_layers.py:93,108). Benign (-inf+-inf / 0+0) but part of the
    # numerics contract; kept for exactness and documented here.
    double_add_attn_bias: bool = True
    # NOTE on vestigial reference params: GraphFusionLayer(use_projection=
    # True) creates 768x768 projections the reference forward never applies
    # (multi_graphormer_fusion_layer.py:22-27); like the other dead head
    # params they are NOT created here — the checkpoint importer drops them
    # (they receive no gradient in the reference, so round-trips are exact).

    # compute policy (TPU-native replacement for the reference's --fp16)
    dtype: str = "bfloat16"  # activation/compute dtype
    param_dtype: str = "float32"
    # use the Pallas fused biased-attention kernel for graph attention.
    # Default ON (round-2 measurements, tools/tpu_perf_sweep.py +
    # tools/tpu_tree_attention_check.py): full-train-step parity with the
    # XLA path at Nmax=32 (42.3 = 42.3 disc/s) and Nmax=128 (7.9 vs 7.8),
    # standalone 3x faster at S>=257, and the streaming variant extends
    # S past VMEM. Off-TPU backends transparently fall back to XLA.
    use_pallas_attention: bool = True
    # sequence/context parallelism: when True AND the ambient mesh has an
    # 'sp' axis (make_mesh(..., sp_size>1)), the graph attention's node
    # axis S is sharded over that axis and computed with the differentiable
    # ring attention (ops/ring_attention.py) — k/v blocks rotate over ICI
    # via ppermute and the O(S^2) bias structure is itself sharded 1/sp per
    # device. This is the TPU-native answer to trees too big for one chip
    # (the reference's only answer is data-side pruning,
    # Pre-Processing/3-prune-trees.py:16-39, and spatial_pos_max clipping,
    # collator.py:122-126). Training and scoring both supported (the ring
    # body is scan+ppermute+einsum, reverse-differentiable; attention-prob
    # dropout regenerates per-tile masks from a seed inside the ring).
    sequence_parallel: bool = False
    # rematerialize fusion+graph blocks to trade FLOPs for HBM. Off by
    # default: the canonical config (batch 12/chip, 256-node capacity) fits
    # v5e HBM comfortably and remat costs ~21% measured throughput
    # (tools/tpu_perf_sweep.py r2: 42.3 vs 35.1 disc/s). Enable for
    # bigger-than-HBM configs (large node buckets, big per-chip batches).
    remat: bool = False
    # what remat saves: "full" = jax.checkpoint default (save only block
    # inputs, recompute everything); "dots" = save matmul outputs with no
    # batch dims; "dots_saveable" = save ALL matmul outputs and recompute
    # only the cheap elementwise ops (LN/gelu/bias/dropout-mask math) —
    # a middle ground between remat off (all activations resident) and
    # full remat (whole-block recompute) for the big-tree regime;
    # "names" = save exactly the checkpoint_name-tagged tensors (each
    # layer's attention and FFN outputs, models/{graphormer,bert,vit}.py)
    # — a finer rung between "full" and "dots_saveable": O(layers * S * D)
    # residuals instead of dots_saveable's O(layers * S * ffn_dim) saved
    # matmul outputs, for shapes where dots_saveable overflows HBM;
    # "names_heavy" = names + attention projections + FFN intermediates
    # (near dots_saveable's save set, but the names-tagged programs
    # fresh-compile at big shapes where dots_saveable is tunnel-blocked).
    remat_policy: str = "full"
    # Layer-scan: run the structurally identical interleave pairs
    # (graph_stack_i + fusion_stack_{i+1}, models/mdt.py) as ONE nn.scan
    # body over stacked params, and likewise the bottom-tower layer stacks
    # — numerically identical to the unrolled model (same ops, params
    # sliced per iteration) with an HLO ~n_pairs x smaller. This is the
    # compile-payload lever for the tunnel's fresh-big-shape 500s
    # (BIGTREE_SWEEP_r04) and for batch-36-as-one-program. Param layout
    # changes (stacked leading axis, utils/scan_params.py converts);
    # checkpoints written under one layout need converting to load under
    # the other (Trainer.load_params adapts automatically).
    scan_layers: bool = False

    @property
    def num_fusion_stacks(self) -> int:
        """Number of GraphFusionStack modules: ceil((F+1)/num_fusion_stack)
        (multigraphormer_graph_encoder.py:145-158)."""
        total = self.num_fusion_layers + 1
        return -(-total // self.num_fusion_stack)

    @property
    def num_graph_stacks(self) -> int:
        """len(fusion stacks) + 1 (multigraphormer_graph_encoder.py:173-191)."""
        return self.num_fusion_stacks + 1

    @property
    def num_bottom_text_layers(self) -> int:
        """BERT layers left in the bottom tower after splitting the top
        ``num_fusion_layers+1`` into fusion stacks
        (multigraphormer_graph_encoder.py:249-260)."""
        return self.text_tower.num_hidden_layers - (self.num_fusion_layers + 1)

    @property
    def num_bottom_image_layers(self) -> int:
        return self.image_tower.num_hidden_layers - (
            self.num_fusion_layers + 1
        )

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def roberta_tower_config(**overrides) -> BertTowerConfig:
    """``roberta-base`` geometry for the encoder-swap ablation
    (BASELINE.json configs; the reference reaches it via HF AutoModel
    names — multigraphormer_graph_encoder.py:236-245, commented CLIP code at
    hateful_discussions.py:58-59)."""
    cfg = BertTowerConfig(
        vocab_size=50265,
        max_position_embeddings=514,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        position_offset=2,  # RoBERTa padding_idx + 1
        # HF RoBERTa still adds its single-row token-type table (ids all 0)
        use_token_type=True,
    )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def clip_vit_tower_config(**overrides) -> ViTTowerConfig:
    """``openai/clip-vit-base-patch32`` vision-tower geometry."""
    cfg = ViTTowerConfig(
        image_size=224,
        patch_size=32,
        layer_norm_eps=1e-5,
        hidden_act="quick_gelu",
        embeddings_layernorm=True,
        patch_bias=False,
    )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def tiny_model_config(**overrides) -> ModelConfig:
    """A small config for tests: 2-layer towers, d=64, 2 fusion layers."""
    text = BertTowerConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
    )
    image = ViTTowerConfig(
        image_size=32,
        patch_size=16,
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
    )
    cfg = ModelConfig(
        num_in_degree=16,
        num_out_degree=16,
        num_spatial=64,
        num_bottleneck_tokens=2,
        num_fusion_layers=2,
        num_fusion_stack=1,
        num_graph_stack=1,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=64,
        encoder_attention_heads=4,
        dropout=0.0,
        attention_dropout=0.0,
        act_dropout=0.0,
        text_tower=text,
        image_tower=image,
        dtype="float32",
        remat=False,
    )
    return cfg.replace(**overrides) if overrides else cfg


@dataclass(frozen=True)
class TaskConfig:
    """Mirrors the reference TaskConfig (mDT/src/tasks/task.py:29-113)."""

    dataset_name: str = "hateful_discussions"
    num_classes: int = 2
    max_nodes: int = 10000
    dataset_source: str = "pyg"
    spatial_pos_max: int = 5  # run_train.sh:41 with sample_run.sh arg $3=5
    seed: int = 1
    train_epoch_shuffle: bool = True
    user_data_dir: str = ""


@dataclass(frozen=True)
class DataConfig:
    """Static-shape bucketing policy — the TPU-native replacement for the
    reference's per-batch max-node padding (collator.py:127)."""

    batch_size: int = 12  # graphs per batch (run_train.sh:44)
    # The reference's ``--batch-size 12`` is PER GPU (run_train.sh:44 runs
    # on 8 GPUs -> global batch 96). True (default, reference parity):
    # global batch = batch_size x dp, so batches are dp-divisible by
    # construction. False: batch_size is the global batch and must divide
    # evenly by dp (the Trainer enforces this).
    batch_size_is_per_replica: bool = True
    max_text_len: int = 100  # hateful_discussions.py:165
    # per-batch token-length buckets: trim the fixed 100-token padding down
    # to the batch's longest attended token (numerics-identical; the text
    # tower is the FLOP-dominant component)
    text_len_buckets: Tuple[int, ...] = (32, 64, 100)
    # group similar-length discussions into the same batch (fairseq-style
    # noisy length sort) so the text-length buckets actually bind; changes
    # batch composition (not per-example numerics), off by default
    length_grouped: bool = False
    # per-graph node-count buckets (graphs padded up to the nearest)
    node_buckets: Tuple[int, ...] = (8, 16, 32, 64, 128, 256)
    # total real-node capacity buckets for the flattened text tower
    node_capacity_buckets: Tuple[int, ...] = (32, 64, 128, 256, 512, 1024)
    # image-count capacity buckets for the ViT tower
    image_capacity_buckets: Tuple[int, ...] = (0, 8, 16, 32, 64)
    # labelled-node capacity buckets for the loss
    label_capacity_buckets: Tuple[int, ...] = (8, 16, 32, 64, 128)
    drop_last: bool = True
    # Grain collation worker PROCESSES (the reference's torch DataLoader
    # ``--num-workers 8``, run_train.sh:31 + src/__init__.py:8). 0 = the
    # in-process prefetch thread (data/loader.py) — enough for one chip;
    # >0 routes batch production through data/grain_loader.py (identical
    # order, items must be picklable).
    num_workers: int = 0


@dataclass(frozen=True)
class OptimConfig:
    """The canonical recipe (run_train.sh:38-40,65)."""

    lr: float = 3e-5
    end_learning_rate: float = 3e-7
    warmup_updates: int = 3246
    total_num_update: int = 10820
    adam_betas: Tuple[float, float] = (0.9, 0.999)
    adam_eps: float = 1e-8
    weight_decay: float = 0.01
    update_freq: int = 3  # gradient accumulation microsteps
    # Accumulate the update's microbatches inside ONE jitted step with
    # lax.scan instead of optax.MultiSteps. DEFAULT ON: faster (no
    # accumulator-state churn per microstep: MultiSteps measured ~7% of
    # throughput at update_freq=3, tools/tpu_perf_sweep.py) and EXACT
    # FairSeq semantics: grads of the SUMMED losses divided by the update's
    # TOTAL sample size (fairseq trainer), where MultiSteps averages
    # per-microbatch-normalized grads (equal only when every microbatch has
    # the same sample size). Mixed bucket shapes within an update are grown
    # to the group max with inert padding (loader.stack_microbatches);
    # False falls back to MultiSteps.
    scan_microbatches: bool = True
    clip_norm: float = 0.0
    power: float = 1.0  # polynomial decay power
    # Store Adam m/v in bfloat16: half the optimizer-state HBM footprint
    # and half the m/v read/write traffic per update (the optimizer phase
    # is pure HBM bandwidth). Moment math stays f32 — moments are upcast
    # in-register, updated, downcast once per update; only the storage
    # dtype changes. The reference's analogous lever is --fp16
    # (run_train.sh:45), though FairSeq's default fp16 path keeps f32 adam
    # stats — hence default OFF here (exact-recipe parity); flip ON for
    # the bandwidth win (bf16 nu adds ~0.4% relative error through the
    # sqrt, far above Adam's eps floor only for pathological grads).
    bf16_adam_state: bool = False


@dataclass(frozen=True)
class TrainConfig:
    criterion: str = "node_cross_entropy"
    task: str = "node_prediction"
    arch: str = "multi_graphormer_base"
    max_epoch: int = 37
    validate_interval_updates: int = 300
    save_dir: str = "checkpoints"
    # FairSeq --save-interval / --save-interval-updates: checkpoint every
    # Nth epoch end (always at the final epoch) / every N optimizer
    # updates (0 = off). Defaults match fairseq's (1 / 0).
    save_interval: int = 1
    save_interval_updates: int = 0
    # Capture a jax.profiler device trace (XProf/Perfetto) of a few steady
    # -state optimizer updates into this directory, then keep training —
    # the SURVEY §5 tracing story as a one-flag CLI surface
    # (--profile-trace). Starts AFTER profile_trace_start updates so the
    # first-step compile never pollutes the trace.
    profile_trace_dir: Optional[str] = None
    profile_trace_steps: int = 5
    profile_trace_start: int = 2
    restore_file: Optional[str] = None
    reset_optimizer: bool = False
    seed: int = 1
    log_interval: int = 50
    # criterion hyperparams (run_train.sh:59-60)
    positive_weight: float = 1.5
    negative_weight: float = 1.0
    # contrastive criterion (contrastive_loss.py:23-49)
    soft_negative_weight: float = 0.0
    adaptive_soft_negative_weight: bool = True
    multiplication_scale: float = 20.0
    # mesh geometry
    dp_size: int = -1  # -1: all devices
    tp_size: int = 1
    # sequence-parallel axis size (giant trees; pairs with
    # ModelConfig.sequence_parallel — see that field's doc)
    sp_size: int = 1
    # multi-slice pods (DCN): outermost 'dcn' mesh axis, pure data
    # parallelism across slices — batch shards over (dcn, dp), params
    # replicate per slice, fsdp/tp/sp collectives stay on intra-slice ICI
    # (parallel/mesh.py::make_mesh). dp_size=-1 then means per-slice dp.
    num_slices: int = 1
    # Generate dropout masks with the TPU hardware RNG (rbg) instead of
    # threefry: the model is dropout-heavy (0.4/0.3/0.3 on every layer) and
    # threefry bits are compute-bound on TPU — measured +16% train
    # throughput (tools/tpu_perf_sweep.py rbg_noremat: 49.1 vs 42.3
    # disc/s). TrainState.rng stays a threefry key (checkpoint-compatible);
    # only the per-step dropout chain is wrapped to rbg. Caveat: rbg bit
    # streams are TOPOLOGY-dependent (JAX documents rbg/unsafe_rbg output
    # as unstable across sharding/process layouts), so the same seed draws
    # different masks on e.g. 1-process-4-devices vs 2-processes-2x2 —
    # statistically equivalent training, but cross-topology runs are not
    # bit-comparable; parity tests must set dropout to 0 (threefry, the
    # False setting, is layout-invariant).
    fast_dropout_rng: bool = True
    # ZeRO-3-style parameter/optimizer-state sharding over the dp axis
    # (absent in the reference, FSDP only mentioned at
    # multigraphormer_graph_encoder.py:24; ~300M params fit one chip, so
    # this is for big-model/many-chip configs)
    fsdp: bool = False
    optim: OptimConfig = field(default_factory=OptimConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    task_cfg: TaskConfig = field(default_factory=TaskConfig)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
