"""The full Multi-Modal Discussion Transformer (Flax linen).

TPU-native rebuild of the reference core encoder + output head
(mDT/src/modules/multigraphormer_graph_encoder.py:42-464 and
mDT/src/models/multi_modal_discussion_transformer.py:181-287):

- text tower runs over a fixed-capacity flat node buffer ``(C, T, D)``
  instead of boolean-mask flattening (``x[x_token_mask]``, ref line 321-324);
- the bottleneck <-> graph-grid exchange (ref 363-371, 423-437) is a pair of
  static scatter/gather ops through ``node_graph * Nmax + node_pos`` flat
  indices with drop/fill out-of-range handling;
- the interleave schedule reproduces the reference's ``zip(layers,
  fusion[1:])`` + ``layers[-1]`` control flow exactly, including the
  constructed-but-never-run second-to-last graph stack under canonical args
  (ref 413-446) when ``config.reproduce_dead_graph_stack`` (the dead stack's
  params are simply never created — they receive no gradient in the
  reference either, so checkpoints round-trip);
- optional ``jax.checkpoint`` rematerialization of fusion and graph stacks
  replaces torch gradient checkpointing (multi_graphormer_fusion_layer.py:79-96).

Output head (multi_modal_discussion_transformer.py:256-276): the shared
[text_pooler -> dropout -> node_classifier] stack runs on both the text CLS
path and the bottleneck token-0 path; final logits are their mean.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodaldiscussiontransformer_tpu.models.fast_dropout import FastDropout

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig
from multimodaldiscussiontransformer_tpu.core.registry import (
    register_model,
    register_model_architecture,
)
from multimodaldiscussiontransformer_tpu.models.bert import (
    BertBottomTower,
    BertPooler,
    attention_mask_bias,
)
from multimodaldiscussiontransformer_tpu.models.fusion import GraphFusionStack
from multimodaldiscussiontransformer_tpu.models.graphormer import (
    GraphAttnBias,
    GraphEncoderStack,
    GraphNodeFeature,
)
from multimodaldiscussiontransformer_tpu.models.vit import ViTBottomTower, ViTPooler

Dtype = Any


class EncoderOutput(NamedTuple):
    text_states: jnp.ndarray  # (C, T, D) final text-tower states
    bottleneck: jnp.ndarray  # (C, nbn, D) final bottleneck tokens
    global_embedding: jnp.ndarray  # (B, D) graph-token state


class MDTOutput(NamedTuple):
    logits: jnp.ndarray  # (C, num_classes) per-node logits (padded slots garbage)
    global_embedding: jnp.ndarray  # (B, D)
    text_states: jnp.ndarray  # (C, T, D)
    bottleneck: jnp.ndarray  # (C, nbn, D)


def _stack_sizes(total: int, chunk: int) -> list:
    """Sizes of the per-stack layer groups: ``total`` layers chunked into
    groups of ``chunk`` (last may be smaller) — reproduces the list-slicing at
    multigraphormer_graph_encoder.py:145-158."""
    return [min(chunk, total - i) for i in range(0, total, chunk)]


def _scan_pair_count(sizes: list) -> int:
    """How many leading interleave pairs are structurally identical and can
    run as one ``nn.scan`` body (pair ``i`` couples ``graph_stack_i`` with
    ``fusion_stack_{i+1}``). All fusion stacks except possibly the last have
    ``num_fusion_stack`` layers, so this is ``n_pairs`` (uniform) or
    ``n_pairs - 1`` (ragged final stack, e.g. canonical sizes [2,2,2,2,1])."""
    n_pairs = len(sizes) - 1
    if n_pairs <= 0:
        return 0
    return n_pairs if sizes[-1] == sizes[1] else n_pairs - 1


def _remat_policy(name: str):
    """remat_policy string -> jax.checkpoint policy (None = "full")."""
    return {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_saveable": jax.checkpoint_policies.dots_saveable,
        # save exactly the per-layer attention/FFN outputs tagged with
        # jax.ad_checkpoint.checkpoint_name in the layer modules — the
        # O(S*D) residual rung between "full" and "dots_saveable"
        "names": jax.checkpoint_policies.save_only_these_names(
            "attn_out", "ffn_out"
        ),
        # heavier save-set: + attention projection and FFN intermediate —
        # approaches dots_saveable's resident set through the names
        # mechanism (which fresh-compiles at big shapes where
        # dots_saveable 500s on the tunnel, BIGTREE_SWEEP_r05)
        "names_heavy": jax.checkpoint_policies.save_only_these_names(
            "attn_out", "ffn_out", "attn_proj", "ffn_mid"
        ),
    }.get(name)


class InterleavePairBlock(nn.Module):
    """One interleave iteration — graph stack, bottleneck pull, fusion
    stack, bottleneck push (ref multigraphormer_graph_encoder.py:413-439) —
    as a scannable unit. Under ``ModelConfig.scan_layers`` the uniform pairs
    run as one ``nn.scan`` over params stacked on a leading axis: the HLO
    contains ONE pair body instead of ``n_pairs`` copies (the
    compile-payload shrink; utils/scan_params.py converts layouts)."""

    config: ModelConfig
    num_fusion: int
    deterministic: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, attn_bias, key_padding_mask, mask_bias,
                 image_node, flat_idx):
        c = self.config
        x, bert, vit, bn = carry
        bsz, s, d = x.shape
        nmax = s - 1
        x = GraphEncoderStack(
            c, c.num_graph_stack, self.dtype, self.param_dtype,
            name="graph_stack",
        )(x, attn_bias, key_padding_mask, self.deterministic)
        node_states = (
            x[:, 1:, :]
            .reshape(bsz * nmax, d)
            .at[flat_idx]
            .get(mode="fill", fill_value=0)
        )
        bn = bn.at[:, 0, :].set(node_states)
        bert, vit, bn = GraphFusionStack(
            c, self.num_fusion, self.dtype, self.param_dtype,
            name="fusion_stack",
        )(bert, vit, bn, mask_bias, image_node, self.deterministic)
        tail = (
            x[:, 1:, :]
            .reshape(bsz * nmax, d)
            .at[flat_idx]
            .set(bn[:, 0, :], mode="drop")
            .reshape(bsz, nmax, d)
        )
        x = jnp.concatenate([x[:, :1, :], tail], axis=1)
        return (x, bert, vit, bn)


class MultiGraphormerGraphEncoder(nn.Module):
    """The core interleaved text/image/graph encoder."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        self.text_model = BertBottomTower(
            c.text_tower, c.num_bottom_text_layers, self.dtype, self.param_dtype,
            scan_layers=c.scan_layers,
        )
        if c.use_image_tower:
            self.vit_model = ViTBottomTower(
                c.image_tower, c.num_bottom_image_layers, self.dtype, self.param_dtype,
                scan_layers=c.scan_layers,
            )
        sizes = _stack_sizes(c.num_fusion_layers + 1, c.num_fusion_stack)
        n_scan = _scan_pair_count(sizes) if c.scan_layers else 0
        # scanned pair indices (graph_stack_i for i < n_scan and
        # fusion_stack_{i+1} for i+1 <= n_scan) are created inside the
        # compact __call__'s nn.scan under the single name "scan_pairs";
        # everything else keeps its unrolled name so checkpoints and the
        # layout transforms only touch the scanned range
        self.fusion_layers = [
            None
            if (0 < i <= n_scan)
            else GraphFusionStack(c, n, self.dtype, self.param_dtype, name=f"fusion_stack_{i}")
            for i, n in enumerate(sizes)
        ]
        self.layers = [
            None
            if i < n_scan
            else GraphEncoderStack(
                c, c.num_graph_stack, self.dtype, self.param_dtype, name=f"graph_stack_{i}"
            )
            for i in range(len(sizes) + 1)
        ]
        self.graph_node_feature = GraphNodeFeature(c, self.dtype, self.param_dtype)
        self.graph_attn_bias = GraphAttnBias(c, self.dtype, self.param_dtype)
        self.bottle_neck = self.param(
            "bottle_neck",
            nn.initializers.normal(1.0),  # torch nn.Embedding default N(0,1)
            (c.num_bottleneck_tokens, c.encoder_embed_dim),
            self.param_dtype,
        )
        if c.encoder_normalize_before:
            self.emb_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        self.emb_dropout = FastDropout(c.dropout)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> EncoderOutput:
        c = self.config
        d = c.encoder_embed_dim
        nbn = c.num_bottleneck_tokens

        input_ids = batch["input_ids"]
        cap, seq = input_ids.shape
        bsz, nmax = batch["in_degree"].shape

        use_remat = c.remat and not deterministic
        if use_remat:
            # remat_policy "dots"/"dots_saveable"/"names" keeps selected
            # tensors resident and recomputes the rest in the backward
            # (see core/config.py); "full" recomputes the whole block
            policy = _remat_policy(c.remat_policy)
            maybe_remat = lambda f: jax.checkpoint(f, policy=policy)  # noqa: E731
        else:
            policy = None
            maybe_remat = lambda f: f  # noqa: E731

        # ---- bottom towers (ref forward lines 321-337) ----
        bert_out = self.text_model(
            input_ids, batch["token_type_ids"], batch["attention_mask"], deterministic
        )
        # always run the image tower (when configured): a zero-capacity image
        # buffer is a zero-sized XLA computation, keeps params materialized,
        # and removes the reference's data-dependent branch (ref 332-337)
        if c.use_image_tower:
            vit_out = self.vit_model(batch["images"], deterministic)
            image_node = batch["image_node"]
        else:
            vit_out = None
            image_node = None

        # ---- bottleneck init + extended fusion mask (ref 339-354) ----
        bn = jnp.broadcast_to(
            self.bottle_neck.astype(self.dtype)[None], (cap, nbn, d)
        )
        fusion_mask = jnp.concatenate(
            [jnp.ones((cap, nbn), dtype=batch["attention_mask"].dtype),
             batch["attention_mask"]],
            axis=1,
        )
        mask_bias = attention_mask_bias(fusion_mask, self.dtype)

        # ---- fusion stack 0 (ref 356-362) ----
        def run_fusion(stack, bert_h, vit_h, bn_h):
            f = maybe_remat(
                lambda b_, v_, n_: stack(b_, v_, n_, mask_bias, image_node, deterministic)
            )
            return f(bert_h, vit_h, bn_h)

        bert_out, vit_out, bn = run_fusion(self.fusion_layers[0], bert_out, vit_out, bn)

        # ---- scatter bottleneck token 0 into the (B, Nmax) grid (ref 363-371) ----
        flat_idx = batch["node_graph"] * nmax + batch["node_pos"]  # (C,); pad -> >= B*Nmax
        grid = (
            jnp.zeros((bsz * nmax, d), dtype=self.dtype)
            .at[flat_idx]
            .set(bn[:, 0, :], mode="drop")
            .reshape(bsz, nmax, d)
        )

        # padding mask over grid slots; explicit (grid_mask) instead of the
        # reference's value-sniffing ``x[:, :, 0].eq(0)`` (ref 377)
        pad_grid = ~batch["grid_mask"]  # (B, Nmax) True = pad
        key_padding_mask = jnp.concatenate(
            [jnp.zeros((bsz, 1), dtype=bool), pad_grid], axis=1
        )

        x = self.graph_node_feature(grid, batch["in_degree"], batch["out_degree"])
        if c.use_pallas_attention or c.sequence_parallel:
            # compact (template, ids, lut): the (B,H,S,S) bias never
            # materializes — it is assembled inside the tree-attention
            # kernel (or tile-by-tile inside the ring for sequence-parallel)
            attn_bias = self.graph_attn_bias.compact_inputs(
                batch["attn_bias"], batch["spatial_pos"]
            )
        else:
            attn_bias = self.graph_attn_bias(
                batch["attn_bias"], batch["spatial_pos"]
            )

        if c.encoder_normalize_before:
            x = self.emb_layer_norm(x)
        x = self.emb_dropout(x, deterministic=deterministic)

        def run_graph(stack, x_h):
            f = maybe_remat(
                lambda xx: stack(xx, attn_bias, key_padding_mask, deterministic)
            )
            return f(x_h)

        # ---- interleave (ref 413-439): zip(layers, fusion[1:]) ----
        n_pairs = len(self.fusion_layers) - 1
        sizes = _stack_sizes(c.num_fusion_layers + 1, c.num_fusion_stack)
        n_scan = _scan_pair_count(sizes) if c.scan_layers else 0
        if n_scan > 0:
            # layer-scan: the uniform pairs as ONE scan body over stacked
            # params — numerically identical to the unrolled loop (params
            # sliced per iteration), HLO ~n_scan x smaller (the
            # compile-payload lever; see ModelConfig.scan_layers)
            body_cls = (
                nn.remat(InterleavePairBlock, policy=policy)
                if use_remat
                else InterleavePairBlock
            )

            def pair_body(blk, carry, _):
                return (
                    blk(
                        carry, attn_bias, key_padding_mask, mask_bias,
                        image_node, flat_idx,
                    ),
                    None,
                )

            scan = nn.scan(
                pair_body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=n_scan,
            )
            blk = body_cls(
                c, sizes[1], deterministic, self.dtype, self.param_dtype,
                name="scan_pairs",
            )
            (x, bert_out, vit_out, bn), _ = scan(
                blk, (x, bert_out, vit_out, bn), None
            )
        for i in range(n_scan, n_pairs):
            x = run_graph(self.layers[i], x)
            # bottleneck token 0 <- graph node states at real slots (ref 423-425)
            node_states = (
                x[:, 1:, :]
                .reshape(bsz * nmax, d)
                .at[flat_idx]
                .get(mode="fill", fill_value=0)
            )
            bn = bn.at[:, 0, :].set(node_states)
            bert_out, vit_out, bn = run_fusion(
                self.fusion_layers[i + 1], bert_out, vit_out, bn
            )
            # graph grid <- updated bottleneck token 0 (ref 435-437)
            tail = (
                x[:, 1:, :]
                .reshape(bsz * nmax, d)
                .at[flat_idx]
                .set(bn[:, 0, :], mode="drop")
                .reshape(bsz, nmax, d)
            )
            x = jnp.concatenate([x[:, :1, :], tail], axis=1)

        if not c.reproduce_dead_graph_stack and len(self.layers) >= 2:
            # "fixed" variant: also run the stack the reference skips
            x = run_graph(self.layers[-2], x)
        # final stack — the reference's ``self.layers[-1]`` (ref 441-446)
        x = run_graph(self.layers[-1], x)

        return EncoderOutput(
            text_states=bert_out,
            bottleneck=bn,
            global_embedding=x[:, 0, :],
        )


@register_model("multi_graphormer")
class MDTModel(nn.Module):
    """Encoder + output head — the reference ``GraphormerModel`` /
    ``GraphormerEncoder`` pair (multi_modal_discussion_transformer.py:145-287).

    The head applies the shared [text_pooler -> dropout -> node_classifier]
    stack to the text CLS path and to the bottleneck token-0 path and averages
    the two logits (ref 263-276). The reference's vestigial head params
    (masked_lm_pooler, lm_head_transform_weight, layer_norm, embed_out,
    lm_output_learned_bias — ref 224-249, never used in forward) are not
    created; the checkpoint importer drops them."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        self.graph_encoder = MultiGraphormerGraphEncoder(c, self.dtype, self.param_dtype)
        # node_encoder_stack (ref 215-221): pooler + dropout + classifier,
        # harvested from the BERT sequence-classification head in the
        # reference (multigraphormer_graph_encoder.py:241-246,264-265)
        self.text_pooler = BertPooler(c.text_tower.hidden_size, self.dtype, self.param_dtype)
        self.text_dropout = FastDropout(c.text_tower.hidden_dropout_prob)
        self.node_classifier = nn.Dense(c.num_classes, dtype=self.dtype, param_dtype=self.param_dtype)
        # vit_pooler: unfrozen but uncalled in the reference forward
        # (multigraphormer_graph_encoder.py:228); exposed for the image-head
        # ablation surface
        if c.use_image_tower:
            self.vit_pooler = ViTPooler(c.image_tower.hidden_size, self.dtype, self.param_dtype)

    def __call__(
        self, batch: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> MDTOutput:
        enc = self.graph_encoder(batch, deterministic)

        def head(states: jnp.ndarray) -> jnp.ndarray:
            pooled = self.text_pooler(states)
            pooled = self.text_dropout(pooled, deterministic=deterministic)
            return self.node_classifier(pooled)

        text_logits = head(enc.text_states)
        graph_logits = head(enc.bottleneck)
        logits = (text_logits + graph_logits) / 2

        return MDTOutput(
            logits=logits,
            global_embedding=enc.global_embedding,
            text_states=enc.text_states,
            bottleneck=enc.bottleneck,
        )


def apply_graphormer_init_params(params, rng: jax.Array):
    """The reference's ``--apply-graphormer-init`` transform
    (``init_graphormer_params``, multigraphormer_graph_encoder.py:18-39,
    applied model-wide by ``GraphormerModel.__init__`` when the flag is set,
    multi_modal_discussion_transformer.py:28; arch default False, line 312):
    every Linear weight and every Embedding table re-initialized
    normal(0, 0.02), Linear biases zeroed. Conv (ViT patch embedding) and
    LayerNorms are untouched, matching the reference's isinstance checks.
    Note the reference applies this over the WHOLE model, towers included —
    enabling it after an HF import clobbers the pretrained towers there
    too, which is why it defaults off in both systems."""
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    )
    keys = sorted(flat)  # deterministic rng assignment
    rngs = dict(zip(keys, jax.random.split(rng, len(keys))))
    out = {}
    for path, leaf in flat.items():
        name = path[-1]
        if name == "kernel" and getattr(leaf, "ndim", 0) == 2:
            out[path] = 0.02 * jax.random.normal(
                rngs[path], leaf.shape, leaf.dtype
            )
        elif name == "bias" and (path[:-1] + ("kernel",)) in flat \
                and flat[path[:-1] + ("kernel",)].ndim == 2:
            out[path] = jnp.zeros_like(leaf)
        elif name == "embedding":
            out[path] = 0.02 * jax.random.normal(
                rngs[path], leaf.shape, leaf.dtype
            )
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


@register_model_architecture("multi_graphormer")
def multi_graphormer(cfg: Optional[ModelConfig] = None, **overrides) -> ModelConfig:
    """Arch defaults mirroring ``base_architecture``
    (multi_modal_discussion_transformer.py:290-317)."""
    base = cfg if cfg is not None else ModelConfig(
        dropout=0.1,
        attention_dropout=0.1,
        act_dropout=0.0,
        encoder_ffn_embed_dim=4096,
        encoder_attention_heads=8,
        encoder_embed_dim=1024,
        num_bottleneck_tokens=4,
        num_fusion_layers=4,
        num_graph_stack=1,
        num_fusion_stack=1,
    )
    return base.replace(**overrides) if overrides else base


@register_model_architecture("multi_graphormer_base")
def multi_graphormer_base(cfg: Optional[ModelConfig] = None, **overrides) -> ModelConfig:
    """Arch defaults mirroring ``graphormer_base_architecture``
    (multi_modal_discussion_transformer.py:320-344) combined with the
    canonical launch overrides (run_train.sh:47-54, sample_run.sh:3)."""
    base = cfg if cfg is not None else ModelConfig()
    return base.replace(**overrides) if overrides else base


@register_model_architecture("multi_graphormer_graph_only")
def multi_graphormer_graph_only(**overrides) -> ModelConfig:
    """Graph-only ablation: text embeddings + graphormer tree attention, no
    image tower (BASELINE.json configs)."""
    base = ModelConfig(use_image_tower=False)
    return base.replace(**overrides) if overrides else base


@register_model_architecture("multi_graphormer_roberta_clip")
def multi_graphormer_roberta_clip(**overrides) -> ModelConfig:
    """Encoder-swap ablation: RoBERTa text tower + CLIP-ViT image tower
    (BASELINE.json configs; reference reaches this via HF AutoModel names +
    the commented CLIP path at hateful_discussions.py:58-59)."""
    from multimodaldiscussiontransformer_tpu.core.config import (
        clip_vit_tower_config,
        roberta_tower_config,
    )

    base = ModelConfig(
        text_tower=roberta_tower_config(),
        image_tower=clip_vit_tower_config(),
        text_encoder_name="roberta-base",
        image_encoder_name="openai/clip-vit-base-patch32",
    )
    return base.replace(**overrides) if overrides else base
