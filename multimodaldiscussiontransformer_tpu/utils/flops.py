"""Analytic FLOPs for the canonical mDT training/inference step.

Used by ``bench.py`` to print MFU next to throughput so the measured
number can be sanity-checked against hardware peak (a throughput claim
whose implied MFU exceeds 100% means the timing harness is broken, not
that the model is fast).

Counting convention: 1 multiply-add = 2 FLOPs; only matmul/conv terms are
counted (elementwise, layernorm and softmax flops are bandwidth-bound noise
next to the MXU terms). The model geometry mirrors
reference mDT/src/modules/multigraphormer_graph_encoder.py:236-464
(12-layer BERT/ViT towers split into bottom + fusion segments, interleaved
graph stacks) as re-provided by models/{mdt,fusion,graphormer,bert,vit}.py.

Backward ≈ 2x forward over the *trainable* region only: with
``freeze_initial_encoders`` the whole bottom towers (incl. embeddings) are
frozen (train/optimizer.py::FROZEN_PREFIXES), and since nothing trainable
sits below them, autodiff does not traverse them. With ``remat`` the
rematerialized blocks (fusion + graph stacks) are re-run forward once more
during backward.
"""

from __future__ import annotations

from typing import Dict

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig


def transformer_layer_flops(seq: int, d: int, ffn: int) -> float:
    """Forward matmul FLOPs for one post/pre-LN transformer encoder layer.

    QKV+out projections (4 x [s,d]x[d,d]) + attention scores/values
    (QK^T and AV, 2 x [s,s]x[s,d]) + 2-matmul FFN ([s,d]x[d,f] twice).
    """
    proj = 8.0 * seq * d * d
    attn = 4.0 * seq * seq * d
    ffn_ = 4.0 * seq * d * ffn
    return proj + attn + ffn_


def train_step_flops(
    cfg: ModelConfig,
    *,
    batch: int,
    node_capacity: int,
    image_capacity: int,
    seq_len: int,
    max_nodes: int,
) -> Dict[str, float]:
    """FLOPs breakdown for one optimizer step at static capacities.

    Capacity buffers (not live node counts) set the cost: every one of the
    ``node_capacity`` text slots and ``image_capacity`` image slots runs
    through its tower regardless of padding (data/collator.py contract).
    """
    t = cfg.text_tower
    v = cfg.image_tower
    nb = cfg.num_bottleneck_tokens
    n_fusion = cfg.num_fusion_layers + 1  # tower layers inside fusion stacks

    # --- text tower: bottom layers at seq, fusion layers at seq + nb -----
    text_bottom = (
        node_capacity
        * cfg.num_bottom_text_layers
        * transformer_layer_flops(seq_len, t.hidden_size, t.intermediate_size)
    )
    text_fusion = (
        node_capacity
        * n_fusion
        * transformer_layer_flops(
            seq_len + nb, t.hidden_size, t.intermediate_size
        )
    )

    # --- image tower -----------------------------------------------------
    if cfg.use_image_tower:
        vseq = v.seq_len
        patch_embed = (
            2.0
            * image_capacity
            * v.num_patches
            * v.hidden_size
            * (v.num_channels * v.patch_size * v.patch_size)
        )
        vit_bottom = (
            image_capacity
            * cfg.num_bottom_image_layers
            * transformer_layer_flops(vseq, v.hidden_size, v.intermediate_size)
        )
        vit_fusion = (
            image_capacity
            * n_fusion
            * transformer_layer_flops(
                vseq + nb, v.hidden_size, v.intermediate_size
            )
        )
    else:
        patch_embed = vit_bottom = vit_fusion = 0.0

    # --- graph stacks ------------------------------------------------------
    # num_graph_stacks = num_fusion_stacks + 1; under the reference's dead-
    # stack quirk one constructed stack never executes
    # (multigraphormer_graph_encoder.py:413-446).
    live_stacks = cfg.num_graph_stacks - (
        1 if cfg.reproduce_dead_graph_stack else 0
    )
    s_graph = max_nodes + 1  # +1 graph token
    graph = (
        batch
        * live_stacks
        * cfg.num_graph_stack
        * transformer_layer_flops(
            s_graph, cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim
        )
    )

    # --- head: pooler + classifier on every node slot ---------------------
    head = 2.0 * node_capacity * t.hidden_size * t.hidden_size
    head += 2.0 * node_capacity * t.hidden_size * cfg.num_classes

    fwd = (
        text_bottom
        + text_fusion
        + patch_embed
        + vit_bottom
        + vit_fusion
        + graph
        + head
    )
    trainable_fwd = text_fusion + vit_fusion + graph + head
    if not cfg.freeze_initial_encoders:
        trainable_fwd = fwd
    bwd = 2.0 * trainable_fwd
    remat = (text_fusion + vit_fusion + graph) if cfg.remat else 0.0

    return {
        "fwd": fwd,
        "bwd": bwd,
        "remat": remat,
        "train_total": fwd + bwd + remat,
        "infer_total": fwd,
    }


# bf16 matmul peak per chip, FLOP/s, from published TPU specs.
TPU_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "TPU7x": 2307e12,
}


def peak_flops(device_kind: str) -> float:
    """bf16 peak for a jax ``device_kind`` string. Unknown kinds fall back
    to the v5e figure; the assumed peak is printed alongside MFU so the
    reader can rescale if the actual chip differs."""
    for name, peak in TPU_PEAK_FLOPS.items():
        if name.lower() in device_kind.lower():
            return peak
    return 197e12
