"""HF checkpoint import: PyTorch BERT/ViT state dicts -> mDT Flax params.

The reference builds its towers by loading
``AutoModelForSequenceClassification('bert-base-uncased')`` and
``AutoModel('google/vit-base-patch16-224')`` and splitting the top
``num_fusion_layers + 1`` encoder layers off into fusion stacks
(mDT/src/modules/multigraphormer_graph_encoder.py:233-278). This module does
the equivalent transform on a *state dict*: bottom layers feed
``text_model``/``vit_model``, top layers feed the fusion stacks in order,
pooler/classifier/dropout feed the output head.

Weight layout conversions:
- torch ``nn.Linear.weight`` is (out, in) -> flax ``kernel`` (in, out): transpose;
- torch ``nn.Conv2d.weight`` (out, in, kh, kw) -> flax (kh, kw, in, out);
- embeddings copy straight through.

Vestigial reference params (masked_lm_pooler, lm_head_transform_weight,
embed_out, lm_output_learned_bias, fusion projections — SURVEY.md §7) have no
destination and are ignored.

Works offline: pass state dicts from locally-constructed
``transformers`` models (random init) for parity tests, or from downloaded
checkpoints for real training.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _np(w) -> np.ndarray:
    return np.asarray(w)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _embed(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[f"{prefix}.weight"])}


def bert_layer_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """One HF ``BertLayer`` -> models.bert.BertLayer params."""
    return {
        "attention": {
            "query": _linear(sd, f"{prefix}.attention.self.query"),
            "key": _linear(sd, f"{prefix}.attention.self.key"),
            "value": _linear(sd, f"{prefix}.attention.self.value"),
        },
        "attention_output_dense": _linear(sd, f"{prefix}.attention.output.dense"),
        "attention_output_layernorm": _layernorm(
            sd, f"{prefix}.attention.output.LayerNorm"
        ),
        "intermediate_dense": _linear(sd, f"{prefix}.intermediate.dense"),
        "output_dense": _linear(sd, f"{prefix}.output.dense"),
        "output_layernorm": _layernorm(sd, f"{prefix}.output.LayerNorm"),
    }


def vit_layer_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """One HF ``ViTLayer`` -> models.vit.ViTLayer params."""
    return {
        "layernorm_before": _layernorm(sd, f"{prefix}.layernorm_before"),
        "attention": {
            "query": _linear(sd, f"{prefix}.attention.attention.query"),
            "key": _linear(sd, f"{prefix}.attention.attention.key"),
            "value": _linear(sd, f"{prefix}.attention.attention.value"),
        },
        "attention_output_dense": _linear(sd, f"{prefix}.attention.output.dense"),
        "layernorm_after": _layernorm(sd, f"{prefix}.layernorm_after"),
        "intermediate_dense": _linear(sd, f"{prefix}.intermediate.dense"),
        "output_dense": _linear(sd, f"{prefix}.output.dense"),
    }


def bert_embeddings_params(sd: Mapping[str, Any], prefix: str = "bert.embeddings") -> Dict[str, Any]:
    return {
        "word_embeddings": _embed(sd, f"{prefix}.word_embeddings"),
        "position_embeddings": _embed(sd, f"{prefix}.position_embeddings"),
        "token_type_embeddings": _embed(sd, f"{prefix}.token_type_embeddings"),
        "layernorm": _layernorm(sd, f"{prefix}.LayerNorm"),
    }


def vit_embeddings_params(sd: Mapping[str, Any], prefix: str = "vit.embeddings") -> Dict[str, Any]:
    conv_w = np.asarray(sd[f"{prefix}.patch_embeddings.projection.weight"])
    return {
        "patch_embeddings": {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),
            "bias": _np(sd[f"{prefix}.patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd[f"{prefix}.cls_token"]),
        "position_embeddings": _np(sd[f"{prefix}.position_embeddings"]),
    }


def roberta_embeddings_params(
    sd: Mapping[str, Any], prefix: str = "roberta.embeddings"
) -> Dict[str, Any]:
    """RoBERTa embeddings share the BERT structure (token-type table exists
    with a single row); position-id offsetting is config-side
    (core.config.roberta_tower_config)."""
    return bert_embeddings_params(sd, prefix)


def clip_vit_embeddings_params(
    sd: Mapping[str, Any], prefix: str = "vision_model.embeddings"
) -> Dict[str, Any]:
    """HF ``CLIPVisionEmbeddings`` -> models.vit.ViTEmbeddings params."""
    conv_w = np.asarray(sd[f"{prefix}.patch_embedding.weight"])
    d = conv_w.shape[0]
    return {
        "patch_embeddings": {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),
        },
        "cls_token": np.asarray(sd[f"{prefix}.class_embedding"]).reshape(1, 1, d),
        "position_embeddings": np.asarray(
            sd[f"{prefix}.position_embedding.weight"]
        )[None],
    }


def clip_vit_layer_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """HF ``CLIPEncoderLayer`` -> models.vit.ViTLayer params."""
    return {
        "layernorm_before": _layernorm(sd, f"{prefix}.layer_norm1"),
        "attention": {
            "query": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "key": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "value": _linear(sd, f"{prefix}.self_attn.v_proj"),
        },
        "attention_output_dense": _linear(sd, f"{prefix}.self_attn.out_proj"),
        "layernorm_after": _layernorm(sd, f"{prefix}.layer_norm2"),
        "intermediate_dense": _linear(sd, f"{prefix}.mlp.fc1"),
        "output_dense": _linear(sd, f"{prefix}.mlp.fc2"),
    }


def clip_vit_tower_params(
    sd: Mapping[str, Any],
    num_layers: int,
    prefix: str = "vision_model",
) -> Dict[str, Any]:
    """Bottom CLIP vision tower incl. pre_layrnorm; the truncated-final-LN
    quirk maps post_layernorm into the tower tail exactly like ViT."""
    emb = clip_vit_embeddings_params(sd, f"{prefix}.embeddings")
    emb["pre_layernorm"] = _layernorm(sd, f"{prefix}.pre_layrnorm")
    out = {"embeddings": emb}
    for i in range(num_layers):
        out[f"layer_{i}"] = clip_vit_layer_params(
            sd, f"{prefix}.encoder.layers.{i}"
        )
    out["layernorm"] = _layernorm(sd, f"{prefix}.post_layernorm")
    return out


def import_towers(
    params: Dict[str, Any],
    cfg: ModelConfig,
    bert_sd: Mapping[str, Any],
    vit_sd: Mapping[str, Any],
    bert_prefix: str = "bert",
    vit_prefix: str = "vit",
) -> Dict[str, Any]:
    """Overwrite tower/fusion/head weights in a (host, nested-dict) param
    tree with HF weights, applying the reference's layer split
    (multigraphormer_graph_encoder.py:249-260).

    Layout-agnostic: a ``scan_layers`` (stacked) tree is unrolled for the
    name mapping and restacked on return (utils/scan_params.py)."""
    import flax

    from multimodaldiscussiontransformer_tpu.utils.scan_params import (
        params_layout,
        to_scanned,
        to_unrolled,
    )

    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    was_scanned = params_layout(params) == "scanned"
    if was_scanned:
        params = to_unrolled(params, cfg)
    p = params["params"]
    ge = p["graph_encoder"]

    n_split = cfg.num_fusion_layers + 1
    n_text_total = cfg.text_tower.num_hidden_layers
    n_image_total = cfg.image_tower.num_hidden_layers

    # bottom towers
    ge["text_model"]["embeddings"] = bert_embeddings_params(
        bert_sd, f"{bert_prefix}.embeddings"
    )
    for i in range(n_text_total - n_split):
        ge["text_model"][f"layer_{i}"] = bert_layer_params(
            bert_sd, f"{bert_prefix}.encoder.layer.{i}"
        )
    if cfg.use_image_tower and vit_sd is not None:
        ge["vit_model"]["embeddings"] = vit_embeddings_params(
            vit_sd, f"{vit_prefix}.embeddings"
        )
        for i in range(n_image_total - n_split):
            ge["vit_model"][f"layer_{i}"] = vit_layer_params(
                vit_sd, f"{vit_prefix}.encoder.layer.{i}"
            )
        ge["vit_model"]["layernorm"] = _layernorm(vit_sd, f"{vit_prefix}.layernorm")

    # top layers -> fusion stacks, in order (ref 145-168)
    sizes = []
    total = n_split
    while total > 0:
        sizes.append(min(cfg.num_fusion_stack, total))
        total -= sizes[-1]
    k = 0
    for si, sz in enumerate(sizes):
        stack = ge[f"fusion_stack_{si}"]
        for j in range(sz):
            hf_text = n_text_total - n_split + k
            hf_image = n_image_total - n_split + k
            stack[f"fusion_{j}"]["bert_encoder"] = bert_layer_params(
                bert_sd, f"{bert_prefix}.encoder.layer.{hf_text}"
            )
            if cfg.use_image_tower and vit_sd is not None:
                stack[f"fusion_{j}"]["vit_encoder"] = vit_layer_params(
                    vit_sd, f"{vit_prefix}.encoder.layer.{hf_image}"
                )
            k += 1

    # output head: BERT pooler + seq-classification classifier
    # (multigraphormer_graph_encoder.py:241-246,264-265)
    p["text_pooler"] = {"dense": _linear(bert_sd, f"{bert_prefix}.pooler.dense")}
    if "classifier.weight" in bert_sd:
        p["node_classifier"] = _linear(bert_sd, "classifier")
    if (
        cfg.use_image_tower
        and vit_sd is not None
        and f"{vit_prefix}.pooler.dense.weight" in vit_sd
    ):
        p["vit_pooler"] = {"dense": _linear(vit_sd, f"{vit_prefix}.pooler.dense")}
    if was_scanned:
        params = to_scanned(params, cfg)
    return params


def state_dicts_from_pretrained(
    text_name: str = "bert-base-uncased",
    image_name: str = "google/vit-base-patch16-224",
    attention_dropout: float = 0.3,
    hidden_dropout: float = 0.3,
):
    """Load HF torch models (network/cache required) and return numpy state
    dicts — mirrors ``build_vit_bert_encoders`` dropout overrides
    (multigraphormer_graph_encoder.py:233-245)."""
    import torch
    from transformers import AutoModel, AutoModelForSequenceClassification

    bert = AutoModelForSequenceClassification.from_pretrained(
        text_name,
        hidden_dropout_prob=hidden_dropout,
        attention_probs_dropout_prob=attention_dropout,
    )
    vit = AutoModel.from_pretrained(
        image_name,
        hidden_dropout_prob=hidden_dropout,
        attention_probs_dropout_prob=attention_dropout,
    )
    with torch.no_grad():
        bert_sd = {k: v.numpy() for k, v in bert.state_dict().items()}
        vit_sd = {"vit." + k: v.numpy() for k, v in vit.state_dict().items()}
    return bert_sd, vit_sd
