"""Reference (FairSeq/PyTorch) mDT checkpoint import.

Maps a state dict saved by the reference ``GraphormerModel``
(mDT/src/models/multi_modal_discussion_transformer.py — module tree
``encoder.graph_encoder.{text_model, vit_model, fusion_layers.i.
fusion_layers.j.{bert_encoder, vit_encoder}, layers.i.layers.j, ...}``)
onto this framework's param tree, so models trained with the PyTorch
reference can be served/fine-tuned here.

Also implements the reference's state-dict upgrade hooks:
- legacy fused qkv split (``in_proj_weight`` -> q/k/v projections,
  multihead_attention.py:219-248);
- LM-head strip (embed_out / lm_output_learned_bias,
  multi_modal_discussion_transformer.py:282-287) — those and the other
  vestigial params (masked_lm_pooler, lm_head_transform_weight, fusion
  projections, atom/edge encoders, the dead graph stack) have no
  destination and are dropped.

Accepts raw FairSeq checkpoint dicts (uses ``ckpt["model"]``) or plain
state dicts; tensors may be torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig
from multimodaldiscussiontransformer_tpu.utils import hf_import as hfi


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def upgrade_legacy_qkv(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Split legacy fused ``in_proj_weight``/``in_proj_bias`` into
    q/k/v projections (multihead_attention.py:219-248)."""
    out = dict(sd)
    for key in list(out):
        if key.endswith("in_proj_weight"):
            prefix = key[: -len("in_proj_weight")]
            w = _np(out.pop(key))
            dim = w.shape[0] // 3
            out[prefix + "q_proj.weight"] = w[:dim]
            out[prefix + "k_proj.weight"] = w[dim : 2 * dim]
            out[prefix + "v_proj.weight"] = w[2 * dim :]
            bkey = prefix + "in_proj_bias"
            if bkey in out:
                b = _np(out.pop(bkey))
                out[prefix + "q_proj.bias"] = b[:dim]
                out[prefix + "k_proj.bias"] = b[dim : 2 * dim]
                out[prefix + "v_proj.bias"] = b[2 * dim :]
    return out


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _graph_layer(sd, prefix) -> Dict[str, Any]:
    """One reference GraphormerGraphEncoderLayer -> our params."""
    return {
        "self_attn": {
            "q_proj": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
    }


def import_reference_checkpoint(
    params: Dict[str, Any],
    cfg: ModelConfig,
    checkpoint: Mapping[str, Any],
    prefix: str = "encoder.",
) -> Dict[str, Any]:
    """Overwrite ``params`` (host nested dict, as returned by model.init +
    device_get) with the reference checkpoint's weights.

    Layout-agnostic: a ``scan_layers`` (stacked) tree is unrolled for the
    name mapping and restacked on return (utils/scan_params.py)."""
    import jax

    from multimodaldiscussiontransformer_tpu.utils.scan_params import (
        params_layout,
        to_scanned,
        to_unrolled,
    )

    sd = checkpoint.get("model", checkpoint) if isinstance(checkpoint, dict) else checkpoint
    sd = upgrade_legacy_qkv(dict(sd))
    # convert once; everything below reads numpy
    sd = {k: _np(v) for k, v in sd.items()}
    ge_ref = f"{prefix}graph_encoder"

    was_scanned = params_layout(params) == "scanned"
    if was_scanned:
        params = to_unrolled(params, cfg)
        _restack = lambda t: to_scanned(t, cfg)  # noqa: E731
    else:
        _restack = lambda t: t  # noqa: E731

    # rebuild container spine so the input tree is untouched
    params = jax.tree_util.tree_map_with_path(lambda _, x: x, params)
    p = params["params"]
    ge = p["graph_encoder"]

    # HF towers (truncated inside the reference model, so layer indices are
    # already bottom-relative)
    ge["text_model"]["embeddings"] = hfi.bert_embeddings_params(
        sd, f"{ge_ref}.text_model.embeddings"
    )
    for i in range(cfg.num_bottom_text_layers):
        ge["text_model"][f"layer_{i}"] = hfi.bert_layer_params(
            sd, f"{ge_ref}.text_model.encoder.layer.{i}"
        )
    if cfg.use_image_tower:
        ge["vit_model"]["embeddings"] = hfi.vit_embeddings_params(
            sd, f"{ge_ref}.vit_model.embeddings"
        )
        for i in range(cfg.num_bottom_image_layers):
            ge["vit_model"][f"layer_{i}"] = hfi.vit_layer_params(
                sd, f"{ge_ref}.vit_model.encoder.layer.{i}"
            )
        ge["vit_model"]["layernorm"] = _layernorm(sd, f"{ge_ref}.vit_model.layernorm")

    # fusion stacks (same grouping as the model build, models/mdt.py)
    from multimodaldiscussiontransformer_tpu.models.mdt import _stack_sizes

    sizes = _stack_sizes(cfg.num_fusion_layers + 1, cfg.num_fusion_stack)
    for i, sz in enumerate(sizes):
        for j in range(sz):
            fp = f"{ge_ref}.fusion_layers.{i}.fusion_layers.{j}"
            dst = ge[f"fusion_stack_{i}"][f"fusion_{j}"]
            dst["bert_encoder"] = hfi.bert_layer_params(sd, f"{fp}.bert_encoder")
            if cfg.use_image_tower:
                dst["vit_encoder"] = hfi.vit_layer_params(sd, f"{fp}.vit_encoder")

    # graph stacks (the dead second-to-last stack has no destination here —
    # it receives no gradient in the reference, SURVEY.md §7)
    for i in range(cfg.num_graph_stacks):
        key = f"graph_stack_{i}"
        if key not in ge:
            continue
        for j in range(cfg.num_graph_stack):
            ge[key][f"layer_{j}"] = _graph_layer(
                sd, f"{ge_ref}.layers.{i}.layers.{j}"
            )

    # featurizers + bias tables + bottleneck + emb LN
    gnf = ge["graph_node_feature"]
    gnf["in_degree_encoder"] = _np(sd[f"{ge_ref}.graph_node_feature.in_degree_encoder.weight"])
    gnf["out_degree_encoder"] = _np(sd[f"{ge_ref}.graph_node_feature.out_degree_encoder.weight"])
    gnf["graph_token"] = _np(sd[f"{ge_ref}.graph_node_feature.graph_token.weight"])
    gab = ge["graph_attn_bias"]
    gab["spatial_pos_encoder"] = _np(sd[f"{ge_ref}.graph_attn_bias.spatial_pos_encoder.weight"])
    gab["graph_token_virtual_distance"] = _np(
        sd[f"{ge_ref}.graph_attn_bias.graph_token_virtual_distance.weight"]
    )
    ge["bottle_neck"] = _np(sd[f"{ge_ref}.bottle_neck.weight"])
    if f"{ge_ref}.emb_layer_norm.weight" in sd:
        ge["emb_layer_norm"] = _layernorm(sd, f"{ge_ref}.emb_layer_norm")

    # output head (shared text pooler + classifier)
    p["text_pooler"] = {"dense": _linear(sd, f"{ge_ref}.text_pooler.dense")}
    p["node_classifier"] = _linear(sd, f"{ge_ref}.node_classifier")
    if cfg.use_image_tower and f"{ge_ref}.vit_pooler.dense.weight" in sd:
        p["vit_pooler"] = {"dense": _linear(sd, f"{ge_ref}.vit_pooler.dense")}
    return _restack(params)


def export_reference_state_dict(
    params: Dict[str, Any], cfg: ModelConfig, prefix: str = "encoder."
) -> Dict[str, np.ndarray]:
    """Inverse mapping: our param tree -> reference-named state dict
    (numpy). Enables round-trip tests and porting trained weights back to
    the PyTorch reference. Layout-agnostic: scanned trees are unrolled
    first (utils/scan_params.py)."""
    from multimodaldiscussiontransformer_tpu.utils.scan_params import (
        to_unrolled,
    )

    params = to_unrolled(params, cfg)
    sd: Dict[str, np.ndarray] = {}
    p = params["params"]
    ge = p["graph_encoder"]
    ge_ref = f"{prefix}graph_encoder"

    def put_linear(dst, tree):
        sd[f"{dst}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
        if "bias" in tree:
            sd[f"{dst}.bias"] = np.asarray(tree["bias"])

    def put_ln(dst, tree):
        sd[f"{dst}.weight"] = np.asarray(tree["scale"])
        sd[f"{dst}.bias"] = np.asarray(tree["bias"])

    def put_bert_layer(dst, tree):
        put_linear(f"{dst}.attention.self.query", tree["attention"]["query"])
        put_linear(f"{dst}.attention.self.key", tree["attention"]["key"])
        put_linear(f"{dst}.attention.self.value", tree["attention"]["value"])
        put_linear(f"{dst}.attention.output.dense", tree["attention_output_dense"])
        put_ln(f"{dst}.attention.output.LayerNorm", tree["attention_output_layernorm"])
        put_linear(f"{dst}.intermediate.dense", tree["intermediate_dense"])
        put_linear(f"{dst}.output.dense", tree["output_dense"])
        put_ln(f"{dst}.output.LayerNorm", tree["output_layernorm"])

    # text tower
    emb = ge["text_model"]["embeddings"]
    t = f"{ge_ref}.text_model.embeddings"
    sd[f"{t}.word_embeddings.weight"] = np.asarray(emb["word_embeddings"]["embedding"])
    sd[f"{t}.position_embeddings.weight"] = np.asarray(emb["position_embeddings"]["embedding"])
    sd[f"{t}.token_type_embeddings.weight"] = np.asarray(emb["token_type_embeddings"]["embedding"])
    put_ln(f"{t}.LayerNorm", emb["layernorm"])
    for i in range(cfg.num_bottom_text_layers):
        put_bert_layer(
            f"{ge_ref}.text_model.encoder.layer.{i}", ge["text_model"][f"layer_{i}"]
        )

    # image tower
    if cfg.use_image_tower:
        vemb = ge["vit_model"]["embeddings"]
        v = f"{ge_ref}.vit_model.embeddings"
        conv = np.asarray(vemb["patch_embeddings"]["kernel"])
        sd[f"{v}.patch_embeddings.projection.weight"] = np.ascontiguousarray(
            conv.transpose(3, 2, 0, 1)
        )
        sd[f"{v}.patch_embeddings.projection.bias"] = np.asarray(
            vemb["patch_embeddings"]["bias"]
        )
        sd[f"{v}.cls_token"] = np.asarray(vemb["cls_token"])
        sd[f"{v}.position_embeddings"] = np.asarray(vemb["position_embeddings"])

        def put_vit(dst, tree):
            put_ln(f"{dst}.layernorm_before", tree["layernorm_before"])
            put_linear(f"{dst}.attention.attention.query", tree["attention"]["query"])
            put_linear(f"{dst}.attention.attention.key", tree["attention"]["key"])
            put_linear(f"{dst}.attention.attention.value", tree["attention"]["value"])
            put_linear(f"{dst}.attention.output.dense", tree["attention_output_dense"])
            put_ln(f"{dst}.layernorm_after", tree["layernorm_after"])
            put_linear(f"{dst}.intermediate.dense", tree["intermediate_dense"])
            put_linear(f"{dst}.output.dense", tree["output_dense"])

        for i in range(cfg.num_bottom_image_layers):
            put_vit(f"{ge_ref}.vit_model.encoder.layer.{i}", ge["vit_model"][f"layer_{i}"])
        put_ln(f"{ge_ref}.vit_model.layernorm", ge["vit_model"]["layernorm"])

    # fusion stacks (same grouping as the model build)
    from multimodaldiscussiontransformer_tpu.models.mdt import _stack_sizes

    sizes = _stack_sizes(cfg.num_fusion_layers + 1, cfg.num_fusion_stack)
    for i, sz in enumerate(sizes):
        for j in range(sz):
            src = p["graph_encoder"][f"fusion_stack_{i}"][f"fusion_{j}"]
            fp = f"{ge_ref}.fusion_layers.{i}.fusion_layers.{j}"
            put_bert_layer(f"{fp}.bert_encoder", src["bert_encoder"])
            if cfg.use_image_tower:
                tree = src["vit_encoder"]
                put_ln(f"{fp}.vit_encoder.layernorm_before", tree["layernorm_before"])
                put_linear(f"{fp}.vit_encoder.attention.attention.query", tree["attention"]["query"])
                put_linear(f"{fp}.vit_encoder.attention.attention.key", tree["attention"]["key"])
                put_linear(f"{fp}.vit_encoder.attention.attention.value", tree["attention"]["value"])
                put_linear(f"{fp}.vit_encoder.attention.output.dense", tree["attention_output_dense"])
                put_ln(f"{fp}.vit_encoder.layernorm_after", tree["layernorm_after"])
                put_linear(f"{fp}.vit_encoder.intermediate.dense", tree["intermediate_dense"])
                put_linear(f"{fp}.vit_encoder.output.dense", tree["output_dense"])

    # graph stacks
    for i in range(cfg.num_graph_stacks):
        key = f"graph_stack_{i}"
        if key not in ge:
            continue
        for j in range(cfg.num_graph_stack):
            tree = ge[key][f"layer_{j}"]
            gp = f"{ge_ref}.layers.{i}.layers.{j}"
            put_linear(f"{gp}.self_attn.q_proj", tree["self_attn"]["q_proj"])
            put_linear(f"{gp}.self_attn.k_proj", tree["self_attn"]["k_proj"])
            put_linear(f"{gp}.self_attn.v_proj", tree["self_attn"]["v_proj"])
            put_linear(f"{gp}.self_attn.out_proj", tree["self_attn"]["out_proj"])
            put_ln(f"{gp}.self_attn_layer_norm", tree["self_attn_layer_norm"])
            put_linear(f"{gp}.fc1", tree["fc1"])
            put_linear(f"{gp}.fc2", tree["fc2"])
            put_ln(f"{gp}.final_layer_norm", tree["final_layer_norm"])

    gnf = ge["graph_node_feature"]
    sd[f"{ge_ref}.graph_node_feature.in_degree_encoder.weight"] = np.asarray(gnf["in_degree_encoder"])
    sd[f"{ge_ref}.graph_node_feature.out_degree_encoder.weight"] = np.asarray(gnf["out_degree_encoder"])
    sd[f"{ge_ref}.graph_node_feature.graph_token.weight"] = np.asarray(gnf["graph_token"])
    gab = ge["graph_attn_bias"]
    sd[f"{ge_ref}.graph_attn_bias.spatial_pos_encoder.weight"] = np.asarray(gab["spatial_pos_encoder"])
    sd[f"{ge_ref}.graph_attn_bias.graph_token_virtual_distance.weight"] = np.asarray(
        gab["graph_token_virtual_distance"]
    )
    sd[f"{ge_ref}.bottle_neck.weight"] = np.asarray(ge["bottle_neck"])
    if "emb_layer_norm" in ge:
        put_ln(f"{ge_ref}.emb_layer_norm", ge["emb_layer_norm"])
    put_linear(f"{ge_ref}.text_pooler.dense", p["text_pooler"]["dense"])
    put_linear(f"{ge_ref}.node_classifier", p["node_classifier"])
    if cfg.use_image_tower and "vit_pooler" in p:
        put_linear(f"{ge_ref}.vit_pooler.dense", p["vit_pooler"]["dense"])
    return sd
