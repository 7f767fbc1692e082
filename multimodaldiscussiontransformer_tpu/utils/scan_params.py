"""Param-layout transforms between the unrolled and layer-scanned model.

``ModelConfig.scan_layers`` (models/mdt.py::InterleavePairBlock and the
tower scans in models/{bert,vit}.py) changes the param LAYOUT, not the
math: the uniform interleave pairs live under one ``scan_pairs`` subtree
with params stacked on a leading axis (``graph_stack_i``/
``fusion_stack_{i+1}`` for scanned ``i`` disappear), and each bottom
tower's ``layer_0..n-1`` become one stacked ``scan_layers``. Checkpoints,
the HF importer (utils/hf_import.py) and the reference importer/exporter
(utils/reference_import.py) all speak the UNROLLED layout — these
transforms convert at the boundary (``Trainer.load_params`` calls
``adapt_params`` automatically, so an unrolled checkpoint loads into a
scanned model and vice versa).

Transforms are exact host-side restacks (np.stack / slicing); forward
outputs are bit-identical across layouts (pinned by
tests/test_scan_layers.py). The reference has no analogue — its torch
modules are always unrolled (multigraphormer_graph_encoder.py:145-191).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig
from multimodaldiscussiontransformer_tpu.models.mdt import (
    _scan_pair_count,
    _stack_sizes,
)


def scan_plan(cfg: ModelConfig) -> Dict[str, int]:
    """What the scanned layout stacks, from the model config alone."""
    sizes = _stack_sizes(cfg.num_fusion_layers + 1, cfg.num_fusion_stack)
    return {
        "n_pairs_scanned": _scan_pair_count(sizes),
        "text_layers": max(cfg.num_bottom_text_layers, 0),
        "image_layers": (
            max(cfg.num_bottom_image_layers, 0) if cfg.use_image_tower else 0
        ),
    }


def _unwrap(params: Any):
    """(inner-tree, rewrap) for raw trees and {"params": ...} wrappers."""
    if isinstance(params, dict) and "params" in params:
        outer = dict(params)

        def rewrap(inner):
            out = dict(outer)
            out["params"] = inner
            return out

        return params["params"], rewrap
    return params, lambda inner: inner


def params_layout(params: Any) -> str:
    """"scanned" | "unrolled" | "none" by key presence under graph_encoder."""
    inner, _ = _unwrap(params)
    enc = inner.get("graph_encoder", {}) if isinstance(inner, dict) else {}
    if "scan_pairs" in enc or "scan_layers" in enc.get("text_model", {}):
        return "scanned"
    if any(k.startswith("graph_stack_") for k in enc) or "layer_0" in enc.get(
        "text_model", {}
    ):
        return "unrolled"
    return "none"


def _stack_trees(trees):
    return jax.tree.map(
        lambda *ls: np.stack([np.asarray(x) for x in ls], axis=0), *trees
    )


def _unstack_tree(tree, n):
    return [
        jax.tree.map(lambda x: np.asarray(x)[i], tree) for i in range(n)
    ]


def to_scanned(params: Any, cfg: ModelConfig) -> Any:
    """Unrolled-layout params -> scanned layout (host-side restack)."""
    inner, rewrap = _unwrap(params)
    if params_layout(params) != "unrolled":
        return params
    plan = scan_plan(cfg)
    enc = dict(inner["graph_encoder"])
    n = plan["n_pairs_scanned"]
    if n > 0:
        enc["scan_pairs"] = {
            "graph_stack": _stack_trees(
                [enc.pop(f"graph_stack_{i}") for i in range(n)]
            ),
            "fusion_stack": _stack_trees(
                [enc.pop(f"fusion_stack_{i + 1}") for i in range(n)]
            ),
        }
    for tower, count in (
        ("text_model", plan["text_layers"]),
        ("vit_model", plan["image_layers"]),
    ):
        if count > 0 and tower in enc:
            t = dict(enc[tower])
            t["scan_layers"] = _stack_trees(
                [t.pop(f"layer_{i}") for i in range(count)]
            )
            enc[tower] = t
    out = dict(inner)
    out["graph_encoder"] = enc
    return rewrap(out)


def to_unrolled(params: Any, cfg: ModelConfig) -> Any:
    """Scanned-layout params -> unrolled layout (host-side unstack)."""
    inner, rewrap = _unwrap(params)
    if params_layout(params) != "scanned":
        return params
    plan = scan_plan(cfg)
    enc = dict(inner["graph_encoder"])
    n = plan["n_pairs_scanned"]
    if n > 0 and "scan_pairs" in enc:
        pairs = enc.pop("scan_pairs")
        for i, sub in enumerate(_unstack_tree(pairs["graph_stack"], n)):
            enc[f"graph_stack_{i}"] = sub
        for i, sub in enumerate(_unstack_tree(pairs["fusion_stack"], n)):
            enc[f"fusion_stack_{i + 1}"] = sub
    for tower, count in (
        ("text_model", plan["text_layers"]),
        ("vit_model", plan["image_layers"]),
    ):
        if count > 0 and tower in enc and "scan_layers" in enc[tower]:
            t = dict(enc[tower])
            stacked = t.pop("scan_layers")
            for i, sub in enumerate(_unstack_tree(stacked, count)):
                t[f"layer_{i}"] = sub
            enc[tower] = t
    out = dict(inner)
    out["graph_encoder"] = enc
    return rewrap(out)


def adapt_params(params: Any, cfg: ModelConfig) -> Any:
    """Convert ``params`` to the layout ``cfg`` expects (no-op if aligned)."""
    if cfg.scan_layers:
        return to_scanned(params, cfg)
    return to_unrolled(params, cfg)
