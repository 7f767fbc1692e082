"""Bottleneck-token fusion layers (Flax linen).

TPU-native redesign of the reference ``GraphFusionLayer`` /
``GraphFusionStack`` (mDT/src/modules/multi_graphormer_fusion_layer.py):

- text states live in a fixed-capacity buffer ``(C, T, D)`` of flattened real
  nodes; image states in ``(I, P+1, D)``;
- the reference's dynamic boolean indexing ``bottle_neck[x_image_indexes]``
  (line 57) becomes a static gather through the ``image_node -> C`` index
  vector (out-of-range padded slots gather zeros);
- the in-place modality average ``bottle_neck[idx] = (vit_bn + bert_bn)/2``
  (lines 63-66) becomes a functional scatter with drop-mode out-of-range
  handling, so padded image slots write nowhere.

Numerics per layer (multi_graphormer_fusion_layer.py:29-71):
1. text: BertLayer([bn ⊕ text]) with the extended mask (bn columns visible);
2. image nodes only: ViTLayer([bn_gathered ⊕ patches]) with no mask;
3. bottleneck update: BERT half everywhere; at image nodes the average of
   the ViT and BERT halves.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig
from multimodaldiscussiontransformer_tpu.models.bert import BertLayer
from multimodaldiscussiontransformer_tpu.models.vit import ViTLayer

Dtype = Any


class GraphFusionLayer(nn.Module):
    """One fusion step: paired (BertLayer, ViTLayer) exchanging bottleneck
    tokens across the text and image modalities."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.bert_encoder = BertLayer(self.config.text_tower, self.dtype, self.param_dtype)
        if self.config.use_image_tower:
            self.vit_encoder = ViTLayer(self.config.image_tower, self.dtype, self.param_dtype)

    def __call__(
        self,
        bert_hidden: jnp.ndarray,  # (C, T, D)
        vit_hidden: Optional[jnp.ndarray],  # (I, P+1, D) or None
        bottle_neck: jnp.ndarray,  # (C, nbn, D)
        bert_mask_bias: jnp.ndarray,  # (C, 1, 1, nbn+T) additive
        image_node: Optional[jnp.ndarray],  # (I,) int32 -> [0, C); pad -> C
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        nbn = self.config.num_bottleneck_tokens

        bert_in = jnp.concatenate([bottle_neck, bert_hidden], axis=1)
        bert_out_full = self.bert_encoder(bert_in, bert_mask_bias, deterministic)
        bert_hidden_out = bert_out_full[:, nbn:]
        bn_out = bert_out_full[:, :nbn]

        if vit_hidden is not None and self.config.use_image_tower:
            # zero-capacity image buffers flow through as zero-sized XLA ops,
            # keeping ViT fusion params materialized in all-text batches
            # gather bottleneck rows for image-bearing nodes; padded slots
            # (image_node == C, out of range) gather zeros and are dropped on
            # the write-back below
            bn_img = bottle_neck.at[image_node].get(mode="fill", fill_value=0)
            vit_in = jnp.concatenate([bn_img, vit_hidden], axis=1)
            vit_out_full = self.vit_encoder(vit_in, deterministic)
            vit_hidden_out = vit_out_full[:, nbn:]
            vit_bn = vit_out_full[:, :nbn]
            # modality average at image nodes (fusion_layer.py:63-66);
            # image_node values are unique (<=1 image per node,
            # hateful_discussions.py:168-182) so scatter-set is exact
            bert_bn_at_img = bn_out.at[image_node].get(mode="fill", fill_value=0)
            bn_out = bn_out.at[image_node].set(
                (vit_bn + bert_bn_at_img) / 2, mode="drop"
            )
        else:
            vit_hidden_out = vit_hidden

        return bert_hidden_out, vit_hidden_out, bn_out


class GraphFusionStack(nn.Module):
    """``num_layers`` chained fusion layers (multi_graphormer_fusion_layer.py:152-192)."""

    config: ModelConfig
    num_layers: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.fusion_layers = [
            GraphFusionLayer(
                self.config, self.dtype, self.param_dtype, name=f"fusion_{i}"
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        bert_hidden: jnp.ndarray,
        vit_hidden: Optional[jnp.ndarray],
        bottle_neck: jnp.ndarray,
        bert_mask_bias: jnp.ndarray,
        image_node: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        for f in self.fusion_layers:
            bert_hidden, vit_hidden, bottle_neck = f(
                bert_hidden, vit_hidden, bottle_neck, bert_mask_bias,
                image_node, deterministic,
            )
        return bert_hidden, vit_hidden, bottle_neck
