"""ViT tower modules (Flax linen).

Re-provision of the HF ``google/vit-base-patch16-224`` surface the reference
consumes (mDT/src/modules/multigraphormer_graph_encoder.py:236-240,253-256:
embeddings + bottom encoder layers as ``vit_model``, pooler as
``vit_pooler``, top layers split off into fusion stacks).

Quirk reproduced deliberately: HF ``ViTModel.forward`` applies the model's
*final* layernorm to the encoder output before returning
``last_hidden_state``. Because the reference truncates ``encoder.layer`` but
keeps calling the full model, that final layernorm runs right after the
BOTTOM tower — before the fusion layers — instead of at the very end
(multigraphormer_graph_encoder.py:261 acknowledges "this still includes the
layernorm"). ``ViTBottomTower`` therefore ends with that layernorm.

ViT layers are pre-LN: LN -> attention -> +residual; LN -> MLP -> +residual
(HF ``ViTLayer``), with no attention mask (all patches are real).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from flax import linen as nn

from multimodaldiscussiontransformer_tpu.models.fast_dropout import FastDropout

from multimodaldiscussiontransformer_tpu.core.config import ViTTowerConfig
from multimodaldiscussiontransformer_tpu.models.bert import SelfAttention, act_fn

Dtype = Any


class ViTLayer(nn.Module):
    """One pre-LN ViT encoder layer (HF ``ViTLayer``)."""

    config: ViTTowerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c, d, p = self.config, self.dtype, self.param_dtype
        self.layernorm_before = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=d, param_dtype=p)
        self.attention = SelfAttention(
            c.hidden_size, c.num_attention_heads, c.attention_probs_dropout_prob,
            use_pallas=c.use_pallas_attention, dtype=d, param_dtype=p,
        )
        self.attention_output_dense = nn.Dense(c.hidden_size, dtype=d, param_dtype=p)
        self.layernorm_after = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=d, param_dtype=p)
        self.intermediate_dense = nn.Dense(c.intermediate_size, dtype=d, param_dtype=p)
        self.output_dense = nn.Dense(c.hidden_size, dtype=d, param_dtype=p)
        self.hidden_dropout = FastDropout(c.hidden_dropout_prob)

    def __call__(self, hidden: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = self.attention(self.layernorm_before(hidden), None, deterministic)
        attn = self.attention_output_dense(attn)
        attn = _checkpoint_name(attn, "attn_proj")  # names_heavy saveable
        attn = self.hidden_dropout(attn, deterministic=deterministic)
        # remat_policy="names" saveables (identity outside jax.checkpoint)
        hidden = _checkpoint_name(hidden + attn, "attn_out")
        mlp = act_fn(self.config.hidden_act)(
            self.intermediate_dense(self.layernorm_after(hidden))
        )
        mlp = _checkpoint_name(mlp, "ffn_mid")  # names_heavy saveable
        mlp = self.output_dense(mlp)
        mlp = self.hidden_dropout(mlp, deterministic=deterministic)
        return _checkpoint_name(hidden + mlp, "ffn_out")


class ViTEmbeddings(nn.Module):
    """HF ``ViTEmbeddings``: conv patch projection, CLS token, learned
    position embeddings, dropout."""

    config: ViTTowerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        self.patch_embeddings = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            use_bias=c.patch_bias,  # CLIP's patch conv is bias-free
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if c.embeddings_layernorm:  # CLIP pre_layrnorm
            self.pre_layernorm = nn.LayerNorm(
                epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype
            )
        self.cls_token = self.param(
            "cls_token",
            nn.initializers.zeros_init(),
            (1, 1, c.hidden_size),
            self.param_dtype,
        )
        self.position_embeddings = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (1, c.seq_len, c.hidden_size),
            self.param_dtype,
        )
        self.dropout = FastDropout(c.hidden_dropout_prob)

    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # pixel_values: (B, 3, H, W) channels-first like the HF processor
        # output (hateful_discussions.py:168-182); convert to NHWC for the
        # TPU-preferred conv layout.
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        x = self.patch_embeddings(x)  # (B, H/ps, W/ps, D)
        b = x.shape[0]
        # explicit patch count (not -1): zero-capacity image buffers are
        # legal zero-sized arrays and -1 cannot infer against size 0
        x = x.reshape(
            b, x.shape[1] * x.shape[2], self.config.hidden_size
        )
        cls = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (b, 1, self.config.hidden_size)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.position_embeddings.astype(self.dtype)
        if self.config.embeddings_layernorm:
            x = self.pre_layernorm(x)
        return self.dropout(x, deterministic=deterministic)


class ViTPooler(nn.Module):
    """HF ``ViTPooler``: dense + tanh on the CLS token. Vestigial in the
    reference forward (kept unfrozen but never called,
    multigraphormer_graph_encoder.py:228,247) — provided for checkpoint
    parity and for the commented-out image-head variant."""

    hidden_size: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.dense = nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(self.dense(hidden[:, 0]))


class ViTBottomTower(nn.Module):
    """Embeddings + bottom ``num_layers`` ViT layers + the (early) final
    layernorm — see module docstring for why the layernorm sits here."""

    config: ViTTowerConfig
    num_layers: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # ModelConfig.scan_layers: uniform layer stack as one nn.scan body over
    # stacked params (name "scan_layers"; utils/scan_params.py converts)
    scan_layers: bool = False

    def setup(self) -> None:
        self.embeddings = ViTEmbeddings(self.config, self.dtype, self.param_dtype)
        self.layer = (
            []
            if self.scan_layers
            else [
                ViTLayer(self.config, self.dtype, self.param_dtype, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        )
        self.layernorm = nn.LayerNorm(
            epsilon=self.config.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype
        )

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hidden = self.embeddings(pixel_values, deterministic)
        if self.scan_layers and self.num_layers > 0:
            def body(lyr, carry, _):
                return lyr(carry, deterministic), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
            )
            hidden, _ = scan(
                ViTLayer(
                    self.config, self.dtype, self.param_dtype,
                    name="scan_layers",
                ),
                hidden,
                None,
            )
            return self.layernorm(hidden)
        for lyr in self.layer:
            hidden = lyr(hidden, deterministic)
        return self.layernorm(hidden)
