"""Graphormer-style graph transformer blocks (Flax linen).

Re-implements the reference graph path — ``GraphNodeFeature`` /
``GraphAttnBias`` (mDT/src/modules/graphormer_layers.py), the biased
``MultiheadAttention`` (mDT/src/modules/multihead_attention.py) and the
post-LN ``GraphormerGraphEncoderLayer`` / ``GraphEncoderStack``
(mDT/src/modules/graphormer_graph_encoder_layer.py) — batch-first and
TPU-shaped:

- torch's ``padding_idx=0`` embeddings (rows pinned to zero) become masked
  lookups: id 0 contributes an exact zero vector, which is how the +1-shifted
  collator encodes padding;
- softmax runs in float32 regardless of compute dtype (the reference relies
  on fairseq ``utils.softmax`` doing the same under fp16);
- the whole-bias assembly can be bypassed by the Pallas fused attention
  kernel (ops/biased_attention.py) which consumes the compact
  ``spatial_pos`` + template instead of the materialized (B,H,N+1,N+1) bias.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from flax import linen as nn

from multimodaldiscussiontransformer_tpu.models.fast_dropout import FastDropout

from multimodaldiscussiontransformer_tpu.core.config import ModelConfig
from multimodaldiscussiontransformer_tpu.models.bert import MASK_BIAS

Dtype = Any


def graph_activation_fn(name: str):
    """The fairseq activation registry subset the reference exposes on
    ``--activation-fn`` (multi_modal_discussion_transformer.py:138-143 via
    fairseq ``utils.get_activation_fn``; arch default gelu, line 314).
    fairseq's ``gelu`` is the exact erf variant; ``gelu_fast`` /
    ``gelu_accurate`` are the tanh approximation."""
    table = {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_accurate": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "relu_squared": lambda x: jnp.square(jax.nn.relu(x)),
        "tanh": jnp.tanh,
        "linear": lambda x: x,
    }
    if name not in table:
        raise ValueError(
            f"unknown activation_fn {name!r}; supported: {sorted(table)}"
        )
    return table[name]


def masked_embed(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup with torch ``padding_idx=0`` semantics: id 0 maps to
    an exact zero vector (graphormer_layers.py:29-33, 74-80).

    Ids SATURATE at the last table row: a degree/bucket beyond the table
    (e.g. a star node with in-degree past ``num_in_degree``) reads the
    final embedding instead of poisoning the graph — ``jnp.take`` defaults
    to ``mode="fill"`` (NaN for floats) on BOTH eager and jitted execution
    (pinned by tests/test_model.py::test_degree_overflow_saturates_not_nan),
    so without the explicit clip one overflowing id silently NaNs the whole
    graph either way. The reference would crash outright here (torch
    nn.Embedding index assert); saturating the long tail is the standard
    Graphormer treatment and is numerically safe on both execution paths."""
    ids = jnp.clip(ids, 0, table.shape[0] - 1)
    out = jnp.take(table, ids, axis=0)
    return jnp.where((ids == 0)[..., None], 0.0, out)


class GraphNodeFeature(nn.Module):
    """Node features: bottleneck states + in/out-degree embeddings, with a
    learned graph token prepended (graphormer_layers.py:16-50)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        d = c.encoder_embed_dim
        init = nn.initializers.normal(0.02)
        self.in_degree_encoder = self.param(
            "in_degree_encoder", init, (c.num_in_degree, d), self.param_dtype
        )
        self.out_degree_encoder = self.param(
            "out_degree_encoder", init, (c.num_out_degree, d), self.param_dtype
        )
        self.graph_token = self.param(
            "graph_token", init, (1, d), self.param_dtype
        )

    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, D) node grid
        in_degree: jnp.ndarray,  # (B, N) int, +1-shifted, 0 = pad
        out_degree: jnp.ndarray,  # (B, N) int
    ) -> jnp.ndarray:
        feats = (
            x
            + masked_embed(self.in_degree_encoder.astype(self.dtype), in_degree)
            + masked_embed(self.out_degree_encoder.astype(self.dtype), out_degree)
        )
        b = x.shape[0]
        tok = jnp.broadcast_to(
            self.graph_token.astype(self.dtype)[None], (b, 1, x.shape[-1])
        )
        return jnp.concatenate([tok, feats], axis=1)


class GraphAttnBias(nn.Module):
    """Per-head attention bias: spatial-bucket embeddings over node pairs plus
    a learned virtual distance for the graph-token row/column
    (graphormer_layers.py:53-110). Reproduces the reference's double addition
    of the base template (line 108) when ``config.double_add_attn_bias``."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        h = c.encoder_attention_heads
        init = nn.initializers.normal(0.02)
        self.spatial_pos_encoder = self.param(
            "spatial_pos_encoder", init, (c.num_spatial, h), self.param_dtype
        )
        self.graph_token_virtual_distance = self.param(
            "graph_token_virtual_distance", init, (1, h), self.param_dtype
        )

    def __call__(
        self,
        attn_bias: jnp.ndarray,  # (B, N+1, N+1) template (0 / -inf)
        spatial_pos: jnp.ndarray,  # (B, N, N) int, +1-shifted, 0 = pad
    ) -> jnp.ndarray:
        h = self.config.encoder_attention_heads
        template = attn_bias.astype(self.dtype)[:, None]  # (B, 1, N+1, N+1)
        g = jnp.broadcast_to(
            template, (attn_bias.shape[0], h) + attn_bias.shape[1:]
        )
        # (B, N, N, H) -> (B, H, N, N)
        sp = masked_embed(
            self.spatial_pos_encoder.astype(self.dtype), spatial_pos
        ).transpose(0, 3, 1, 2)
        g = g.at[:, :, 1:, 1:].add(sp)
        t = self.graph_token_virtual_distance.astype(self.dtype).reshape(1, h, 1)
        g = g.at[:, :, 1:, 0].add(t)
        g = g.at[:, :, 0, :].add(t)
        if self.config.double_add_attn_bias:
            g = g + template  # "reset" double-add (graphormer_layers.py:108)
        return g

    def compact_inputs(
        self,
        attn_bias: jnp.ndarray,  # (B, N+1, N+1) template
        spatial_pos: jnp.ndarray,  # (B, N, N)
    ):
        """Compact (template, ids, lut) triple for the fused tree-attention
        kernel — the bias is assembled in-kernel instead of materializing
        (B, H, S, S) in HBM (ops/tree_attention.py). Requires the +1-shifted
        bucket ids to fit the LUT (clipped Cantor space: <= 22 ids)."""
        from multimodaldiscussiontransformer_tpu.ops.tree_attention import (
            build_compact_bias_inputs,
        )

        return build_compact_bias_inputs(
            attn_bias,
            spatial_pos,
            self.spatial_pos_encoder.astype(jnp.float32),
            self.graph_token_virtual_distance.astype(jnp.float32),
        )


class BiasedMultiheadAttention(nn.Module):
    """Self-attention with additive per-head bias and key-padding masking
    (multihead_attention.py:91-214), batch-first."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        d = c.encoder_embed_dim
        # fairseq scaled xavier init for qkv: xavier_uniform with gain
        # 1/sqrt(2) (multihead_attention.py:75-81) — variance_scaling scale
        # is gain^2 on the fan_avg uniform distribution
        qkv_init = nn.initializers.variance_scaling(0.5, "fan_avg", "uniform")
        self.q_proj = nn.Dense(d, kernel_init=qkv_init, dtype=self.dtype, param_dtype=self.param_dtype)
        self.k_proj = nn.Dense(d, kernel_init=qkv_init, dtype=self.dtype, param_dtype=self.param_dtype)
        self.v_proj = nn.Dense(d, kernel_init=qkv_init, dtype=self.dtype, param_dtype=self.param_dtype)
        self.out_proj = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype, param_dtype=self.param_dtype)
        self.dropout = FastDropout(self.config.attention_dropout)

    def __call__(
        self,
        x: jnp.ndarray,  # (B, S, D)
        attn_bias: Optional[jnp.ndarray],  # (B, H, S, S)
        key_padding_mask: Optional[jnp.ndarray],  # (B, S) bool, True = pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        b, s, d = x.shape
        h = c.encoder_attention_heads
        dh = d // h
        scaling = dh ** -0.5
        q = self.q_proj(x).reshape(b, s, h, dh)
        k = self.k_proj(x).reshape(b, s, h, dh)
        v = self.v_proj(x).reshape(b, s, h, dh)

        use_fused = (
            c.use_pallas_attention
            and (deterministic or c.attention_dropout == 0.0)
        )
        if isinstance(attn_bias, tuple):
            # compact-bias path: (template, ids, lut) assembled in-kernel;
            # the template already encodes key padding (collator semantics)
            from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta

            template, ids, lut = attn_bias
            if c.sequence_parallel:
                # sequence parallelism: node axis S sharded over the
                # ambient mesh's 'sp' axis, ring attention over ICI —
                # trees bigger than one chip's O(S^2) bias train/score
                # through the standard model path (ops/ring_attention.py)
                from multimodaldiscussiontransformer_tpu.ops.ring_attention import (
                    _sp_shard_spec,
                    ring_tree_attention_dispatch,
                )

                if _sp_shard_spec() is not None:
                    seed = None
                    rate = 0.0
                    if not deterministic and c.attention_dropout > 0.0:
                        seed = jax.random.randint(
                            self.make_rng("dropout"), (), 0, 2**31 - 1,
                            jnp.int32,
                        )
                        rate = c.attention_dropout
                    ctx = ring_tree_attention_dispatch(
                        q.transpose(0, 2, 1, 3),
                        k.transpose(0, 2, 1, 3),
                        v.transpose(0, 2, 1, 3),
                        template, ids, lut,
                        scale=scaling,
                        double_add=c.double_add_attn_bias,
                        dropout_seed=seed,
                        dropout_rate=rate,
                    ).transpose(0, 2, 1, 3).reshape(b, s, d)
                    return self.out_proj(ctx)
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            if deterministic or c.attention_dropout == 0.0:
                ctx = ta.tree_attention(
                    q.transpose(0, 2, 1, 3),
                    k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3),
                    template, ids, lut,
                    scale=scaling,
                    double_add=c.double_add_attn_bias,
                    use_pallas=c.use_pallas_attention,
                ).transpose(0, 2, 1, 3).reshape(b, s, d)
                return self.out_proj(ctx)
            if c.use_pallas_attention and on_tpu:
                # training with attention dropout: in-kernel PRNG mask,
                # regenerated (not stored) in the Pallas backward
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, jnp.int32
                )
                ctx = ta.tree_attention_dropout_dispatch(
                    q.transpose(0, 2, 1, 3),
                    k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3),
                    template, ids, lut, seed,
                    rate=c.attention_dropout,
                    scale=scaling,
                    double_add=c.double_add_attn_bias,
                ).transpose(0, 2, 1, 3).reshape(b, s, d)
                return self.out_proj(ctx)
            # off-TPU fallback: assemble the full bias and take the standard
            # path so probs can be dropped out by the flax Dropout
            attn_bias = ta._assemble_bias_xla(
                template, ids, lut, c.double_add_attn_bias
            ).astype(x.dtype)
            key_padding_mask = None
        if use_fused:
            # Pallas fused path: probabilities never materialize in HBM
            from multimodaldiscussiontransformer_tpu.ops.biased_attention import (
                biased_attention,
            )

            ctx = biased_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                bias=attn_bias,
                key_padding_mask=key_padding_mask,
                scale=scaling,
            ).transpose(0, 2, 1, 3).reshape(b, s, d)
            return self.out_proj(ctx)

        q = q * jnp.asarray(scaling, x.dtype)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if attn_bias is not None:
            scores = scores + attn_bias
        if key_padding_mask is not None:
            scores = jnp.where(
                key_padding_mask[:, None, None, :], MASK_BIAS, scores
            )
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        probs = self.dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.out_proj(ctx)


class GraphormerGraphEncoderLayer(nn.Module):
    """Post-LN (default) / pre-LN transformer block with biased attention
    (graphormer_graph_encoder_layer.py:103-142)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c = self.config
        self.self_attn = BiasedMultiheadAttention(c, self.dtype, self.param_dtype)
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        self.fc1 = nn.Dense(c.encoder_ffn_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype)
        self.fc2 = nn.Dense(c.encoder_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        self.dropout = FastDropout(c.dropout)
        self.activation_dropout = FastDropout(c.act_dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray],
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        pre = self.config.pre_layernorm
        residual = x
        if pre:
            x = self.self_attn_layer_norm(x)
        x = self.self_attn(x, attn_bias, key_padding_mask, deterministic)
        x = _checkpoint_name(x, "attn_proj")  # remat_policy="names_heavy"
        x = self.dropout(x, deterministic=deterministic)
        x = residual + x
        if not pre:
            x = self.self_attn_layer_norm(x)
        # remat_policy="names": the post-attention residual stream is a
        # saveable (identity outside jax.checkpoint)
        x = _checkpoint_name(x, "attn_out")

        residual = x
        if pre:
            x = self.final_layer_norm(x)
        x = graph_activation_fn(self.config.activation_fn)(self.fc1(x))
        x = _checkpoint_name(x, "ffn_mid")  # remat_policy="names_heavy"
        x = self.activation_dropout(x, deterministic=deterministic)
        x = self.fc2(x)
        x = self.dropout(x, deterministic=deterministic)
        x = residual + x
        if not pre:
            x = self.final_layer_norm(x)
        return _checkpoint_name(x, "ffn_out")


class GraphEncoderStack(nn.Module):
    """``num_layers`` chained graph encoder layers
    (graphormer_graph_encoder_layer.py:145-195)."""

    config: ModelConfig
    num_layers: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.layers = [
            GraphormerGraphEncoderLayer(
                self.config, self.dtype, self.param_dtype, name=f"layer_{i}"
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray],
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for lyr in self.layers:
            x = lyr(x, attn_bias, key_padding_mask, deterministic)
        return x
