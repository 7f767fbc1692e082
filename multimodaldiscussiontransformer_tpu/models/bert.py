"""BERT tower modules (Flax linen).

TPU-native re-provision of the HF ``bert-base-uncased`` surface the reference
consumes (mDT/src/modules/multigraphormer_graph_encoder.py:241-246: embeddings
+ bottom encoder layers as ``text_model``, pooler as ``text_pooler``, the
sequence-classification dropout/classifier as ``text_dropout`` /
``node_classifier``, and the top layers split off into fusion stacks).

Module/param names mirror the HF PyTorch module tree (``query``, ``key``,
``value``, ``attention_output_dense`` ≙ ``attention.output.dense``, …) so the
checkpoint importer (utils/hf_import.py) is a mechanical path mapping.

Numerics notes:
- gelu is the exact (erf) variant, matching HF BERT's ``gelu`` activation.
- additive attention masks: masked key columns get a large negative bias
  before softmax; the reference uses ``torch.finfo(torch.half).min``
  (multigraphormer_graph_encoder.py:348-354) — any sufficiently negative
  value yields identical softmax output, we use a dtype-safe constant.
- softmax statistics are accumulated in float32 regardless of the compute
  dtype (the reference runs fp16 with fp32 softmax via fairseq
  utils.softmax; we run bf16 with fp32 softmax).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from flax import linen as nn

from multimodaldiscussiontransformer_tpu.models.fast_dropout import FastDropout

from multimodaldiscussiontransformer_tpu.core.config import BertTowerConfig

Dtype = Any

# Large negative bias for masked attention logits. Finite (not -inf) so that
# fully-masked rows degrade to uniform attention instead of NaN, and safe in
# bf16 (|min bf16| ~ 3.4e38; exp(-1e9) == 0 exactly after the f32 softmax).
MASK_BIAS = -1e9


def act_fn(name: str):
    """HF activation registry subset: exact gelu (BERT/ViT), tanh-approx
    gelu_new, and CLIP's QuickGELU."""
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {name!r}")


def attention_mask_bias(attention_mask: jnp.ndarray, dtype: Dtype) -> jnp.ndarray:
    """(…, S) {0,1} mask -> (…, 1, 1, S) additive bias.

    Equivalent of HF ``get_extended_attention_mask`` and of the reference's
    manual version at multigraphormer_graph_encoder.py:347-354."""
    m = attention_mask[..., None, None, :].astype(jnp.float32)
    return ((1.0 - m) * MASK_BIAS).astype(dtype)


class SelfAttention(nn.Module):
    """HF-style encoder self-attention (shared by BERT and ViT).

    Equivalent to ``BertSelfAttention`` + ``BertSelfOutput``'s dense (the
    residual+LN lives in the caller for ViT, inside for BERT — see users).

    With ``use_pallas`` (tower config ``use_pallas_attention``, TPU only)
    the softmax/dropout/value contraction runs through the fused tower
    kernel (ops/masked_attention.py): the (B, H, S, S) probabilities never
    materialize in HBM and attention-prob dropout masks are regenerated
    in-kernel in the backward. The fused path requires a key-only bias —
    exactly what the towers pass ((B, 1, 1, S) from attention_mask_bias,
    or None for ViT)."""

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    use_bias: bool = True
    use_pallas: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        d, p = self.dtype, self.param_dtype
        self.query = nn.Dense(self.hidden_size, use_bias=self.use_bias, dtype=d, param_dtype=p)
        self.key = nn.Dense(self.hidden_size, use_bias=self.use_bias, dtype=d, param_dtype=p)
        self.value = nn.Dense(self.hidden_size, use_bias=self.use_bias, dtype=d, param_dtype=p)
        self.attn_dropout = FastDropout(self.dropout_rate)

    def __call__(
        self,
        hidden: jnp.ndarray,  # (B, S, D)
        attn_bias: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, S, S)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, s, _ = hidden.shape
        h = self.num_heads
        dh = self.hidden_size // h
        q = self.query(hidden).reshape(b, s, h, dh)
        k = self.key(hidden).reshape(b, s, h, dh)
        v = self.value(hidden).reshape(b, s, h, dh)

        from multimodaldiscussiontransformer_tpu.ops import masked_attention as ma

        drop = (not deterministic) and self.dropout_rate > 0.0
        key_only = attn_bias is None or (
            attn_bias.ndim == 4
            and attn_bias.shape[1] == 1
            and attn_bias.shape[2] == 1
        )
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        # dropout needs the TPU PRNG — off-TPU the XLA + FastDropout path
        # below is the (numerically equivalent in distribution) fallback.
        # Past the kernel's whole-S VMEM bound the same fallback applies:
        # masked_attention would reject the dropout call rather than
        # silently spill (ops/masked_attention.py::_MAX_WHOLE_S).
        kernel_ok = (
            self.use_pallas
            and key_only
            and b > 0
            and (on_tpu or (ma.FORCE_KERNEL and not drop))
            and (s <= ma._MAX_WHOLE_S or not drop)
        )
        if kernel_ok:
            kmask = (
                None if attn_bias is None
                else attn_bias[:, 0, 0, :].astype(jnp.float32)
            )
            seed = None
            if drop:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, jnp.int32
                )
            ctx = ma.masked_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                key_mask_bias=kmask,
                seed=seed,
                rate=self.dropout_rate if drop else 0.0,
                scale=dh**-0.5,
            )
            return ctx.transpose(0, 2, 1, 3).reshape(b, s, self.hidden_size)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(hidden.dtype)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(hidden.dtype)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(b, s, self.hidden_size)


class BertLayer(nn.Module):
    """One post-LN BERT encoder layer (HF ``BertLayer``): self-attention ->
    dense+dropout+LN(residual) -> intermediate gelu -> dense+dropout+LN."""

    config: BertTowerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c, d, p = self.config, self.dtype, self.param_dtype
        self.attention = SelfAttention(
            c.hidden_size, c.num_attention_heads, c.attention_probs_dropout_prob,
            use_pallas=c.use_pallas_attention, dtype=d, param_dtype=p,
        )
        self.attention_output_dense = nn.Dense(c.hidden_size, dtype=d, param_dtype=p)
        self.attention_output_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=d, param_dtype=p)
        self.intermediate_dense = nn.Dense(c.intermediate_size, dtype=d, param_dtype=p)
        self.output_dense = nn.Dense(c.hidden_size, dtype=d, param_dtype=p)
        self.output_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=d, param_dtype=p)
        self.hidden_dropout = FastDropout(c.hidden_dropout_prob)

    def __call__(
        self,
        hidden: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn = self.attention(hidden, attn_bias, deterministic)
        attn = self.attention_output_dense(attn)
        attn = _checkpoint_name(attn, "attn_proj")  # names_heavy saveable
        attn = self.hidden_dropout(attn, deterministic=deterministic)
        hidden = self.attention_output_layernorm(attn + hidden)
        # remat_policy="names" saveables (identity outside jax.checkpoint)
        hidden = _checkpoint_name(hidden, "attn_out")
        inter = act_fn(self.config.hidden_act)(self.intermediate_dense(hidden))
        inter = _checkpoint_name(inter, "ffn_mid")  # names_heavy saveable
        out = self.output_dense(inter)
        out = self.hidden_dropout(out, deterministic=deterministic)
        return _checkpoint_name(
            self.output_layernorm(out + hidden), "ffn_out"
        )


class BertEmbeddings(nn.Module):
    """HF ``BertEmbeddings``: word + position + token-type, LN, dropout."""

    config: BertTowerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        c, p = self.config, self.param_dtype
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size, param_dtype=p)
        self.position_embeddings = nn.Embed(c.max_position_embeddings, c.hidden_size, param_dtype=p)
        self.token_type_embeddings = nn.Embed(c.type_vocab_size, c.hidden_size, param_dtype=p)
        self.layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=p)
        self.dropout = FastDropout(c.hidden_dropout_prob)

    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, S) int
        token_type_ids: jnp.ndarray,  # (B, S) int
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        s = input_ids.shape[-1]
        if c.position_offset:
            # RoBERTa position ids: cumulative count of non-pad tokens,
            # shifted past padding_idx (HF create_position_ids_from_input_ids)
            mask = (input_ids != c.pad_token_id).astype(jnp.int32)
            positions = jnp.cumsum(mask, axis=-1) * mask + (c.position_offset - 1)
        else:
            positions = jnp.arange(s, dtype=jnp.int32)[None, :]
        emb = self.word_embeddings(input_ids) + self.position_embeddings(positions)
        if c.use_token_type:
            emb = emb + self.token_type_embeddings(token_type_ids)
        emb = emb.astype(self.dtype)
        emb = self.layernorm(emb)
        return self.dropout(emb, deterministic=deterministic)


class BertPooler(nn.Module):
    """HF ``BertPooler``: dense + tanh on token 0. Used both as the text
    pooler and as the graph-path pooler in the output head (reference
    node_encoder_stack, multi_modal_discussion_transformer.py:215-221)."""

    hidden_size: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.dense = nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(self.dense(hidden[:, 0]))


class BertBottomTower(nn.Module):
    """Embeddings + the bottom ``num_layers`` BERT encoder layers — the
    reference's truncated ``text_model``
    (multigraphormer_graph_encoder.py:257-260: top fusion layers are split
    off; BERT applies no final layernorm so ``last_hidden_state`` is the raw
    output of the last remaining layer)."""

    config: BertTowerConfig
    num_layers: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # ModelConfig.scan_layers: run the uniform layer stack as one nn.scan
    # body over params stacked on a leading axis (param name "scan_layers"
    # instead of layer_0..n-1; utils/scan_params.py converts layouts)
    scan_layers: bool = False

    def setup(self) -> None:
        self.embeddings = BertEmbeddings(self.config, self.dtype, self.param_dtype)
        self.layer = (
            []
            if self.scan_layers
            else [
                BertLayer(self.config, self.dtype, self.param_dtype, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        )

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_type_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hidden = self.embeddings(input_ids, token_type_ids, deterministic)
        bias = attention_mask_bias(attention_mask, hidden.dtype)
        if self.scan_layers and self.num_layers > 0:
            def body(lyr, carry, _):
                return lyr(carry, bias, deterministic), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
            )
            hidden, _ = scan(
                BertLayer(
                    self.config, self.dtype, self.param_dtype,
                    name="scan_layers",
                ),
                hidden,
                None,
            )
            return hidden
        for lyr in self.layer:
            hidden = lyr(hidden, bias, deterministic)
        return hidden
