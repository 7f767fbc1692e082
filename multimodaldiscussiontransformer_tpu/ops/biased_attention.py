"""Fused biased attention — Pallas TPU kernel + XLA reference.

Computes ``softmax(q @ k^T * scale + bias [+ key-pad mask]) @ v`` per
(batch, head) without round-tripping the (B, H, S, S) probability tensor
through HBM: one kernel invocation per (batch*head, q-block) computes scores,
a numerically-stable f32 softmax, and the value contraction entirely in VMEM.

This is the device-side replacement for the reference attention math
(mDT/src/modules/multihead_attention.py:134-203: q-scaling, additive
``attn_weights += attn_bias``, key-padding -inf fill, fp32 softmax).

Design notes (tree-scale shapes: S = Nmax+1 <= ~512, dh = 64):
- whole K/V rows fit VMEM, so no streaming flash loop is needed — each
  q-block sees all keys in one MXU contraction; for S beyond
  ``MAX_FUSED_KEYS`` the wrapper falls back to the XLA path (correctness
  first; a streaming variant is the obvious extension);
- the -inf entries of the additive bias (distance clipping / padding
  columns, collator semantics) flow through the f32 softmax exactly like the
  reference; rows whose keys are ALL masked yield 0 output, matching
  softmax-of-uniform times zero-value convention... (such rows cannot occur
  for real nodes: self-distance is 0 and the graph token column is finite);
- backward is a custom VJP that recomputes probabilities (rematerialized
  flash-style backward) in plain XLA — the forward never stores them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

MASK_BIAS = -1e9
MAX_FUSED_KEYS = 2048  # whole-K VMEM budget; beyond this use the XLA path
Q_BLOCK = 128


def biased_attention_reference(
    q: jnp.ndarray,  # (B, H, S, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],  # (B, H, S, S) additive, may contain -inf
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = pad
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """XLA reference path (used on CPU and as the parity oracle)."""
    dh = q.shape[-1]
    scale = dh**-0.5 if scale is None else scale
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], MASK_BIAS, scores
        )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fused_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    """One (batch, head): whole-sequence fused attention in VMEM.

    The additive bias may contain -inf (collator distance clipping); it is
    clamped in-register to a finite mask value so inf-inf never occurs."""
    q = q_ref[0].astype(jnp.float32) * scale  # (S, dh)
    k = k_ref[0].astype(jnp.float32)  # (S, dh)
    v = v_ref[0].astype(jnp.float32)  # (S, dh)
    b = jnp.maximum(bias_ref[0].astype(jnp.float32), MASK_BIAS)  # (S, S)
    scores = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + b
    )
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), MASK_BIAS)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[0] = (acc / jnp.maximum(denom, 1e-30)).astype(out_ref.dtype)


def _fused_forward(q, k, v, bias, scale):
    """Pallas dispatch: one grid step per (batch*head); bias (B,H,S,S) or
    broadcastable (B,1,S,S)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, s, dh = q.shape
    s_pad = -(-s // 8) * 8  # sublane multiple; Mosaic pads lanes internally
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        # padded key columns must be masked; padded query rows are sliced off
        bias = jnp.pad(
            bias,
            [(0, 0), (0, 0), (0, s_pad - s), (0, s_pad - s)],
            constant_values=MASK_BIAS,
        )

    h_bias = bias.shape[1]  # 1 (shared across heads) or h
    q3 = q.reshape(bsz * h, s_pad, dh)
    k3 = k.reshape(bsz * h, s_pad, dh)
    v3 = v.reshape(bsz * h, s_pad, dh)
    b3 = bias.reshape(bsz * h_bias, s_pad, s_pad)

    def qkv_map(bh):
        return (bh, 0, 0)

    def bias_map(bh):
        return ((bh // h) if h_bias == 1 else bh, 0, 0)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale),
        grid=(bsz * h,),
        interpret=jax.default_backend() == "cpu",  # CPU: tests/debug only
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        in_specs=[
            pl.BlockSpec((1, s_pad, dh), qkv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh), qkv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh), qkv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, s_pad), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, dh), qkv_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * h, s_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * h * s_pad * s_pad * dh,
            bytes_accessed=(3 * s_pad * dh * 2 + s_pad * s_pad * 4) * bsz * h,
            transcendentals=bsz * h * s_pad * s_pad,
        ),
    )(q3, k3, v3, b3)
    out = out.reshape(bsz, h, s_pad, dh)
    return out[:, :, :s, :] if s_pad != s else out


def _combine_bias(bias, key_padding_mask, bsz, s):
    """Fold key padding into the additive bias (shape (B,H|1,S,S), f32).
    The -inf clamp happens inside the kernel, so this is a cheap fused add
    that XLA folds into the surrounding pad."""
    if bias is None:
        bias = jnp.zeros((bsz, 1, s, s), jnp.float32)
    bias = bias.astype(jnp.float32)
    if key_padding_mask is not None:
        bias = bias + jnp.where(
            key_padding_mask[:, None, None, :], MASK_BIAS, 0.0
        )
    if bias.ndim == 4 and bias.shape[2] == s:
        return bias
    return jnp.broadcast_to(bias, (bsz, bias.shape[1], s, s))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _biased_attention_fused(q, k, v, bias, key_padding_mask, scale):
    bsz, h, s, dh = q.shape
    combined = _combine_bias(bias, key_padding_mask, bsz, s)
    return _fused_forward(q, k, v, combined, scale)


def _fwd(q, k, v, bias, key_padding_mask, scale):
    out = _biased_attention_fused(q, k, v, bias, key_padding_mask, scale)
    return out, (q, k, v, bias, key_padding_mask)


def _bwd(scale, residuals, g):
    """Rematerialized attention backward (probabilities recomputed, XLA)."""
    q, k, v, bias, key_padding_mask = residuals
    bsz, h, s, dh = q.shape
    combined = jnp.maximum(
        _combine_bias(bias, key_padding_mask, bsz, s), MASK_BIAS
    )
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf * scale, kf) + combined
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    if bias is None:
        dbias = None
    elif bias.shape[1] == 1:  # head-shared bias: reduce over heads
        dbias = ds.sum(axis=1, keepdims=True).astype(bias.dtype)
    else:
        dbias = ds.astype(bias.dtype)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dbias,
        None,
    )


_biased_attention_fused.defvjp(_fwd, _bwd)


def biased_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Biased attention with automatic Pallas/XLA dispatch.

    Args mirror ``biased_attention_reference``. ``use_pallas=False`` (or
    non-TPU backends, or S > MAX_FUSED_KEYS) routes to the XLA path."""
    s = q.shape[2]
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not use_pallas or not on_tpu or s > MAX_FUSED_KEYS:
        return biased_attention_reference(
            q, k, v, bias, key_padding_mask, scale
        )
    return _biased_attention_fused(q, k, v, bias, key_padding_mask, scale)
