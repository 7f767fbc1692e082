"""Fused masked attention with in-kernel dropout — the TOWER kernel.

The BERT/ViT tower layers (models/bert.py ``SelfAttention``, shared by
models/vit.py) compute plain ``softmax(q k^T * scale + key_pad_bias) @ v``.
The reference consumes this through HF ``BertSelfAttention`` /
``ViTSelfAttention`` (torch SDPA → cuDNN fused attention + a stored
attention-prob dropout mask), at
mDT/src/modules/multigraphormer_graph_encoder.py:241-246 (text tower) and
:236-240 (image tower), with dropout on the normalized probabilities
(HF ``self.dropout(attention_probs)``).

TPU-native design — the tower analogue of the graph path's
``ops/tree_attention.py`` dropout kernels, minus everything graph-specific:

- batched (G batch rows × all H heads) layout: one grid step computes
  scores, a numerically-stable f32 softmax, dropout, and the value
  contraction for G×H attention maps entirely in VMEM — the (B, H, S, S)
  probability tensor never reaches HBM in forward OR backward;
- the only bias the towers need is a per-KEY additive vector (B, S)
  (0 for real tokens / -1e9 for padding), broadcast in-register — unlike
  ``ops/biased_attention.py`` there is no (B, 1, S, S) HBM bias tensor
  at all;
- attention-prob dropout masks are a pure function of
  ``seed + grid_step`` via the TPU PRNG; forward and backward tile the
  batch identically and REGENERATE the mask — only the int32 seed
  survives as a residual;
- backward is a fused Pallas kernel producing dq/dk/dv in one pass
  (probabilities recomputed in VMEM, flash-style).

Off-TPU (or ``use_pallas=False``, or zero-size batches) the public entry
falls back to the XLA reference path; with dropout active the CALLER is
expected to keep the XLA-softmax + FastDropout path off-TPU (the TPU PRNG
has no interpret-mode equivalent) — see models/bert.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

MASK_BIAS = -1e9
_VMEM_BUDGET = 8 * 1024 * 1024
_MAX_WHOLE_S = 1024  # beyond this the whole-S working set outgrows VMEM

# test hook: route to the (interpret-mode) kernel even off-TPU so the
# no-dropout kernel + shard_map dispatch are exercisable on the CPU mesh
FORCE_KERNEL = False


def masked_attention_reference(
    q: jnp.ndarray,  # (B, H, S, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask_bias: Optional[jnp.ndarray] = None,  # (B, S) additive f32
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """XLA reference path (CPU fallback and parity oracle; no dropout —
    callers apply FastDropout on the probabilities off-TPU)."""
    dh = q.shape[-1]
    scale = dh**-0.5 if scale is None else scale
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k
    ).astype(jnp.float32)
    if key_mask_bias is not None:
        scores = scores + key_mask_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _graphs_per_step(h: int, s_pad: int, dh: int) -> int:
    """Batch rows per grid step. Shared by forward and backward — the PRNG
    dropout mask is a function of (seed + step) over a (G*H*S, S) bits
    block, so both passes must tile B identically. Sized for the
    backward's (larger) working set."""
    per_g = (
        7 * h * s_pad * dh * 4  # q, k, v, g, dq, dk, dv
        + s_pad * 4  # key mask row
        + 5 * h * s_pad * s_pad * 4  # scores/exp/probs/ds/bits
    )
    return max(1, _VMEM_BUDGET // per_g)


def _make_fwd_kernel(scale, num_heads, rate, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, out_ref):
        h = num_heads
        gg, _, s, dh = q_ref.shape
        i = pl.program_id(0)
        q = q_ref[...].astype(jnp.float32) * scale
        k = k_ref[...].astype(jnp.float32)
        v = v_ref[...].astype(jnp.float32)
        # mask block is (g, 1, s): the singleton keeps the LAST TWO dims
        # (1, s) equal to the overall array dims, which is what Mosaic's
        # block-shape rule constrains — the leading g stays free
        mask = jnp.maximum(
            mask_ref[...].reshape(gg, s).astype(jnp.float32), MASK_BIAS
        )

        qb = q.reshape(gg * h, s, dh)
        kb = k.reshape(gg * h, s, dh)
        vb = v.reshape(gg * h, s, dh)
        scores = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(gg, h, s, s) + mask.reshape(gg, 1, 1, s)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), MASK_BIAS)
        p = jnp.exp(scores - m)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
            # 2D generation (Mosaic rejects 4D PRNG layouts), then a free
            # row-major split of the leading dim
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((gg * h * s, s)), jnp.uint32
            ).reshape(gg, h, s, s)
            threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
            p = jnp.where(bits >= threshold, p, 0.0) / (1.0 - rate)

        acc = jax.lax.dot_general(
            p.reshape(gg * h, s, s), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(gg, h, s, dh)
        out_ref[...] = (acc / denom).astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(scale, num_heads, rate, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(
        seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
        dq_ref, dk_ref, dv_ref,
    ):
        h = num_heads
        gg, _, s, dh = q_ref.shape
        i = pl.program_id(0)
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
        v = v_ref[...].astype(jnp.float32)
        gr = g_ref[...].astype(jnp.float32)
        mask = jnp.maximum(
            mask_ref[...].reshape(gg, s).astype(jnp.float32), MASK_BIAS
        )

        qb = (q * scale).reshape(gg * h, s, dh)
        kb = k.reshape(gg * h, s, dh)
        scores = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(gg, h, s, s) + mask.reshape(gg, 1, 1, s)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), MASK_BIAS)
        e = jnp.exp(scores - m)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        p_norm = e / denom

        grb = gr.reshape(gg * h, s, dh)
        vb = v.reshape(gg * h, s, dh)
        if rate > 0.0:
            # IDENTICAL mask to the forward: same (seed + step), same 2D
            # generation shape + reshape
            pltpu.prng_seed(seed_ref[0] + i)
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((gg * h * s, s)), jnp.uint32
            ).reshape(gg, h, s, s)
            keep = bits >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p_norm, 0.0) * inv
        else:
            pd = p_norm

        dv_ref[...] = jax.lax.dot_general(
            pd.reshape(gg * h, s, s), grb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(gg, h, s, dh).astype(dv_ref.dtype)
        dpd = jax.lax.dot_general(
            grb, vb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(gg, h, s, s)
        if rate > 0.0:
            dp_norm = jnp.where(keep, dpd, 0.0) * inv
        else:
            dp_norm = dpd
        ds = p_norm * (
            dp_norm - jnp.sum(dp_norm * p_norm, axis=-1, keepdims=True)
        )
        dsb = ds.reshape(gg * h, s, s)
        dq_ref[...] = (
            jax.lax.dot_general(
                dsb, kb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(gg, h, s, dh)
            * scale
        ).astype(dq_ref.dtype)
        # dk contracts with qb = q * scale, so the scale is already applied
        dk_ref[...] = (
            jax.lax.dot_general(
                dsb, qb, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(gg, h, s, dh)
        ).astype(dk_ref.dtype)

    return kernel


def _pad_inputs(q, k, v, mask, extra_batch=0):
    """Pad S to a sublane multiple (masking padded key columns) and B by
    ``extra_batch`` rows; always returns a concrete (B, S) mask."""
    bsz, h, s, dh = q.shape
    s_pad = -(-s // 8) * 8
    if mask is None:
        mask = jnp.zeros((bsz, s), jnp.float32)
    mask = mask.astype(jnp.float32)
    if s_pad != s:
        pad4 = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = (jnp.pad(x, pad4) for x in (q, k, v))
        mask = jnp.pad(
            mask, [(0, 0), (0, s_pad - s)], constant_values=MASK_BIAS
        )
    if extra_batch:
        q, k, v = (
            jnp.pad(x, [(0, extra_batch), (0, 0), (0, 0), (0, 0)])
            for x in (q, k, v)
        )
        mask = jnp.pad(mask, [(0, extra_batch), (0, 0)])
    return q, k, v, mask, s_pad


def _forward(q, k, v, mask, seed, rate, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, s, dh = q.shape
    s_pad = -(-s // 8) * 8
    g = min(_graphs_per_step(h, s_pad, dh), bsz)
    b_pad = -(-bsz // g) * g
    q, k, v, mask, s_pad = _pad_inputs(q, k, v, mask, b_pad - bsz)
    blk4 = lambda i: (i, 0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        _make_fwd_kernel(scale, h, rate, g),
        grid=(b_pad // g,),
        interpret=jax.default_backend() == "cpu",  # CPU: tests only
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((g, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (g, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, h, s_pad, dh), blk4, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, h, s_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * h * s_pad * s_pad * dh,
            bytes_accessed=4 * b_pad * h * s_pad * dh * q.dtype.itemsize,
            transcendentals=b_pad * h * s_pad * s_pad,
        ),
    )(seed.reshape(1), q, k, v, mask[:, None, :])
    return out[:bsz, :, :s, :]


def _backward(q, k, v, mask, seed, g_out, rate, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, s, dh = q.shape
    s_pad = -(-s // 8) * 8
    gper = min(_graphs_per_step(h, s_pad, dh), bsz)
    b_pad = -(-bsz // gper) * gper
    q, k, v, mask, s_pad = _pad_inputs(q, k, v, mask, b_pad - bsz)
    if b_pad != bsz or s_pad != s:
        g_out = jnp.pad(
            g_out,
            [(0, b_pad - bsz), (0, 0), (0, s_pad - s), (0, 0)],
        )
    blk4 = lambda i: (i, 0, 0, 0)  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        _make_bwd_kernel(scale, h, rate, gper),
        grid=(b_pad // gper,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (gper, 1, s_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((gper, h, s_pad, dh), blk4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, h, s_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((b_pad, h, s_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((b_pad, h, s_pad, dh), v.dtype),
        ],
    )(seed.reshape(1), q, k, v, mask[:, None, :], g_out)
    return tuple(x[:bsz, :, :s, :] for x in (dq, dk, dv))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _masked_attention(q, k, v, mask, seed, rate, scale):
    return _forward(q, k, v, mask, seed, rate, scale)


def _ma_fwd(q, k, v, mask, seed, rate, scale):
    out = _forward(q, k, v, mask, seed, rate, scale)
    return out, (q, k, v, mask, seed)


def _ma_bwd(rate, scale, res, g_out):
    q, k, v, mask, seed = res
    dq, dk, dv = _backward(q, k, v, mask, seed, g_out, rate, scale)
    return dq, dk, dv, None, None


_masked_attention.defvjp(_ma_fwd, _ma_bwd)


def masked_attention(
    q: jnp.ndarray,  # (B, H, S, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask_bias: Optional[jnp.ndarray] = None,  # (B, S) additive f32
    seed: Optional[jnp.ndarray] = None,  # int32, required when rate > 0
    rate: float = 0.0,
    scale: Optional[float] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Tower attention with automatic Pallas/XLA dispatch.

    Under a multi-device mesh the Pallas call is shard_mapped over the dp
    axis (batch-parallel; dropout seeds are decorrelated per shard)."""
    bsz, h, s, dh = q.shape
    scale = dh**-0.5 if scale is None else scale
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    kernel_ok = (
        use_pallas
        and (on_tpu or FORCE_KERNEL)
        and bsz > 0
        and s <= _MAX_WHOLE_S
    )
    if not kernel_ok:
        if rate > 0.0:
            raise ValueError(
                "masked_attention dropout requires the TPU kernel path; "
                "off-TPU callers must use the XLA softmax + FastDropout "
                "path (models/bert.py SelfAttention)"
            )
        return masked_attention_reference(q, k, v, key_mask_bias, scale)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    impl = lambda q_, k_, v_, m_, s_: _masked_attention(  # noqa: E731
        q_, k_, v_, m_, s_, rate, scale
    )

    from multimodaldiscussiontransformer_tpu.ops.tree_attention import (
        _dp_shard_spec,
        _shard_linear_index,
    )

    dp = _dp_shard_spec()
    if dp is not None and bsz % dp[1] == 0:
        from jax.sharding import PartitionSpec as P

        mesh, _, axes = dp
        if key_mask_bias is None:
            key_mask_bias = jnp.zeros((bsz, s), jnp.float32)

        def sharded(q_, k_, v_, m_, s_):
            # decorrelate dropout masks across dp shards (mask is a
            # function of seed + LOCAL grid step)
            s_ = s_ + _shard_linear_index(mesh, axes) * jnp.int32(1000003)
            return impl(q_, k_, v_, m_, s_)

        fn = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(axes),) * 4 + (P(),),
            out_specs=P(axes),
            check_vma=False,
        )
        return fn(q, k, v, key_mask_bias, seed)
    return impl(q, k, v, key_mask_bias, seed)
