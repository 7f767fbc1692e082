"""Ring (sequence-parallel) tree attention over a mesh axis.

The reference's scaling axis is tree size (SURVEY.md §2.4: text is fixed at
100 tokens, hateful_discussions.py:165; trees are pruned, 3-prune-trees.py:
16-39), and a single chip's streaming kernel (ops/tree_attention.py flash
path) already covers any tree whose O(S^2) spatial-bias structure fits one
HBM. This module covers the regime past that: shard the node axis S over a
mesh axis and rotate key/value blocks around the ring with
``jax.lax.ppermute``, combining per-block partial softmaxes online — the
blockwise/ring-attention construction, specialized to the mDT compact bias:

- every device holds its q-row block of q/k/v AND its q-row STRIP of the
  (B, S, S) template/ids (so the quadratic bias structure is itself sharded
  1/n per device — the actual memory win of sequence parallelism here);
- k/v blocks travel the ring; the matching bias COLUMNS are a dynamic
  slice of the local row strip, so only (B, H, S/n, dh) tensors ever move
  over ICI;
- the per-step local computation reuses the compact-bias assembly
  (template + LUT[ids]) and an online-softmax accumulator, exactly the
  flash kernel's math at block granularity.

Differentiable end to end: the body is scan + ppermute + einsum, all of
which JAX autodiff reverses (the ppermute transposes to the inverse ring),
so sequence-parallel TRAINING falls out for free — autodiff residuals are
O(S^2/n) per device, the same scaling as the sharded bias
(tests/test_ring_attention.py::test_ring_gradients_match_reference).
XLA-level implementation (matmuls + ppermute) — the per-device block work
is itself large enough to hit the MXU without a custom kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multimodaldiscussiontransformer_tpu.ops.tree_attention import (
    MASK_BIAS,
)


def _block_bias(tpl_cols, ids_cols, lut, double_add):
    """(B, Sq_loc, C) template/id columns -> (B, H, Sq_loc, C) bias."""
    t = jnp.maximum(tpl_cols.astype(jnp.float32), MASK_BIAS)
    lut = lut.at[0].set(0.0)
    gathered = jnp.take(lut, ids_cols, axis=0)  # (B, Sq, C, H)
    return gathered.transpose(0, 3, 1, 2) + (
        (2.0 if double_add else 1.0) * t[:, None]
    )


def ring_tree_attention_local(
    q, k, v, tpl_strip, ids_strip, lut,
    axis_name: str,
    scale: Optional[float] = None,
    double_add: bool = True,
    dropout_seed=None,
    dropout_rate: float = 0.0,
):
    """Per-device body — call INSIDE ``shard_map`` with S sharded over
    ``axis_name``.

    Args (local shards):
      q, k, v: (B, H, S/n, dh) — this device's node block;
      tpl_strip, ids_strip: (B, S/n, S) — this device's q-row strip of the
        GLOBAL (B, S, S) template/ids;
      lut: (LUT_SIZE, H), replicated;
      dropout_seed/dropout_rate: optional ATTENTION-PROB dropout
        (multihead_attention.py:196 semantics): masks are regenerated per
        (q-block, k-block) tile from the seed, applied to the unnormalized
        probs feeding the value accumulator but NOT to the softmax
        normalizer — algebraically dropout(softmax(s)) @ v, tile by tile.
    Returns the local (B, H, S/n, dh) attention output.
    """
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, sq, dh = q.shape
    chunk = sq  # k-block length == q-block length (uniform shard)

    qf = q.astype(jnp.float32) * scale
    use_dropout = dropout_seed is not None and dropout_rate > 0.0
    if use_dropout:
        base_key = jax.random.fold_in(
            jax.random.PRNGKey(jnp.asarray(dropout_seed, jnp.uint32)[()]), my
        )

    def step(carry, _):
        kb, vb, src, m, l, acc = carry
        # bias columns for the k-block currently held (global block `src`)
        start = src * chunk
        tpl_j = jax.lax.dynamic_slice_in_dim(tpl_strip, start, chunk, axis=2)
        ids_j = jax.lax.dynamic_slice_in_dim(ids_strip, start, chunk, axis=2)
        bias = _block_bias(tpl_j, ids_j, lut, double_add)
        s = (
            jnp.einsum("bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32))
            + bias
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if use_dropout:
            keep = jax.random.bernoulli(
                jax.random.fold_in(base_key, src),
                1.0 - dropout_rate,
                (b, h, sq, chunk),
            )
            pv = p * keep.astype(p.dtype) / (1.0 - dropout_rate)
        else:
            pv = p
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", pv, vb.astype(jnp.float32)
        )
        # rotate the k/v block one hop around the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        src = (src - 1) % n  # we now hold our left neighbour's old block
        return (kb, vb, src, m_new, l, acc), None

    init = (
        k, v, my,
        jnp.full((b, h, sq, 1), MASK_BIAS, jnp.float32),
        jnp.zeros((b, h, sq, 1), jnp.float32),
        jnp.zeros((b, h, sq, dh), jnp.float32),
    )
    (kb, vb, src, m, l, acc), _ = jax.lax.scan(step, init, None, length=n)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def _sp_shard_spec():
    """If tracing inside a mesh with an 'sp' axis (> 1), return
    (mesh, sp_size); else None — the ambient-mesh probe that lets the model
    route attention through the ring without threading a Mesh object
    through module configs (same idiom as tree_attention._dp_shard_spec;
    sees both set_mesh and classic ``with mesh:`` contexts)."""
    from multimodaldiscussiontransformer_tpu.ops.tree_attention import (
        ambient_mesh,
    )

    mesh = ambient_mesh()
    if mesh is not None and "sp" in mesh.shape and mesh.shape["sp"] > 1:
        return mesh, mesh.shape["sp"]
    return None


def ring_tree_attention_dispatch(
    q, k, v, template, ids, lut,
    scale: Optional[float] = None,
    double_add: bool = True,
    dropout_seed=None,
    dropout_rate: float = 0.0,
):
    """Model-facing entry: ring attention over the ambient mesh's 'sp' axis.

    Called from ``BiasedMultiheadAttention`` when
    ``ModelConfig.sequence_parallel`` is on and the surrounding mesh has an
    sp axis (``parallel.mesh.make_mesh(sp_size>1)``). Handles the static
    plumbing the raw ring body can't:

    - pads S up to a multiple of sp with inert slots (template columns at
      ``MASK_BIAS`` so padded keys are ignored; padded query rows produce
      garbage that is sliced off);
    - shards B over 'dp' when divisible (batch parallelism composes with
    - the ring), S over 'sp';
    - optional in-ring attention-prob dropout (seed + rate).

    q, k, v: (B, H, S, dh); template/ids: (B, S, S); lut replicated.
    """
    spm = _sp_shard_spec()
    if spm is None:
        raise ValueError(
            "ring_tree_attention_dispatch requires an ambient mesh with an "
            "'sp' axis (make_mesh(..., sp_size>1))"
        )
    mesh, n = spm
    b, h, s, dh = q.shape
    pad = (-s) % n
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        tpl = jnp.pad(
            template.astype(jnp.float32),
            ((0, 0), (0, pad), (0, pad)),
            constant_values=MASK_BIAS,
        )
        idp = jnp.pad(ids, ((0, 0), (0, pad), (0, pad)))
    else:
        qp, kp, vp, tpl, idp = q, k, v, template.astype(jnp.float32), ids

    baxes = tuple(
        a for a in ("dcn", "dp") if a in mesh.shape and mesh.shape[a] > 1
    )
    bsize = 1
    for a in baxes:
        bsize *= mesh.shape[a]
    bax = baxes if baxes and b % bsize == 0 else None

    seed_arr = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    ).reshape(())

    def local(q_, k_, v_, t_, i_, l_, sd_):
        if dropout_seed is not None and bax:
            # decorrelate masks across dp/dcn batch shards (the seed is
            # replicated and the local ring only folds in the sp index) —
            # same recipe as tree_attention's _shard_linear_index offset
            from multimodaldiscussiontransformer_tpu.ops.tree_attention import (
                _shard_linear_index,
            )

            sd_ = sd_ + _shard_linear_index(mesh, bax) * jnp.int32(1000003)
        return ring_tree_attention_local(
            q_, k_, v_, t_, i_, l_,
            axis_name="sp",
            scale=scale,
            double_add=double_add,
            dropout_seed=(sd_ if dropout_seed is not None else None),
            dropout_rate=dropout_rate,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(bax, None, "sp", None),
            P(bax, None, "sp", None),
            P(bax, None, "sp", None),
            P(bax, "sp", None),
            P(bax, "sp", None),
            P(),
            P(),
        ),
        out_specs=P(bax, None, "sp", None),
        check_vma=False,
    )
    out = fn(qp, kp, vp, tpl, idp, jnp.asarray(lut), seed_arr)
    return out[:, :, :s, :] if pad else out


def ring_tree_attention(
    q, k, v, template, ids, lut,
    mesh: Mesh,
    axis_name: str = "dp",
    scale: Optional[float] = None,
    double_add: bool = True,
):
    """Convenience wrapper: shard the global (B, H, S, dh)/(B, S, S) inputs
    over ``axis_name`` and run the ring. S must divide the axis size."""
    n = mesh.shape[axis_name]
    s = q.shape[2]
    if s % n:
        raise ValueError(f"S={s} not divisible by {axis_name} size {n}")

    fn = jax.shard_map(
        functools.partial(
            ring_tree_attention_local,
            axis_name=axis_name,
            scale=scale,
            double_add=double_add,
        ),
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name, None),  # q rows
            P(None, None, axis_name, None),  # k rows (initial block = own)
            P(None, None, axis_name, None),  # v rows
            P(None, axis_name, None),  # template q-row strips
            P(None, axis_name, None),  # ids q-row strips
            P(),  # lut replicated
        ),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )
    with mesh:
        return fn(q, k, v, template, ids, jnp.asarray(lut))
