"""Micro-parity tests for the three riskiest oracle spots (VERDICT r1
item 7). Each test quotes the reference lines it pins and implements the
reference-side computation with the reference's own torch idioms
(masked_fill(-inf), boolean fancy indexing, finfo(half).min), NOT the
restated oracle of test_full_model_parity.py — so a shared misreading
between the oracle and the implementation cannot hide here.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 1. key-padding x attn_bias interplay
#    /root/reference/mDT/src/modules/multihead_attention.py:168-196:
#      attn_weights = bmm(q*scaling, k^T)            (134-139, 168)
#      attn_weights += attn_bias                     (173-175, may be -inf)
#      masked_fill(key_padding_mask, float("-inf"))  (180-187, AFTER bias)
#      utils.softmax(..., float32)                   (193-196)
# ---------------------------------------------------------------------------


def test_key_padding_after_bias_float32_softmax():
    rng = np.random.RandomState(0)
    b, h, s, dh = 2, 3, 5, 4
    q = rng.randn(b, h, s, dh).astype(np.float32)
    k = rng.randn(b, h, s, dh).astype(np.float32)
    v = rng.randn(b, h, s, dh).astype(np.float32)
    scaling = dh ** -0.5
    # bias carries real -inf (distance clipping / pad blocks, collator)
    bias = rng.randn(b, h, s, s).astype(np.float32)
    bias[0, :, :, 4] = -np.inf
    bias[1, :, 2, 3] = -np.inf
    key_pad = np.zeros((b, s), bool)
    key_pad[0, 4] = True  # pad col that ALSO has -inf bias
    key_pad[1, 3] = True  # pad col whose bias row is finite elsewhere

    # reference computation, verbatim idioms
    tw = torch.from_numpy(q * scaling) @ torch.from_numpy(k).transpose(-1, -2)
    tw = tw + torch.from_numpy(bias)
    tw = tw.masked_fill(
        torch.from_numpy(key_pad)[:, None, None, :], float("-inf")
    )
    tprobs = torch.softmax(tw.float(), dim=-1)
    tctx = tprobs @ torch.from_numpy(v)

    # our implementation's formulation (models/graphormer.py:245-252):
    # additive large-negative instead of masked_fill(-inf)
    from multimodaldiscussiontransformer_tpu.models.bert import MASK_BIAS

    s_j = jnp.einsum(
        "bhqd,bhkd->bhqk", jnp.asarray(q * scaling), jnp.asarray(k)
    ) + jnp.asarray(bias)
    s_j = jnp.where(jnp.asarray(key_pad)[:, None, None, :], MASK_BIAS, s_j)
    jprobs = jax.nn.softmax(s_j.astype(jnp.float32), axis=-1)
    jctx = jnp.einsum("bhqk,bhkd->bhqd", jprobs, jnp.asarray(v))

    np.testing.assert_allclose(
        np.asarray(jprobs), tprobs.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jctx), tctx.numpy(), rtol=1e-5, atol=1e-5
    )
    # masked columns are EXACTLY zero probability under both formulations
    assert float(jnp.abs(jprobs[0, :, :, 4]).max()) == 0.0
    assert float(tprobs[0, :, :, 4].abs().max()) == 0.0


def test_module_matches_reference_attention():
    """Drive the actual BiasedMultiheadAttention module and compare with a
    torch re-derivation from the reference lines (weights exported)."""
    from multimodaldiscussiontransformer_tpu.core.config import (
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.models.graphormer import (
        BiasedMultiheadAttention,
    )

    cfg = tiny_model_config()
    d, h = cfg.encoder_embed_dim, cfg.encoder_attention_heads
    b, s = 2, 6
    rng = np.random.RandomState(1)
    x = rng.randn(b, s, d).astype(np.float32)
    bias = rng.randn(b, h, s, s).astype(np.float32)
    bias[:, :, :, s - 1] = -np.inf
    key_pad = np.zeros((b, s), bool)
    key_pad[:, s - 1] = True

    mod = BiasedMultiheadAttention(cfg)
    params = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(bias),
        jnp.asarray(key_pad), deterministic=True,
    )
    out = np.asarray(
        mod.apply(params, jnp.asarray(x), jnp.asarray(bias),
                  jnp.asarray(key_pad), deterministic=True)
    )

    def lin(p):
        w = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
        bb = torch.from_numpy(np.asarray(p["bias"]).copy())
        return lambda t: t @ w.T + bb

    p = params["params"]
    tq = lin(p["q_proj"])(torch.from_numpy(x))
    tk = lin(p["k_proj"])(torch.from_numpy(x))
    tv = lin(p["v_proj"])(torch.from_numpy(x))
    dh = d // h
    # multihead_attention.py:134-156 reshapes + scaling on q
    tq = (tq * dh ** -0.5).view(b, s, h, dh).permute(0, 2, 1, 3)
    tk = tk.view(b, s, h, dh).permute(0, 2, 1, 3)
    tv = tv.view(b, s, h, dh).permute(0, 2, 1, 3)
    tw = tq @ tk.transpose(-1, -2) + torch.from_numpy(bias)
    tw = tw.masked_fill(
        torch.from_numpy(key_pad)[:, None, None, :], float("-inf")
    )
    tp = torch.softmax(tw.float(), dim=-1)
    tctx = (tp @ tv).permute(0, 2, 1, 3).reshape(b, s, d)
    tout = lin(p["out_proj"])(tctx).numpy()

    np.testing.assert_allclose(out, tout, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# 2. fp16-min fusion mask extension
#    /root/reference/mDT/src/modules/multigraphormer_graph_encoder.py:342-354:
#      added_mask = ones(n_graph, num_bottle_neck)
#      x_attention_mask = cat([added_mask, x_attention_mask], 1)
#      extended = (1.0 - mask[:, None, None, :]) * finfo(half).min
# ---------------------------------------------------------------------------


def test_fusion_mask_extension_matches_half_min():
    from multimodaldiscussiontransformer_tpu.models.bert import (
        attention_mask_bias,
    )

    rng = np.random.RandomState(2)
    n, nbn, t, s_heads = 3, 2, 5, 2
    am = rng.randint(0, 2, (n, t)).astype(np.float32)
    am[1] = 0.0  # a fully-padded text row: bottleneck cols keep it alive

    # reference extension (half.min scale)
    added = torch.ones(n, nbn)
    full = torch.cat([added, torch.from_numpy(am)], dim=1)
    ext_ref = (1.0 - full[:, None, None, :]) * torch.finfo(torch.half).min

    # ours (MASK_BIAS scale)
    full_j = jnp.concatenate(
        [jnp.ones((n, nbn), jnp.float32), jnp.asarray(am)], axis=1
    )
    ext_ours = attention_mask_bias(full_j, jnp.float32)

    # the additive constants differ (-65504 vs -1e9) but the float32-softmax
    # results are identical: masked columns underflow to exactly 0
    scores = rng.randn(n, s_heads, nbn + t, nbn + t).astype(np.float32)
    p_ref = torch.softmax(
        torch.from_numpy(scores) + ext_ref.float(), dim=-1
    ).numpy()
    p_ours = np.asarray(
        jax.nn.softmax(jnp.asarray(scores) + ext_ours, axis=-1)
    )
    np.testing.assert_allclose(p_ours, p_ref, rtol=1e-6, atol=1e-7)
    # masked cols exactly zero under both
    masked_cols = np.flatnonzero(am[0] == 0) + nbn
    assert p_ref[0, :, :, masked_cols].max() == 0.0
    assert p_ours[0, :, :, masked_cols].max() == 0.0
    # bottleneck columns are NEVER masked, even for all-pad text rows
    assert (p_ours[1, :, :, :nbn] > 0).all()


# ---------------------------------------------------------------------------
# 3. bottleneck scatter order
#    /root/reference/mDT/src/modules/multigraphormer_graph_encoder.py:
#      363-371: graph_data = zeros(B, Nmax, D); graph_data[mask] = bn[:, 0]
#      423-425: bottle_neck[:, 0, :] = x[mask, :]   (mask has CLS col False)
#      435-437: x[mask, :] = bottle_neck[:, 0, :]
#    Boolean fancy indexing enumerates True positions in row-major order ==
#    (graph-major, node-ascending) == the collator's flat buffer order.
# ---------------------------------------------------------------------------


def test_bottleneck_scatter_gather_matches_boolean_indexing():
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )

    items = synthetic_batch_items(
        4, seed=3, min_nodes=2, max_nodes=7, seq_len=8, vocab_size=64,
        image_shape=(3, 16, 16),
    )
    batch = collate(
        items,
        node_buckets=(8,),
        node_capacity_buckets=(32,),
        image_capacity_buckets=(0, 8),
        label_capacity_buckets=(16,),
        image_shape=(3, 16, 16),
    )
    bsz, nmax = batch.grid_mask.shape
    cap = batch.node_capacity
    d = 5
    rng = np.random.RandomState(4)
    bn0 = rng.randn(cap, d).astype(np.float32)  # bottleneck token 0 buffer
    # padded flat slots must stay inert in the scatter
    bn0[~batch.node_mask] = rng.randn((~batch.node_mask).sum(), d)

    mask = torch.from_numpy(batch.grid_mask)  # (B, Nmax) bool
    n_real = int(batch.node_mask.sum())

    # ref 363-371: scatter flat -> grid
    grid_ref = torch.zeros(bsz, nmax, d)
    grid_ref[mask] = torch.from_numpy(bn0[:n_real])

    flat_idx = jnp.asarray(batch.node_graph) * nmax + jnp.asarray(
        batch.node_pos
    )
    grid_ours = (
        jnp.zeros((bsz * nmax, d))
        .at[flat_idx]
        .set(jnp.asarray(bn0), mode="drop")
        .reshape(bsz, nmax, d)
    )
    np.testing.assert_allclose(np.asarray(grid_ours), grid_ref.numpy())

    # ref 423-425: gather grid (with CLS col) -> flat, row-major
    x = rng.randn(bsz, nmax + 1, d).astype(np.float32)
    cls_false = torch.zeros(bsz, 1, dtype=torch.bool)
    mask_cls = torch.cat([cls_false, mask], dim=1)
    gathered_ref = torch.from_numpy(x)[mask_cls].numpy()

    gathered_ours = np.asarray(
        jnp.asarray(x[:, 1:, :])
        .reshape(bsz * nmax, d)
        .at[flat_idx]
        .get(mode="fill", fill_value=0)
    )
    np.testing.assert_allclose(gathered_ours[:n_real], gathered_ref)
    # padded flat slots gather exactly zero
    assert np.all(gathered_ours[n_real:] == 0)

    # ref 435-437: write-back keeps CLS row untouched, pads untouched
    xt = torch.from_numpy(x.copy())
    xt[mask_cls] = torch.from_numpy(bn0[:n_real])
    tail_ours = (
        jnp.asarray(x[:, 1:, :])
        .reshape(bsz * nmax, d)
        .at[flat_idx]
        .set(jnp.asarray(bn0), mode="drop")
        .reshape(bsz, nmax, d)
    )
    x_ours = np.concatenate([x[:, :1, :], np.asarray(tail_ours)], axis=1)
    np.testing.assert_allclose(x_ours, xt.numpy())
