"""Compact-bias tree attention: equivalence to the full-bias path."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import tiny_model_config
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_batch_items
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta

IMG = (3, 32, 32)


def test_compact_assembly_matches_full():
    """XLA-assembled bias from (template, ids, lut) must equal the module's
    full GraphAttnBias output."""
    from multimodaldiscussiontransformer_tpu.models.graphormer import GraphAttnBias

    cfg = tiny_model_config()
    items = synthetic_batch_items(
        2, seed=0, seq_len=12, vocab_size=128, image_shape=IMG, max_nodes=7
    )
    batch = collate(items, spatial_pos_max=5, image_shape=IMG)
    template = jnp.asarray(batch.attn_bias)
    spatial = jnp.asarray(batch.spatial_pos)

    mod = GraphAttnBias(cfg)
    params = mod.init(jax.random.PRNGKey(0), template, spatial)
    full = mod.apply(params, template, spatial)
    tpl, ids, lut = mod.apply(
        params, template, spatial, method=GraphAttnBias.compact_inputs
    )
    assembled = ta._assemble_bias_xla(tpl, ids, lut, cfg.double_add_attn_bias)
    f = np.asarray(full, np.float32)
    a = np.asarray(assembled, np.float32)
    # -inf in the full path becomes large-negative in the compact path;
    # compare only where the full bias is finite, and check masked slots are
    # hugely negative in both
    finite = np.isfinite(f)
    np.testing.assert_allclose(a[finite], f[finite], rtol=1e-5, atol=1e-6)
    assert (a[~finite] < -1e8).all()


def test_model_compact_path_matches_full():
    """Full model forward with use_pallas_attention=True (compact path, XLA
    fallback on CPU) must match the default path."""
    cfg = tiny_model_config()
    items = synthetic_batch_items(
        2, seed=1, seq_len=12, vocab_size=128, image_shape=IMG, max_nodes=8,
        image_prob=0.5,
    )
    batch = collate(items, spatial_pos_max=5, image_shape=IMG)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}

    m_full = MDTModel(cfg)
    params = m_full.init(jax.random.PRNGKey(0), jb, deterministic=True)
    out_full = m_full.apply(params, jb, deterministic=True)

    m_compact = MDTModel(cfg.replace(use_pallas_attention=True))
    out_compact = m_compact.apply(params, jb, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out_full.logits)[batch.node_mask],
        np.asarray(out_compact.logits)[batch.node_mask],
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_full.global_embedding),
        np.asarray(out_compact.global_embedding),
        rtol=2e-4, atol=2e-5,
    )


def test_tree_attention_grads():
    """Custom VJP (incl. d_lut segment-sum) matches autodiff of the
    reference assembly."""
    rng = np.random.default_rng(0)
    b, h, s, dh = 2, 3, 9, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    template = jnp.asarray(rng.standard_normal((b, s, s)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 22, (b, s, s)), jnp.int32)
    lut = jnp.asarray(rng.standard_normal((ta.LUT_SIZE, h)), jnp.float32)
    scale = dh**-0.5

    def f_ref(q, k, v, lut):
        return jnp.sum(
            ta.tree_attention_reference(q, k, v, template, ids, lut, scale) ** 2
        )

    def f_fused(q, k, v, lut):
        return jnp.sum(
            ta._tree_attention(q, k, v, template, ids, lut, scale, True) ** 2
        )

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, lut)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, lut)
    for a, b_ in zip(g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-4, atol=2e-5
        )


def test_shard_map_dispatch_on_mesh(monkeypatch):
    """Under a dp mesh the kernel is shard_mapped over the batch axis; the
    sharded result must match the single-device reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(ta, "FORCE_KERNEL", True)
    rng = np.random.default_rng(3)
    b, h, s, dh = 8, 2, 9, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    template = jnp.asarray(rng.standard_normal((b, s, s)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 22, (b, s, s)), jnp.int32)
    lut = jnp.asarray(rng.standard_normal((ta.LUT_SIZE, h)), jnp.float32)
    lut = lut.at[0].set(0.0)

    ref = np.asarray(ta.tree_attention_reference(q, k, v, template, ids, lut))

    mesh = make_mesh(4, 2)
    with jax.sharding.set_mesh(mesh):
        dp_shard = NamedSharding(mesh, P("dp"))
        args = [jax.device_put(x, dp_shard) for x in (q, k, v, template, ids)]
        lut_r = jax.device_put(lut, NamedSharding(mesh, P()))
        out = jax.jit(
            lambda *a: ta.tree_attention(*a, use_pallas=True)
        )(*args, lut_r)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)


def _rand_inputs(seed, b, h, s, dh):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    template = jnp.where(
        jnp.asarray(rng.random((b, s, s))) < 0.15, ta.MASK_BIAS, 0.0
    ).astype(jnp.float32)
    template = template.at[:, :, 0].set(0.0)  # graph-token col never masked
    ids = jnp.asarray(rng.integers(0, ta.LUT_SIZE, (b, s, s)), jnp.int32)
    lut = jnp.asarray(rng.standard_normal((ta.LUT_SIZE, h)), jnp.float32)
    lut = lut.at[0].set(0.0)
    return q, k, v, template, ids, lut


def test_batched_small_s_kernel_matches_reference():
    """The G-graphs-x-all-heads kernel (s_pad <= 128 path), incl. a batch
    size that does not divide the graphs-per-step block."""
    q, k, v, template, ids, lut = _rand_inputs(5, b=5, h=3, s=17, dh=8)
    scale = q.shape[-1] ** -0.5
    ref = ta.tree_attention_reference(q, k, v, template, ids, lut, scale, True)
    got = ta._tree_forward(q, k, v, template, ids, lut, scale, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_streaming_kernel_matches_reference(monkeypatch):
    """The streaming kernel (giant-S path), forced at a toy size with a
    tile smaller than S so the online-softmax accumulation is exercised
    across multiple k tiles."""
    monkeypatch.setattr(ta, "_FLASH_MIN_S", 16)
    monkeypatch.setattr(ta, "_FLASH_TILE", 16)
    q, k, v, template, ids, lut = _rand_inputs(6, b=2, h=2, s=40, dh=8)
    scale = q.shape[-1] ** -0.5
    ref = ta.tree_attention_reference(q, k, v, template, ids, lut, scale, True)
    got = ta._tree_forward(q, k, v, template, ids, lut, scale, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_streaming_backward_matches_reference(monkeypatch):
    """Gradients through the streaming backward (LSE + dq/dLUT + dk/dv
    passes) must match autodiff through the XLA reference, forced at a toy
    size with multiple tiles in both q and k."""
    monkeypatch.setattr(ta, "_FLASH_MIN_S", 16)
    monkeypatch.setattr(ta, "_FLASH_TILE", 16)
    q, k, v, template, ids, lut = _rand_inputs(7, b=2, h=3, s=40, dh=8)
    scale = q.shape[-1] ** -0.5

    def loss_fused(q, k, v, lut):
        out = ta._tree_attention(q, k, v, template, ids, lut, scale, True)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def loss_ref(q, k, v, lut):
        out = ta.tree_attention_reference(
            q, k, v, template, ids, lut, scale, True
        )
        return jnp.sum(out * jnp.cos(out))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, lut)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, lut)
    for name, a, b in zip("q k v lut".split(), g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name}",
        )
