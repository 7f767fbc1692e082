"""Tower fused masked attention (ops/masked_attention.py): kernel parity
vs the XLA reference, custom-VJP grads, shard_map dispatch, and the
SelfAttention module routing (models/bert.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodaldiscussiontransformer_tpu.ops import masked_attention as ma


def _rand_inputs(seed, b, h, s, dh, masked=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    mask = None
    if masked:
        # per-key additive bias: 0 for real tokens, -1e9 for padding, with
        # at least one real token per row
        keep = rng.random((b, s)) < 0.7
        keep[:, 0] = True
        mask = jnp.where(jnp.asarray(keep), 0.0, ma.MASK_BIAS).astype(
            jnp.float32
        )
    return q, k, v, mask


@pytest.mark.parametrize(
    "b,h,s,dh,masked",
    [
        (3, 2, 16, 8, True),  # aligned S
        (5, 3, 17, 8, True),  # S needs sublane padding, B not divisible
        (2, 2, 12, 8, False),  # no mask (ViT path)
    ],
)
def test_kernel_matches_reference(monkeypatch, b, h, s, dh, masked):
    monkeypatch.setattr(ma, "FORCE_KERNEL", True)
    q, k, v, mask = _rand_inputs(0, b, h, s, dh, masked)
    ref = ma.masked_attention_reference(q, k, v, mask)
    got = ma.masked_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_kernel_fully_masked_row_is_finite(monkeypatch):
    """A row whose every key is padding must degrade to finite output
    (uniform attention), not NaN — mirrors the graph kernels' contract."""
    monkeypatch.setattr(ma, "FORCE_KERNEL", True)
    q, k, v, _ = _rand_inputs(1, 2, 2, 9, 8, masked=False)
    mask = jnp.full((2, 9), ma.MASK_BIAS, jnp.float32)
    got = np.asarray(ma.masked_attention(q, k, v, mask))
    assert np.isfinite(got).all()


def test_kernel_grads_match_reference(monkeypatch):
    monkeypatch.setattr(ma, "FORCE_KERNEL", True)
    q, k, v, mask = _rand_inputs(2, 3, 2, 13, 8, masked=True)

    def f_ref(q, k, v):
        return jnp.sum(ma.masked_attention_reference(q, k, v, mask) ** 2)

    def f_fused(q, k, v):
        return jnp.sum(ma.masked_attention(q, k, v, mask) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-4, atol=2e-5
        )


def test_shard_map_dispatch_on_mesh(monkeypatch):
    """Under a dp mesh the kernel is shard_mapped over the batch axis; the
    sharded result must match the single-device reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(ma, "FORCE_KERNEL", True)
    q, k, v, mask = _rand_inputs(3, 8, 2, 9, 8, masked=True)
    ref = np.asarray(ma.masked_attention_reference(q, k, v, mask))

    mesh = make_mesh(4, 2)
    with jax.sharding.set_mesh(mesh):
        dp_shard = NamedSharding(mesh, P("dp"))
        args = [jax.device_put(x, dp_shard) for x in (q, k, v, mask)]
        out = jax.jit(lambda *a: ma.masked_attention(*a))(*args)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)


def test_dropout_off_tpu_raises():
    """rate > 0 must not silently fall back off-TPU — the module keeps the
    XLA+FastDropout path there; calling the op directly is an error."""
    q, k, v, mask = _rand_inputs(4, 2, 2, 8, 8, masked=True)
    with pytest.raises(ValueError, match="dropout requires the TPU kernel"):
        ma.masked_attention(
            q, k, v, mask, seed=jnp.zeros((1,), jnp.int32), rate=0.1
        )


def test_self_attention_module_kernel_path(monkeypatch):
    """SelfAttention with use_pallas routes through the kernel (FORCE_KERNEL
    on CPU, deterministic) and matches the XLA path bit-for-bit in shape and
    numerically in value."""
    import multimodaldiscussiontransformer_tpu.models.bert as bert_mod

    monkeypatch.setattr(ma, "FORCE_KERNEL", True)
    rng = np.random.default_rng(5)
    b, s, d, h = 3, 17, 32, 4
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    attn_mask = jnp.asarray(
        (rng.random((b, s)) < 0.8).astype(np.float32)
    ).at[:, 0].set(1.0)
    bias = bert_mod.attention_mask_bias(attn_mask, jnp.float32)

    mod_xla = bert_mod.SelfAttention(d, h, 0.0, use_pallas=False)
    params = mod_xla.init(jax.random.PRNGKey(0), hidden, bias)
    out_xla = mod_xla.apply(params, hidden, bias, deterministic=True)

    mod_pl = bert_mod.SelfAttention(d, h, 0.0, use_pallas=True)
    out_pl = mod_pl.apply(params, hidden, bias, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pl), rtol=2e-5, atol=2e-6
    )


def test_full_model_tower_kernel_matches_xla(monkeypatch):
    """Full MDT forward with tower Pallas attention on vs off (deterministic,
    CPU interpret kernel) must agree — proves the flag threads through
    BertLayer/ViTLayer/fusion and changes numerics by rounding only."""
    import dataclasses as dc

    from multimodaldiscussiontransformer_tpu.core.config import (
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel

    monkeypatch.setattr(ma, "FORCE_KERNEL", True)
    img = (3, 32, 32)
    cfg = tiny_model_config()
    cfg_off = cfg.replace(
        text_tower=dc.replace(cfg.text_tower, use_pallas_attention=False),
        image_tower=dc.replace(cfg.image_tower, use_pallas_attention=False),
    )
    cfg_on = cfg.replace(
        text_tower=dc.replace(cfg.text_tower, use_pallas_attention=True),
        image_tower=dc.replace(cfg.image_tower, use_pallas_attention=True),
    )
    items = synthetic_batch_items(
        2, seed=7, seq_len=12, vocab_size=128, image_shape=img, max_nodes=8,
        image_prob=0.5,
    )
    batch = collate(items, spatial_pos_max=5, image_shape=img)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}

    m_off = MDTModel(cfg_off)
    params = m_off.init(jax.random.PRNGKey(0), jb, deterministic=True)
    out_off = m_off.apply(params, jb, deterministic=True)
    out_on = MDTModel(cfg_on).apply(params, jb, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_off.logits)[batch.node_mask],
        np.asarray(out_on.logits)[batch.node_mask],
        rtol=2e-4, atol=2e-5,
    )
