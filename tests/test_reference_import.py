"""Reference-checkpoint import: export -> import round trip + legacy qkv
upgrade hook."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import tiny_model_config
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_batch_items
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.utils import reference_import as ri

IMG = (3, 32, 32)


def make_model_and_params(seed=0):
    cfg = tiny_model_config()
    items = synthetic_batch_items(
        2, seed=seed, seq_len=12, vocab_size=128, image_shape=IMG, max_nodes=6,
        image_prob=0.5,
    )
    batch = collate(items, spatial_pos_max=5, image_shape=IMG)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    model = MDTModel(cfg)
    params = jax.device_get(model.init(jax.random.PRNGKey(seed), jb, deterministic=True))
    return cfg, model, params, batch, jb


def tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_export_import_roundtrip():
    cfg, model, params, batch, jb = make_model_and_params(0)
    sd = ri.export_reference_state_dict(params, cfg)
    # keys follow the reference module tree
    assert "encoder.graph_encoder.bottle_neck.weight" in sd
    assert "encoder.graph_encoder.layers.0.layers.0.self_attn.q_proj.weight" in sd
    assert (
        "encoder.graph_encoder.fusion_layers.0.fusion_layers.0.bert_encoder."
        "attention.self.query.weight" in sd
    )

    # import into a DIFFERENTLY-initialized model: must reproduce the
    # original params and therefore the original logits
    _, _, params2, _, _ = make_model_and_params(1)
    assert not tree_equal(params, params2)
    imported = ri.import_reference_checkpoint(params2, cfg, sd)
    assert tree_equal(params, imported)

    out_orig = model.apply(params, jb, deterministic=True)
    out_imp = model.apply(imported, jb, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_orig.logits)[batch.node_mask],
        np.asarray(out_imp.logits)[batch.node_mask],
        rtol=1e-6,
    )


def test_vestigial_keys_ignored():
    """Reference checkpoints carry vestigial params; import must not choke."""
    cfg, model, params, batch, jb = make_model_and_params(0)
    sd = ri.export_reference_state_dict(params, cfg)
    d = cfg.encoder_embed_dim
    sd["encoder.embed_out.weight"] = np.zeros((2, d), np.float32)
    sd["encoder.lm_output_learned_bias"] = np.zeros((1,), np.float32)
    sd["encoder.masked_lm_pooler.weight"] = np.zeros((d, d), np.float32)
    sd[
        "encoder.graph_encoder.fusion_layers.0.fusion_layers.0.bert_projection.weight"
    ] = np.zeros((d, d), np.float32)
    sd["encoder.graph_encoder.graph_node_feature.atom_encoder.weight"] = np.zeros(
        (16, d), np.float32
    )
    _, _, params2, _, _ = make_model_and_params(2)
    imported = ri.import_reference_checkpoint(params2, cfg, sd)
    assert tree_equal(params, imported)


def test_legacy_qkv_upgrade():
    """in_proj_weight/bias split (multihead_attention.py:219-248)."""
    rng = np.random.default_rng(0)
    d = 8
    w = rng.standard_normal((3 * d, d)).astype(np.float32)
    b = rng.standard_normal(3 * d).astype(np.float32)
    sd = {
        "encoder.graph_encoder.layers.0.layers.0.self_attn.in_proj_weight": w,
        "encoder.graph_encoder.layers.0.layers.0.self_attn.in_proj_bias": b,
    }
    up = ri.upgrade_legacy_qkv(sd)
    base = "encoder.graph_encoder.layers.0.layers.0.self_attn."
    np.testing.assert_array_equal(up[base + "q_proj.weight"], w[:d])
    np.testing.assert_array_equal(up[base + "k_proj.weight"], w[d : 2 * d])
    np.testing.assert_array_equal(up[base + "v_proj.weight"], w[2 * d :])
    np.testing.assert_array_equal(up[base + "q_proj.bias"], b[:d])
    assert base + "in_proj_weight" not in up
    assert base + "in_proj_bias" not in up


def test_fairseq_checkpoint_wrapper():
    """FairSeq saves {'model': state_dict, ...}; import must unwrap it."""
    cfg, model, params, batch, jb = make_model_and_params(0)
    sd = ri.export_reference_state_dict(params, cfg)
    ckpt = {"model": sd, "args": None, "optimizer_history": []}
    _, _, params2, _, _ = make_model_and_params(3)
    imported = ri.import_reference_checkpoint(params2, cfg, ckpt)
    assert tree_equal(params, imported)
