"""Golden-parity tests vs HuggingFace PyTorch modules (SURVEY.md §4).

HF torch models are constructed locally from configs (random init, no
network); their state dicts are imported through utils/hf_import and outputs
compared element-wise. This pins the numerics contract the reference relies
on: exact-erf gelu, LN epsilon, pooler tanh, additive attention masks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import (
    BertTowerConfig,
    ViTTowerConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.models.bert import (
    BertBottomTower,
    BertPooler,
)
from multimodaldiscussiontransformer_tpu.models.vit import ViTBottomTower
from multimodaldiscussiontransformer_tpu.utils import hf_import as hfi

HIDDEN = 64
LAYERS = 4
HEADS = 4


def small_hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=128,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        max_position_embeddings=64,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        num_labels=2,
    )
    torch.manual_seed(0)
    return transformers.BertForSequenceClassification(cfg).eval(), cfg


def small_hf_vit():
    cfg = transformers.ViTConfig(
        image_size=32,
        patch_size=16,
        num_channels=3,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    return transformers.ViTModel(cfg).eval(), cfg


def tower_cfg_bert():
    return BertTowerConfig(
        vocab_size=128,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def tower_cfg_vit():
    return ViTTowerConfig(
        image_size=32,
        patch_size=16,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
    )


def test_bert_tower_matches_hf():
    hf, _ = small_hf_bert()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(0)
    b, t = 3, 12
    ids = rng.integers(0, 128, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[1, 8:] = 0
    tt = np.zeros((b, t), np.int32)

    with torch.no_grad():
        hf_out = hf.bert(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(tt.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = BertBottomTower(tower_cfg_bert(), num_layers=LAYERS)
    params = tower.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), deterministic=True,
    )
    # splice HF weights in
    host = jax.device_get(params)
    p = host["params"]
    p["embeddings"] = hfi.bert_embeddings_params(sd, "bert.embeddings")
    for i in range(LAYERS):
        p[f"layer_{i}"] = hfi.bert_layer_params(sd, f"bert.encoder.layer.{i}")
    out = tower.apply(
        host, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(mask),
        deterministic=True,
    )
    # only compare non-padded positions (HF computes padded ones too, but
    # they feed nothing downstream in either implementation)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], hf_out[m], rtol=2e-4, atol=2e-5
    )


def test_bert_pooler_and_classifier_match_hf():
    hf, _ = small_hf_bert()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(1)
    h = rng.standard_normal((5, 9, HIDDEN)).astype(np.float32)

    with torch.no_grad():
        pooled_t = hf.bert.pooler(torch.tensor(h)).numpy()
        logits_t = hf.classifier(torch.tensor(pooled_t)).numpy()

    pooler = BertPooler(HIDDEN)
    pp = pooler.init(jax.random.PRNGKey(0), jnp.asarray(h))
    host = jax.device_get(pp)
    host["params"]["dense"] = hfi._linear(sd, "bert.pooler.dense")
    pooled_j = np.asarray(pooler.apply(host, jnp.asarray(h)))
    np.testing.assert_allclose(pooled_j, pooled_t, rtol=2e-4, atol=2e-5)

    cls = hfi._linear(sd, "classifier")
    logits_j = pooled_j @ cls["kernel"] + cls["bias"]
    np.testing.assert_allclose(logits_j, logits_t, rtol=2e-4, atol=2e-5)


def test_vit_tower_matches_hf():
    hf, _ = small_hf_vit()
    sd = {"vit." + k: v.numpy() for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(2)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf(torch.tensor(px)).last_hidden_state.numpy()

    tower = ViTBottomTower(tower_cfg_vit(), num_layers=LAYERS)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(px), deterministic=True)
    host = jax.device_get(params)
    p = host["params"]
    p["embeddings"] = hfi.vit_embeddings_params(sd, "vit.embeddings")
    for i in range(LAYERS):
        p[f"layer_{i}"] = hfi.vit_layer_params(sd, f"vit.encoder.layer.{i}")
    p["layernorm"] = hfi._layernorm(sd, "vit.layernorm")
    out = np.asarray(tower.apply(host, jnp.asarray(px), deterministic=True))
    np.testing.assert_allclose(out, hf_out, rtol=2e-4, atol=2e-5)


def test_full_import_runs():
    """import_towers maps the split correctly into the tiny full model."""
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel

    cfg = tiny_model_config()
    # tiny config: towers have 4 layers, split = num_fusion_layers+1 = 3
    hf_bert, _ = small_hf_bert()
    hf_vit, _ = small_hf_vit()
    bert_sd = {k: v.numpy() for k, v in hf_bert.state_dict().items()}
    vit_sd = {"vit." + k: v.numpy() for k, v in hf_vit.state_dict().items()}

    items = synthetic_batch_items(
        2, seed=0, seq_len=12, vocab_size=128, image_shape=(3, 32, 32),
        max_nodes=6,
    )
    batch = collate(items, spatial_pos_max=5, image_shape=(3, 32, 32))
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    model = MDTModel(cfg)
    params = jax.device_get(
        model.init(jax.random.PRNGKey(0), jb, deterministic=True)
    )
    before = np.asarray(
        model.apply(params, jb, deterministic=True).logits
    )
    imported = hfi.import_towers(params, cfg, bert_sd, vit_sd)
    after_out = model.apply(imported, jb, deterministic=True)
    after = np.asarray(after_out.logits)
    assert np.isfinite(after[batch.node_mask]).all()
    assert not np.allclose(before, after)
