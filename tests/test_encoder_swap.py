"""Encoder-swap ablation parity: RoBERTa text tower and CLIP-ViT image tower
vs locally-constructed HF torch models (BASELINE.json 'encoder-swap
ablation' config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import (
    clip_vit_tower_config,
    roberta_tower_config,
)
from multimodaldiscussiontransformer_tpu.models.bert import BertBottomTower
from multimodaldiscussiontransformer_tpu.models.vit import ViTBottomTower
from multimodaldiscussiontransformer_tpu.utils import hf_import as hfi

HIDDEN = 64
LAYERS = 3
HEADS = 4


def test_roberta_tower_matches_hf():
    cfg = transformers.RobertaConfig(
        vocab_size=200,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        max_position_embeddings=66,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(3)
    hf = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()
    sd = {"roberta." + k: v.numpy() for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(0)
    b, t = 3, 12
    ids = rng.integers(2, 200, size=(b, t)).astype(np.int32)
    ids[1, 8:] = 1  # pad
    mask = (ids != 1).astype(np.int32)
    tt = np.zeros((b, t), np.int32)

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower_cfg = roberta_tower_config(
        vocab_size=200,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        max_position_embeddings=66,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    tower = BertBottomTower(tower_cfg, num_layers=LAYERS)
    params = tower.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), deterministic=True,
    )
    host = jax.device_get(params)
    p = host["params"]
    p["embeddings"] = hfi.roberta_embeddings_params(sd)
    for i in range(LAYERS):
        p[f"layer_{i}"] = hfi.bert_layer_params(sd, f"roberta.encoder.layer.{i}")
    out = np.asarray(
        tower.apply(
            host, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(mask),
            deterministic=True,
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], hf_out[m], rtol=2e-4, atol=3e-5)


def test_clip_vit_tower_matches_hf():
    cfg = transformers.CLIPVisionConfig(
        image_size=32,
        patch_size=16,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        hidden_act="quick_gelu",
        layer_norm_eps=1e-5,
        attention_dropout=0.0,
    )
    torch.manual_seed(4)
    hf = transformers.CLIPVisionModel(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(1)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # CLIPVisionModel applies post_layernorm only to the pooled CLS; the
        # truncated-tower contract (ViTModel-style last_hidden_state) wants
        # it on the full sequence, so apply it manually as oracle
        hidden = hf(torch.tensor(px)).last_hidden_state
        hf_out = hf.vision_model.post_layernorm(hidden).numpy()

    tower_cfg = clip_vit_tower_config(
        image_size=32,
        patch_size=16,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
    )
    tower = ViTBottomTower(tower_cfg, num_layers=LAYERS)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(px), deterministic=True)
    host = jax.device_get(params)
    host["params"] = hfi.clip_vit_tower_params(sd, LAYERS)
    out = np.asarray(tower.apply(host, jnp.asarray(px), deterministic=True))
    np.testing.assert_allclose(out, hf_out, rtol=2e-4, atol=3e-5)


def test_swapped_full_model_runs():
    """Tiny mDT with RoBERTa-style text + CLIP-style image towers."""
    from multimodaldiscussiontransformer_tpu.core.config import tiny_model_config
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel

    base = tiny_model_config()
    cfg = base.replace(
        text_tower=roberta_tower_config(
            vocab_size=128, hidden_size=64, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=66,
        ),
        image_tower=clip_vit_tower_config(
            image_size=32, patch_size=16, hidden_size=64,
            num_hidden_layers=4, num_attention_heads=4, intermediate_size=128,
        ),
    )
    items = synthetic_batch_items(
        2, seed=0, seq_len=12, vocab_size=128, image_shape=(3, 32, 32),
        max_nodes=6, image_prob=0.5,
    )
    batch = collate(items, spatial_pos_max=5, image_shape=(3, 32, 32))
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    model = MDTModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jb, deterministic=True)
    out = model.apply(params, jb, deterministic=True)
    assert np.isfinite(np.asarray(out.logits)[batch.node_mask]).all()
