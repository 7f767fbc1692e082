"""Model-forward tests for the TPU-native mDT.

The key property the static-capacity redesign must preserve: padded slots are
inert. The same discussions collated into different bucket capacities must
produce bit-near-identical real-node logits and global embeddings (oracle for
the dynamic-shape semantics of the reference forward,
mDT/src/modules/multigraphormer_graph_encoder.py:310-464).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import tiny_model_config
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_batch_items
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel

IMG = (3, 32, 32)


def make_batch(items, **kw):
    defaults = dict(spatial_pos_max=5, image_shape=IMG)
    defaults.update(kw)
    return collate(items, **defaults)


def to_jax(batch):
    return {k: jnp.asarray(v) for k, v in batch.asdict().items()}


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_model_config()
    model = MDTModel(cfg)
    items = synthetic_batch_items(
        2, seed=0, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8
    )
    batch = make_batch(items)
    params = model.init(jax.random.PRNGKey(0), to_jax(batch), deterministic=True)
    return cfg, model, params


def test_forward_shapes(model_and_params):
    cfg, model, params = model_and_params
    items = synthetic_batch_items(
        3, seed=1, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=10
    )
    batch = make_batch(items)
    out = model.apply(params, to_jax(batch), deterministic=True)
    assert out.logits.shape == (batch.node_capacity, cfg.num_classes)
    assert out.global_embedding.shape == (3, cfg.encoder_embed_dim)
    assert np.isfinite(np.asarray(out.logits)[batch.node_mask]).all()
    assert np.isfinite(np.asarray(out.global_embedding)).all()


def test_padding_invariance(model_and_params):
    """Same items, different capacities -> same real-node outputs."""
    _, model, params = model_and_params
    items = synthetic_batch_items(
        2, seed=2, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8,
        image_prob=0.5,
    )
    small = make_batch(items)
    big = make_batch(
        items,
        node_buckets=(32,),
        node_capacity_buckets=(64,),
        image_capacity_buckets=(16,),
        label_capacity_buckets=(32,),
    )
    assert big.max_nodes > small.max_nodes
    assert big.node_capacity > small.node_capacity

    out_s = model.apply(params, to_jax(small), deterministic=True)
    out_b = model.apply(params, to_jax(big), deterministic=True)

    lg_s = np.asarray(out_s.logits)[small.node_mask]
    lg_b = np.asarray(out_b.logits)[big.node_mask]
    np.testing.assert_allclose(lg_s, lg_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_s.global_embedding),
        np.asarray(out_b.global_embedding),
        rtol=1e-4,
        atol=1e-5,
    )


def test_no_image_batch(model_and_params):
    """The all-text path (image capacity 0) must run and differ from the
    image path only via the fusion average (ref fusion_layer.py:55-69)."""
    _, model, params = model_and_params
    items = synthetic_batch_items(
        2, seed=3, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8,
        image_prob=0.0,
    )
    batch = make_batch(items)
    assert batch.images.shape[0] == 0
    out = model.apply(params, to_jax(batch), deterministic=True)
    assert np.isfinite(np.asarray(out.logits)[batch.node_mask]).all()


def test_image_changes_image_node_only(model_and_params):
    """Zeroing an image must change logits only at nodes reachable from the
    image node through fusion/graph exchange -- minimally, it must change the
    image-bearing node's logit and leave the text tower of other graphs'
    nodes identical at layer 0... weaker check: outputs differ."""
    _, model, params = model_and_params
    items = synthetic_batch_items(
        2, seed=4, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8,
        image_prob=0.9,
    )
    batch = make_batch(items)
    assert batch.images.shape[0] > 0
    jb = to_jax(batch)
    out1 = model.apply(params, jb, deterministic=True)
    jb2 = dict(jb)
    jb2["images"] = jb["images"] * 0.0
    out2 = model.apply(params, jb2, deterministic=True)
    assert not np.allclose(
        np.asarray(out1.logits)[batch.node_mask],
        np.asarray(out2.logits)[batch.node_mask],
    )


def test_dead_graph_stack_flag():
    """reproduce_dead_graph_stack=False runs one extra stack -> different
    outputs; True reproduces the reference's skipped stack
    (multigraphormer_graph_encoder.py:413-446)."""
    cfg = tiny_model_config(num_fusion_layers=2, num_fusion_stack=1)
    # fusion stacks = 3, graph stacks = 4, zip runs 2, dead stack = idx 2
    items = synthetic_batch_items(
        2, seed=5, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8
    )
    batch = make_batch(items)
    jb = to_jax(batch)

    model_ref = MDTModel(cfg)
    params = model_ref.init(jax.random.PRNGKey(0), jb, deterministic=True)
    out_ref = model_ref.apply(params, jb, deterministic=True)

    model_fix = MDTModel(cfg.replace(reproduce_dead_graph_stack=False))
    # the fixed variant creates params for the extra stack; init it fresh
    params_fix = model_fix.init(jax.random.PRNGKey(0), jb, deterministic=True)
    out_fix = model_fix.apply(params_fix, jb, deterministic=True)

    # the dead stack's params exist only in the fixed variant
    n_ref = sum(x.size for x in jax.tree.leaves(params))
    n_fix = sum(x.size for x in jax.tree.leaves(params_fix))
    assert n_fix > n_ref
    assert not np.allclose(
        np.asarray(out_ref.global_embedding), np.asarray(out_fix.global_embedding)
    )


def test_dropout_rng_changes_output(model_and_params):
    cfg, model, params = model_and_params
    items = synthetic_batch_items(
        2, seed=6, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8
    )
    cfg_dropout = tiny_model_config(dropout=0.2)
    model_d = MDTModel(cfg_dropout)
    batch = make_batch(items)
    jb = to_jax(batch)
    out1 = model_d.apply(
        params, jb, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out2 = model_d.apply(
        params, jb, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out1.logits), np.asarray(out2.logits))


def test_text_length_bucketing_invariance(model_and_params):
    """Trimming fully-masked token columns must not change outputs
    (the collator text_len_buckets optimization)."""
    _, model, params = model_and_params
    items = synthetic_batch_items(
        2, seed=7, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8,
    )
    # force short texts: mask out everything past token 9
    for it in items:
        it.attention_mask[:, 9:] = 0
        it.input_ids[:, 9:] = 0
    full = make_batch(items)
    trimmed = make_batch(items, text_len_buckets=(8, 12, 16))
    assert trimmed.input_ids.shape[1] == 12
    out_f = model.apply(params, to_jax(full), deterministic=True)
    out_t = model.apply(params, to_jax(trimmed), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_f.logits)[full.node_mask],
        np.asarray(out_t.logits)[trimmed.node_mask],
        rtol=1e-4, atol=1e-5,
    )


def test_graph_only_config():
    """No image tower: no vit params, forward runs on image-free batches
    (the graph-only ablation, BASELINE.json configs)."""
    cfg = tiny_model_config().replace(use_image_tower=False)
    items = synthetic_batch_items(
        2, seed=8, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8,
        image_prob=0.0,
    )
    batch = make_batch(items)
    jb = to_jax(batch)
    model = MDTModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jb, deterministic=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = ["/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat]
    assert not any("vit" in p for p in paths)
    out = model.apply(params, jb, deterministic=True)
    assert np.isfinite(np.asarray(out.logits)[batch.node_mask]).all()


def test_activation_fn_is_honored(model_and_params):
    """``ModelConfig.activation_fn`` must reach the graph-block FFN (the
    reference's --activation-fn via fairseq get_activation_fn,
    graphormer_graph_encoder_layer.py:50,135; arch default gelu)."""
    cfg, model, params = model_and_params
    items = synthetic_batch_items(
        2, seed=3, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8
    )
    jb = to_jax(make_batch(items))
    base = model.apply(params, jb, deterministic=True)
    relu_model = MDTModel(cfg.replace(activation_fn="relu"))
    out = relu_model.apply(params, jb, deterministic=True)
    # same params, different FFN nonlinearity => different logits
    assert not np.allclose(np.asarray(base.logits), np.asarray(out.logits))
    with pytest.raises(ValueError, match="unknown activation_fn"):
        MDTModel(cfg.replace(activation_fn="nope")).apply(
            params, jb, deterministic=True
        )


def test_apply_graphormer_init_transform(model_and_params):
    """--apply-graphormer-init semantics (init_graphormer_params,
    multigraphormer_graph_encoder.py:18-39): every 2-D Dense kernel and
    embedding table re-drawn normal(0, 0.02), Dense biases zeroed;
    LayerNorms and conv kernels untouched."""
    import flax

    from multimodaldiscussiontransformer_tpu.models.mdt import (
        apply_graphormer_init_params,
    )

    cfg, model, params = model_and_params
    new = apply_graphormer_init_params(params, jax.random.PRNGKey(7))
    old_flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    new_flat = flax.traverse_util.flatten_dict(new)
    assert set(old_flat) == set(new_flat)
    n_kernels = n_embeds = 0
    for path, old in old_flat.items():
        fresh = np.asarray(new_flat[path])
        name = path[-1]
        if name == "kernel" and old.ndim == 2:
            n_kernels += 1
            assert not np.allclose(fresh, np.asarray(old))
            assert abs(float(fresh.std()) - 0.02) < 0.01, path
        elif name == "bias" and (path[:-1] + ("kernel",)) in old_flat \
                and old_flat[path[:-1] + ("kernel",)].ndim == 2:
            assert (fresh == 0).all(), path
        elif name == "embedding":
            n_embeds += 1
            assert abs(float(fresh.std()) - 0.02) < 0.01, path
        else:  # LN scale/bias, conv kernels: untouched
            np.testing.assert_array_equal(fresh, np.asarray(old), err_msg=str(path))
    assert n_kernels > 10 and n_embeds >= 3

    # the transformed tree still drives the forward
    items = synthetic_batch_items(
        2, seed=4, seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8
    )
    jb = to_jax(make_batch(items))
    out = model.apply(new, jb, deterministic=True)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_degree_overflow_saturates_not_nan(model_and_params):
    """A star node whose in-degree exceeds ``num_in_degree`` must SATURATE
    at the last embedding row, never poison the forward: ``jnp.take``'s
    default is mode="fill" (NaN for floats) on BOTH eager and jit paths,
    which silently NaN'd whole graphs on real heavy-tailed corpora before
    masked_embed clipped (found by the round-4 scale rehearsal; the torch
    reference crashes on the same input instead)."""
    from multimodaldiscussiontransformer_tpu.data.preprocess import (
        preprocess_item,
    )
    from multimodaldiscussiontransformer_tpu.data.trees import (
        tree_distance_pairs,
    )
    from multimodaldiscussiontransformer_tpu.models.graphormer import (
        masked_embed,
    )

    cfg, model, params = model_and_params
    n = cfg.num_in_degree + 8  # root in-degree n-1 > table size
    parents = np.asarray([-1] + [0] * (n - 1), np.int64)
    edges = [(0, i) for i in range(1, n)]
    edge_index = np.asarray(
        edges + [(b, a) for a, b in edges], np.int64
    ).T
    rng = np.random.default_rng(0)
    tokens = {
        "input_ids": rng.integers(1, 128, (n, 16)).astype(np.int32),
        "token_type_ids": np.zeros((n, 16), np.int32),
        "attention_mask": np.ones((n, 16), np.int32),
    }
    item = preprocess_item(
        idx=0,
        tokens=tokens,
        edge_index=edge_index,
        distance_pairs=tree_distance_pairs(parents),
        x_images=np.zeros((0,) + IMG, np.float32),
        x_image_index=np.zeros(n, bool),
        y=np.asarray([1], np.int64),
        y_mask=np.asarray([True] + [False] * (n - 1), bool),
    )
    batch = make_batch([item], node_buckets=(n,))
    assert batch.asdict()["in_degree"].max() >= cfg.num_in_degree

    logits = jax.jit(
        lambda p, b: model.apply(p, b, deterministic=True).logits
    )(params, to_jax(batch))
    assert bool(jnp.isfinite(logits).all())
    # eager path agrees (take's eager fill was the other half of the bug)
    logits_eager = model.apply(params, to_jax(batch), deterministic=True).logits
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_eager), rtol=1e-5, atol=1e-6
    )

    # saturation semantics: overflowing ids read the LAST table row
    table = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    out = masked_embed(table, jnp.asarray([[0, 1, 3, 4, 99]]))
    np.testing.assert_array_equal(np.asarray(out[0, 0]), 0.0)  # pad -> zero
    np.testing.assert_array_equal(np.asarray(out[0, 3]), np.asarray(table[3]))
    np.testing.assert_array_equal(np.asarray(out[0, 4]), np.asarray(table[3]))
