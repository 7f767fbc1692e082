"""Sequence parallelism through the PRODUCT path: a giant tree (S=520,
bigger than any single node bucket the canonical ladders ship) trains and
scores through the standard MDTModel/DiscussionScorer APIs with the node
axis sharded over an 8-device 'sp' mesh axis (ring attention), matching the
single-device path.

This is the TPU-native answer to the reference's tree-size scaling, which
is data-side pruning (Pre-Processing/3-prune-trees.py:16-39) and
spatial_pos_max attention clipping (mDT/src/data/collator.py:122-126) —
here the tree itself stays whole and its O(S^2) bias shards 1/sp per
device (ops/ring_attention.py)."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    TaskConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_item
from multimodaldiscussiontransformer_tpu.losses.node_cross_entropy import (
    NodeCrossEntropyCriterion,
)
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
)

IMG = (3, 32, 32)
N_NODES = 519  # S = N + 1 (graph token) = 520 = 8 * 65


def big_tree_batch(seed: int = 0):
    rng = np.random.default_rng(seed)
    item = synthetic_item(
        idx=0, num_nodes=N_NODES, rng=rng, seq_len=16, vocab_size=128,
        image_prob=0.02, image_shape=IMG,
    )
    return collate(
        [item],
        spatial_pos_max=5,
        node_buckets=(N_NODES,),
        node_capacity_buckets=(520,),
        image_capacity_buckets=(16,),
        label_capacity_buckets=(256,),
        image_shape=IMG,
    )


def make_models():
    base = tiny_model_config()
    cfg_sp = base.replace(sequence_parallel=True)
    return (
        MDTModel(base, dtype=jnp.float32),
        MDTModel(cfg_sp, dtype=jnp.float32),
    )


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    batch = big_tree_batch()
    model, model_sp = make_models()
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    params = model.init(jax.random.PRNGKey(0), jb, deterministic=True)
    mesh = make_mesh(1, 1, 8)
    return batch, model, model_sp, params, mesh


def test_sp_forward_matches_single_device(setup):
    batch, model, model_sp, params, mesh = setup
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    ref = jax.jit(
        lambda p, b: model.apply(p, b, deterministic=True).logits
    )(params, jb)

    with mesh:
        sb = shard_batch(mesh, batch.asdict())
        got = jax.jit(
            lambda p, b: model_sp.apply(p, b, deterministic=True).logits
        )(params, sb)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(got), np.float32),
        np.asarray(jax.device_get(ref), np.float32),
        rtol=2e-4, atol=2e-5,
    )


def test_sp_gradients_match_single_device(setup):
    batch, model, model_sp, params, mesh = setup
    criterion = NodeCrossEntropyCriterion(positive_weight=1.5)

    def make_loss(m):
        def loss_fn(p, b):
            out = m.apply(p, b, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
            loss, ssz, _ = criterion(out, b)
            return loss / jnp.maximum(ssz.astype(jnp.float32), 1.0)

        return loss_fn

    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(make_loss(model))
    )(params, jb)
    with mesh:
        sb = shard_batch(mesh, batch.asdict())
        sp_loss, sp_grads = jax.jit(
            jax.value_and_grad(make_loss(model_sp))
        )(params, sb)

    np.testing.assert_allclose(
        float(sp_loss), float(ref_loss), rtol=1e-5, atol=1e-7
    )
    ref_leaves = jax.tree.leaves(jax.device_get(ref_grads))
    sp_leaves = jax.tree.leaves(jax.device_get(sp_grads))
    for a, b in zip(sp_leaves, ref_leaves):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-4, atol=1e-6,
        )


def test_sp_training_with_attention_dropout_runs(setup):
    """With attention dropout > 0 the ring regenerates per-tile masks from
    a seed (a DIFFERENT mask process than the single-device kernel, so no
    elementwise parity) — assert the step runs, grads are finite, and
    dropout actually perturbs the output."""
    batch, model, model_sp, params, mesh = setup
    cfg_do = model_sp.config.replace(attention_dropout=0.3)
    model_do = MDTModel(cfg_do, dtype=jnp.float32)
    criterion = NodeCrossEntropyCriterion(positive_weight=1.5)

    def loss_fn(p, b, key):
        out = model_do.apply(p, b, deterministic=False,
                             rngs={"dropout": key})
        loss, ssz, _ = criterion(out, b)
        return loss / jnp.maximum(ssz.astype(jnp.float32), 1.0)

    with mesh:
        sb = shard_batch(mesh, batch.asdict())
        step = jax.jit(jax.value_and_grad(loss_fn))
        l1, g1 = step(params, sb, jax.random.PRNGKey(1))
        l2, _ = step(params, sb, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)  # masks depend on the rng
    gn = np.sqrt(
        sum(
            float(jnp.sum(jnp.square(g.astype(jnp.float32))))
            for g in jax.tree.leaves(g1)
        )
    )
    assert np.isfinite(gn) and gn > 0


def test_sp_scorer_matches_plain_scorer(setup):
    """serve/incremental.py giant-tree entry: a DiscussionScorer on an sp
    mesh re-scores the same probabilities as the single-device scorer."""
    from multimodaldiscussiontransformer_tpu.serve.incremental import (
        DiscussionScorer,
    )

    batch, model, model_sp, params, mesh = setup
    rng = np.random.default_rng(1)
    item = synthetic_item(
        idx=0, num_nodes=N_NODES, rng=rng, seq_len=16, vocab_size=128,
        image_prob=0.02, image_shape=IMG,
    )
    data_cfg = DataConfig(
        batch_size=1,
        node_buckets=(N_NODES,),
        node_capacity_buckets=(520,),
        image_capacity_buckets=(16,),
        label_capacity_buckets=(256,),
        text_len_buckets=(16,),
        max_text_len=16,
    )
    kw = dict(data_cfg=data_cfg, task_cfg=TaskConfig(), image_shape=IMG)
    plain = DiscussionScorer(model, params, **kw)
    sharded = DiscussionScorer(model_sp, params, mesh=mesh, **kw)
    p_ref = plain.score_items([item])[0]
    p_sp = sharded.score_items([item])[0]
    assert p_sp.shape == (N_NODES, 2)
    np.testing.assert_allclose(p_sp, p_ref, rtol=2e-4, atol=2e-5)


def test_sp_path_is_not_vacuous(setup):
    """The sequence_parallel model must ACTUALLY route through the ring
    dispatch under the classic ``with mesh:`` context the Trainer and
    DiscussionScorer use — guards the ambient-mesh probe
    (ops/tree_attention.py::ambient_mesh): with a probe that only sees
    set_mesh contexts, every test above would pass vacuously on the
    regular attention path."""
    batch, model, model_sp, params, mesh = setup
    from multimodaldiscussiontransformer_tpu.ops import ring_attention as ra

    calls = []
    orig = ra.ring_tree_attention_dispatch

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ra.ring_tree_attention_dispatch = counting
    try:
        with mesh:
            sb = shard_batch(mesh, batch.asdict())
            jax.jit(
                lambda p, b: model_sp.apply(p, b, deterministic=True).logits
            )(params, sb)
    finally:
        ra.ring_tree_attention_dispatch = orig
    assert calls, "sp model fell through to regular attention"
