"""Incremental-inference (re-scoring) API tests."""

import numpy as np
import jax

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.serve.incremental import (
    Discussion,
    DiscussionScorer,
)

IMG = (3, 32, 32)


def make_scorer():
    import jax.numpy as jnp

    cfg = tiny_model_config()
    model = MDTModel(cfg)
    d = Discussion()
    d.add_node(-1, np.arange(1, 13, dtype=np.int32))
    item = d.to_item()
    from multimodaldiscussiontransformer_tpu.data.collator import collate

    batch = collate([item], spatial_pos_max=5, image_shape=IMG)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    params = model.init(jax.random.PRNGKey(0), jb, deterministic=True)
    data_cfg = DataConfig(
        batch_size=1,
        node_buckets=(8, 16),
        node_capacity_buckets=(8, 16, 32),
        image_capacity_buckets=(0, 4),
        label_capacity_buckets=(8,),
    )
    return DiscussionScorer(model, params, data_cfg, image_shape=IMG)


def test_incremental_rescoring():
    scorer = make_scorer()
    d = Discussion()
    root = d.add_node(-1, np.arange(1, 13, dtype=np.int32))
    probs1 = scorer.score(d)
    assert probs1.shape == (1, 2)
    np.testing.assert_allclose(probs1.sum(-1), 1.0, rtol=1e-5)

    # grow the discussion: every node gets re-scored
    c1 = d.add_node(root, np.arange(2, 14, dtype=np.int32))
    d.add_node(c1, np.arange(3, 15, dtype=np.int32))
    probs2 = scorer.score(d)
    assert probs2.shape == (3, 2)
    # the root's score changes as context grows (re-scoring semantics,
    # SURVEY.md §3.5)
    assert not np.allclose(probs1[0], probs2[0])


def test_image_node_scoring():
    scorer = make_scorer()
    d = Discussion()
    d.add_node(
        -1, np.arange(1, 13, dtype=np.int32),
        image=np.random.default_rng(0).standard_normal(IMG).astype(np.float32),
    )
    d.add_node(0, np.arange(2, 14, dtype=np.int32))
    probs = scorer.score(d)
    assert probs.shape == (2, 2)
    assert np.isfinite(probs).all()


def test_from_checkpoint(tmp_path):
    """Scorer restores params from an Orbax training checkpoint."""
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.utils.checkpoints import Checkpointer

    cfg = tiny_model_config()
    model = MDTModel(cfg)
    d = Discussion()
    d.add_node(-1, np.arange(1, 13, dtype=np.int32))
    batch = collate([d.to_item()], spatial_pos_max=5, image_shape=IMG)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    params = model.init(jax.random.PRNGKey(3), jb, deterministic=True)

    class FakeState:
        pass

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save({"params": jax.device_get(params), "step": 5}, 5, best=True)
    ckpt.wait()
    ckpt.close()

    from multimodaldiscussiontransformer_tpu.core.config import DataConfig

    scorer = DiscussionScorer.from_checkpoint(
        str(tmp_path / "ckpt"),
        model_cfg=cfg,
        data_cfg=DataConfig(
            batch_size=1, node_buckets=(8,), node_capacity_buckets=(8,),
            image_capacity_buckets=(0,), label_capacity_buckets=(8,),
        ),
        image_shape=IMG,
    )
    probs = scorer.score(d)
    assert probs.shape == (1, 2)
    direct = DiscussionScorer(
        model, params,
        DataConfig(batch_size=1, node_buckets=(8,), node_capacity_buckets=(8,),
                   image_capacity_buckets=(0,), label_capacity_buckets=(8,)),
        image_shape=IMG,
    ).score(d)
    np.testing.assert_allclose(probs, direct, rtol=1e-5)


def test_scoring_through_flash_path(monkeypatch):
    """Serving a larger discussion routes graph attention through the
    streaming (flash) path (forced thresholds; XLA interpret on CPU) and
    still produces valid per-node probabilities."""
    from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta

    monkeypatch.setattr(ta, "_FLASH_MIN_S", 16)
    monkeypatch.setattr(ta, "_FLASH_TILE", 16)

    cfg = tiny_model_config()
    assert cfg.use_pallas_attention  # default-on compact path
    model = MDTModel(cfg)
    rng = np.random.default_rng(1)
    d = Discussion()
    d.add_node(-1, np.arange(1, 13, dtype=np.int32))
    for i in range(1, 20):  # 20 nodes -> S=21 >= forced flash threshold
        d.add_node(int(rng.integers(0, i)), rng.integers(1, 120, 12).astype(np.int32))

    from multimodaldiscussiontransformer_tpu.data.collator import collate

    import jax.numpy as jnp

    data_cfg = DataConfig(
        batch_size=1,
        node_buckets=(24,),
        node_capacity_buckets=(32,),
        image_capacity_buckets=(0, 4),
        label_capacity_buckets=(8,),
    )
    item = d.to_item()
    batch = collate(
        [item],
        node_buckets=data_cfg.node_buckets,
        node_capacity_buckets=data_cfg.node_capacity_buckets,
        image_capacity_buckets=data_cfg.image_capacity_buckets,
        label_capacity_buckets=data_cfg.label_capacity_buckets,
        image_shape=IMG,
    )
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    params = model.init(jax.random.PRNGKey(0), jb, deterministic=True)
    scorer = DiscussionScorer(model, params, data_cfg, image_shape=IMG)
    probs = scorer.score(d)
    assert probs.shape == (20, cfg.num_classes)
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_batch_bucket_padding_is_inert():
    """Request-batch bucketing: a 3-discussion request pads to the
    4-bucket with zero-node pad graphs; every real item's probabilities
    match its solo (batch-bucket 1) score to padding-invariance tolerance
    (shape changes reassociate XLA reductions), and distinct request
    sizes inside one bucket share a compiled program signature."""
    from multimodaldiscussiontransformer_tpu.serve.incremental import (
        _batch_bucket,
    )

    assert [_batch_bucket(n, "pow2") for n in (1, 2, 3, 4, 5, 16)] == [
        1, 2, 4, 4, 8, 16]
    assert _batch_bucket(3, (2, 6)) == 6
    assert _batch_bucket(7, None) == 7

    scorer = make_scorer()
    rng = np.random.RandomState(0)
    discs = []
    for n_nodes in (1, 3, 2):
        d = Discussion()
        d.add_node(-1, rng.randint(1, 40, 12).astype(np.int32))
        for i in range(1, n_nodes):
            d.add_node(int(rng.randint(0, i)),
                       rng.randint(1, 40, 12).astype(np.int32))
        discs.append(d)
    items = [d.to_item(i) for i, d in enumerate(discs)]

    batched = scorer.score_items(items)  # 3 -> padded to 4
    solo = [scorer.score(d) for d in discs]
    for got, want in zip(batched, solo):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # sizes 3 and 4 collate to the same static shape (one program)
    from multimodaldiscussiontransformer_tpu.data.collator import collate

    shapes = []
    for reqs in (items[:1] * 3, items[:1] * 4):
        b = collate(
            list(reqs),
            pad_to_graphs=_batch_bucket(len(reqs), "pow2"),
            node_buckets=scorer.data_cfg.node_buckets,
            node_capacity_buckets=scorer.data_cfg.node_capacity_buckets,
            image_capacity_buckets=scorer.data_cfg.image_capacity_buckets,
            label_capacity_buckets=scorer.data_cfg.label_capacity_buckets,
            image_shape=IMG,
        )
        shapes.append({k: v.shape for k, v in b.asdict().items()})
    assert shapes[0] == shapes[1]


def test_from_checkpoint_cross_layout(tmp_path):
    """A checkpoint written by a scan_layers trainer serves under an
    unrolled serving config (and vice versa): from_checkpoint adapts the
    param layout (utils/scan_params.py) and scores identically."""
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.core.config import DataConfig
    from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
        Checkpointer,
    )
    from multimodaldiscussiontransformer_tpu.utils.scan_params import (
        to_scanned,
    )

    cfg = tiny_model_config()
    cfg_s = cfg.replace(scan_layers=True)
    model = MDTModel(cfg)
    d = Discussion()
    d.add_node(-1, np.arange(1, 13, dtype=np.int32))
    from multimodaldiscussiontransformer_tpu.data.collator import collate

    batch = collate([d.to_item()], spatial_pos_max=5, image_shape=IMG)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    params = model.init(jax.random.PRNGKey(3), jb, deterministic=True)
    scanned = to_scanned(jax.device_get(params), cfg_s)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save({"params": scanned, "step": 5}, 5, best=True)
    ckpt.wait()
    ckpt.close()

    dc = DataConfig(batch_size=1, node_buckets=(8,), node_capacity_buckets=(8,),
                    image_capacity_buckets=(0,), label_capacity_buckets=(8,))
    # scanned checkpoint -> unrolled serving config
    probs_u = DiscussionScorer.from_checkpoint(
        str(tmp_path / "ckpt"), model_cfg=cfg, data_cfg=dc, image_shape=IMG
    ).score(d)
    # scanned checkpoint -> scanned serving config (no-op adapt)
    probs_s = DiscussionScorer.from_checkpoint(
        str(tmp_path / "ckpt"), model_cfg=cfg_s, data_cfg=dc, image_shape=IMG
    ).score(d)
    oracle = DiscussionScorer(model, params, dc, image_shape=IMG).score(d)
    np.testing.assert_allclose(probs_u, oracle, rtol=1e-5)
    np.testing.assert_allclose(probs_s, oracle, rtol=1e-5)
