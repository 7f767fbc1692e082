"""Collator tests: padding/shift semantics vs the reference collator math
(mDT/src/data/collator.py:8-66,122-179), re-expressed for the static
capacity layout."""

import numpy as np

from multimodaldiscussiontransformer_tpu.data.collator import (
    NEG_INF,
    collate,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    synthetic_batch_items,
)


def _small_batch(contrastive=False, seed=0):
    items = synthetic_batch_items(
        4,
        seed=seed,
        min_nodes=3,
        max_nodes=10,
        seq_len=16,
        vocab_size=50,
        image_shape=(3, 8, 8),
        contrastive=contrastive,
    )
    return items, collate(
        items,
        spatial_pos_max=5,
        node_buckets=(4, 8, 16),
        node_capacity_buckets=(16, 32, 64),
        image_capacity_buckets=(0, 4, 8, 16),
        label_capacity_buckets=(4, 8, 16, 32),
        contrastive=contrastive,
        image_shape=(3, 8, 8),
    )


def test_shapes_are_bucketed():
    items, batch = _small_batch()
    total = sum(it.num_nodes for it in items)
    assert batch.node_capacity in (16, 32, 64)
    assert batch.node_capacity >= total
    assert batch.max_nodes >= max(it.num_nodes for it in items)
    assert batch.attn_bias.shape == (4, batch.max_nodes + 1, batch.max_nodes + 1)
    assert int(batch.node_mask.sum()) == total


def test_node_gather_roundtrip():
    items, batch = _small_batch()
    off = 0
    for g, it in enumerate(items):
        n = it.num_nodes
        np.testing.assert_array_equal(
            batch.input_ids[off : off + n], it.input_ids
        )
        np.testing.assert_array_equal(
            batch.node_graph[off : off + n], np.full(n, g)
        )
        np.testing.assert_array_equal(
            batch.node_pos[off : off + n], np.arange(n)
        )
        off += n
    # padded slots point at the trash graph id B
    assert (batch.node_graph[off:] == 4).all()
    assert not batch.node_mask[off:].any()


def test_shift_semantics():
    items, batch = _small_batch()
    for g, it in enumerate(items):
        n = it.num_nodes
        # +1 shift so 0 is padding (collator.py:8-20,59-66)
        np.testing.assert_array_equal(
            batch.spatial_pos[g, :n, :n], it.spatial_pos + 1
        )
        np.testing.assert_array_equal(
            batch.in_degree[g, :n], it.in_degree + 1
        )
        assert (batch.spatial_pos[g, n:, :] == 0).all()
        assert (batch.in_degree[g, n:] == 0).all()
    np.testing.assert_array_equal(batch.in_degree, batch.out_degree)


def test_attn_bias_reference_padding_semantics():
    """Reproduce pad_attn_bias_unsqueeze + distance clipping exactly."""
    items, batch = _small_batch()
    nmax = batch.max_nodes
    for g, it in enumerate(items):
        n = it.num_nodes
        want = np.full((nmax + 1, nmax + 1), NEG_INF, dtype=np.float32)
        blk = np.zeros((n + 1, n + 1), dtype=np.float32)
        blk[1:, 1:][it.distance >= 5] = NEG_INF
        want[: n + 1, : n + 1] = blk
        want[n + 1 :, : n + 1] = 0.0
        np.testing.assert_array_equal(batch.attn_bias[g], want)
        # graph token row/col never clipped (collator.py:123)
        assert (batch.attn_bias[g, 0, : n + 1] == 0).all()
        assert (batch.attn_bias[g, : n + 1, 0] == 0).all()


def test_image_capacity_mapping():
    items, batch = _small_batch(seed=3)
    n_imgs = sum(int(it.x_image_index.sum()) for it in items)
    assert int(batch.image_mask.sum()) == n_imgs
    # each image row maps to a node slot bearing an image, in node order
    off = 0
    i = 0
    for it in items:
        for pos in np.flatnonzero(it.x_image_index):
            assert batch.image_node[i] == off + pos
            i += 1
        off += it.num_nodes
    # padded image slots point at the trash node slot C
    assert (batch.image_node[n_imgs:] == batch.node_capacity).all()


def test_labels_node_task():
    items, batch = _small_batch()
    total_labels = sum(len(it.y) for it in items)
    assert int(batch.y_slot_mask.sum()) == total_labels
    off = 0
    i = 0
    for it in items:
        for j, pos in enumerate(np.flatnonzero(it.y_mask)):
            assert batch.y_node[i] == off + pos
            assert batch.y[i] == it.y[j]
            i += 1
        off += it.num_nodes
    assert (batch.y_node[total_labels:] == batch.node_capacity).all()


def test_contrastive_labels():
    items, batch = _small_batch(contrastive=True)
    assert batch.y.shape == (4,)
    assert batch.hard_y.shape == (4,)
    for g, it in enumerate(items):
        assert batch.y[g] == float(it.y[0])
        assert batch.hard_y[g] == float(it.hard_y[0])


def test_zero_image_batch():
    items = synthetic_batch_items(
        2,
        seed=7,
        min_nodes=3,
        max_nodes=5,
        seq_len=8,
        vocab_size=50,
        image_prob=0.0,
        image_shape=(3, 8, 8),
    )
    batch = collate(
        items,
        image_capacity_buckets=(0, 4),
        node_buckets=(8,),
        node_capacity_buckets=(16,),
        label_capacity_buckets=(8,),
        image_shape=(3, 8, 8),
    )
    assert batch.images.shape[0] == 0
    assert batch.image_mask.shape == (0,)


def test_shard_multiple():
    items, _ = _small_batch()
    batch = collate(
        items,
        node_buckets=(16,),
        node_capacity_buckets=(40, 48, 64),
        label_capacity_buckets=(8, 16, 32),
        image_capacity_buckets=(0, 8, 16),
        shard_multiple=8,
        image_shape=(3, 8, 8),
    )
    assert batch.node_capacity % 8 == 0
    assert batch.images.shape[0] % 8 == 0
    assert batch.y.shape[0] % 8 == 0


def test_length_grouped_batching():
    """Length grouping: every index appears exactly once per epoch, batches
    hold similar-length items, and the average text bucket shrinks."""
    import dataclasses

    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        TaskConfig,
    )
    from multimodaldiscussiontransformer_tpu.data.dataset import (
        DiscussionDataset,
        iterate_batches,
    )
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )

    items = synthetic_batch_items(
        32, seed=0, seq_len=64, vocab_size=128, image_shape=(3, 32, 32),
        min_nodes=3, max_nodes=6,
    )
    # force a wide length spread: half short, half long
    for i, it in enumerate(items):
        cut = 8 if i % 2 == 0 else 64
        it.attention_mask[:, cut:] = 0
        it.input_ids[:, cut:] = 0
    ds = DiscussionDataset.from_splits(items, seed=0)

    def run(grouped):
        cfg = DataConfig(
            batch_size=4,
            node_buckets=(8,),
            node_capacity_buckets=(32,),
            image_capacity_buckets=(0, 8, 16, 32),
            label_capacity_buckets=(32,),
            text_len_buckets=(8, 16, 32, 64),
            length_grouped=grouped,
        )
        batches = list(
            iterate_batches(
                ds, np.arange(32), cfg, TaskConfig(seed=0), epoch=1,
                shuffle=True, image_shape=(3, 32, 32),
            )
        )
        seen = np.concatenate([b.idx for b in batches])
        assert sorted(seen.tolist()) == list(range(32))
        return np.mean([b.input_ids.shape[1] for b in batches])

    ungrouped_t = run(False)
    grouped_t = run(True)
    # grouped: half the batches are all-short (bucket 8), half all-long (64)
    assert grouped_t < ungrouped_t
    assert grouped_t <= (8 + 64) / 2
