"""Grain loader parity: same batches, same order as iterate_batches, with
in-process and multi-process workers, plus the per-host slicing contract."""

import numpy as np
import pytest

from multimodaldiscussiontransformer_tpu.core.config import DataConfig, TaskConfig
from multimodaldiscussiontransformer_tpu.data.dataset import iterate_batches
from multimodaldiscussiontransformer_tpu.data.grain_loader import (
    batch_index_chunks,
    grain_batches,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.input import (
    assemble_global_batch,
    host_data_config,
)

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)
DATA = DataConfig(
    batch_size=4,
    max_text_len=16,
    node_buckets=(8,),
    node_capacity_buckets=(64,),
    image_capacity_buckets=(16,),
    label_capacity_buckets=(32,),
)
TASK = TaskConfig(dataset_name="synthetic", seed=3)


def batches_equal(a, b):
    da, db = a.asdict(), b.asdict()
    assert da.keys() == db.keys()
    for k in da:
        np.testing.assert_array_equal(da[k], db[k], err_msg=k)


@pytest.mark.parametrize("workers", [0, 2])
def test_grain_matches_iterate_batches(workers):
    ds = synthetic_dataset(num_graphs=30, seed=0, **SYN)
    kw = dict(
        epoch=2, shuffle=True, image_shape=IMG, drop_last=False,
        pad_tail_to_batch=True,
    )
    ref = list(iterate_batches(ds, ds.train_idx, DATA, TASK, **kw))
    got = list(
        grain_batches(ds, ds.train_idx, DATA, TASK, worker_count=workers, **kw)
    )
    assert len(ref) == len(got) > 1
    for a, b in zip(ref, got):
        batches_equal(a, b)


def test_grain_length_grouped_order_matches():
    import dataclasses

    ds = synthetic_dataset(num_graphs=24, seed=1, **SYN)
    cfg = dataclasses.replace(DATA, length_grouped=True)
    ref = list(iterate_batches(ds, ds.train_idx, cfg, TASK, epoch=3, shuffle=True, image_shape=IMG))
    got = list(grain_batches(ds, ds.train_idx, cfg, TASK, epoch=3, shuffle=True, image_shape=IMG))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        batches_equal(a, b)


def test_grain_per_host_slices_assemble_to_global():
    """Two simulated hosts' grain streams assemble into the global batches
    (parallel/input.py contract)."""
    ds = synthetic_dataset(num_graphs=24, seed=2, **SYN)
    host_streams = [
        list(
            grain_batches(
                ds, ds.train_idx, DATA, TASK, epoch=1, shuffle=True,
                image_shape=IMG, host_index=h, host_count=2,
            )
        )
        for h in range(2)
    ]
    per_host = host_data_config(DATA, 2)
    assert all(
        b.asdict()["input_ids"].shape[0] == per_host.node_capacity_buckets[0]
        for stream in host_streams
        for b in stream
    )
    # assembled == a single global collation with single-entry ladders
    global_ref = list(
        iterate_batches(
            ds, ds.train_idx, DATA, TASK, epoch=1, shuffle=True,
            image_shape=IMG,
        )
    )
    assert len(host_streams[0]) == len(host_streams[1]) == len(global_ref)
    for b0, b1, ref in zip(host_streams[0], host_streams[1], global_ref):
        asm = assemble_global_batch([b0.asdict(), b1.asdict()])
        refd = ref.asdict()
        for k in ("spatial_pos", "in_degree", "grid_mask", "idx", "attn_bias"):
            np.testing.assert_array_equal(asm[k], refd[k], err_msg=k)
        assert int(asm["nsamples"]) == int(refd["nsamples"])


def test_chunk_order_is_iterate_batches_order():
    ds = synthetic_dataset(num_graphs=20, seed=4, **SYN)
    chunks = batch_index_chunks(
        ds, ds.train_idx, DATA, TASK, epoch=5, shuffle=True
    )
    ref = list(
        iterate_batches(ds, ds.train_idx, DATA, TASK, epoch=5, shuffle=True, image_shape=IMG)
    )
    assert len(chunks) == len(ref)
    for chunk, b in zip(chunks, ref):
        np.testing.assert_array_equal(
            np.asarray([ds.get(int(i)).idx for i in chunk]), b.idx
        )


def test_host_capacity_overflow_raises():
    """A host slice that exceeds capacity/host_count must raise (silent
    bucket-rounding would desynchronize program shapes across hosts)."""
    import dataclasses

    ds = synthetic_dataset(num_graphs=16, seed=5, **SYN)
    tiny = dataclasses.replace(
        DATA, node_capacity_buckets=(16,)  # 8/host: 4 graphs x up to 8 nodes
    )
    with pytest.raises(ValueError, match="overflowed"):
        list(
            grain_batches(
                ds, ds.train_idx, tiny, TASK, epoch=1, shuffle=True,
                image_shape=IMG, host_index=0, host_count=2,
            )
        )


def test_grain_workers_over_npz_dataset(tmp_path):
    """Multi-process Grain workers over the npz-backed HatefulDiscussions
    dataset: NpzItemLoader must survive pickling into workers and produce
    the same batches as the in-process path."""
    import json as _json

    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions import (
        ingest,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
        create_hatespeech_dataset,
    )
    from tests.test_ingest import make_raw_tree

    raw = tmp_path / "raw.json"
    with open(raw, "w") as f:
        for i in range(6):
            t = make_raw_tree()
            t["id"] = f"t3_r{i}"
            t["data"]["id"] = t["id"]
            f.write(_json.dumps(t) + "\n")
    root = str(tmp_path / "data")
    ingest.process(str(raw), root, tokenizer_name="__offline__",
                   vocab_size=128, log_every=0, max_length=16)
    ds = create_hatespeech_dataset(root=root, seed=0)

    import dataclasses
    cfg = dataclasses.replace(DATA, batch_size=4)
    kw = dict(epoch=1, shuffle=True, image_shape=(3, 224, 224), drop_last=False)
    ref = list(grain_batches(ds, ds.train_idx, cfg, TASK, worker_count=0, **kw))
    got = list(grain_batches(ds, ds.train_idx, cfg, TASK, worker_count=2, **kw))
    assert len(ref) == len(got) > 0
    for a, b in zip(ref, got):
        batches_equal(a, b)


def test_grain_multi_host_ragged_tail():
    """drop_last=False + pad_tail_to_batch: a ragged tail chunk slices
    proportionally across hosts — later hosts may get an EMPTY slice and
    must emit the matching all-pad batch, and the assembly still equals the
    single-process padded collation."""
    ds = synthetic_dataset(num_graphs=22, seed=4, **SYN)  # 5 full + tail 2
    kw = dict(
        epoch=1, shuffle=False, image_shape=IMG, drop_last=False,
        pad_tail_to_batch=True,
    )
    host_streams = [
        list(
            grain_batches(
                ds, ds.train_idx, DATA, TASK, host_index=h, host_count=2,
                **kw,
            )
        )
        for h in range(2)
    ]
    global_ref = list(iterate_batches(ds, ds.train_idx, DATA, TASK, **kw))
    assert len(host_streams[0]) == len(host_streams[1]) == len(global_ref)
    # the tail leaves host 1 with zero real rows
    tail_h1 = host_streams[1][-1].asdict()
    assert int(tail_h1["nsamples"]) == 0
    assert not tail_h1["grid_mask"].any()
    def real_rows_by_node(batch):
        m = batch["node_mask"]
        key = batch["node_graph"][m] * 10_000 + batch["node_pos"][m]
        order = np.argsort(key)
        return batch["input_ids"][m][order], key[order]

    for b0, b1, ref in zip(host_streams[0], host_streams[1], global_ref):
        got = assemble_global_batch([b0.asdict(), b1.asdict()])
        refd = ref.asdict()
        # per-graph fields are layout-identical; the flat C axis is
        # host-blocked (host h at offset h*cap_local) vs contiguous in the
        # single-process collation, so compare its REAL rows semantically
        for k in ("spatial_pos", "in_degree", "grid_mask", "idx", "attn_bias"):
            np.testing.assert_array_equal(got[k], refd[k], err_msg=k)
        assert int(got["nsamples"]) == int(refd["nsamples"])
        rows_got, key_got = real_rows_by_node(got)
        rows_ref, key_ref = real_rows_by_node(refd)
        np.testing.assert_array_equal(key_got, key_ref)
        np.testing.assert_array_equal(rows_got, rows_ref)


def test_grain_multi_host_ragged_tail_without_pad_raises():
    ds = synthetic_dataset(num_graphs=22, seed=4, **SYN)
    with pytest.raises(ValueError, match="ragged"):
        list(
            grain_batches(
                ds, ds.train_idx, DATA, TASK, epoch=1, shuffle=False,
                image_shape=IMG, drop_last=False, pad_tail_to_batch=False,
                host_index=1, host_count=2,
            )
        )


def test_trainer_num_workers_is_a_product_path(tmp_path):
    """DataConfig.num_workers routes the Trainer's batch production through
    Grain worker processes (the reference's --num-workers surface,
    run_train.sh:31): identical batches, and a real train update runs."""
    import dataclasses

    from multimodaldiscussiontransformer_tpu.core.config import (
        OptimConfig,
        TrainConfig,
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    ds = synthetic_dataset(num_graphs=12, seed=7, **SYN)

    def make(workers):
        cfg = TrainConfig(
            model=tiny_model_config(),
            data=dataclasses.replace(DATA, num_workers=workers),
            optim=OptimConfig(lr=1e-3, warmup_updates=2, total_num_update=20,
                              update_freq=1),
            task_cfg=TASK,
            save_dir=str(tmp_path / f"w{workers}"),
        )
        return Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)

    t0, t1 = make(0), make(1)
    ref = list(t0.train_batches(ds, epoch=1))
    got = list(t1.train_batches(ds, epoch=1))
    assert len(ref) == len(got) >= 1
    for a, b in zip(ref, got):
        batches_equal(a, b)

    state = t1.init_state(got[0].asdict())
    step = t1._make_train_step()
    with t1.mesh:
        state, logs = step(state, shard_batch(t1.mesh, got[0].asdict()))
    assert np.isfinite(float(np.asarray(logs["loss"])))
