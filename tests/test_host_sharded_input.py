"""Per-host sharded input (VERDICT r1 item 10): each simulated host
collates only its slice of the global batch; the assembled global batch
must be model-equivalent to a single-host global collation (pad slots are
inert, so interleaved per-host padding cannot change any output)."""

import numpy as np
import jax
import pytest

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    synthetic_batch_items,
)
from multimodaldiscussiontransformer_tpu.parallel.input import (
    assemble_global_batch,
    host_data_config,
    host_graph_slice,
    put_host_local,
)
from multimodaldiscussiontransformer_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
)
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

IMG = (3, 32, 32)
GLOBAL_DATA = DataConfig(
    batch_size=8,
    batch_size_is_per_replica=False,
    max_text_len=16,
    node_buckets=(8,),
    node_capacity_buckets=(64,),
    image_capacity_buckets=(16,),
    label_capacity_buckets=(32,),
)


def collate_with(items, cfg: DataConfig):
    return collate(
        items,
        node_buckets=cfg.node_buckets,
        node_capacity_buckets=cfg.node_capacity_buckets,
        image_capacity_buckets=cfg.image_capacity_buckets,
        label_capacity_buckets=cfg.label_capacity_buckets,
        image_shape=IMG,
    ).asdict()


def test_host_slices_partition_the_batch():
    assert host_graph_slice(0, 2, 8) == slice(0, 4)
    assert host_graph_slice(1, 2, 8) == slice(4, 8)
    with pytest.raises(ValueError):
        host_graph_slice(0, 3, 8)


def test_host_data_config_divides_capacities():
    per_host = host_data_config(GLOBAL_DATA, 2)
    assert per_host.node_capacity_buckets == (32,)
    assert per_host.image_capacity_buckets == (8,)
    assert per_host.label_capacity_buckets == (16,)
    assert per_host.node_buckets == (8,)


def test_assembled_two_host_batch_matches_global_collation():
    items = synthetic_batch_items(
        8, seed=0, min_nodes=2, max_nodes=8, seq_len=16, vocab_size=128,
        image_shape=IMG,
    )
    per_host_cfg = host_data_config(GLOBAL_DATA, 2)
    host_batches = [
        collate_with(items[host_graph_slice(h, 2, 8)], per_host_cfg)
        for h in range(2)
    ]
    assembled = assemble_global_batch(host_batches)
    reference = collate_with(items, GLOBAL_DATA)

    # identical static shapes
    for k in reference:
        assert assembled[k].shape == reference[k].shape, k
    assert int(assembled["nsamples"]) == int(reference["nsamples"]) == 8
    # per-graph arrays are identical (concat order == global order)
    for k in ("spatial_pos", "attn_bias", "in_degree", "grid_mask", "idx"):
        np.testing.assert_array_equal(assembled[k], reference[k], err_msg=k)

    # model equivalence: eval logs must match exactly (pads are inert even
    # though the flat packing interleaves per-host padding)
    cfg = TrainConfig(
        model=tiny_model_config(),
        data=GLOBAL_DATA,
        optim=OptimConfig(lr=1e-3, warmup_updates=2, total_num_update=10),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
    )
    mesh = make_mesh(2, 1)
    trainer = Trainer(cfg, mesh=mesh, image_shape=IMG)
    state = trainer.init_state(reference)
    ev = trainer._make_eval_step()
    with mesh:
        logs_ref = jax.device_get(ev(state.params, shard_batch(mesh, reference)))
        logs_asm = jax.device_get(ev(state.params, shard_batch(mesh, assembled)))
    for k in logs_ref:
        np.testing.assert_allclose(
            np.asarray(logs_ref[k], np.float32),
            np.asarray(logs_asm[k], np.float32),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )


def test_put_host_local_rejects_single_process():
    items = synthetic_batch_items(
        4, seed=1, min_nodes=2, max_nodes=8, seq_len=16, vocab_size=128,
        image_shape=IMG,
    )
    local = collate_with(items, host_data_config(GLOBAL_DATA, 2))
    mesh = make_mesh(2, 1)
    with pytest.raises(ValueError, match="process_count"):
        put_host_local(mesh, local, host_index=0, host_count=2)


def test_distributed_helpers_single_process():
    """parallel.distributed: single-process behavior of the multi-host
    wrappers (initialize no-op, process_info identity, per-host index
    slicing degenerate case)."""
    import numpy as np

    from multimodaldiscussiontransformer_tpu.parallel import distributed

    distributed.initialize(num_processes=1)  # must be a no-op
    pid, pcount, local, global_ = distributed.process_info()
    assert pid == 0 and pcount == 1
    assert local == global_ == len(jax.devices())

    idx = np.arange(12)
    out = distributed.per_host_batch_indices(idx, batch_size=12)
    np.testing.assert_array_equal(out, idx)
