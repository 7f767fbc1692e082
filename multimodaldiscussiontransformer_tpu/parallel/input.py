"""Per-host sharded input assembly for multi-host meshes.

The reference rides torch DataLoader forking on ONE host (run_train.sh:31);
a TPU pod slice runs one Python process per host, and each host must feed
only the batch rows its local devices own. This module provides the
host-sharded input contract:

1. every host collates ONLY its slice of the global batch
   (``host_graph_slice``) with per-host capacity ladders
   (``host_data_config``: global capacities / host_count, single-entry so
   all hosts independently pick identical static shapes);
2. the global batch is the concatenation of the host-local batches with
   index-vector offsets applied (``assemble_global_batch`` — used verbatim
   in single-process tests, and defining the layout contract);
3. on a real multi-host runtime each host passes its local batch to
   ``put_host_local``, which builds the globally-sharded ``jax.Array`` from
   process-local data without any host ever materializing the full batch.

Padded-slot index conventions (data/collator.py): ``node_graph`` pads to
B_local, ``image_node``/``y_node`` pad to cap_local — after offsetting,
pads are re-pointed at the GLOBAL out-of-range sentinels so scatters stay
drop-mode inert.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import DataConfig

# per-graph leading axis
_PER_GRAPH = (
    "spatial_pos", "attn_bias", "in_degree", "out_degree", "grid_mask", "idx",
    "hard_y",
)


def host_graph_slice(host_index: int, host_count: int, global_batch: int) -> slice:
    """Contiguous block of global batch rows owned by one host — matches the
    dp-major device order of ``parallel.mesh.make_mesh`` (host h holds dp
    ranks [h*dp/H, (h+1)*dp/H))."""
    if global_batch % host_count:
        raise ValueError(f"global batch {global_batch} % hosts {host_count}")
    per = global_batch // host_count
    return slice(host_index * per, (host_index + 1) * per)


def host_data_config(cfg: DataConfig, host_count: int) -> DataConfig:
    """Per-host DataConfig: capacities divided by host_count, single-entry
    ladders so every host picks the same static shape with no
    communication."""

    def split(ladder: Sequence[int]) -> tuple:
        cap = max(ladder)
        if cap % host_count:
            raise ValueError(f"capacity {cap} % hosts {host_count}")
        return (cap // host_count,)

    return dataclasses.replace(
        cfg,
        node_buckets=(max(cfg.node_buckets),),
        node_capacity_buckets=split(cfg.node_capacity_buckets),
        image_capacity_buckets=split(cfg.image_capacity_buckets),
        label_capacity_buckets=split(cfg.label_capacity_buckets),
        # per-batch text trimming picks t from each host's LOCAL rows —
        # hosts would desync; pin to the max (no trimming) so every host
        # independently chooses the same static shape
        text_len_buckets=(
            (max(cfg.text_len_buckets),) if cfg.text_len_buckets else
            cfg.text_len_buckets
        ),
    )


def assemble_global_batch(host_batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Concatenate host-local collated batches into the global batch,
    re-pointing index vectors and pad sentinels at global coordinates."""
    h0 = host_batches[0]
    n_hosts = len(host_batches)
    b_local = h0["idx"].shape[0]
    cap_local = h0["input_ids"].shape[0]
    b_global = b_local * n_hosts
    cap_global = cap_local * n_hosts

    out: Dict[str, np.ndarray] = {}
    for key in h0:
        parts = [hb[key] for hb in host_batches]
        if key == "nsamples":
            out[key] = np.asarray(sum(int(p) for p in parts), h0[key].dtype)
        elif key == "node_graph":
            out[key] = np.concatenate(
                [
                    np.where(hb["node_mask"], p + i * b_local, b_global)
                    for i, (p, hb) in enumerate(zip(parts, host_batches))
                ]
            ).astype(h0[key].dtype)
        elif key == "image_node":
            out[key] = np.concatenate(
                [
                    np.where(hb["image_mask"], p + i * cap_local, cap_global)
                    for i, (p, hb) in enumerate(zip(parts, host_batches))
                ]
            ).astype(h0[key].dtype)
        elif key == "y_node":
            out[key] = np.concatenate(
                [
                    np.where(hb["y_slot_mask"], p + i * cap_local, cap_global)
                    for i, (p, hb) in enumerate(zip(parts, host_batches))
                ]
            ).astype(h0[key].dtype)
        else:
            out[key] = np.concatenate(parts)
    return out


def check_host_shapes(batch: Dict[str, np.ndarray], cfg: DataConfig) -> None:
    """Fail loudly if a host-local collation overflowed its single-entry
    capacity ladder. Capacities are divided statically across hosts
    (``host_data_config``) with NO communication, so a host whose slice
    holds more nodes/images/labels than capacity/host_count would silently
    round its buffers up (collator ``_bucket`` fallback) and produce a
    DIFFERENT program shape than its peers — a multi-host hang. Provision
    the GLOBAL capacities for the worst-case per-host load and keep this
    check on."""
    expect = {
        "input_ids": max(cfg.node_capacity_buckets),
        "images": max(cfg.image_capacity_buckets),
    }
    if batch["y_node"].size:
        expect["y"] = max(cfg.label_capacity_buckets)
    for key, cap in expect.items():
        got = batch[key].shape[0]
        if got != cap:
            raise ValueError(
                f"host-local batch overflowed its capacity ladder: {key} "
                f"buffer is {got}, per-host capacity {cap}. Raise the "
                "GLOBAL capacity buckets so every host's worst-case slice "
                "fits capacity/host_count (capacities are split statically "
                "across hosts with no communication)."
            )


def local_batch_with_global_indices(
    local: Dict[str, np.ndarray], host_index: int, host_count: int
) -> Dict[str, np.ndarray]:
    """Apply the global-coordinate offsets to ONE host's local batch (the
    per-host half of ``assemble_global_batch``) without concatenating."""
    b_local = local["idx"].shape[0]
    cap_local = local["input_ids"].shape[0]
    out = dict(local)
    out["node_graph"] = np.where(
        local["node_mask"],
        local["node_graph"] + host_index * b_local,
        b_local * host_count,
    ).astype(local["node_graph"].dtype)
    out["image_node"] = np.where(
        local["image_mask"],
        local["image_node"] + host_index * cap_local,
        cap_local * host_count,
    ).astype(local["image_node"].dtype)
    if local["y_node"].size:
        out["y_node"] = np.where(
            local["y_slot_mask"],
            local["y_node"] + host_index * cap_local,
            cap_local * host_count,
        ).astype(local["y_node"].dtype)
    return out


def put_host_local(mesh, local: Dict[str, np.ndarray], host_index: int, host_count: int):
    """Build globally-sharded device arrays from this host's local batch.

    On a true multi-host runtime (jax.process_count() == host_count) this
    uses ``jax.make_array_from_process_local_data`` so no host materializes
    the global batch. ``local["nsamples"]`` must already hold the GLOBAL
    real-graph count — every host iterates the same deterministic global
    index list (data/dataset.py), so the global count is host-computable
    with no communication. Single-process callers (tests) should use
    ``assemble_global_batch`` + ``parallel.mesh.shard_batch`` instead."""
    import jax

    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        batch_sharding,
    )

    if jax.process_count() != host_count or host_count <= 1:
        raise ValueError(
            f"put_host_local: host_count={host_count} does not match "
            f"jax.process_count()={jax.process_count()}; single-process "
            "callers should assemble_global_batch + shard_batch instead"
        )
    local = local_batch_with_global_indices(local, host_index, host_count)
    global_shapes = {
        k: ((np.asarray(v).shape[0] * host_count,) + np.asarray(v).shape[1:])
        if np.ndim(v) else ()
        for k, v in local.items()
    }
    specs = batch_sharding(
        mesh,
        {
            k: np.zeros(global_shapes[k], np.asarray(v).dtype)
            for k, v in local.items()
        },
    )
    out = {}
    for k, v in local.items():
        arr = np.asarray(v)
        if specs[k].spec == () or arr.ndim == 0:  # replicated (nsamples)
            out[k] = jax.device_put(arr, specs[k])
        else:
            out[k] = jax.make_array_from_process_local_data(
                specs[k], arr, global_shapes[k]
            )
    return out


def put_host_local_stacked(
    mesh, local: Dict[str, np.ndarray], host_index: int, host_count: int
):
    """``put_host_local`` for (k, ...)-stacked microbatch GROUPS (the scan
    accumulation path, ``data/loader.py::stack_microbatches``): the scan
    axis k stays replicated, the per-batch axis (axis 1) shards over the
    data axes with each host contributing only its rows.

    ``local["nsamples"]`` must hold the (k,)-vector of GLOBAL real-graph
    counts — host-computable because every host iterates the same global
    index list (the same contract as ``put_host_local``)."""
    import jax

    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        _REPLICATED_FIELDS,
        data_axes,
        data_parallel_size,
    )

    if jax.process_count() != host_count or host_count <= 1:
        raise ValueError(
            f"put_host_local_stacked: host_count={host_count} does not "
            f"match jax.process_count()={jax.process_count()}"
        )
    k = next(iter(local.values())).shape[0]
    # the per-microbatch offset math of local_batch_with_global_indices
    # broadcasts unchanged over the stacked axis (masks and index vectors
    # carry the same leading k)
    b_local = local["idx"].shape[1]
    cap_local = local["input_ids"].shape[1]
    adj = dict(local)
    adj["node_graph"] = np.where(
        local["node_mask"],
        local["node_graph"] + host_index * b_local,
        b_local * host_count,
    ).astype(local["node_graph"].dtype)
    adj["image_node"] = np.where(
        local["image_mask"],
        local["image_node"] + host_index * cap_local,
        cap_local * host_count,
    ).astype(local["image_node"].dtype)
    if local["y_node"].size:
        adj["y_node"] = np.where(
            local["y_slot_mask"],
            local["y_node"] + host_index * cap_local,
            cap_local * host_count,
        ).astype(local["y_node"].dtype)

    dp = data_parallel_size(mesh)
    dax = data_axes(mesh)
    out = {}
    for key, v in adj.items():
        arr = np.asarray(v)
        if key in _REPLICATED_FIELDS or arr.ndim <= 1:
            out[key] = jax.device_put(arr, NamedSharding(mesh, P()))
            continue
        gshape = (k, arr.shape[1] * host_count) + arr.shape[2:]
        if gshape[1] % dp != 0:
            raise ValueError(
                f"stacked field '{key}' global batch axis {gshape[1]} not "
                f"divisible by dp={dp} on a multi-process mesh"
            )
        spec = NamedSharding(mesh, P(None, dax, *([None] * (arr.ndim - 2))))
        out[key] = jax.make_array_from_process_local_data(spec, arr, gshape)
    return out
