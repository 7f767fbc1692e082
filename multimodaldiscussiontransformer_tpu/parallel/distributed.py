"""Multi-host / multi-slice initialization.

The reference's distributed story is single-host FairSeq DDP
(run_train.sh:52). TPU-natively, multi-host SPMD needs exactly one call per
process before any jax use; the mesh layer then sees all global devices.
ICI carries intra-slice collectives; DCN carries cross-slice ones — both are
XLA-inserted from the same sharding annotations.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op on single-process TPU VMs where the
    runtime auto-detects; explicit args for GKE/manual clusters)."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_info():
    """(process_index, process_count, local_device_count, global_device_count)."""
    import jax

    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def per_host_batch_indices(global_indices, batch_size: int):
    """Shard an epoch's example indices across hosts: each host loads only
    its slice (host data loading with per-host sharding, SURVEY.md §5)."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per_host = batch_size // n
    if batch_size % n:
        raise ValueError(f"batch_size {batch_size} not divisible by {n} hosts")
    return global_indices[i * per_host : (i + 1) * per_host]
