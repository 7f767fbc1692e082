"""Mesh/axis definitions and sharding rules.

The reference's only parallelism is FairSeq DDP over NCCL
(run_train.sh:52, SURVEY.md §2.4). The TPU-native replacement is SPMD over a
``jax.sharding.Mesh`` with named axes:

- ``dp``  — data parallel: every per-batch leading dim (graphs B, flat node
  capacity C, image capacity I, label capacity L) is sharded;
- ``tp``  — tensor parallel: attention heads and FFN hidden dims of every
  tower/graph layer are sharded; XLA GSPMD inserts the all-reduces on the
  row-parallel output projections.

No hand-written collectives: lay out the shardings, jit the step, and XLA
rides ICI. Metric logging outputs are whole-batch sums, which under jit are
global cross-shard reductions — the psum equivalent of the reference's
summed ``logging_outputs`` contract (hatespeech_loss.py:175-182).
"""

from multimodaldiscussiontransformer_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
