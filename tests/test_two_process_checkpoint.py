"""Multi-process checkpoint save/restore over a REAL 2-process
``jax.distributed`` mesh (CPU): with fsdp the params' shards span hosts, so
no single process can materialize the state — ``Checkpointer.save`` must
hand Orbax the GLOBAL jax.Arrays (each process writes its addressable
shards) and ``restore`` must rebuild global arrays placed by the live
state's shardings so the result can feed the pjit-ed train step directly.

Reference surface: FairSeq's distributed checkpointing under
``--distributed-world-size`` (run_train.sh:52) with ``--save-dir`` /
``--restore-file`` semantics (run_train.sh:57-58).

Synchronous saves (``async_save=False``): the async path's background
barriers deadlock when both ranks share one CPU core (see
tests/test_two_process_train.py); on a real pod async stays the default.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys

pid, port, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

from multimodaldiscussiontransformer_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import jax
import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    synthetic_dataset,
)
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer
from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
    Checkpointer,
    restore_params_into_state,
)

IMG = (3, 32, 32)
cfg = TrainConfig(
    model=tiny_model_config(),
    data=DataConfig(
        batch_size=4,
        batch_size_is_per_replica=False,
        max_text_len=16,
        # single-entry ladders: both hosts must pick one identical shape
        node_buckets=(8,),
        node_capacity_buckets=(32,),
        image_capacity_buckets=(8,),
        label_capacity_buckets=(16,),
    ),
    optim=OptimConfig(lr=1e-3, warmup_updates=1, total_num_update=10,
                      update_freq=1),
    task_cfg=TaskConfig(dataset_name="synthetic", seed=5),
    fsdp=True,
)
mesh = make_mesh(4, 1)
trainer = Trainer(cfg, mesh=mesh, image_shape=IMG)
assert trainer.host_count == 2, trainer.host_count

ds = synthetic_dataset(
    num_graphs=12, seed=5, seq_len=16, vocab_size=128, image_shape=IMG,
    max_nodes=8,
)
local = next(iter(trainer.train_batches(ds, epoch=1))).asdict()
state = trainer.init_state(local)

# fsdp must actually shard at least one big param across processes — the
# test is vacuous otherwise
leaves = jax.tree.leaves(state.params)
assert any(
    not leaf.is_fully_replicated
    and len(leaf.sharding.device_set) == 4
    for leaf in leaves
), "no parameter is fsdp-sharded over the global mesh"

ckpt = Checkpointer(ckpt_dir, async_save=False)
ckpt.save(state, 1)
ckpt.wait()

# restore into a zeroed clone: proves values come from disk, not the target
zeroed = state.replace(
    params=jax.tree.map(lambda x: x * 0, state.params)
)
restored = ckpt.restore(zeroed)
assert restored is not None
state2 = restore_params_into_state(trainer, zeroed, restored, False)

for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
    assert isinstance(b, jax.Array), type(b)
    assert b.sharding == a.sharding, (b.sharding, a.sharding)
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        np.testing.assert_array_equal(
            np.asarray(sa.data), np.asarray(sb.data)
        )

# the restored state must feed the pjit-ed step directly: same batch, same
# rng, same params => bit-identical loss to the original state's step
step = trainer._make_train_step()
jb = trainer._put_batch(local)
with mesh:
    _, logs_orig = step(state, jb)
    _, logs_rest = step(state2, jb)
l_orig, l_rest = float(logs_orig["loss"]), float(logs_rest["loss"])
assert np.isfinite(l_orig)
assert l_orig == l_rest, (l_orig, l_rest)
print(f"worker {pid} ok: fsdp save/restore roundtrip, step loss {l_rest}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fsdp_checkpoint_roundtrip(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    ckpt_dir = tmp_path / "ckpt"
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), str(port),
             str(ckpt_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), (
        f"--- rank0 ---\n{logs[0][-4000:]}\n--- rank1 ---\n{logs[1][-4000:]}"
    )
    for pid in range(2):
        assert f"worker {pid} ok" in logs[pid], logs[pid][-2000:]
