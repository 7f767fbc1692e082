"""A REAL multi-process jax.distributed exercise on CPU: two local
processes (coordinator on localhost) each build only their host slice of
every global batch (parallel/input.py + data/grain_loader.py) and place it
into globally-sharded jax.Arrays with ``put_host_local`` — the parent then
reassembles the addressable shards both processes wrote and asserts the
global batch is exactly the single-process assembly contract.

Reference surface: FairSeq DDP world-size semantics
(mDT/experiments/hateful_discussions/run_train.sh:52); the per-host input
contract this validates is SURVEY.md §5's "host data loading via Grain with
per-host sharding"."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys

pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]

from multimodaldiscussiontransformer_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import jax
import numpy as np

info = distributed.process_info()
assert info[0] == pid and info[1] == 2, info
assert info[3] == 4, f"expected 4 global devices, got {info}"

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    TaskConfig,
)
from multimodaldiscussiontransformer_tpu.data.grain_loader import grain_batches
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.input import put_host_local
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh

IMG = (3, 32, 32)
DATA = DataConfig(
    batch_size=4,
    batch_size_is_per_replica=False,
    max_text_len=16,
    node_buckets=(8,),
    node_capacity_buckets=(64,),
    image_capacity_buckets=(16,),
    label_capacity_buckets=(32,),
)
TASK = TaskConfig(dataset_name="synthetic", seed=7)

ds = synthetic_dataset(
    num_graphs=12, seed=7, seq_len=16, vocab_size=128, image_shape=IMG,
    max_nodes=8,
)
local = next(
    iter(
        grain_batches(
            ds, ds.train_idx, DATA, TASK, epoch=1, shuffle=True,
            image_shape=IMG, host_index=pid, host_count=2,
        )
    )
).asdict()
# put_host_local contract: nsamples must already be the GLOBAL real-graph
# count (host-computable: both hosts iterate the same global index list)
local["nsamples"] = np.asarray(4, np.int32)

mesh = make_mesh(4, 1)
arrs = put_host_local(mesh, local, host_index=pid, host_count=2)

shards = {}
for k, a in arrs.items():
    gshape = ",".join(str(d) for d in a.shape)
    for j, sh in enumerate(a.addressable_shards):
        starts = ",".join(
            str(0 if s.start is None else s.start) for s in sh.index
        ) if sh.index else ""
        shards[f"{k}|{gshape}|{starts}|{j}"] = np.asarray(sh.data)
np.savez(out, **shards)
print(f"worker {pid} ok: {len(shards)} shards")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_host_input(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"shards{pid}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py), str(pid), str(port), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # reassemble the global arrays from both processes' addressable shards
    assembled = {}
    for out in outs:
        with np.load(out) as z:
            for key in z.files:
                k, gshape, starts, _ = key.split("|")
                shape = tuple(int(d) for d in gshape.split(",") if d)
                data = z[key]
                if k not in assembled:
                    assembled[k] = np.zeros(shape, data.dtype)
                if starts:
                    idx = tuple(
                        slice(int(s), int(s) + d)
                        for s, d in zip(starts.split(","), data.shape)
                    )
                    assembled[k][idx] = data
                else:
                    assembled[k] = data.reshape(shape)

    # expected: the documented single-process assembly of the two host
    # slices (the layout contract, parallel/input.py)
    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        TaskConfig,
    )
    from multimodaldiscussiontransformer_tpu.data.grain_loader import (
        grain_batches,
    )
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_dataset,
    )
    from multimodaldiscussiontransformer_tpu.parallel.input import (
        assemble_global_batch,
    )

    IMG = (3, 32, 32)
    DATA = DataConfig(
        batch_size=4,
        batch_size_is_per_replica=False,
        max_text_len=16,
        node_buckets=(8,),
        node_capacity_buckets=(64,),
        image_capacity_buckets=(16,),
        label_capacity_buckets=(32,),
    )
    TASK = TaskConfig(dataset_name="synthetic", seed=7)
    ds = synthetic_dataset(
        num_graphs=12, seed=7, seq_len=16, vocab_size=128, image_shape=IMG,
        max_nodes=8,
    )
    locals_ = [
        next(
            iter(
                grain_batches(
                    ds, ds.train_idx, DATA, TASK, epoch=1, shuffle=True,
                    image_shape=IMG, host_index=h, host_count=2,
                )
            )
        ).asdict()
        for h in range(2)
    ]
    expected = assemble_global_batch(locals_)
    expected["nsamples"] = np.asarray(4, np.int32)

    assert set(assembled) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(
            assembled[k], expected[k], err_msg=k
        )
