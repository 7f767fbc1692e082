"""Multi-host prediction export (VERDICT r3 missing #5): ``Trainer.predict``
over a REAL 2-process ``jax.distributed`` mesh must return the SAME row set
as the single-process oracle — per-host row assembly from the logits'
addressable shards + an allgather so every rank holds the full table
(train/trainer.py::predict, _allgather_columns).

Reference surface: the eval artifact surface has no single-host restriction
(Comment-Only Experiments/src/text_bert.py:68-80).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = r"""
import json
import sys

import numpy as np


def build(cfg_overrides=None):
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

    IMG = (3, 32, 32)
    cfg = TrainConfig(
        model=tiny_model_config(dropout=0.0, attention_dropout=0.0,
                                act_dropout=0.0),
        data=DataConfig(
            batch_size=4,
            batch_size_is_per_replica=False,
            max_text_len=16,
            node_buckets=(8,),
            node_capacity_buckets=(32,),
            image_capacity_buckets=(8,),
            label_capacity_buckets=(16,),
        ),
        optim=OptimConfig(lr=1e-3, warmup_updates=1, total_num_update=10,
                          update_freq=1),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=7),
        **(cfg_overrides or {}),
    )
    ds = synthetic_dataset(
        num_graphs=16, seed=7, seq_len=16, vocab_size=128, image_shape=IMG,
        max_nodes=8,
    )
    return cfg, ds, IMG


def rows_as_sorted_table(cols):
    keys = sorted(cols)
    rows = sorted(
        tuple(round(float(cols[k][i]), 4) for k in keys)
        for i in range(len(cols["graph_idx"]))
    )
    return keys, rows
"""

WORKER = COMMON + r"""
pid, port, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
dp = int(sys.argv[4]) if len(sys.argv) > 4 else 4
tp = int(sys.argv[5]) if len(sys.argv) > 5 else 1

from multimodaldiscussiontransformer_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import jax

from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

cfg, ds, IMG = build({"fsdp": True})
mesh = make_mesh(dp, tp)
trainer = Trainer(cfg, mesh=mesh, image_shape=IMG)
assert trainer.host_count == 2

local = next(iter(trainer.train_batches(ds, epoch=1))).asdict()
state = trainer.init_state(local)

cols = trainer.predict(state, ds, split="test")
keys, rows = rows_as_sorted_table(cols)
if pid == 0:
    with open(out_json, "w") as f:
        json.dump({"keys": keys, "rows": rows}, f)
print(f"worker {pid} ok: {len(rows)} rows")
"""

ORACLE = COMMON + r"""
out_json = sys.argv[1]

from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

cfg, ds, IMG = build()
mesh = make_mesh(2, 1)
trainer = Trainer(cfg, mesh=mesh, image_shape=IMG)
local = next(iter(trainer.train_batches(ds, epoch=1))).asdict()
state = trainer.init_state(local)
cols = trainer.predict(state, ds, split="test")
keys, rows = rows_as_sorted_table(cols)
with open(out_json, "w") as f:
    json.dump({"keys": keys, "rows": rows}, f)
print(f"oracle ok: {len(rows)} rows")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(devices: int) -> dict:
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


import pytest


@pytest.mark.parametrize(
    "dp,tp",
    [
        (4, 1),  # pure data parallel (the original coverage)
        # tp>1: the logits replicate over tp, so each host sees its row
        # range once PER tp device — predict must dedupe addressable
        # shards by row range or export silently duplicated/misaligned
        # rows (ADVICE r4 medium; train/trainer.py::predict)
        (2, 2),
    ],
)
def test_two_process_predict_matches_single_process(tmp_path, dp, tp):
    two_json = tmp_path / "two.json"
    oracle_json = tmp_path / "oracle.json"

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), str(port),
             str(two_json), str(dp), str(tp)],
            env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
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

    oracle_py = tmp_path / "oracle.py"
    oracle_py.write_text(ORACLE)
    out = subprocess.run(
        [sys.executable, str(oracle_py), str(oracle_json)],
        env=_env(2), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]

    two = json.loads(two_json.read_text())
    oracle = json.loads(oracle_json.read_text())
    assert two["keys"] == oracle["keys"]
    assert len(two["rows"]) == len(oracle["rows"]) > 0
    # identical parameters (same seed/init) => identical per-node rows up to
    # the float rounding baked into rows_as_sorted_table
    mismatches = [
        (a, b) for a, b in zip(two["rows"], oracle["rows"])
        if any(abs(x - y) > 2e-3 for x, y in zip(a, b))
    ]
    assert not mismatches, mismatches[:5]
