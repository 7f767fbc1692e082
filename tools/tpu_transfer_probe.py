"""Quantify the CLI-loop residual vs the fenced bench (VERDICT r3 #2).

After the metric-readback fix the product loop runs ~44 disc/s vs the
bench's 65 on the tunneled chip. The bench reuses pre-staged device
batches; the product loop transfers a fresh scan group per update (via the
threaded prefetcher). This probe measures, on the real chip with the
cached canonical program:

  A. chained steps over ONE staged group            (no H2D at all)
  B. chained steps cycling 6 PRE-STAGED groups      (bench's shape)
  C. fresh device_put per step, same thread          (fully serialized)
  D. fresh device_put per step from a prefetch thread (the product path)
  E. one device_put of m=3 stacked groups per 3 steps (call coalescing)

C-A isolates the per-update transfer cost; D shows how much the tunnel
lets the prefetch thread hide; E shows whether fewer-but-larger puts help
(per-call overhead vs bandwidth). Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, MAX_NODES, NODE_CAP, IMG_CAP, LABEL_CAP, SEQ = 12, 32, 256, 64, 128, 100
UF = 3
N_GROUPS = 6
STEPS = 18


def main() -> int:
    import jax
    import numpy as np

    from multimodaldiscussiontransformer_tpu.core.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig, OptimConfig, TaskConfig, TrainConfig,
    )
    from multimodaldiscussiontransformer_tpu.data.loader import (
        cast_images_for_transfer,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        make_mesh, shard_stacked_batch,
    )
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    sys.path.insert(0, REPO)
    import bench as benchmod

    cfg = TrainConfig(
        data=DataConfig(
            batch_size=BATCH,
            node_buckets=(MAX_NODES,), node_capacity_buckets=(NODE_CAP,),
            image_capacity_buckets=(IMG_CAP,),
            label_capacity_buckets=(LABEL_CAP,),
        ),
        optim=OptimConfig(update_freq=UF, bf16_adam_state=False),
        task_cfg=TaskConfig(dataset_name="synthetic"),
        dp_size=1, tp_size=1,
    )
    device = jax.devices()[0]
    mesh = make_mesh(1, 1, devices=[device])
    trainer = Trainer(cfg, mesh=mesh)
    host_batches = benchmod._build(cfg, mesh)
    host_groups = [
        {
            k: np.stack([host_batches[(j + m) % len(host_batches)][k]
                         for m in range(UF)])
            for k in host_batches[0]
        }
        for j in range(N_GROUPS)
    ]
    host_groups = [
        cast_images_for_transfer(g, trainer._image_transfer_dtype)
        for g in host_groups
    ]
    state = trainer.init_state(host_batches[0])
    step = trainer._make_train_step_scan()
    res = {}

    def fence(logs):
        return float(jax.device_get(logs["loss"]))

    with mesh:
        staged = [shard_stacked_batch(mesh, g) for g in host_groups]
        # warm
        for i in range(3):
            state, logs = step(state, staged[i % N_GROUPS])
        fence(logs)

        # A: one group reused
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, logs = step(state, staged[0])
        fence(logs)
        res["A_one_staged_group_s_per_update"] = (
            (time.perf_counter() - t0) / STEPS
        )

        # B: cycle staged groups (bench)
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, logs = step(state, staged[i % N_GROUPS])
        fence(logs)
        res["B_cycled_staged_s_per_update"] = (
            (time.perf_counter() - t0) / STEPS
        )

        # C: fresh put per step, same thread
        t0 = time.perf_counter()
        for i in range(STEPS):
            jb = shard_stacked_batch(mesh, host_groups[i % N_GROUPS])
            state, logs = step(state, jb)
        fence(logs)
        res["C_serial_put_s_per_update"] = (time.perf_counter() - t0) / STEPS

        # D: product path — ThreadedPrefetcher
        from multimodaldiscussiontransformer_tpu.data.loader import (
            ThreadedPrefetcher,
        )

        def src():
            for i in range(STEPS):
                yield host_groups[i % N_GROUPS]

        t0 = time.perf_counter()
        for jb in ThreadedPrefetcher(
            src(), lambda h: shard_stacked_batch(mesh, h)
        ):
            state, logs = step(state, jb)
        fence(logs)
        res["D_prefetch_thread_s_per_update"] = (
            (time.perf_counter() - t0) / STEPS
        )

        # E: coalesced put — m groups in one transfer, sliced on device
        M = 3
        super_groups = [
            {
                k: np.stack([host_groups[(j * M + m) % N_GROUPS][k]
                             for m in range(M)])
                for k in host_groups[0]
            }
            for j in range(2)
        ]
        t0 = time.perf_counter()
        n_done = 0
        while n_done < STEPS:
            sg = shard_stacked_batch(
                mesh, super_groups[(n_done // M) % 2]
            )  # (M, UF, ...)
            for m in range(M):
                jb = jax.tree.map(lambda x: x[m], sg)
                state, logs = step(state, jb)
                n_done += 1
        fence(logs)
        res["E_coalesced_m3_s_per_update"] = (time.perf_counter() - t0) / STEPS

    out = {
        k: round(v, 4) for k, v in res.items()
    }
    out["transfer_cost_per_update_s"] = round(
        res["C_serial_put_s_per_update"] - res["B_cycled_staged_s_per_update"], 4
    )
    out["prefetch_hides_s"] = round(
        res["C_serial_put_s_per_update"] - res["D_prefetch_thread_s_per_update"], 4
    )
    out["coalesce_saves_s"] = round(
        res["D_prefetch_thread_s_per_update"] - res["E_coalesced_m3_s_per_update"], 4
    )
    assert all(math.isfinite(v) for v in out.values())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
