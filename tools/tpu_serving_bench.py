"""Serving latency/throughput on the real chip through the PRODUCTION path.

The reference has no serving story (SURVEY.md §3.5 — re-running the training
forward is the implicit API); serve/{incremental,server}.py are this
framework's first-class replacement. This tool measures them on the chip:

- solo latency: one 20-node discussion scored end-to-end (host preprocess +
  collate + H2D + forward + D2H), p50/p95 over repeated calls;
- coalesced throughput: C client threads issue sequential ``score`` calls
  through one ``BatchingScorer`` for a fixed wall window — requests ride
  shared device batches padded up the batch-bucket ladder (so every drain
  size hits a pre-compiled program).

Random-init canonical-geometry model: latency is weight-independent.

    python tools/tpu_serving_bench.py [--window 20] [--concurrency 1,4,8]

Prints one JSON line {solo_p50_ms, solo_p95_ms, levels: {C: {req_s, ...}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pct(xs, q):
    xs = sorted(xs)
    return xs[min(int(q * len(xs)), len(xs) - 1)]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=20)
    p.add_argument("--seq", type=int, default=100)
    p.add_argument("--window", type=float, default=20.0,
                   help="seconds per concurrency level")
    p.add_argument("--solo-iters", type=int, default=30)
    p.add_argument("--concurrency", default="1,4,8")
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    a = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.core.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        ModelConfig,
    )
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
    from multimodaldiscussiontransformer_tpu.serve.incremental import (
        Discussion,
        DiscussionScorer,
        _batch_bucket,
    )
    from multimodaldiscussiontransformer_tpu.serve.server import BatchingScorer

    levels = [int(x) for x in a.concurrency.split(",")]
    cfg = ModelConfig()  # canonical geometry, text+graph serving
    model = MDTModel(cfg, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)

    def make_discussion() -> Discussion:
        d = Discussion()
        d.add_node(-1, rng.randint(1000, cfg.text_tower.vocab_size,
                                   a.seq).astype(np.int32))
        for i in range(1, a.nodes):
            d.add_node(int(rng.randint(0, i)),
                       rng.randint(1000, cfg.text_tower.vocab_size,
                                   a.seq).astype(np.int32))
        return d

    bucket = max(32, -(-a.nodes // 32) * 32)
    data_cfg = DataConfig(
        batch_size=1,
        node_buckets=(bucket,),
        node_capacity_buckets=tuple(sorted({
            bucket * b for b in (1, 2, 4, 8, 16) if b <= max(levels) * 2
        })),
        image_capacity_buckets=(0,),
        label_capacity_buckets=(8,),
    )
    disc = make_discussion()
    item = disc.to_item()
    host = collate(
        [item],
        pad_to_graphs=1,
        node_buckets=data_cfg.node_buckets,
        node_capacity_buckets=data_cfg.node_capacity_buckets,
        image_capacity_buckets=data_cfg.image_capacity_buckets,
        label_capacity_buckets=data_cfg.label_capacity_buckets,
    )
    jb = {k: jnp.asarray(v) for k, v in host.asdict().items()}
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), jb, deterministic=True
    )
    scorer = DiscussionScorer(model, params, data_cfg=data_cfg)

    # warm every program a drain of 1..max(levels) can hit: the compiled
    # signature is (batch bucket, node-capacity bucket) and the CAPACITY
    # depends on the REAL item count (s x nodes), not the padded batch —
    # so warm each drain size, not just each batch bucket
    compiles = {}
    for size in range(1, max(levels) + 1):
        t0 = time.perf_counter()
        scorer.score_items([disc.to_item(i) for i in range(size)])
        compiles[size] = round(time.perf_counter() - t0, 2)
        print(f"warmed drain size {size}: {compiles[size]}s",
              file=sys.stderr)

    # solo latency (direct scorer, no batching layer)
    lat = []
    for _ in range(a.solo_iters):
        t0 = time.perf_counter()
        scorer.score(disc)
        lat.append((time.perf_counter() - t0) * 1e3)

    out = {
        "nodes": a.nodes,
        "node_bucket": bucket,
        "warm_compile_s": compiles,
        "solo_p50_ms": round(_pct(lat, 0.50), 1),
        "solo_p95_ms": round(_pct(lat, 0.95), 1),
        "levels": {},
    }

    for c in levels:
        bs = BatchingScorer(scorer, max_batch=max(levels),
                            max_wait_ms=a.max_wait_ms)
        done = []
        lock = threading.Lock()
        stop = time.monotonic() + a.window

        def client():
            my = make_discussion()
            while time.monotonic() < stop:
                t0 = time.perf_counter()
                bs.score(my)
                dt = (time.perf_counter() - t0) * 1e3
                with lock:
                    done.append(dt)

        threads = [threading.Thread(target=client) for _ in range(c)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        bs.close()
        out["levels"][str(c)] = {
            "requests": len(done),
            "req_s": round(len(done) / wall, 2),
            "lat_p50_ms": round(_pct(done, 0.50), 1),
            "lat_p95_ms": round(_pct(done, 0.95), 1),
        }
        print(f"concurrency {c}: {out['levels'][str(c)]}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
