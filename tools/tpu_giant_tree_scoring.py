"""Giant-discussion scoring on the real chip: the serving story at scale.

Builds a synthetic discussion with hundreds/thousands of comments, scores
it through ``serve.DiscussionScorer`` (canonical model geometry, random
init), grows it by one node, and re-scores — demonstrating that:
- the graph attention routes through the streaming (flash) kernel
  (S = nodes + 1 >= ops.tree_attention._FLASH_MIN_S) so the (S, S) score
  matrix never materializes;
- bucket-stable incremental re-scoring hits the compile cache (the +1-node
  tree lands in the same node bucket).

    python tools/tpu_giant_tree_scoring.py [--nodes 600]

Prints one JSON line {nodes, s_attention, first_score_s, rescore_s, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=600)
    p.add_argument("--seq", type=int, default=100)
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
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
    from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta
    from multimodaldiscussiontransformer_tpu.serve.incremental import (
        Discussion,
        DiscussionScorer,
    )

    n = a.nodes
    s_attn = n + 1
    bucket = -(-n // 64) * 64  # one stable node bucket around n
    cfg = ModelConfig(use_image_tower=False)  # text+graph giant-tree path
    model = MDTModel(cfg, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    d = Discussion()
    root_ids = rng.randint(1000, cfg.text_tower.vocab_size, a.seq).astype(
        np.int32
    )
    d.add_node(-1, root_ids)
    for i in range(1, n):
        parent = int(rng.randint(0, i))
        ids = rng.randint(1000, cfg.text_tower.vocab_size, a.seq).astype(
            np.int32
        )
        d.add_node(parent, ids)

    data_cfg = DataConfig(
        batch_size=1,
        node_buckets=(bucket, bucket + 64),
        node_capacity_buckets=(bucket, bucket + 64),
        image_capacity_buckets=(0,),
        label_capacity_buckets=(8,),
    )
    item = d.to_item()
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0),
        _collated(item, data_cfg),
        deterministic=True,
    )
    scorer = DiscussionScorer(model, params, data_cfg=data_cfg)

    t0 = time.perf_counter()
    probs = scorer.score(d)
    first = time.perf_counter() - t0
    assert probs.shape == (n, cfg.num_classes)
    assert np.isfinite(probs).all() and np.allclose(probs.sum(-1), 1.0, atol=1e-3)

    # grow by one comment; same bucket -> cached program
    d.add_node(0, rng.randint(1000, cfg.text_tower.vocab_size, a.seq).astype(np.int32))
    t0 = time.perf_counter()
    probs2 = scorer.score(d)
    rescore = time.perf_counter() - t0
    assert probs2.shape == (n + 1, cfg.num_classes)

    print(
        json.dumps(
            {
                "nodes": n,
                "s_attention": s_attn,
                "flash_path": bool(s_attn >= ta._FLASH_MIN_S),
                "first_score_s": round(first, 3),
                "rescore_s": round(rescore, 3),
                "node_bucket": bucket,
            }
        )
    )


def _collated(item, data_cfg):
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.data.collator import collate

    b = collate(
        [item],
        node_buckets=data_cfg.node_buckets,
        node_capacity_buckets=data_cfg.node_capacity_buckets,
        image_capacity_buckets=data_cfg.image_capacity_buckets,
        label_capacity_buckets=data_cfg.label_capacity_buckets,
    )
    return {k: jnp.asarray(v) for k, v in b.asdict().items()}


if __name__ == "__main__":
    main()
