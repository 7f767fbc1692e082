"""Incremental inference: re-score every comment as a discussion grows.

The reference has no serving entry; "updatable comment predictions"
(reference README.md:13) is realized implicitly — every forward pass yields a
logit for every node, and re-scoring after new replies means re-running the
full forward over the extended tree (SURVEY.md §3.5). This module makes that
an explicit first-class API, TPU-shaped:

- trees are padded into the same static node-count buckets as training, so a
  growing discussion only triggers a recompile when it crosses a bucket
  boundary — scoring a tree that grew by one node reuses the cached program;
- ``add_node``/``score`` maintain the incremental state (parents, tokens,
  images); distances are recomputed host-side by the native tree kernel
  (O(n^2), microseconds at discussion scale);
- batch scoring amortizes across many discussions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    ModelConfig,
    TaskConfig,
)
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.preprocess import (
    GraphItem,
    preprocess_item,
)
from multimodaldiscussiontransformer_tpu.data.trees import tree_distance_pairs


@dataclass
class Discussion:
    """Mutable host-side discussion tree being scored incrementally."""

    parents: List[int] = field(default_factory=list)  # -1 for root
    input_ids: List[np.ndarray] = field(default_factory=list)
    token_type_ids: List[np.ndarray] = field(default_factory=list)
    attention_mask: List[np.ndarray] = field(default_factory=list)
    images: Dict[int, np.ndarray] = field(default_factory=dict)  # node -> (3,H,W)

    def add_node(
        self,
        parent: int,
        input_ids: np.ndarray,
        attention_mask: Optional[np.ndarray] = None,
        token_type_ids: Optional[np.ndarray] = None,
        image: Optional[np.ndarray] = None,
    ) -> int:
        """Append a comment under ``parent`` (-1 for the root post).
        Returns the new node id."""
        nid = len(self.parents)
        if parent >= nid:
            raise ValueError(f"parent {parent} does not exist")
        self.parents.append(int(parent))
        ids = np.asarray(input_ids, np.int32)
        self.input_ids.append(ids)
        self.attention_mask.append(
            np.asarray(
                attention_mask if attention_mask is not None else (ids != 0),
                np.int32,
            )
        )
        self.token_type_ids.append(
            np.asarray(
                token_type_ids
                if token_type_ids is not None
                else np.zeros_like(ids),
                np.int32,
            )
        )
        if image is not None:
            self.images[nid] = np.asarray(image, np.float32)
        return nid

    @property
    def num_nodes(self) -> int:
        return len(self.parents)

    def to_item(self, idx: int = 0) -> GraphItem:
        n = self.num_nodes
        parents = np.asarray(self.parents, np.int64)
        pairs = tree_distance_pairs(parents)
        edges = [(p, i) for i, p in enumerate(parents) if p >= 0]
        edge_index = (
            np.asarray(edges + [(b, a) for a, b in edges], np.int64).T
            if edges
            else np.zeros((2, 0), np.int64)
        )
        has_image = np.asarray(
            [i in self.images for i in range(n)], bool
        )
        imgs = (
            np.stack([self.images[i] for i in range(n) if i in self.images])
            if self.images
            else np.zeros((0, 3, 224, 224), np.float32)
        )
        return preprocess_item(
            idx=idx,
            tokens={
                "input_ids": np.stack(self.input_ids),
                "token_type_ids": np.stack(self.token_type_ids),
                "attention_mask": np.stack(self.attention_mask),
            },
            edge_index=edge_index,
            distance_pairs=pairs,
            x_images=imgs,
            x_image_index=has_image,
            y=np.zeros(0, np.int64),
            y_mask=np.zeros(n, bool),
        )


def _batch_bucket(n: int, buckets) -> int:
    """Round a request-batch size up to its ladder entry.

    ``"pow2"`` (the default ladder) -> next power of two; an explicit tuple
    -> smallest entry >= n; ``None`` -> n (no padding)."""
    if buckets is None:
        return n
    if buckets == "pow2":
        b = 1
        while b < n:
            b *= 2
        return b
    for b in sorted(buckets):
        if b >= n:
            return int(b)
    raise ValueError(
        f"request batch {n} exceeds the largest batch bucket {max(buckets)}"
    )


class DiscussionScorer:
    """Scores (and re-scores) discussions with a trained mDT model.

    One jit-compiled program per (node-bucket, capacity, batch-bucket)
    signature; growing trees hit the compile cache until they cross a
    bucket boundary. Request batches are padded up the ``batch_buckets``
    ladder with the collator's inert zero-node pad graphs
    (``collate(pad_to_graphs=...)``) so coalesced serving batches
    (serve/server.py::BatchingScorer drains 1..max_batch requests) reuse a
    handful of compiled programs instead of one per distinct size; real
    items' probabilities are unchanged (padding-invariance contract,
    tests/test_serve.py::test_batch_bucket_padding_is_inert)."""

    def __init__(
        self,
        model,
        params,
        data_cfg: Optional[DataConfig] = None,
        task_cfg: Optional[TaskConfig] = None,
        image_shape=(3, 224, 224),
        mesh=None,
        batch_buckets="pow2",
    ):
        """``mesh``: optional device mesh for sharded serving. A mesh with
        an 'sp' axis (``parallel.mesh.make_mesh(sp_size>1)``) plus a model
        whose config sets ``sequence_parallel=True`` scores GIANT trees —
        the node axis and its O(S^2) bias shard 1/sp per chip and attention
        runs as a ring over ICI (ops/ring_attention.py), so discussions far
        past one chip's HBM re-score through the same API.

        ``batch_buckets``: ``"pow2"`` (default), an explicit ascending
        tuple, or ``None`` to disable request-batch padding."""
        import jax

        self.model = model
        self.params = params
        self.data_cfg = data_cfg or DataConfig(batch_size=1)
        self.task_cfg = task_cfg or TaskConfig()
        self.image_shape = image_shape
        self.mesh = mesh
        self.batch_buckets = batch_buckets
        self._apply = jax.jit(
            lambda p, b: self.model.apply(p, b, deterministic=True).logits
        )

    @classmethod
    def from_checkpoint(
        cls,
        save_dir: str,
        model_cfg: Optional[ModelConfig] = None,
        step: Optional[int] = None,
        best: bool = True,
        **kw,
    ) -> "DiscussionScorer":
        """Build a scorer from an Orbax training checkpoint directory.

        Loads the best (default) or latest step's params. The model is
        reconstructed from ``model_cfg`` (canonical config by default) with
        deterministic serving settings."""
        import jax
        import jax.numpy as jnp

        from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
        from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
            Checkpointer,
        )

        cfg = model_cfg or ModelConfig()
        model = MDTModel(cfg, dtype=jnp.dtype(cfg.dtype))
        ckpt = Checkpointer(save_dir)
        if step is not None:  # explicit step wins
            restored = ckpt.restore_raw(step=step, best=False)
        else:
            restored = ckpt.restore_raw(best=best)
        ckpt.close()
        if restored is None:
            raise FileNotFoundError(f"no checkpoints under {save_dir}")
        params = (
            restored["params"] if isinstance(restored, dict) and "params" in restored
            else getattr(restored, "params", restored)
        )
        # layout-adapt: serve a scan_layers checkpoint with an unrolled
        # serving config and vice versa (utils/scan_params.py)
        from multimodaldiscussiontransformer_tpu.utils.scan_params import (
            adapt_params,
        )

        params = adapt_params(params, cfg)
        return cls(model, params, **kw)

    def score_items(self, items: Sequence[GraphItem]) -> List[np.ndarray]:
        """Per-node class probabilities for each discussion item."""
        import jax
        import jax.numpy as jnp

        items = list(items)
        target = _batch_bucket(len(items), self.batch_buckets)
        batch = collate(
            list(items),
            pad_to_graphs=target,
            spatial_pos_max=self.task_cfg.spatial_pos_max,
            node_buckets=self.data_cfg.node_buckets,
            node_capacity_buckets=self.data_cfg.node_capacity_buckets,
            image_capacity_buckets=self.data_cfg.image_capacity_buckets,
            label_capacity_buckets=self.data_cfg.label_capacity_buckets,
            image_shape=self.image_shape,
        )
        if self.mesh is not None:
            from multimodaldiscussiontransformer_tpu.parallel.mesh import (
                shard_batch,
            )

            with self.mesh:
                jb = shard_batch(self.mesh, batch.asdict())
                logits = np.asarray(
                    jax.device_get(self._apply(self.params, jb)), np.float32
                )
        else:
            jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
            logits = np.asarray(self._apply(self.params, jb), np.float32)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        out = []
        off = 0
        for it in items:  # pad graphs hold no flat node rows
            out.append(probs[off : off + it.num_nodes])
            off += it.num_nodes
        return out

    def score(self, discussion: Discussion) -> np.ndarray:
        """(N, num_classes) probabilities for every comment in the tree —
        call again after ``add_node`` to re-score the grown discussion."""
        return self.score_items([discussion.to_item()])[0]
