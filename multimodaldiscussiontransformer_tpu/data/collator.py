"""Static-shape bucketed collator — the TPU-native redesign of the reference
collator (mDT/src/data/collator.py:69-179).

The reference pads every per-graph tensor to the *batch max* node count and
lets the GPU model flatten nodes with boolean masks
(multigraphormer_graph_encoder.py:321-324). Under XLA every distinct shape is
a recompile and dynamic boolean indexing is unavailable, so this collator
instead emits **fixed-capacity buffers** chosen from small bucket ladders:

- per-graph node grid padded to a node-count bucket ``Nmax``;
- all real nodes across the batch gathered (host-side) into a flat text-tower
  buffer of capacity ``C`` (bucketed), with ``node_graph``/``node_pos`` index
  vectors replacing the reference's ``x[x_token_mask]`` boolean flattening;
- image-bearing nodes gathered into a ViT buffer of capacity ``I`` with a
  ``image_node -> C`` index vector replacing ``bottle_neck[x_image_indexes]``
  (multi_graphormer_fusion_layer.py:55-66);
- labelled nodes gathered into a loss buffer of capacity ``L`` with a
  ``y_node -> C`` index vector replacing ``logits[y_mask]``
  (hatespeech_loss.py:93-95).

Numerics are unchanged: padded slots scatter to a trash row / are masked out
of every reduction, and the attention-bias assembly reproduces the reference
padding semantics exactly:

- spatial_pos and degrees are +1-shifted so 0 means padding
  (collator.py:8-20, 59-66);
- base attention bias is 0 inside the real block, except ``-inf`` where
  ``distance >= spatial_pos_max`` (distance clipping, collator.py:122-126);
  real-row->pad-col is ``-inf``; pad-row->real-col is 0 (collator.py:38-47).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, fields
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimodaldiscussiontransformer_tpu.data.preprocess import GraphItem

NEG_INF = float("-inf")


def _bucket(value: int, ladder: Sequence[int], multiple: int = 1) -> int:
    """Smallest ladder entry >= value (entries must respect ``multiple``);
    falls back to value rounded up to ``multiple`` beyond the ladder."""
    for b in ladder:
        if b >= value and b % max(multiple, 1) == 0:
            return b
    m = max(multiple, 1)
    return -(-value // m) * m


@dataclass
class Batch:
    """One device-ready batch. All arrays are numpy with static shapes.

    Shape legend: B graphs, Nmax nodes/graph, C flat node capacity, T text
    tokens, I image capacity, L label capacity."""

    # text tower (reference keys x / x_token_type_ids / x_attention_mask,
    # flattened to real nodes like multigraphormer_graph_encoder.py:321-324)
    input_ids: np.ndarray  # (C, T) int32
    token_type_ids: np.ndarray  # (C, T) int32
    attention_mask: np.ndarray  # (C, T) int32
    node_mask: np.ndarray  # (C,) bool — real node slots
    node_graph: np.ndarray  # (C,) int32 — graph id; padded slots -> B
    node_pos: np.ndarray  # (C,) int32 — node index within graph

    # image tower
    images: np.ndarray  # (I, 3, H, W) float32
    image_mask: np.ndarray  # (I,) bool
    image_node: np.ndarray  # (I,) int32 — node slot in C; padded -> C

    # graph grid
    spatial_pos: np.ndarray  # (B, Nmax, Nmax) int32, +1-shifted, 0 = pad
    attn_bias: np.ndarray  # (B, Nmax+1, Nmax+1) float32 base bias
    in_degree: np.ndarray  # (B, Nmax) int32, +1-shifted, 0 = pad
    out_degree: np.ndarray  # (B, Nmax) int32 (== in_degree, undirected)
    grid_mask: np.ndarray  # (B, Nmax) bool — real grid slots

    # labels
    y: np.ndarray  # node task: (L,) int32; contrastive: (B,) float32
    y_node: np.ndarray  # (L,) int32 — node slot in C; padded -> C
    y_slot_mask: np.ndarray  # (L,) bool
    hard_y: np.ndarray  # (B,) float32 (contrastive) or zeros

    idx: np.ndarray  # (B,) int32
    nsamples: np.ndarray  # () int32 — number of graphs (NumSamplesDataset)

    def asdict(self) -> Dict[str, np.ndarray]:
        return {f.name: getattr(self, f.name) for f in fields(self)}

    @property
    def num_graphs(self) -> int:
        return int(self.idx.shape[0])

    @property
    def max_nodes(self) -> int:
        return int(self.in_degree.shape[1])

    @property
    def node_capacity(self) -> int:
        return int(self.input_ids.shape[0])


def pad_batch_to_shapes(
    batch: Dict[str, np.ndarray], shapes: Dict[str, Tuple[int, ...]]
) -> Dict[str, np.ndarray]:
    """Grow a collated batch's capacity axes to ``shapes`` with INERT
    padding — exactly what ``collate`` would have produced had it picked
    the larger buckets (the padding-invariance contract,
    tests/test_model.py::test_padding_invariance, guarantees the grown
    slots cannot change any real output).

    Growable axes: text length t, flat node capacity C, image capacity I,
    label capacity L, per-graph node count Nmax (and the bias's S=Nmax+1).
    The per-graph count B must match (an accumulation group always comes
    from one fixed-batch-size stream). Pad sentinels that encode the OLD
    capacity (``image_node``/``y_node`` -> C) are re-pointed at the new one."""
    b = batch["idx"].shape[0]
    if shapes["idx"][0] != b:
        raise ValueError(
            f"pad_batch_to_shapes cannot grow the graph axis ({b} -> "
            f"{shapes['idx'][0]}); accumulation groups must share a batch size"
        )
    old_cap = batch["input_ids"].shape[0]
    new_cap = shapes["input_ids"][0]
    old_nmax = batch["in_degree"].shape[1]
    new_nmax = shapes["in_degree"][1]
    out: Dict[str, np.ndarray] = {}
    for k, v in batch.items():
        tgt = shapes[k]
        if v.shape == tgt:
            out[k] = v
            continue
        grown = np.zeros(tgt, dtype=v.dtype)
        if k == "attn_bias":
            grown[:] = NEG_INF
            # rows past the old S follow the collate pad-row recipe:
            # cols [0, n_g] are 0 (collator.py:38-47 semantics), rest -inf
            n_g = batch["grid_mask"].sum(axis=1)  # (B,)
            old_s, new_s = v.shape[1], tgt[1]
            cols = np.arange(new_s)
            grown[:, old_s:, :] = np.where(
                (cols[None, :] <= n_g[:, None])[:, None, :], 0.0, NEG_INF
            )
            grown[:, :old_s, :old_s] = v
        elif k == "node_graph":
            grown[:] = b  # pad sentinel: graph-count, capacity-independent
            grown[: v.shape[0]] = v
        elif k == "image_node":
            grown[:] = new_cap
            grown[: v.shape[0]] = np.where(
                batch["image_mask"], v, new_cap
            )
        elif k == "y_node":
            grown[:] = new_cap
            grown[: v.shape[0]] = np.where(
                batch["y_slot_mask"], v, new_cap
            )
        else:
            # zero-padded everywhere else: ids/masks/degrees/spatial buckets
            # all use 0 as their padding value
            grown[tuple(slice(0, d) for d in v.shape)] = v
        out[k] = grown
    # re-point flat grid indices at the grown grid if Nmax changed:
    # flat scatter/gather targets are node_graph * Nmax + node_pos, which
    # the MODEL computes from in_degree's shape — node_graph/node_pos are
    # per-node coordinates, unchanged by capacity growth. (No action; noted
    # for the reader: old_nmax/new_nmax only affect the attn_bias block.)
    del old_cap, old_nmax, new_nmax
    return out


def all_pad_like(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """An ALL-PAD microbatch with the same shapes/dtypes as ``batch``.

    Built by running ``collate`` itself on zero items with single-entry
    ladders read off the template's shapes, so every pad convention (idx
    -1, ``attn_bias`` n=0 template rows, capacity sentinels) is the one
    the collator already emits for padded eval tails — not a parallel
    re-implementation. Used to grow a ragged epoch-tail accumulation
    group to the full ``update_freq`` so the scan train step keeps ONE
    compiled shape; a pad microbatch contributes exactly zero summed
    loss/grads/sample-size, so the update is bit-identical to the short
    group's (tests/test_scan_microbatches.py pins this)."""
    contrastive = batch["y_node"].shape[0] == 0
    out = collate(
        [],
        node_buckets=[batch["in_degree"].shape[1]],
        node_capacity_buckets=[batch["input_ids"].shape[0]],
        image_capacity_buckets=[batch["images"].shape[0]],
        label_capacity_buckets=[batch["y"].shape[0]],
        contrastive=contrastive,
        image_shape=tuple(batch["images"].shape[1:]),
        pad_to_graphs=batch["idx"].shape[0],
        text_len=batch["input_ids"].shape[1],
    ).asdict()
    mismatched = {
        k: (v.shape, batch[k].shape)
        for k, v in out.items()
        if v.shape != batch[k].shape
    }
    if mismatched:
        raise ValueError(f"all_pad_like shape mismatch: {mismatched}")
    return out


def collate(
    items: List[GraphItem],
    spatial_pos_max: int = 5,
    node_buckets: Sequence[int] = (8, 16, 32, 64, 128, 256),
    node_capacity_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024),
    image_capacity_buckets: Sequence[int] = (0, 8, 16, 32, 64),
    label_capacity_buckets: Sequence[int] = (8, 16, 32, 64, 128),
    shard_multiple: int = 1,
    contrastive: bool = False,
    image_shape: Tuple[int, int, int] = (3, 224, 224),
    text_len_buckets: Optional[Sequence[int]] = None,
    pad_to_graphs: Optional[int] = None,
    text_len: Optional[int] = None,
) -> Batch:
    """Collate preprocessed GraphItems into one static-shape Batch.

    ``text_len_buckets``: optional token-length ladder. The reference pads
    every comment to the tokenizer max (100, hateful_discussions.py:165) and
    pays the full text-tower cost for it; most comments are far shorter, so
    trimming to the smallest bucket covering the batch's longest attended
    token is a large FLOP saving with identical numerics (the removed
    columns are fully masked in every consumer).

    ``pad_to_graphs``: pad the per-graph axis up to this count with inert
    zero-node graphs so ragged eval tails reuse the full-batch compiled
    program and shard over dp. A pad graph is a graph whose every node row
    is padding (``grid_mask`` all-False, ``idx`` -1); it consumes no flat
    text/image/label capacity, ``nsamples`` counts only real graphs, and
    per-graph validity is recoverable as ``grid_mask.any(-1)``.

    ``items`` may be EMPTY when ``pad_to_graphs`` is set (a multi-host
    ragged eval tail can leave later hosts with zero rows): the result is an
    all-pad batch whose shapes match peers collating real rows under
    single-entry ladders. ``text_len`` then supplies the token length that
    non-empty peers would derive from their items."""
    b = len(items)
    if not items:
        if pad_to_graphs is None or text_len is None:
            raise ValueError(
                "collate([]) needs pad_to_graphs and text_len to emit an "
                "all-pad batch"
            )
        t = text_len
    else:
        t = items[0].input_ids.shape[1]
    if text_len_buckets and items:
        longest = max(
            (
                int(np.max(np.where(it.attention_mask.any(axis=0))[0], initial=0)) + 1
                if it.attention_mask.any()
                else 1
            )
            for it in items
        )
        t = min(_bucket(longest, text_len_buckets), t)
        items = [
            dataclasses.replace(
                it,
                input_ids=it.input_ids[:, :t],
                token_type_ids=it.token_type_ids[:, :t],
                attention_mask=it.attention_mask[:, :t],
            )
            for it in items
        ]
    n_per_graph = [it.num_nodes for it in items]
    total_nodes = sum(n_per_graph)
    nmax = _bucket(max(n_per_graph, default=1), node_buckets)
    cap = _bucket(total_nodes, node_capacity_buckets, shard_multiple)
    n_images = sum(int(it.x_image_index.sum()) for it in items)
    icap = _bucket(n_images, image_capacity_buckets, shard_multiple)

    input_ids = np.zeros((cap, t), dtype=np.int32)
    token_type_ids = np.zeros((cap, t), dtype=np.int32)
    attention_mask = np.zeros((cap, t), dtype=np.int32)
    node_mask = np.zeros(cap, dtype=bool)
    node_graph = np.full(cap, b, dtype=np.int32)
    node_pos = np.zeros(cap, dtype=np.int32)

    images = np.zeros((icap,) + image_shape, dtype=np.float32)
    image_mask = np.zeros(icap, dtype=bool)
    image_node = np.full(icap, cap, dtype=np.int32)

    ball = max(b, pad_to_graphs or 0)
    spatial_pos = np.zeros((ball, nmax, nmax), dtype=np.int32)
    attn_bias = np.full((ball, nmax + 1, nmax + 1), NEG_INF, dtype=np.float32)
    in_degree = np.zeros((ball, nmax), dtype=np.int32)
    grid_mask = np.zeros((ball, nmax), dtype=bool)

    y_vals: List[np.ndarray] = []
    y_nodes: List[int] = []
    contr_y = np.zeros(ball, dtype=np.float32)
    hard_y = np.zeros(ball, dtype=np.float32)
    idxs = np.full(ball, -1, dtype=np.int32)

    # pad graphs: the n=0 instance of the real-graph bias template — the
    # graph token attends only itself, every node row is padding
    attn_bias[b:, 0, 0] = 0.0
    attn_bias[b:, 1:, 0] = 0.0

    node_off = 0
    img_off = 0
    for g, it in enumerate(items):
        n = it.num_nodes
        idxs[g] = it.idx
        sl = slice(node_off, node_off + n)
        input_ids[sl] = it.input_ids
        token_type_ids[sl] = it.token_type_ids
        attention_mask[sl] = it.attention_mask
        node_mask[sl] = True
        node_graph[sl] = g
        node_pos[sl] = np.arange(n, dtype=np.int32)

        # +1 shifts: 0 becomes the padding id (collator.py:8-20, 59-66)
        spatial_pos[g, :n, :n] = it.spatial_pos + 1
        in_degree[g, :n] = it.in_degree + 1
        grid_mask[g, :n] = True

        # base attention bias: zeros within the real (n+1, n+1) block, -inf
        # in the [1:, 1:] sub-block where distance >= spatial_pos_max
        # (collator.py:122-126), pad rows -> real cols = 0 (collator.py:38-47)
        blk = np.zeros((n + 1, n + 1), dtype=np.float32)
        blk[1:, 1:][it.distance >= spatial_pos_max] = NEG_INF
        attn_bias[g, : n + 1, : n + 1] = blk
        attn_bias[g, n + 1 :, : n + 1] = 0.0

        # images, in node order (hateful_discussions.py:168-182)
        img_nodes = np.flatnonzero(it.x_image_index)
        k = len(img_nodes)
        if k:
            # drop the reference's all-zero placeholder convention
            # (collator.py:144-148): items with no real image carry
            # x_image_index all-False and an empty x_images
            images[img_off : img_off + k] = it.x_images[:k]
            image_mask[img_off : img_off + k] = True
            image_node[img_off : img_off + k] = node_off + img_nodes
            img_off += k

        if contrastive:
            contr_y[g] = float(np.asarray(it.y).reshape(-1)[0])
            if it.hard_y is not None:
                hard_y[g] = float(np.asarray(it.hard_y).reshape(-1)[0])
        else:
            assert it.y_mask is not None, "node task items need y_mask"
            lab_nodes = np.flatnonzero(it.y_mask)
            y_vals.append(np.asarray(it.y).reshape(-1))
            y_nodes.extend((node_off + lab_nodes).tolist())

        node_off += n

    if contrastive:
        y = contr_y
        y_node = np.zeros(0, dtype=np.int32)
        y_slot_mask = np.zeros(0, dtype=bool)
    else:
        flat_y = (
            np.concatenate(y_vals) if y_vals else np.zeros(0, dtype=np.int64)
        )
        n_labels = len(flat_y)
        lcap = _bucket(n_labels, label_capacity_buckets, shard_multiple)
        y = np.zeros(lcap, dtype=np.int32)
        y[:n_labels] = flat_y.astype(np.int32)
        y_node = np.full(lcap, cap, dtype=np.int32)
        y_node[:n_labels] = np.asarray(y_nodes, dtype=np.int32)
        y_slot_mask = np.zeros(lcap, dtype=bool)
        y_slot_mask[:n_labels] = True

    return Batch(
        input_ids=input_ids,
        token_type_ids=token_type_ids,
        attention_mask=attention_mask,
        node_mask=node_mask,
        node_graph=node_graph,
        node_pos=node_pos,
        images=images,
        image_mask=image_mask,
        image_node=image_node,
        spatial_pos=spatial_pos,
        attn_bias=attn_bias,
        in_degree=in_degree,
        out_degree=in_degree.copy(),
        grid_mask=grid_mask,
        y=y,
        y_node=y_node,
        y_slot_mask=y_slot_mask,
        hard_y=hard_y,
        idx=idxs,
        nsamples=np.asarray(b, dtype=np.int32),
    )
