"""One-command two-stage rehearsal: raw JSON -> ingest -> contrastive
pre-train -> transfer -> fine-tune -> test F1.

The reference's canonical training story is a two-stage recipe
(run_train.sh:57-63): restore a contrastive pre-training checkpoint with
``--reset-optimizer`` and fine-tune on node prediction. The real corpus
(Pushshift dumps) and real tower weights (HF hub) are unreachable from this
environment, so this driver rehearses the FULL pipeline end to end on a
faithful mini-corpus it generates itself:

1. ``generate_mini_corpus`` writes raw discussion trees in the exact
   reference JSON schema (nested ``{id, data, images, tree}`` lines,
   hateful_discussions.py:107-232) with hate/normal labels, per-tree
   communities (for the contrastive stage), PNG images on some roots, and
   a mini WordPiece ``vocab.txt`` covering the corpus;
2. ``data_prep.splits.make_splits`` produces hate-stratified train/test
   line splits (6-export:50-58);
3. ``ingest.process`` tokenizes with the offline WordPiece tokenizer
   (data/tokenizer.py) and writes ``graph-<k>.npz`` + idx files;
4. stage 1 trains ``contrastive_learning`` on per-tree community labels
   (polar-opposite pairs as hard negatives, contrastive_loss.py:117-134);
5. the checkpoint is restored into a ``node_prediction`` trainer with
   optimizer reset + classifier-head reset (run_train.sh:63,
   node_prediction.py:44-54 intent);
6. stage 2 fine-tunes and prints test accuracy/P/R/F1 as one JSON line.

Run: ``python -m multimodaldiscussiontransformer_tpu.experiments.\
hateful_discussions.two_stage --out /tmp/rehearsal`` (CI-scale defaults,
a few minutes on CPU). Labels correlate with lexicon words, so the F1 is a
real learning signal, not chance.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, List, Optional

import numpy as np

# word lists: hate-labelled comments draw from HATE_WORDS, others from
# NEUTRAL_WORDS; communities skew topic words so contrastive can learn
HATE_WORDS = "blight vermin scum filth degenerate parasite".split()
NEUTRAL_WORDS = (
    "thanks interesting agree point source fair question answer detail "
    "update thread reply topic post story"
).split()
COMMUNITY_WORDS = {
    0: "gaming console pixel quest".split(),
    1: "garden flower seed bloom".split(),
    2: "finance market stock trade".split(),
    3: "cooking recipe flavor spice".split(),
}
# polar-opposite community pairs (hard negatives, contrastive_loss.py:124)
POLAR = {0: 1, 1: 0, 2: 3, 3: 2}

# context-mode markers: planted in the PARENT's text; the child's label
# depends ONLY on whether its parent carries one. Labeled nodes' own bodies
# are marker- and hate-word-free, so a per-comment text model is at chance
# and only discussion context separates the classes (the mDT claim,
# reference README.md:8-14).
MARKER_WORDS = "klaxon beacon omen".split()


def _mini_vocab() -> List[str]:
    words = sorted(
        set(
            HATE_WORDS
            + NEUTRAL_WORDS
            + MARKER_WORDS
            + [w for ws in COMMUNITY_WORDS.values() for w in ws]
            + "a the this is so very and much title link1 link2".split()
        )
    )
    return ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[", "]"] + words


def _sentence(rng, community: int, hateful: bool, n_words: int = 8) -> str:
    pool = (HATE_WORDS if hateful else NEUTRAL_WORDS) + COMMUNITY_WORDS[
        community
    ]
    return " ".join(rng.choice(pool) for _ in range(n_words))


def generate_mini_corpus(
    out_dir: str,
    n_trees: int = 200,
    seed: int = 0,
    image_prob: float = 0.2,
    image_px: int = 32,
    label_mode: str = "text",
    marker_repeats: int = 3,
    context_star: bool = False,
    image_style: str = "noise",
    comment_dist=None,
) -> Dict[str, str]:
    """Write raw.json (reference schema), per-tree communities.json, root
    images, and a covering mini vocab.txt. Returns the file paths.

    ``label_mode``:
    - "text": a hateful comment's OWN body draws from HATE_WORDS — labels
      are text-separable (pipeline rehearsal, not a graph-capability test);
    - "context": every labeled body is hate-word-free; a comment is hate
      IFF its PARENT's text carries a MARKER word (markers are planted
      independently of each node's own label) — per-comment text is at
      chance and only the discussion tree separates the classes. This is
      the corpus that makes the graph path PROVE itself
      (experiments/hateful_discussions/context_ablation.py);
    - "marker": identical tree/marker generation to "context", but each
      comment is labeled by its OWN marker flag — the supervised stage-A
      warm-up of the context ablation (the in-repo stand-in for the
      reference's pretrained towers, which arrive already knowing what
      hate words look like). Stage-A labels say nothing about stage-B
      test labels through a node's own text (markers are independent
      coins), so any above-chance context-corpus F1 after transfer must
      come from learned tree routing;
    - "context_or": hateful IFF own OR parent marker — the headline
      ablation corpus (see _write_context_tree's label_by notes): the
      own-marker half keeps the marker readout alive and aligned during
      training, the parent-only positives are reachable ONLY through
      tree routing, and a context-blind classifier has a provable F1
      ceiling below 1."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    raw_path = os.path.join(out_dir, "raw.json")
    communities: List[int] = []
    with open(raw_path, "w") as f:
        for t in range(n_trees):
            community = int(rng.randint(0, 4))
            communities.append(community)
            image = None
            if rng.rand() < image_prob:
                from PIL import Image

                if image_style == "smooth":
                    # low-frequency content (photo-like compressibility):
                    # white noise is zlib's worst case and makes scale runs
                    # pay an unrepresentative savez_compressed tax
                    base = rng.randint(0, 255, (4, 4, 3), dtype=np.uint8)
                    arr = np.asarray(
                        Image.fromarray(base).resize(
                            (image_px, image_px), resample=2
                        )
                    )
                else:
                    arr = rng.randint(
                        0, 255, (image_px, image_px, 3), dtype=np.uint8
                    )
                image = f"images/img{t}.png"
                Image.fromarray(arr).save(os.path.join(out_dir, image))
            if label_mode in ("context", "marker", "context_or"):
                _write_context_tree(
                    f, rng, t, community, image,
                    marker_repeats=marker_repeats, star=context_star,
                    label_by={
                        "marker": "self",
                        "context": "parent",
                        "context_or": "self_or_parent",
                    }[label_mode],
                )
                continue
            # comment_dist(rng) -> int overrides the CI-scale default tree
            # size (scale rehearsals want a heavy-tailed size mix)
            n_comments = (
                int(comment_dist(rng)) if comment_dist is not None
                else int(rng.randint(3, 8))
            )
            nodes = []
            for c in range(n_comments):
                hateful = bool(rng.rand() < 0.3)
                label = (
                    "DEG" if hateful else
                    ("lti_normal" if rng.rand() < 0.8 else "NA")
                )
                nodes.append(
                    {
                        "id": f"c{t}_{c}",
                        "data": {
                            "id": f"c{t}_{c}",
                            "body": _sentence(rng, community, hateful),
                            "label": label,
                            "parent_id": f"t3_{t}",
                            "link_id": f"t3_{t}",
                        },
                        "images": [],
                        "tree": [],
                    }
                )
            # chain some comments under others for real tree shapes
            top: List[dict] = []
            for i, node in enumerate(nodes):
                if i and rng.rand() < 0.5:
                    parent = nodes[int(rng.randint(0, i))]
                    node["data"]["parent_id"] = parent["id"]
                    parent["tree"].append(node)
                else:
                    top.append(node)
            tree = {
                "id": f"t3_{t}",
                "data": {
                    "id": f"t3_{t}",
                    "title": _sentence(rng, community, False, 4),
                    "selftext": _sentence(rng, community, False, 6),
                    "label": "Neutral",
                    "link_id": f"t3_{t}",
                },
                "images": [image] if image else [],
                "tree": top,
            }
            f.write(json.dumps(tree) + "\n")
    vocab_path = os.path.join(out_dir, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(_mini_vocab()) + "\n")
    comm_path = os.path.join(out_dir, "communities.json")
    with open(comm_path, "w") as f:
        json.dump(communities, f)
    return {"raw": raw_path, "vocab": vocab_path, "communities": comm_path}


def _write_context_tree(
    f, rng, t: int, community: int, image, marker_repeats: int = 3,
    star: bool = False, label_by: str = "parent",
) -> None:
    """One raw.json line in context label mode (see generate_mini_corpus).

    ``marker_repeats`` controls signal strength: how many marker tokens a
    marked node's body carries (the rule stays parent-only either way).

    ``star``: 1-3 comments, ALL directly under the submission — every
    label depends on the SUBMISSION's text. The parent-only rule and
    signal-free labeled bodies are identical to the deep variant; what
    changes is optimization reach: the context signal survives even
    uniform (random-init) graph attention. Neither variant is learnable
    from a fully random init in CPU-feasible budgets (measured: chance
    through thousands of updates, with or without a contrastive
    warm-start) — the reference never trains from scratch either
    (run_train.sh:57-63) — which is why context_ablation.py warm-starts
    both arms from a supervised marker-detection stage A
    (label_mode="marker")."""
    if star:
        n_comments = int(rng.randint(1, 4))
        parents = [-1] * n_comments
    else:
        n_comments = int(rng.randint(4, 9))
        # tree shape first (labels depend on it): comment i hangs under the
        # submission or a random earlier comment
        parents = [
            -1 if (i == 0 or rng.rand() < 0.5) else int(rng.randint(0, i))
            for i in range(n_comments)
        ]
    # marker flags are INDEPENDENT coin flips per node (incl. submission) —
    # a node's own marker says nothing about its own label
    sub_marker = bool(rng.rand() < 0.4)
    markers = [bool(rng.rand() < 0.4) for _ in range(n_comments)]

    def body_for(marker: bool) -> str:
        # LENGTH-MATCHED: unmarked bodies append the same number of
        # neutral filler words. Without this, marked bodies are
        # marker_repeats tokens longer and the attention-mask length alone
        # separates the classes — measured: a "marker detector" trained on
        # the leaky corpus reached F1 1.0 while token-substitution probes
        # moved its logits by <2% (it was a length detector), poisoning
        # every transfer built on top.
        text = _sentence(rng, community, False)
        pool = MARKER_WORDS if marker else NEUTRAL_WORDS
        text += "".join(
            " " + str(rng.choice(pool)) for _ in range(marker_repeats)
        )
        return text

    nodes = []
    for c in range(n_comments):
        parent_marker = (
            sub_marker if parents[c] == -1 else markers[parents[c]]
        )
        # label_by="self" (stage-A marker corpus): label = OWN marker;
        # label_by="parent" (the pure context corpus): label = PARENT's
        # marker; label_by="self_or_parent" (the headline ablation
        # corpus): hateful IFF own OR parent marker — the reference's
        # actual claim shape (context IMPROVES detection: a comment that
        # looks innocuous in isolation is hateful in the context of the
        # thread it supports, README.md:8-14). Under "self_or_parent" a
        # context-blind classifier has a PROVABLE ceiling: it sees only
        # own markers, so parent-only positives (p_parent*(1-p_own) of
        # labeled nodes) are unreachable — the full-vs-blind margin is
        # attributable to tree routing alone.
        label_flag = {
            "self": markers[c],
            "parent": parent_marker,
            "self_or_parent": markers[c] or parent_marker,
        }[label_by]
        label = (
            "DEG" if label_flag
            else ("lti_normal" if rng.rand() < 0.8 else "NA")
        )
        nodes.append(
            {
                "id": f"c{t}_{c}",
                "data": {
                    "id": f"c{t}_{c}",
                    "body": body_for(markers[c]),
                    "label": label,
                    "parent_id": f"t3_{t}",
                    "link_id": f"t3_{t}",
                },
                "images": [],
                "tree": [],
            }
        )
    top: List[dict] = []
    for c, p in enumerate(parents):
        if p == -1:
            top.append(nodes[c])
        else:
            nodes[c]["data"]["parent_id"] = nodes[p]["id"]
            nodes[p]["tree"].append(nodes[c])
    tree = {
        "id": f"t3_{t}",
        "data": {
            "id": f"t3_{t}",
            "title": _sentence(rng, community, False, 4),
            "selftext": body_for(sub_marker),
            "label": "NA",  # unlabeled: its marker predicts its CHILDREN
            "link_id": f"t3_{t}",
        },
        "images": [image] if image else [],
        "tree": top,
    }
    f.write(json.dumps(tree) + "\n")


def build_contrastive_items(
    raw_path: str,
    communities: List[int],
    tokenizer,
    max_length: int,
    image_root: str,
    image_size: int,
):
    """One contrastive GraphItem per discussion: y = community id,
    hard_y = polar-opposite community (ContrastiveBatchedDataDataset's
    added labels, mDT/src/tasks/contrastive.py + contrastive_loss.py:117)."""
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        tree_to_items,
    )

    items = []
    with open(raw_path) as f:
        for t, line in enumerate(f):
            per_label = tree_to_items(
                json.loads(line),
                tokenizer,
                image_root=image_root,
                max_length=max_length,
                start_idx=t,
                image_size=image_size,
            )
            if not per_label:
                continue
            it = per_label[0]
            items.append(
                dataclasses.replace(
                    it,
                    idx=t,
                    y=np.asarray([communities[t]], np.int64),
                    y_mask=None,
                    hard_y=np.asarray([POLAR[communities[t]]], np.int64),
                )
            )
    return items


class ContrastiveNpzLoader:
    """Picklable lazy contrastive item: one ingested graph copy relabeled
    for the contrastive task (y = community id, hard_y = polar opposite,
    y_mask dropped) — loads from disk at collate time only."""

    __slots__ = ("path", "idx", "community", "hard")

    def __init__(self, path: str, idx: int, community: int, hard: int):
        self.path = path
        self.idx = idx
        self.community = community
        self.hard = hard

    def __call__(self):
        from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
            load_graph_npz,
        )

        it = load_graph_npz(self.path)
        return dataclasses.replace(
            it,
            idx=self.idx,
            y=np.asarray([self.community], np.int64),
            y_mask=None,
            hard_y=np.asarray([self.hard], np.int64),
        )

    def text_length(self) -> int:
        from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
            NpzItemLoader,
        )

        return NpzItemLoader(self.path).text_length()


def contrastive_dataset_from_ingest(
    data_root: str, communities: List[int], seed: int = 0
):
    """Scalable stage-1 corpus: one LAZY contrastive item per source tree,
    reusing the ingested npz graphs via ``tree-map.txt`` (ingest.process) —
    no re-tokenization, no re-imaging, nothing resident until collate.
    ``build_contrastive_items`` (above) stays as the in-memory small-corpus
    path; at 10^4+ trees this is the one that holds."""
    from multimodaldiscussiontransformer_tpu.data.dataset import (
        DiscussionDataset,
    )

    items = []
    with open(os.path.join(data_root, "tree-map.txt")) as f:
        for line in f:
            g, k0, n = (int(x) for x in line.split())
            if n == 0:
                continue  # tree contributed no labelled copies
            c = int(communities[g])
            items.append(
                ContrastiveNpzLoader(
                    os.path.join(data_root, "processed", f"graph-{k0}.npz"),
                    g, c, POLAR[c],
                )
            )
    return DiscussionDataset.from_splits(items, seed=seed)


def run(
    out: str,
    n_trees: int = 200,
    seed: int = 0,
    stage1_updates: int = 30,
    stage2_updates: int = 120,
    max_length: int = 24,
    min_f1: Optional[float] = None,
    dp_size: int = 1,
) -> Dict[str, float]:
    from multimodaldiscussiontransformer_tpu.core import registry
    from multimodaldiscussiontransformer_tpu.core.config import (
        BertTowerConfig,
        DataConfig,
        OptimConfig,
        TaskConfig,
        TrainConfig,
        ViTTowerConfig,
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.core.registry import TASKS
    from multimodaldiscussiontransformer_tpu.data.tokenizer import (
        BertWordPieceTokenizer,
    )
    from multimodaldiscussiontransformer_tpu.data_prep.splits import (
        make_splits,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
        create_hatespeech_dataset,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        process,
    )
    from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
        Checkpointer,
        reset_classifier_head,
    )

    registry.populate()
    image_px = 32

    # 1. corpus ------------------------------------------------------------
    paths = generate_mini_corpus(out, n_trees=n_trees, seed=seed, image_px=image_px)
    communities = json.load(open(paths["communities"]))
    prev_vocab_env = os.environ.get("MDT_BERT_VOCAB")
    os.environ["MDT_BERT_VOCAB"] = paths["vocab"]
    tokenizer = BertWordPieceTokenizer(paths["vocab"])
    print(f"[two_stage] corpus: {n_trees} trees, vocab {tokenizer.vocab_size}")

    # 2. splits (stratified by hate presence, 6-export:50-58) --------------
    split_dir = os.path.join(out, "splits")
    make_splits(paths["raw"], split_dir, n_splits=1, seed=seed)

    # 3. ingest -------------------------------------------------------------
    data_root = os.path.join(out, "data")
    n_copies = process(
        paths["raw"],
        data_root,
        train_idx_file=os.path.join(split_dir, "train-idx.txt"),
        test_idx_file=os.path.join(split_dir, "test-idx.txt"),
        tokenizer_name="bert-base-uncased",  # resolves to WordPiece via env
        image_root=out,
        max_length=max_length,
        image_size=image_px,
        log_every=0,
    )
    print(f"[two_stage] ingested {n_copies} graph copies")

    # shared tiny geometry sized for the mini corpus
    model_cfg = tiny_model_config().replace(
        text_tower=BertTowerConfig(
            vocab_size=tokenizer.vocab_size,
            hidden_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=max(64, max_length),
        ),
        image_tower=ViTTowerConfig(
            image_size=image_px,
            patch_size=16,
            hidden_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            intermediate_size=128,
        ),
    )
    img_shape = (3, image_px, image_px)
    data_cfg = DataConfig(
        batch_size=8,
        max_text_len=max_length,
        text_len_buckets=(max_length,),
        node_buckets=(8, 16),
        node_capacity_buckets=(64, 128, 256),
        image_capacity_buckets=(0, 8, 16, 32),
        label_capacity_buckets=(16, 32, 64, 128),
    )

    # 4. stage 1: contrastive pre-train over the LAZY per-tree corpus
    # (reuses the ingested npz via tree-map.txt — the path that holds at
    # 10^4+ trees; build_contrastive_items remains the in-memory variant
    # for corpora ingested elsewhere)
    contr_ds = contrastive_dataset_from_ingest(data_root, communities, seed=seed)
    cfg1 = TrainConfig(
        model=model_cfg,
        data=data_cfg,
        optim=OptimConfig(
            lr=1e-3, warmup_updates=5,
            total_num_update=max(stage1_updates, 1), update_freq=1,
        ),
        task_cfg=TaskConfig(dataset_name="hateful_discussions", seed=seed),
        task="contrastive_learning",
        criterion="contrastive_loss",
        save_dir=os.path.join(out, "stage1"),
        log_interval=10,
        validate_interval_updates=0,
        dp_size=dp_size,
        tp_size=1,
    )
    trainer1 = TASKS.get("contrastive_learning")(cfg1).build_trainer(
        image_shape=img_shape
    )
    state1 = trainer1.fit(contr_ds, max_epoch=1000, max_updates=stage1_updates)
    ckpt1 = Checkpointer(cfg1.save_dir)
    ckpt1.save(state1, int(state1.step))
    ckpt1.wait()
    print(f"[two_stage] stage 1 done @ {int(state1.step)} microsteps")

    # 5. transfer: restore params, reset head + optimizer -------------------
    ds2 = create_hatespeech_dataset(root=data_root, seed=seed)
    cfg2 = TrainConfig(
        model=model_cfg,
        data=data_cfg,
        optim=OptimConfig(
            lr=1e-3, warmup_updates=10,
            total_num_update=max(stage2_updates, 1), update_freq=1,
        ),
        task_cfg=TaskConfig(dataset_name="hateful_discussions", seed=seed),
        task="node_prediction",
        criterion="node_cross_entropy",
        positive_weight=1.5,  # run_train.sh:41
        save_dir=os.path.join(out, "stage2"),
        log_interval=20,
        validate_interval_updates=0,
        dp_size=dp_size,
        tp_size=1,
    )
    trainer2 = TASKS.get("node_prediction")(cfg2).build_trainer(
        image_shape=img_shape
    )
    first = next(iter(trainer2.train_batches(ds2, epoch=1)))
    state2 = trainer2.init_state(first.asdict())
    restored = ckpt1.restore_raw()
    ckpt1.close()
    import jax

    params = (
        restored["params"] if isinstance(restored, dict) else restored.params
    )
    params = reset_classifier_head(params, jax.random.PRNGKey(seed + 17))
    state2 = trainer2.load_params(state2, params)  # reset-optimizer path
    print("[two_stage] transferred stage-1 params (head + optimizer reset)")

    # 6. fine-tune + test ----------------------------------------------------
    state2 = trainer2.fit(ds2, max_epoch=1000, max_updates=stage2_updates)
    metrics = trainer2.evaluate(state2, ds2, "test")
    # restore the caller's tokenizer-vocab env (set above for ingest)
    if prev_vocab_env is None:
        os.environ.pop("MDT_BERT_VOCAB", None)
    else:
        os.environ["MDT_BERT_VOCAB"] = prev_vocab_env
    result = {
        "stage1_updates": stage1_updates,
        "stage2_updates": stage2_updates,
        "n_trees": n_trees,
        **{k: round(float(v), 4) for k, v in metrics.items()},
    }
    print("[two_stage] TEST " + json.dumps(result))
    if min_f1 is not None and result.get("f1", 0.0) < min_f1:
        raise SystemExit(
            f"two_stage F1 {result.get('f1')} below required {min_f1}"
        )
    return result


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="two-stage mini-corpus rehearsal")
    p.add_argument("--out", required=True)
    p.add_argument("--n-trees", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stage1-updates", type=int, default=30)
    p.add_argument("--stage2-updates", type=int, default=120)
    p.add_argument("--max-length", type=int, default=24)
    p.add_argument("--min-f1", type=float, default=None)
    p.add_argument("--dp", type=int, default=1)
    a = p.parse_args(argv)
    run(
        a.out,
        n_trees=a.n_trees,
        seed=a.seed,
        stage1_updates=a.stage1_updates,
        stage2_updates=a.stage2_updates,
        max_length=a.max_length,
        min_f1=a.min_f1,
        dp_size=a.dp,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
