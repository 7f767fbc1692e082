"""Context-label corpus + context-blind ablation plumbing
(experiments/hateful_discussions/{two_stage,context_ablation}.py):

- the "context" label mode's construction invariants: every labeled body
  is marker- and hate-word-free, and a node is hate IFF its PARENT (or the
  submission, for top-level comments) carries a marker — per-comment text
  is at chance BY CONSTRUCTION, so a full-vs-blind F1 margin measures
  graph-context learning (reference README.md:8-14 claim);
- ``context_blind_items`` repacks every labeled node as a single-node tree
  with identical tokens/label and no structure.

The full trained margin is recorded per-round in BASELINE.md (the
experiment's __main__ drives it); CI pins the corpus contract cheaply."""

import json
import os

import numpy as np

from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions import (
    two_stage,
)


def _load_trees(raw_path):
    with open(raw_path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _flatten(node, parent, acc):
    acc.append((node, parent))
    for ch in node.get("tree", []):
        _flatten(ch, node, acc)


def test_context_corpus_invariants(tmp_path):
    paths = two_stage.generate_mini_corpus(
        str(tmp_path), n_trees=40, seed=3, image_prob=0.0,
        label_mode="context",
    )
    trees = _load_trees(paths["raw"])
    assert len(trees) == 40
    markers = set(two_stage.MARKER_WORDS)
    hate = set(two_stage.HATE_WORDS)
    n_pos = n_neg = 0
    for sub in trees:
        sub_body = sub["data"]["selftext"]  # submissions use selftext
        sub_marked = any(w in markers for w in sub_body.split())
        flat = []
        for top in sub["tree"]:
            _flatten(top, None, flat)
        for node, parent in flat:
            body_words = node["data"]["body"].split()
            label = node["data"]["label"]
            # labeled bodies carry NO hate words in context mode — the
            # only signal lives in the tree
            assert not (set(body_words) & hate), node["data"]["id"]
            parent_body = (
                sub_body if parent is None else parent["data"]["body"]
            )
            parent_marked = any(
                w in markers for w in parent_body.split()
            )
            if label == "DEG":
                n_pos += 1
                assert parent_marked, (
                    f"hate node {node['data']['id']} under unmarked parent"
                )
            elif label == "lti_normal":
                n_neg += 1
                assert not parent_marked, (
                    f"normal node {node['data']['id']} under marked parent"
                )
        del sub_marked
    # both classes must actually occur
    assert n_pos > 10 and n_neg > 10, (n_pos, n_neg)


def test_no_length_leak(tmp_path):
    """Marked and unmarked bodies must have IDENTICAL word counts: a
    length difference lets the attention mask alone separate the classes
    (measured: a 'marker detector' trained on a length-leaky corpus hit
    F1 1.0 while token-substitution probes moved its logits by <2%)."""
    paths = two_stage.generate_mini_corpus(
        str(tmp_path), n_trees=30, seed=5, image_prob=0.0,
        label_mode="context", marker_repeats=4,
    )
    markers = set(two_stage.MARKER_WORDS)
    lens_marked, lens_unmarked = set(), set()
    for sub in _load_trees(paths["raw"]):
        flat = []
        for top in sub["tree"]:
            _flatten(top, None, flat)
        bodies = [n["data"]["body"] for n, _ in flat]
        bodies.append(sub["data"]["selftext"])
        for b in bodies:
            words = b.split()
            (lens_marked if set(words) & markers else lens_unmarked).add(
                len(words)
            )
    assert lens_marked and lens_unmarked
    assert lens_marked == lens_unmarked, (lens_marked, lens_unmarked)


def test_marker_corpus_invariants(tmp_path):
    """label_mode="marker" (the stage-A warm-up corpus): a comment is
    labeled by its OWN marker flag — body carries a marker IFF DEG — with
    tree/marker generation otherwise identical to context mode."""
    paths = two_stage.generate_mini_corpus(
        str(tmp_path), n_trees=40, seed=3, image_prob=0.0,
        label_mode="marker", context_star=True,
    )
    markers = set(two_stage.MARKER_WORDS)
    n_pos = n_neg = 0
    for sub in _load_trees(paths["raw"]):
        flat = []
        for top in sub["tree"]:
            _flatten(top, None, flat)
        for node, _parent in flat:
            marked = any(
                w in markers for w in node["data"]["body"].split()
            )
            label = node["data"]["label"]
            if label == "DEG":
                n_pos += 1
                assert marked, node["data"]["id"]
            elif label == "lti_normal":
                n_neg += 1
                assert not marked, node["data"]["id"]
    assert n_pos > 10 and n_neg > 10, (n_pos, n_neg)


def test_context_or_corpus_invariants(tmp_path):
    """label_mode="context_or" (the headline ablation corpus): hateful
    IFF own OR parent marker; parent-only positives exist (the cases a
    context-blind classifier provably cannot reach)."""
    paths = two_stage.generate_mini_corpus(
        str(tmp_path), n_trees=40, seed=3, image_prob=0.0,
        label_mode="context_or", context_star=True,
    )
    markers = set(two_stage.MARKER_WORDS)
    n_parent_only = n_pos = n_neg = 0
    for sub in _load_trees(paths["raw"]):
        sub_marked = any(
            w in markers for w in sub["data"]["selftext"].split()
        )
        flat = []
        for top in sub["tree"]:
            _flatten(top, None, flat)
        for node, parent in flat:
            own = any(
                w in markers for w in node["data"]["body"].split()
            )
            pmark = sub_marked if parent is None else any(
                w in markers for w in parent["data"]["body"].split()
            )
            label = node["data"]["label"]
            if label == "DEG":
                n_pos += 1
                assert own or pmark, node["data"]["id"]
                if pmark and not own:
                    n_parent_only += 1
            elif label == "lti_normal":
                n_neg += 1
                assert not (own or pmark), node["data"]["id"]
    assert n_pos > 10 and n_neg > 10 and n_parent_only > 5, (
        n_pos, n_neg, n_parent_only,
    )


def test_context_ablation_warm_start_plumbing(tmp_path):
    """End-to-end plumbing of the full experiment driver at smoke scale:
    corpus -> splits -> ingest -> contrastive warm-start -> head+optimizer
    reset -> fine-tune BOTH arms -> margin dict. Numbers are meaningless at
    this scale; the recorded capability run lives in BASELINE.md."""
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions import (
        context_ablation,
    )

    # n_trees must give the contrastive stage >= one full batch of TREES
    # (one contrastive item per tree, batch_size 8, drop_last)
    res = context_ablation.run(
        str(tmp_path), n_trees=16, updates=4, contrastive_updates=3,
        pretrain_updates=3, max_length=16,
    )
    for key in (
        "f1_pretrain", "f1_full", "f1_context_blind", "accuracy_full",
        "accuracy_context_blind", "margin",
    ):
        assert key in res, res
    assert np.isfinite(res["margin"])


def test_context_blind_repack(tmp_path):
    """context_blind_items: same tokens + label, single-node tree."""
    from multimodaldiscussiontransformer_tpu.core import registry
    from multimodaldiscussiontransformer_tpu.data.tokenizer import (
        BertWordPieceTokenizer,
    )
    from multimodaldiscussiontransformer_tpu.data_prep.splits import (
        make_splits,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.context_ablation import (
        context_blind_items,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
        create_hatespeech_dataset,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        process,
    )

    registry.populate()
    out = str(tmp_path)
    paths = two_stage.generate_mini_corpus(
        out, n_trees=12, seed=0, image_prob=0.0, label_mode="context",
    )
    prev = os.environ.get("MDT_BERT_VOCAB")
    os.environ["MDT_BERT_VOCAB"] = paths["vocab"]
    try:
        BertWordPieceTokenizer(paths["vocab"])  # vocab sanity
        split_dir = os.path.join(out, "splits")
        make_splits(paths["raw"], split_dir, n_splits=1, seed=0)
        data_root = os.path.join(out, "data")
        process(
            paths["raw"], data_root,
            train_idx_file=os.path.join(split_dir, "train-idx.txt"),
            test_idx_file=os.path.join(split_dir, "test-idx.txt"),
            tokenizer_name="bert-base-uncased",
            image_root=out, max_length=24, image_size=32, log_every=0,
        )
        ds = create_hatespeech_dataset(root=data_root, seed=0)
        blind = context_blind_items(ds, (3, 32, 32))
        assert len(blind) == len(ds)
        for i in range(min(8, len(ds))):
            orig, single = ds.get(i), blind[i]
            node = int(np.flatnonzero(orig.y_mask)[0])
            assert single.input_ids.shape[0] == 1  # one node, no context
            np.testing.assert_array_equal(
                single.input_ids[0], orig.input_ids[node]
            )
            assert single.y_mask.all() and single.y_mask.shape == (1,)
            np.testing.assert_array_equal(
                np.asarray(single.y).reshape(-1),
                np.asarray(orig.y).reshape(-1),
            )
    finally:
        if prev is None:
            os.environ.pop("MDT_BERT_VOCAB", None)
        else:
            os.environ["MDT_BERT_VOCAB"] = prev
