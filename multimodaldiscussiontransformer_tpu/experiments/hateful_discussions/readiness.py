"""Real-data readiness gate: validate assets, then run a tiny end-to-end smoke.

The published F1 parity run is blocked only by external assets this
environment cannot reach (zero egress): the Pushshift-derived
``pruned-with-images*.json`` corpus, the bert-base-uncased ``vocab.txt``
and the HF tower checkpoints (reference
mDT/experiments/hateful_discussions/datasets/hateful_discussions.py:35,
run_train.sh:28-65). This gate makes the eventual real run ONE command the
day the assets exist (VERDICT r4 #8):

    python -m multimodaldiscussiontransformer_tpu.experiments.\
hateful_discussions.readiness --assets DIR --out /tmp/smoke

It checks each asset, prints a per-check verdict, and — when the blocking
assets are present — ingests the first ``--smoke-trees`` trees and trains/
evaluates a few updates end to end, proving the full pipeline against the
REAL data format before anyone burns a 10-hour run.

Asset layout expected under ``--assets DIR`` (override per-asset with
flags):
- ``vocab.txt``                       bert-base-uncased WordPiece vocab
- ``pruned-with-images*.json``        raw discussion trees (one per line)
- ``images/``                         image root referenced by the trees
- ``bert-base-uncased/``              (optional) local HF text checkpoint
- ``vit-base-patch16-224/``           (optional) local HF image checkpoint
- ``{train,test}-idx-many*.txt``      (optional) split index files

Exit code 0 iff every REQUIRED check passes (HF checkpoints are optional —
the smoke falls back to random-init towers and says so; the real run wants
``--hf-init``).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import Dict, Optional


def _check(ok: bool, detail: str) -> Dict[str, object]:
    return {"ok": bool(ok), "detail": detail}


def check_vocab(path: Optional[str]) -> Dict[str, object]:
    if not path or not os.path.exists(path):
        return _check(False, f"vocab.txt not found ({path})")
    with open(path, encoding="utf-8") as f:
        tokens = [ln.rstrip("\n") for ln in f if ln.strip()]
    specials = {"[PAD]", "[UNK]", "[CLS]", "[SEP]"}
    missing = specials - set(tokens[:1000])
    if missing:
        return _check(False, f"{path}: missing special tokens {sorted(missing)}")
    # bert-base-uncased has 30,522 entries; accept any plausible WordPiece
    # vocab but flag suspicious sizes loudly
    note = "" if len(tokens) >= 1000 else f" (small vocab: {len(tokens)})"
    return _check(True, f"{len(tokens)} tokens{note}")


def check_trees(path: Optional[str]) -> Dict[str, object]:
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        collapse_tree,
    )

    if not path:
        return _check(False, "no pruned-with-images*.json found")
    try:
        n_ok = 0
        with open(path) as f:
            for i, line in enumerate(f):
                if i >= 3:
                    break
                tree = json.loads(line)
                for key in ("id", "tree"):
                    if key not in tree:
                        return _check(
                            False,
                            f"{path} line {i}: missing key {key!r} "
                            "(expected the reference schema "
                            "{id, data, images, tree})",
                        )
                ids, meta, dist = collapse_tree(tree)
                if not ids:
                    return _check(False, f"{path} line {i}: empty tree")
                n_ok += 1
        return _check(n_ok > 0, f"{path}: first {n_ok} trees parse + collapse")
    except (json.JSONDecodeError, KeyError, ValueError) as e:
        return _check(False, f"{path}: {e!r}")


def check_hf_checkpoint(path_or_name: str, kind: str) -> Dict[str, object]:
    """Loadable local HF checkpoint (no network). Optional: random-init
    towers still smoke-test the pipeline; the real run wants --hf-init."""
    try:
        from transformers import AutoConfig

        cfg = AutoConfig.from_pretrained(path_or_name, local_files_only=True)
        has_weights = True
        if os.path.isdir(path_or_name):
            has_weights = any(
                glob.glob(os.path.join(path_or_name, pat))
                for pat in ("*.safetensors", "*.bin")
            )
        if not has_weights:
            return _check(False, f"{path_or_name}: config only, no weights")
        return _check(True, f"{path_or_name}: {cfg.model_type} config + weights")
    except Exception as e:
        return _check(False, f"{kind} checkpoint unavailable: {repr(e)[:200]}")


def check_images(root: Optional[str], trees_path: Optional[str]) -> Dict[str, object]:
    """Resolve the first few trees' image paths against ``root`` (the
    directory tree-relative paths like ``images/img4.png`` resolve from)."""
    if not root or not os.path.isdir(root):
        return _check(
            False,
            f"image root not found ({root}); image-bearing nodes would "
            "be dropped loudly at ingest (IngestStats)",
        )
    refs, found = 0, 0
    if trees_path and os.path.exists(trees_path):
        with open(trees_path) as f:
            for i, line in enumerate(f):
                if i >= 5 or refs >= 20:
                    break
                try:
                    tree = json.loads(line)
                except json.JSONDecodeError:
                    continue
                stack = [tree]
                while stack:
                    node = stack.pop()
                    for img in node.get("images", []) or []:
                        refs += 1
                        if os.path.exists(os.path.join(root, img)):
                            found += 1
                    stack.extend(node.get("tree", []) or [])
    if refs == 0:
        return _check(True, f"{root}: no image refs in the first trees")
    return _check(
        found > 0,
        f"{root}: {found}/{refs} sampled image paths resolve",
    )


def run_smoke(
    trees_path: str,
    vocab_path: str,
    image_root: str,
    out_dir: str,
    n_trees: int,
    updates: int,
    full_model: bool,
) -> Dict[str, object]:
    """Ingest the first ``n_trees`` REAL trees and train/eval a few updates
    end to end (tokenizer -> distances -> npz -> lazy dataset -> collator ->
    train step -> eval metrics)."""
    os.environ["MDT_BERT_VOCAB"] = vocab_path
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions import (
        ingest,
    )
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset import (
        create_hatespeech_dataset,
    )

    os.makedirs(out_dir, exist_ok=True)
    k = ingest.process(
        trees_path,
        out_dir,
        tokenizer_name="bert-base-uncased",
        image_root=image_root or "",
        limit=n_trees,
        log_every=max(n_trees, 1),
    )
    if k <= 0:
        return _check(False, f"ingest produced {k} graph copies")
    ds = create_hatespeech_dataset(root=out_dir)

    import jax.numpy as jnp  # noqa: F401  (defer jax into the smoke)

    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig,
        ModelConfig,
        OptimConfig,
        TaskConfig,
        TrainConfig,
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    if full_model:
        model = ModelConfig()  # canonical — the real parity geometry
    else:
        # real-GEOMETRY tiny model: full 30,522-token vocab, 100-token
        # sequences, 224px/16px-patch images — everything the real ingest
        # emits — at d=64 so the smoke compiles in seconds, not minutes
        # (the parity run itself uses --full-model / launch)
        from multimodaldiscussiontransformer_tpu.core.config import (
            BertTowerConfig,
            ViTTowerConfig,
        )

        model = tiny_model_config().replace(
            text_tower=BertTowerConfig(
                vocab_size=30522, hidden_size=64, num_hidden_layers=4,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=128,
            ),
            image_tower=ViTTowerConfig(
                image_size=224, patch_size=16, hidden_size=64,
                num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=128,
            ),
        )
    n_items = len(ds.train_idx)
    bs = max(1, min(4, n_items))
    cfg = TrainConfig(
        model=model,
        data=DataConfig(batch_size=bs),
        optim=OptimConfig(update_freq=1, scan_microbatches=False, lr=1e-4),
        task_cfg=TaskConfig(dataset_name="hateful_discussions"),
        fast_dropout_rng=False,
        dp_size=1,
        save_dir=os.path.join(out_dir, "smoke_ckpt"),
        log_interval=1,
        validate_interval_updates=0,
    )
    trainer = Trainer(cfg)
    state = trainer.fit(ds, max_updates=updates)
    # a smoke ingest without split files may route every copy to train;
    # score whichever eval split has items (valid == test in the real
    # layout, dataset.py:24-27)
    split = "test" if len(ds.test_idx) else "valid"
    if len(ds.test_idx) or len(ds.valid_idx):
        metrics = trainer.evaluate(state, ds, split)
        detail_m = f"{split} metrics {json.dumps(metrics)}"
    else:
        metrics = {}
        detail_m = "no eval split in the smoke slice (all copies -> train)"
    ok = all(
        v == v for v in metrics.values() if isinstance(v, float)
    )  # no NaNs
    return _check(
        ok,
        f"{k} graph copies from {n_trees} trees; {updates} updates; "
        + detail_m,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="real-data readiness gate (assets + end-to-end smoke)"
    )
    p.add_argument("--assets", required=True, help="asset directory")
    p.add_argument("--out", default="/tmp/mdt_readiness_smoke")
    p.add_argument("--vocab", default=None, help="override vocab.txt path")
    p.add_argument("--trees", default=None,
                   help="override pruned-with-images*.json path")
    p.add_argument("--image-root", default=None)
    p.add_argument("--text-ckpt", default=None,
                   help="local HF text checkpoint dir (default "
                        "ASSETS/bert-base-uncased)")
    p.add_argument("--image-ckpt", default=None,
                   help="local HF image checkpoint dir (default "
                        "ASSETS/vit-base-patch16-224)")
    p.add_argument("--smoke-trees", type=int, default=10)
    p.add_argument("--smoke-updates", type=int, default=3)
    p.add_argument("--full-model", action="store_true", default=False,
                   help="smoke with the canonical architecture (slow on "
                        "CPU; the default uses a real-vocab tiny model)")
    p.add_argument("--no-smoke", action="store_true", default=False,
                   help="asset checks only")
    a = p.parse_args(argv)

    assets = os.path.abspath(a.assets)
    vocab = a.vocab or os.path.join(assets, "vocab.txt")
    trees = a.trees
    if trees is None:
        hits = sorted(glob.glob(os.path.join(assets, "pruned-with-images*.json")))
        trees = hits[0] if hits else None
    # tree image paths (e.g. "images/img4.png") resolve relative to the
    # asset root unless overridden
    image_root = a.image_root or assets
    text_ckpt = a.text_ckpt or os.path.join(assets, "bert-base-uncased")
    image_ckpt = a.image_ckpt or os.path.join(assets, "vit-base-patch16-224")

    checks = {
        "vocab": check_vocab(vocab),
        "trees": check_trees(trees),
        "images": check_images(image_root, trees),
        "hf_text": check_hf_checkpoint(text_ckpt, "text"),
        "hf_image": check_hf_checkpoint(image_ckpt, "image"),
    }
    required_ok = checks["vocab"]["ok"] and checks["trees"]["ok"]
    if required_ok and not a.no_smoke:
        try:
            checks["smoke"] = run_smoke(
                trees, vocab,
                image_root if checks["images"]["ok"] else "",
                a.out, a.smoke_trees, a.smoke_updates, a.full_model,
            )
        except Exception as e:
            checks["smoke"] = _check(False, f"smoke failed: {repr(e)[:400]}")
        required_ok = required_ok and checks["smoke"]["ok"]

    verdict = {
        "ok": required_ok,
        "checks": checks,
        "next": (
            "ready: run the parity recipe — launch --user-dir "
            "experiments/hateful_discussions --hf-init ... (BASELINE.md "
            "'real-data F1' section)"
            if required_ok
            else "fix the failing required checks (vocab, trees, smoke)"
        ),
    }
    # one line, last on stdout (smoke/ingest logs precede it): scripts can
    # `tail -1 | jq .ok`
    print(json.dumps(verdict), flush=True)
    return 0 if required_ok else 1


if __name__ == "__main__":
    sys.exit(main())
