"""Real-data readiness gate (experiments/hateful_discussions/readiness.py).

Synthetic stand-in assets (two_stage.generate_mini_corpus writes the exact
reference raw-JSON schema + a covering vocab.txt + root images) stand in
for the externally-blocked real corpus, so the one-command gate is proven
end to end: asset checks -> ingest of N real-format trees -> train/eval
smoke -> exit code.
"""

from __future__ import annotations

import json
import os

from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions import (
    readiness,
)
from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.two_stage import (
    generate_mini_corpus,
)


def test_readiness_gate_passes_on_stand_in_assets(tmp_path, capsys):
    assets = tmp_path / "assets"
    paths = generate_mini_corpus(str(assets), n_trees=10, seed=0)
    # the gate globs the reference corpus filename
    os.rename(paths["raw"], str(assets / "pruned-with-images.json"))
    rc = readiness.main(
        [
            "--assets", str(assets),
            "--out", str(tmp_path / "smoke"),
            "--smoke-trees", "6",
            "--smoke-updates", "2",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, out
    assert out["ok"] is True
    assert out["checks"]["vocab"]["ok"], out["checks"]["vocab"]
    assert out["checks"]["trees"]["ok"], out["checks"]["trees"]
    assert out["checks"]["images"]["ok"], out["checks"]["images"]
    assert out["checks"]["smoke"]["ok"], out["checks"]["smoke"]
    # HF checkpoints are OPTIONAL (absent here): reported, not blocking
    assert out["checks"]["hf_text"]["ok"] is False
    # the smoke actually produced processed graphs
    processed = os.listdir(str(tmp_path / "smoke" / "processed"))
    assert any(f.startswith("graph-") for f in processed)


def test_readiness_gate_fails_loudly_without_assets(tmp_path, capsys):
    empty = tmp_path / "nothing"
    empty.mkdir()
    rc = readiness.main(["--assets", str(empty), "--no-smoke"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["ok"] is False
    assert not out["checks"]["vocab"]["ok"]
    assert not out["checks"]["trees"]["ok"]


def test_readiness_rejects_malformed_trees(tmp_path, capsys):
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world"])
        + "\n"
    )
    (assets / "pruned-with-images.json").write_text(
        json.dumps({"wrong": "schema"}) + "\n"
    )
    rc = readiness.main(["--assets", str(assets), "--no-smoke"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert not out["checks"]["trees"]["ok"]
    assert "missing key" in out["checks"]["trees"]["detail"]
