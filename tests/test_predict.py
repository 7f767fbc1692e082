"""Per-node prediction export (Trainer.predict / --predict-output).

Reference surface: the comment-only baseline persists a predictions
parquet after evaluation (Comment-Only Experiments/src/text_bert.py:68-80),
and the full model scores EVERY node each forward (``out_all``,
multi_modal_discussion_transformer.py:263-276) — the export must cover all
real nodes with ``labeled`` marking the loss-bearing rows."""

import numpy as np
import pandas as pd

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
from multimodaldiscussiontransformer_tpu.train.trainer import (
    Trainer,
    write_predictions,
)

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)


def tiny_cfg(**kw):
    base = dict(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=8,
            max_text_len=16,
            node_buckets=(8, 16),
            node_capacity_buckets=(64, 128),
            image_capacity_buckets=(0, 8, 16, 32),
            label_capacity_buckets=(16, 32, 64),
        ),
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=20, update_freq=1
        ),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        validate_interval_updates=0,
        log_interval=100,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_predict_rows_match_dataset(tmp_path):
    cfg = tiny_cfg(save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=24, seed=3, **SYN)
    first = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(first.asdict())

    cols = trainer.predict(state, ds, "valid")
    n_rows = len(cols["graph_idx"])
    assert n_rows == sum(ds.get(int(i)).num_nodes for i in ds.valid_idx)
    # every valid graph appears exactly once, with all of its nodes
    seen = {}
    for g in cols["graph_idx"]:
        seen[int(g)] = seen.get(int(g), 0) + 1
    assert set(seen) == {int(i) for i in ds.valid_idx}
    for i, count in seen.items():
        assert count == ds.get(i).num_nodes

    # labels: for each graph, labeled rows and values match the item's
    # (y_mask, y) contract (GraphItem.y lists labels in y_mask node order)
    for i in ds.valid_idx:
        item = ds.get(int(i))
        rows = np.nonzero(cols["graph_idx"] == i)[0]
        order = np.argsort(cols["node"][rows])
        rows = rows[order]
        got_mask = cols["labeled"][rows].astype(bool)
        np.testing.assert_array_equal(got_mask, item.y_mask)
        np.testing.assert_array_equal(
            cols["label"][rows][got_mask], np.asarray(item.y)
        )
        assert (cols["label"][rows][~got_mask] == -1).all()

    # pred/prob consistency
    logits = np.stack([cols["logit_0"], cols["logit_1"]], axis=1)
    np.testing.assert_array_equal(cols["pred"], logits.argmax(axis=1))
    probs = np.stack([cols["prob_0"], cols["prob_1"]], axis=1)
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)

    # writer round-trip (parquet; pyarrow is available in this image)
    out = write_predictions(str(tmp_path / "p.parquet"), cols)
    df = pd.read_parquet(out)
    assert len(df) == n_rows
    assert {"graph_idx", "node", "pred", "label", "labeled"} <= set(df.columns)


def test_cli_eval_only_predict_output(tmp_path):
    from multimodaldiscussiontransformer_tpu.train.launch import main

    save = str(tmp_path / "ckpt")
    # pytest's mesh is 8 virtual devices -> global batch = 4 x 8 = 32;
    # the default 32-graph corpus (25 train) would yield zero batches
    rc = main(
        [
            "--synthetic", "--tiny", "--max-updates", "2",
            "--batch-size", "4", "--synthetic-graphs", "128",
            "--save-dir", save,
        ]
    )
    assert rc in (0, None)
    pred_dir = tmp_path / "pred"
    rc = main(
        [
            "--synthetic", "--tiny", "--batch-size", "4",
            "--synthetic-graphs", "128",
            "--save-dir", save, "--eval-only", "--valid-subset", "valid",
            "--predict-output", str(pred_dir),
        ]
    )
    assert rc == 0
    f = pred_dir / "predictions-valid.parquet"
    assert f.exists()
    df = pd.read_parquet(f)
    assert len(df) > 0
    assert {"graph_idx", "node", "pred", "label", "labeled"} <= set(df.columns)
    # labeled rows carry real 0/1 labels; unlabeled rows are -1
    lab = df[df.labeled]
    assert set(lab.label.unique()) <= {0, 1}
    assert (df[~df.labeled].label == -1).all()
