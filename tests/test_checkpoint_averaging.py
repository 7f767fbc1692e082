"""Checkpoint averaging (FairSeq scripts/average_checkpoints.py surface,
SURVEY.md §2.3) and the fairseq-validate-style --eval-only CLI entry."""

import json
import os
import re
import subprocess
import sys

import jax
import numpy as np

from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
    Checkpointer,
    average_checkpoints,
    save_params,
)

from tests.test_checkpoints import SYN, make_trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _saved_states(tmp_path):
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=8, seed=3, **SYN)
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())
    base = jax.device_get(state.params)
    ckpt = Checkpointer(str(tmp_path / "avg"))
    for step, delta in ((1, 0.0), (2, 1.0), (3, 2.0)):
        shifted = jax.tree.map(lambda x, d=delta: np.asarray(x) + d, base)
        ckpt.save(state.replace(params=shifted), step)
    ckpt.wait()
    ckpt.close()
    return base


def test_average_checkpoints_math(tmp_path):
    base = _saved_states(tmp_path)
    src = str(tmp_path / "avg")

    # last 2 of (p, p+1, p+2) -> p + 1.5
    avg = average_checkpoints(src, last_k=2)
    leaf = jax.tree.leaves(base)[0]
    aleaf = jax.tree.leaves(avg)[0]
    np.testing.assert_allclose(aleaf, np.asarray(leaf) + 1.5, rtol=1e-6)
    assert aleaf.dtype == np.asarray(leaf).dtype  # cast back after f64 math

    # explicit steps
    avg13 = average_checkpoints(src, steps=[1, 3])
    np.testing.assert_allclose(
        jax.tree.leaves(avg13)[0], np.asarray(leaf) + 1.0, rtol=1e-6
    )

    # all three
    avg_all = average_checkpoints(src)
    np.testing.assert_allclose(
        jax.tree.leaves(avg_all)[0], np.asarray(leaf) + 1.0, rtol=1e-6
    )


def test_average_checkpoints_cli_roundtrip(tmp_path):
    base = _saved_states(tmp_path)
    src, out = str(tmp_path / "avg"), str(tmp_path / "avg-out")

    from multimodaldiscussiontransformer_tpu.utils import average_checkpoints as cli

    assert cli.main(["--inputs", src, "--output", out, "--num-last", "2"]) == 0
    restored = Checkpointer(out).restore_raw()
    assert restored is not None and "params" in restored
    np.testing.assert_allclose(
        jax.tree.leaves(restored["params"])[0],
        np.asarray(jax.tree.leaves(base)[0]) + 1.5,
        rtol=1e-6,
    )


def test_save_params_feeds_restore_file(tmp_path):
    """save_params output must work as a --restore-file --reset-optimizer
    source (params-only fine-tune checkpoints)."""
    trainer = make_trainer(tmp_path)
    ds = synthetic_dataset(num_graphs=8, seed=4, **SYN)
    batch = next(iter(trainer.train_batches(ds, epoch=1)))
    state = trainer.init_state(batch.asdict())
    params = jax.tree.map(
        lambda x: np.asarray(x) * 0.5, jax.device_get(state.params)
    )
    save_params(str(tmp_path / "p"), params)
    restored = Checkpointer(str(tmp_path / "p")).restore_raw()
    loaded = trainer.load_params(state, restored["params"])
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded.params)[0]),
        np.asarray(jax.tree.leaves(params)[0]),
        rtol=1e-6,
    )


def _cli_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(args):
    return subprocess.run(
        [sys.executable, "-m",
         "multimodaldiscussiontransformer_tpu.train.launch"] + args,
        env=_cli_env(), cwd=REPO, capture_output=True, text=True,
        timeout=1200,
    )


def test_eval_only_cli(tmp_path):
    """Train 2 tiny updates, then --eval-only must restore and print split
    metrics (the fairseq-validate entry), including --average-last."""
    save = str(tmp_path / "ck")
    common = ["--synthetic", "--tiny", "--batch-size", "4",
              "--update-freq", "1", "--validate-interval-updates", "0",
              "--save-dir", save]
    r = _run(common + ["--max-updates", "2", "--log-interval", "1"])
    assert r.returncode == 0, r.stdout + r.stderr

    ev = _run(common + ["--eval-only", "--valid-subset", "valid,test"])
    assert ev.returncode == 0, ev.stdout + ev.stderr
    assert "evaluating latest checkpoint" in ev.stdout
    for split in ("valid", "test"):
        m = re.search(rf"^{split}: (\{{.*\}})$", ev.stdout, re.M)
        assert m, ev.stdout
        metrics = json.loads(m.group(1))
        assert np.isfinite(metrics["loss"])

    av = _run(common + ["--eval-only", "--average-last", "1",
                        "--valid-subset", "valid"])
    assert av.returncode == 0, av.stdout + av.stderr
    assert "average of last 1" in av.stdout
    # averaging exactly the newest checkpoint == evaluating it directly
    m1 = re.search(r"^valid: (\{.*\})$", ev.stdout, re.M)
    m2 = re.search(r"^valid: (\{.*\})$", av.stdout, re.M)
    assert json.loads(m1.group(1))["loss"] == json.loads(m2.group(1))["loss"]

    miss = _run(["--synthetic", "--tiny", "--batch-size", "4", "--eval-only",
                 "--save-dir", str(tmp_path / "nope")])
    assert miss.returncode == 1
    assert "no checkpoint" in miss.stderr + miss.stdout
