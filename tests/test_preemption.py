"""Preemption handling (SURVEY §5 failure-detection row): TPU VMs receive
SIGTERM with a short grace period before a maintenance event. The launch
CLI must finish the in-flight update, persist a resumable checkpoint, and
exit 0; a relaunch with the same --save-dir must auto-resume from it.

Reference surface: the reference's entire failure story is the SLURM
wall-clock kill + manual --restore-file restart
(mDT/experiments/hateful_discussions/run_train.sh:3,58); this is the
TPU-native equivalent with the manual step automated."""

import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(save_dir, max_updates, log_path):
    cmd = [
        sys.executable, "-m",
        "multimodaldiscussiontransformer_tpu.train.launch",
        "--synthetic", "--tiny", "--batch-size", "4", "--update-freq", "1",
        "--max-updates", str(max_updates), "--log-interval", "1",
        "--validate-interval-updates", "0", "--save-dir", str(save_dir),
    ]
    logf = open(log_path, "w")
    proc = subprocess.Popen(
        cmd, env=_cli_env(), stdout=logf, stderr=subprocess.STDOUT,
        cwd=REPO,
    )
    return proc, logf


def _wait_for(log_path, pattern, proc, timeout=900):
    deadline = time.time() + timeout
    while time.time() < deadline:
        text = log_path.read_text() if log_path.exists() else ""
        if re.search(pattern, text):
            return text
        if proc.poll() is not None:
            raise AssertionError(
                f"process exited rc={proc.returncode} before "
                f"{pattern!r} appeared:\n{text}"
            )
        time.sleep(2.0)
    raise AssertionError(f"timed out waiting for {pattern!r}")


def test_sigterm_checkpoints_and_resumes(tmp_path):
    save_dir = tmp_path / "ckpt"
    log1 = tmp_path / "run1.log"
    proc, logf = _launch(save_dir, max_updates=500, log_path=log1)
    try:
        # let at least one optimizer update land, then preempt
        _wait_for(log1, r"update 1:", proc)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
        logf.close()
    text = log1.read_text()
    assert rc == 0, text
    m = re.search(r"preempted: checkpoint saved at step (\d+)", text)
    assert m, text
    saved_step = int(m.group(1))
    assert saved_step >= 1

    # relaunch with the same save-dir: must auto-resume, run the remaining
    # updates to a nearby target, and exit cleanly through the test eval
    log2 = tmp_path / "run2.log"
    proc2, logf2 = _launch(save_dir, max_updates=saved_step + 1, log_path=log2)
    try:
        rc2 = proc2.wait(timeout=900)
    finally:
        if proc2.poll() is None:
            proc2.kill()
        logf2.close()
    text2 = log2.read_text()
    assert rc2 == 0, text2
    assert re.search(r"auto-resumed from step \d+", text2), text2
