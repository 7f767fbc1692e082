"""END-TO-END multi-process training through the product CLI: two local
processes (jax.distributed over a localhost coordinator, 2 CPU devices
each -> one global dp=4 mesh) run ``train.launch`` with the fairseq
``--distributed-world-size/--distributed-rank/--distributed-init-method``
surface (reference run_train.sh:52). Each process collates only its host
slice of every global batch (grain_loader + parallel/input.put_host_local),
the scan accumulation path stages stacked groups with
``put_host_local_stacked``, and validation runs with padded multi-host
tails. Checkpointing is disabled (``--no-save``): multi-process Orbax
async-save barriers deadlock when both ranks share one CPU core; on-mesh
save/restore is covered by the dryrun artifact instead.

The oracle is the SAME run single-process (4 local devices, identical
seeds/flags): deterministic batch order means the global batches are
identical, so final test metrics must match.
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGS = [
    "--synthetic", "--tiny",
    "--batch-size", "2",          # per-replica; global = 2 x dp(4) = 8
    "--update-freq", "2",         # scan path -> put_host_local_stacked
    "--max-updates", "3",
    "--max-epoch", "4",
    "--validate-interval-updates", "2",
    "--log-interval", "1",
    "--no-save",  # multi-process Orbax async barriers deadlock on a
    # single-core CI box (save correctness is covered by the dryrun's
    # on-mesh save/restore phase); fairseq --no-save is the parity flag
    # dropout 0 EVERYWHERE (incl. the tiny preset's 0.1 tower dropout):
    # the rbg dropout RNG's bit stream is topology-dependent (see
    # TrainConfig.fast_dropout_rng), so a 2-process run legitimately draws
    # different masks than the 1-process oracle — parity needs a
    # bit-deterministic train step. Verified at step level: with dropout 0
    # the two topologies' first scan step agrees BIT-EXACTLY and the
    # second to 7e-8 relative (cross-process vs in-process grad-reduction
    # reassociation).
    "--dropout", "0", "--attention-dropout", "0", "--act-dropout", "0",
    "--lr", "1e-3", "--warmup-updates", "1", "--total-num-update", "10",
    "--seed", "3",
    # single-entry ladders pinned to the multi-process maxima: the 2-host
    # run collates per-host halves of these (host_data_config) and needs
    # every host to pick one identical static shape; pinning the oracle to
    # the same global shapes keeps the compiled programs identical too
    "--node-buckets", "16",
    "--node-capacity-buckets", "64",
    "--image-capacity-buckets", "16",
    "--label-capacity-buckets", "64",
]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(args, env, timeout=1800):
    return subprocess.run(
        [sys.executable, "-m",
         "multimodaldiscussiontransformer_tpu.train.launch", *args],
        env=env, capture_output=True, text=True, timeout=timeout,
    )


def _metrics(stdout: str, split: str) -> dict:
    m = re.search(rf"^{split}: (\{{.*\}})$", stdout, re.M)
    assert m, f"no '{split}:' line in output:\n{stdout[-3000:]}"
    return json.loads(m.group(1))


def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m",
                 "multimodaldiscussiontransformer_tpu.train.launch",
                 *FLAGS,
                 "--save-dir", str(tmp_path / "mp"),
                 "--distributed-world-size", "2",
                 "--distributed-rank", str(rank),
                 "--distributed-init-method", f"tcp://127.0.0.1:{port}"],
                env=_env(2), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    assert all(p.returncode == 0 for p in procs), (
        f"--- rank0 ---\n{outs[0][-4000:]}\n--- rank1 ---\n{outs[1][-4000:]}"
    )
    assert "distributed: rank 0/2, 4 global devices" in outs[0]

    mp_test = _metrics(outs[0], "test")
    # rank 1 computes the same replicated metrics (its writer is null but
    # the final test eval prints on both ranks)
    mp_test_r1 = _metrics(outs[1], "test")
    for k in ("loss", "accuracy", "f1"):
        if k in mp_test:
            np.testing.assert_allclose(
                mp_test[k], mp_test_r1[k], rtol=1e-5,
                err_msg=f"ranks disagree on test {k}",
            )

    # only rank 0 wrote metrics.jsonl (no interleaving)
    jsonl = (tmp_path / "mp" / "metrics.jsonl").read_text().strip()
    for line in jsonl.splitlines():
        json.loads(line)

    # single-process oracle: same flags, 4 local devices = same dp=4 mesh
    sp = _run(FLAGS + ["--save-dir", str(tmp_path / "sp")], _env(4))
    assert sp.returncode == 0, sp.stdout[-4000:] + sp.stderr[-2000:]
    sp_test = _metrics(sp.stdout, "test")
    if "nsamples" in sp_test and "nsamples" in mp_test:
        assert int(mp_test["nsamples"]) == int(sp_test["nsamples"])
    # Tolerance argument: with dropout 0 the forward/backward is
    # bit-deterministic, and the step-level probe showed the first update
    # agrees BIT-EXACTLY across topologies. The only remaining source of
    # drift is the RUNTIME all-reduce — in-process shared-memory vs
    # cross-process gloo reassociate the 4-way f32 grad sums in different
    # orders (~1e-7 relative per reduction; observed 7e-8 at update 2).
    # Adam's step-1 normalization (update ~= lr*sign(g)) amplifies
    # noise-level gradient elements into full lr-magnitude param deltas,
    # so after 3 updates the eval loss can drift at the ~1e-4 relative
    # level. rtol 2e-3 bounds that with margin while still catching any
    # structural error (wrong slice, wrong nsamples normalization, missed
    # batch), which shifts loss at the 1e-2+ level.
    np.testing.assert_allclose(
        mp_test["loss"], sp_test["loss"], rtol=2e-3,
        err_msg=f"multi-process test loss diverges from single-process "
                f"({mp_test['loss']} vs {sp_test['loss']})",
    )
