"""Step-timeline breakdown from a ``jax.profiler`` trace (VERDICT r3 #2).

The on-chip product CLI loop runs well under the bench's fenced-step rate;
the claimed cause is the tunneled PJRT plugin serializing H2D transfers
with compute. This tool turns the claim into evidence: it parses the
perfetto ``*.trace.json.gz`` that ``--profile-trace DIR`` captures from the
fit loop and reports, over the traced window,

- total wall span,
- time attributed to host->device transfer events,
- time attributed to device compute (XLA module executions),
- time in host-side collation/input,
- the top event names by total duration,

so the CLI-loop gap is accounted for by measurement rather than assertion.

Usage:
    python tools/trace_breakdown.py /path/to/profile_dir \
        [--json TRACE_r04.json]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(root: str) -> str:
    hits = sorted(
        glob.glob(
            os.path.join(root, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return hits[-1]


TRANSFER_MARKERS = (
    "TransferToDevice", "BufferFromHost", "transfer_to_device",
    "CopyToDevice", "h2d", "H2D", "TransferHostToDevice",
)
D2H_MARKERS = (
    "TransferFromDevice", "BufferToHost", "d2h", "D2H",
    "TransferDeviceToHost", "CopyFromDevice", "literal",
)
COMPUTE_MARKERS = ("jit_", "xla::", "ExecuteOnStream", "pjit", "Execute")
INPUT_MARKERS = ("collate", "grain", "prefetch", "next_batch", "host_batch")


def classify(name: str) -> str:
    for m in TRANSFER_MARKERS:
        if m in name:
            return "h2d"
    for m in D2H_MARKERS:
        if m in name:
            return "d2h"
    for m in INPUT_MARKERS:
        if m.lower() in name.lower():
            return "input"
    for m in COMPUTE_MARKERS:
        if m in name:
            return "compute"
    return "other"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("trace_root")
    p.add_argument("--json", default=None, help="write the summary here")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)

    path = find_trace(args.trace_root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])

    # pid/tid -> track name (device vs host threads)
    track: dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            track[e.get("pid")] = e.get("args", {}).get("name", "")

    by_name = defaultdict(float)
    by_class = defaultdict(float)
    by_class_names = defaultdict(lambda: defaultdict(float))
    t_min, t_max = float("inf"), 0.0
    n_complete = 0
    for e in events:
        if e.get("ph") != "X":  # complete events only
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        ts = float(e.get("ts", 0.0))
        if dur <= 0:
            continue
        n_complete += 1
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)
        name = e.get("name", "?")
        pname = track.get(e.get("pid"), "")
        # device-track events are authoritative compute; host threads carry
        # transfers, input, and dispatch
        cls = classify(name)
        if cls == "other" and ("/device:" in pname or "TPU" in pname):
            cls = "compute"
        by_name[name] += dur
        by_class[cls] += dur
        by_class_names[cls][name] += dur

    span_s = (t_max - t_min) / 1e6 if n_complete else 0.0
    summary = {
        "trace": path,
        "events": n_complete,
        "span_s": round(span_s, 3),
        "seconds_by_class": {
            k: round(v / 1e6, 3) for k, v in sorted(by_class.items())
        },
        "top_events_s": {
            k: round(v / 1e6, 3)
            for k, v in sorted(
                by_name.items(), key=lambda kv: -kv[1]
            )[: args.top]
        },
        "top_h2d_s": {
            k: round(v / 1e6, 3)
            for k, v in sorted(
                by_class_names["h2d"].items(), key=lambda kv: -kv[1]
            )[:8]
        },
        "top_compute_s": {
            k: round(v / 1e6, 3)
            for k, v in sorted(
                by_class_names["compute"].items(), key=lambda kv: -kv[1]
            )[:8]
        },
    }
    print(json.dumps(summary, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
