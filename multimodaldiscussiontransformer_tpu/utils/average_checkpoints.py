"""Checkpoint averaging CLI — FairSeq ``scripts/average_checkpoints.py``
re-provided for the Orbax store (the FairSeq runtime tool surface the
reference consumes, SURVEY.md §2.3).

    python -m multimodaldiscussiontransformer_tpu.utils.average_checkpoints \
        --inputs ckpts/run0 --num-last 3 --output ckpts/run0-avg

The output directory holds a params-only checkpoint (step 0) consumable by
``--restore-file <output> --reset-optimizer`` (fine-tune from averaged
weights) and by ``serve.incremental.DiscussionScorer.from_checkpoint``.
"""

from __future__ import annotations

import argparse
import sys

from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
    average_checkpoints,
    save_params,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--inputs", required=True,
                   help="checkpoint save dir (one Orbax store; fairseq's "
                        "multi-file --inputs maps to steps within it)")
    p.add_argument("--output", required=True,
                   help="directory for the averaged params checkpoint")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--num-last", type=int, default=None,
                   help="average the newest K retained steps (fairseq "
                        "--num-epoch-checkpoints/--num-update-checkpoints)")
    g.add_argument("--steps", default=None,
                   help="comma-separated explicit step numbers")
    args = p.parse_args(argv)

    steps = (
        [int(s) for s in args.steps.split(",") if s.strip()]
        if args.steps
        else None
    )
    avg = average_checkpoints(args.inputs, steps=steps, last_k=args.num_last)
    save_params(args.output, avg)
    print(f"averaged params written to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
