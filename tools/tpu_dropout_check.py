"""On-TPU validation of the in-kernel-dropout tree-attention path: runs the
(CPU-skipped) pytest checks in tests/test_tree_attention_dropout.py on the
real chip.

    python tools/tpu_dropout_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    import jax

    assert jax.default_backend() != "cpu"
    import test_tree_attention_dropout as t

    for name in (
        "test_rate_zero_matches_plain_kernel",
        "test_determinism_and_seed_sensitivity",
        "test_dropout_statistics",
        "test_backward_matches_mask_oracle",
        "test_flash_dropout_paths",
    ):
        getattr(t, name)()
        print(f"{name}: OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
