"""On-TPU validation + timing of the fused TOWER attention kernel
(ops/masked_attention.py): runs the CPU-interpret parity tests on real
hardware, the (CPU-skipped) in-kernel dropout tests, and a fused-vs-XLA
fwd+bwd timing A/B at canonical tower shapes.

    python tools/tpu_masked_attention_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def _time(fn, *args, iters=20):
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu"

    import test_masked_attention_dropout as td
    from multimodaldiscussiontransformer_tpu.ops import masked_attention as ma

    # correctness: hardware parity of the plain kernel vs the XLA
    # reference AT TPU PRECISION — both sides feed the MXU bf16 operands
    # (f32 accumulate), so elementwise agreement is bounded by bf16
    # rounding, not f32: scaled max-err bounds like the graph-path checks
    # (the exact-f32 parity lives in the CPU interpret-mode CI,
    # tests/test_masked_attention.py)
    import test_masked_attention as tm

    for b, h, s, dh, masked in [
        (3, 2, 16, 8, True), (5, 3, 17, 8, True), (2, 2, 12, 8, False)
    ]:
        q, k, v, mask = tm._rand_inputs(0, b, h, s, dh, masked)
        ref = np.asarray(ma.masked_attention_reference(q, k, v, mask))
        got = np.asarray(ma.masked_attention(q, k, v, mask))
        scale_ref = max(float(np.abs(ref).max()), 1.0)
        err = float(np.abs(got - ref).max())
        assert err < 2e-2 * scale_ref, (b, h, s, dh, err, scale_ref)
    print("kernel_matches_reference(tpu-precision): OK", flush=True)

    q, k, v, mask = tm._rand_inputs(2, 3, 2, 13, 8, True)
    g_ref = jax.grad(
        lambda *a: (ma.masked_attention_reference(*a, mask) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_fus = jax.grad(
        lambda *a: (ma.masked_attention(*a, mask) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), g_ref, g_fus):
        scale_ref = max(float(jnp.abs(a).max()), 1.0)
        err = float(jnp.abs(a - b_).max())
        assert err < 2e-2 * scale_ref, (name, err, scale_ref)
    print("kernel_grads_match_reference(tpu-precision): OK", flush=True)

    for name in (
        "test_rate_zero_matches_reference",
        "test_determinism_and_seed_sensitivity",
        "test_dropout_statistics",
        "test_backward_matches_mask_oracle",
        "test_module_dropout_is_unbiased_on_chip",
    ):
        getattr(td, name)()
        print(f"{name}: OK", flush=True)

    # timing A/B at canonical tower shapes: the text tower sees
    # (total_real_nodes, 12, S<=100, 64) bf16; a canonical batch of 12
    # trees x <=32 nodes flattens to ~256 rows
    rng = np.random.default_rng(0)
    for b, h, s, dh in [(256, 12, 32, 64), (256, 12, 64, 64), (128, 12, 100, 64)]:
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
            for _ in range(3)
        )
        mask = jnp.where(
            jnp.asarray(rng.random((b, s)) < 0.9), 0.0, ma.MASK_BIAS
        ).astype(jnp.float32)
        g = jnp.ones((b, h, s, dh), jnp.bfloat16)
        seed = jnp.asarray([3], jnp.int32)

        def fwdbwd_fused(q, k, v, mask, seed):
            def f(q, k, v):
                return (
                    ma.masked_attention(q, k, v, mask, seed=seed, rate=0.3)
                    .astype(jnp.float32)
                    .sum()
                )

            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        def fwdbwd_xla(q, k, v, mask, seed):
            # NO dropout on the XLA side — this is a LOWER bound for what
            # the pre-kernel towers paid (they also materialized a
            # (B,H,S,S) dropout mask on the probs); the fused side pays
            # for dropout in-kernel
            def f(q, k, v):
                out = ma.masked_attention_reference(q, k, v, mask)
                return out.astype(jnp.float32).sum()

            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        t_f = _time(jax.jit(fwdbwd_fused), q, k, v, mask, seed)
        t_x = _time(jax.jit(fwdbwd_xla), q, k, v, mask, seed)
        print(
            f"shapes b={b} h={h} s={s} dh={dh}: fused {t_f*1e6:.0f}us "
            f"xla(no-drop) {t_x*1e6:.0f}us ratio {t_x/t_f:.2f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
