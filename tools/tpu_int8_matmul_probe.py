"""Probe: does int8 x int8 -> int32 dot_general hit the TPU's double-rate
MXU path vs bf16 at mDT tower shapes?

Motivation: v5e lists ~2x int8 peak over bf16. If XLA lowers an int8 dot to
the fast path, a weight+activation int8 serving mode (serve/quantized.py)
roughly doubles inference throughput for the tower matmuls that dominate
mDT's FLOPs (SURVEY.md §3.2: BERT/ViT dense layers are ~99% of forward
FLOPs at canonical shapes). This probe measures raw dots only — run it
BEFORE building on the assumption.

Usage (real TPU): python tools/tpu_int8_matmul_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, x, *rest, iters=30):
    """Fenced timing with the loop INSIDE one program: per-call dispatch
    over the tunneled backend costs ~ms, so host-loop timing measures the
    tunnel, not the kernel. A fori_loop with a loop-carried perturbation of
    x[0,0] (dynamic value -> XLA cannot hoist the dot) measures the kernel;
    the window closes on a host readback of the carry (bench.py pattern)."""
    import jax.lax as lax

    def run(x, *rest):
        y0 = fn(x, *rest)
        c0 = y0.reshape(-1)[0]

        def body(_, c):
            if x.dtype == jnp.int8:
                xi = x.at[0, 0].add((c & 1).astype(jnp.int8))
            else:
                # tiny but DYNAMIC (not foldable-to-0) perturbation
                xi = x.at[0, 0].add((c.astype(jnp.float32) * 1e-30).astype(x.dtype))
            y = fn(xi, *rest)
            return y.reshape(-1)[0]

        return lax.fori_loop(0, iters, body, c0)

    jrun = jax.jit(run)
    float(jax.device_get(jrun(x, *rest)).astype(np.float64))  # compile+fence
    t0 = time.perf_counter()
    float(jax.device_get(jrun(x, *rest)).astype(np.float64))
    return (time.perf_counter() - t0) / (iters + 1)


def main():
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    # tower shapes: (graphs*nodes*tokens, 768) x (768, N)
    shapes = [
        (25600, 768, 768),    # qkv/output projections, 256 nodes x 100 tok
        (25600, 768, 3072),   # FFN up
        (25600, 3072, 768),   # FFN down
    ]
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)

        bf16 = jax.jit(lambda a, b: a @ b)
        int8 = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
        # the realistic serving op: dynamic per-row activation quant fused
        # around the int8 dot, f32 rescale out
        def int8_dyn(a_bf16, b_int8, b_scale):
            s = jnp.max(jnp.abs(a_bf16), axis=-1, keepdims=True).astype(
                jnp.float32
            ) / 127.0
            aq = jnp.clip(
                jnp.round(a_bf16.astype(jnp.float32) / s), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.dot_general(
                aq, b_int8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * s * b_scale).astype(jnp.bfloat16)

        wscale = jnp.ones((1, n), jnp.float32) / 127.0
        int8_dyn_j = jax.jit(int8_dyn)

        t_bf16 = _time(bf16, x, w)
        t_int8 = _time(int8, xq, wq)
        t_dyn = _time(int8_dyn_j, x, wq, wscale)
        fl = 2 * m * k * n
        print(
            f"({m},{k})x({k},{n}): bf16 {t_bf16*1e6:8.1f}us "
            f"({fl/t_bf16/1e12:6.1f} TF/s) | int8 {t_int8*1e6:8.1f}us "
            f"({fl/t_int8/1e12:6.1f} TOP/s) ratio {t_bf16/t_int8:4.2f}x | "
            f"int8+dynquant {t_dyn*1e6:8.1f}us ratio {t_bf16/t_dyn:4.2f}x"
        )


if __name__ == "__main__":
    main()
