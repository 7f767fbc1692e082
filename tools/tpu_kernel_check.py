"""On-TPU validation + microbenchmark of the Pallas biased-attention kernel.

Run on a machine with a real TPU attached (the default env here):

    python tools/tpu_kernel_check.py

Parity is checked against a HIGHEST-precision XLA oracle (both the kernel
and the default XLA path do bf16-decomposed MXU matmuls, so they carry
~1e-2 absolute noise each); timings compare the fused kernel against the
default XLA path in f32 and bf16 at mDT graph shapes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.ops.biased_attention import (
        _biased_attention_fused,
        biased_attention_reference,
    )

    assert jax.default_backend() not in ("cpu",), (
        f"needs a TPU backend, got {jax.default_backend()}"
    )
    rng = np.random.default_rng(0)
    failures = 0
    for (b, h, s, dh) in [(2, 4, 17, 32), (12, 12, 33, 64), (12, 12, 129, 64), (4, 12, 257, 64)]:
        q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        bias = rng.standard_normal((b, h, s, s)).astype(np.float32)
        bias[:, :, :, -3:] = -np.inf
        pad = np.zeros((b, s), bool)
        pad[:, -2:] = True
        scale = dh**-0.5
        args = tuple(map(jnp.asarray, (q, k, v, bias, pad)))
        fused = jax.jit(lambda *a: _biased_attention_fused(*a, scale))
        ref = jax.jit(lambda *a: biased_attention_reference(*a, scale))

        with jax.default_matmul_precision("highest"):
            oracle = np.asarray(jax.jit(
                lambda *a: biased_attention_reference(*a, scale)
            )(*args))
        o1 = np.asarray(fused(*args))
        err = np.abs(o1 - oracle).max()
        ok = err < 2e-2
        failures += not ok
        print(f"shape b{b} h{h} s{s} dh{dh}: max_err_vs_highest={err:.2e} {'OK' if ok else 'FAIL'}")

        if s >= 129:
            for dtype in (jnp.float32, jnp.bfloat16):
                cast = tuple(
                    a.astype(dtype) if a.dtype == jnp.float32 and a.ndim == 4 and a.shape[-1] == dh else a
                    for a in args
                )
                for name, fn in (("pallas", fused), ("xla", ref)):
                    fn(*cast).block_until_ready()
                    t0 = time.perf_counter()
                    for _ in range(50):
                        out = fn(*cast)
                    out.block_until_ready()
                    dt = (time.perf_counter() - t0) / 50
                    print(f"  {np.dtype(dtype).name} {name}: {dt*1e6:.1f} us/call")
    # gradient check on TPU
    q, k, v, bias, pad = args
    g = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(_biased_attention_fused(q, k, v, bias, pad, scale)))
    )(q, k, v)
    assert np.isfinite(np.asarray(g)).all(), "non-finite grads"
    print("grad finite: OK")
    return failures


if __name__ == "__main__":
    sys.exit(main())
