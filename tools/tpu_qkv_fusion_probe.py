"""Probe: is one fused (768, 3*768) QKV projection faster than the three
separate q/k/v dots the towers issue (models/bert.py SelfAttention — kept
separate so the param tree mirrors HF module names for checkpoint import)?

Three variants at tower shapes:
  sep    — three (M,768)x(768,768) dots off one input (what we ship);
  fused  — one (M,768)x(768,2304) dot off a PRE-concatenated weight
           (the ceiling: what a fused-parameter layout would get);
  rtcat  — one dot off a weight concatenated INSIDE the jit each call
           (what we could ship with zero param-tree/checkpoint changes:
           the concat copies 3.5 MB/layer/call, HF names preserved).

If fused/rtcat show a real win at M=25600 (BERT rows at canonical bench
capacities) the SelfAttention forward is worth restructuring; if not,
record the negative and keep the HF-shaped params. XLA has a dot-merger
pass — this probe tells us whether it already fires at these shapes.

Usage (real TPU): python tools/tpu_qkv_fusion_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30):
    """Fenced fori_loop timing (tpu_int8_matmul_probe.py pattern): the loop
    lives in ONE program with a loop-carried perturbation so XLA cannot
    hoist the dots; host reads back one scalar to close the window."""
    import jax.lax as lax

    def run(x, *rest):
        y0 = fn(x, *rest)
        c0 = y0.reshape(-1)[0]

        def body(_, c):
            xi = x.at[0, 0].add(
                (c.astype(jnp.float32) * 1e-30).astype(x.dtype)
            )
            y = fn(xi, *rest)
            return y.reshape(-1)[0]

        return lax.fori_loop(0, iters, body, c0)

    jrun = jax.jit(run)
    float(jax.device_get(jrun(*args)).astype(np.float64))  # compile+fence
    t0 = time.perf_counter()
    float(jax.device_get(jrun(*args)).astype(np.float64))
    return (time.perf_counter() - t0) / (iters + 1)


def main():
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    d = 768
    # M: BERT rows (256 nodes x 100 tok), ViT rows (64 imgs x 197 tok)
    for m in (25600, 12608):
        x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
        wq, wk, wv = (
            jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
            for _ in range(3)
        )
        wcat = jnp.concatenate([wq, wk, wv], axis=1)

        def sep(a, q, k, v):
            return (a @ q) + (a @ k) + (a @ v)  # sum: one scalar carry

        def fused(a, w):
            return a @ w

        def rtcat(a, q, k, v):
            return a @ jnp.concatenate([q, k, v], axis=1)

        t_sep = _time(jax.jit(sep), x, wq, wk, wv)
        t_fus = _time(jax.jit(fused), x, wcat)
        t_cat = _time(jax.jit(rtcat), x, wq, wk, wv)
        fl = 2 * m * d * d * 3
        print(
            f"M={m}: sep {t_sep*1e6:8.1f}us ({fl/t_sep/1e12:5.1f} TF/s) | "
            f"fused {t_fus*1e6:8.1f}us ratio {t_sep/t_fus:4.2f}x | "
            f"rtcat {t_cat*1e6:8.1f}us ratio {t_sep/t_cat:4.2f}x"
        )


if __name__ == "__main__":
    main()
