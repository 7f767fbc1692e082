"""On-TPU validation + microbenchmark of the compact-bias tree-attention
kernel (ops/tree_attention.py) vs the materialized-bias XLA path.

The XLA comparison point includes the bias materialization (take + transpose
+ broadcast) because that is what the kernel eliminates.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    failures = 0
    for (b, h, s, dh) in [(12, 12, 33, 64), (12, 12, 129, 64), (12, 12, 257, 64), (4, 12, 513, 64)]:
        q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        template = np.zeros((b, s, s), np.float32)
        # realistic sparsity: ~30% distance-clipped pairs
        clip = rng.random((b, s - 1, s - 1)) < 0.3
        template[:, 1:, 1:][clip] = -1e9
        ids = rng.integers(0, 22, (b, s, s)).astype(np.int32)
        lut = rng.standard_normal((ta.LUT_SIZE, h)).astype(np.float32)
        lut[0] = 0
        scale = dh**-0.5
        args = tuple(map(jnp.asarray, (q, k, v, template, ids, lut)))

        fused = jax.jit(lambda *a: ta._tree_attention(*a, scale, True))
        xla = jax.jit(lambda *a: ta.tree_attention_reference(*a, scale, True))

        def oracle_once():
            with jax.default_matmul_precision("highest"):
                return np.asarray(
                    jax.jit(
                        lambda *a: ta.tree_attention_reference(*a, scale, True)
                    )(*args)
                )

        oracle = oracle_once()
        if not np.isfinite(oracle).all():
            # the tunneled device occasionally returns transient garbage on
            # the XLA path after many resident programs; retry once
            print(f"  (oracle returned non-finite values at s={s}; retrying)")
            oracle = oracle_once()
        if not np.isfinite(oracle).all():
            # still garbage: fall back to a host-side numpy oracle so the
            # kernel is judged against trustworthy values
            print(f"  (device oracle still non-finite at s={s}; numpy oracle)")
            bias = np.take(lut, ids, axis=0).transpose(0, 3, 1, 2) + (
                2.0 * np.maximum(template, ta.MASK_BIAS)[:, None]
            )
            scores = (
                np.einsum("bhqd,bhkd->bhqk", q * scale, k, dtype=np.float64)
                + bias
            )
            m = scores.max(-1, keepdims=True)
            p = np.exp(scores - m)
            p /= p.sum(-1, keepdims=True)
            oracle = np.einsum(
                "bhqk,bhkd->bhqd", p, v, dtype=np.float64
            ).astype(np.float32)
        out = np.asarray(fused(*args))
        err = np.abs(out - oracle).max()
        ok = err < 2e-2 and np.isfinite(out).all()
        failures += not ok
        print(f"b{b} h{h} s{s}: max_err={err:.2e} {'OK' if ok else 'FAIL'}")

        for dtype in (jnp.float32, jnp.bfloat16):
            cast = tuple(
                a.astype(dtype) if a.ndim == 4 else a for a in args
            )
            for name, fn in (("tree-pallas", fused), ("xla+materialize", xla)):
                fn(*cast).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(50):
                    out = fn(*cast)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / 50
                print(f"  {np.dtype(dtype).name:8s} {name}: {dt*1e6:8.1f} us/call")

    # grads on TPU
    q, k, v, template, ids, lut = args
    g = jax.jit(
        jax.grad(
            lambda q, k, v, lut: jnp.sum(
                ta._tree_attention(q, k, v, template, ids, lut, scale, True)
            ),
            argnums=(0, 1, 2, 3),
        )
    )(q, k, v, lut)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    print("grads finite: OK")

    # streaming (flash) backward vs a float64 numpy oracle at a size small
    # enough to materialize host-side but large enough (s >= _FLASH_MIN_S)
    # to route through the three streaming passes
    b, h, s, dh = 1, 2, 520, 64
    rng2 = np.random.default_rng(1)
    q = rng2.standard_normal((b, h, s, dh)).astype(np.float32)
    k = rng2.standard_normal((b, h, s, dh)).astype(np.float32)
    v = rng2.standard_normal((b, h, s, dh)).astype(np.float32)
    template = np.zeros((b, s, s), np.float32)
    clip = rng2.random((b, s - 1, s - 1)) < 0.3
    template[:, 1:, 1:][clip] = -1e9
    ids = rng2.integers(0, 22, (b, s, s)).astype(np.int32)
    lut = rng2.standard_normal((ta.LUT_SIZE, h)).astype(np.float32)
    lut[0] = 0
    scale = dh**-0.5
    ja = tuple(map(jnp.asarray, (q, k, v, template, ids, lut)))
    dq, dk, dv, dlut = jax.jit(
        jax.grad(
            lambda q_, k_, v_, l_: jnp.sum(
                ta._tree_attention(q_, k_, v_, ja[3], ja[4], l_, scale, True)
            ),
            argnums=(0, 1, 2, 3),
        )
    )(*[ja[i] for i in (0, 1, 2, 5)])

    bias = np.take(lut, ids, axis=0).transpose(0, 3, 1, 2).astype(np.float64)
    bias += 2.0 * np.maximum(template, ta.MASK_BIAS)[:, None]
    sc = np.einsum("bhqd,bhkd->bhqk", q * scale, k, dtype=np.float64) + bias
    m = sc.max(-1, keepdims=True)
    e = np.exp(sc - m)
    p = e / e.sum(-1, keepdims=True)
    gones = np.ones((b, h, s, dh), np.float64)
    dv_o = np.einsum("bhqk,bhqd->bhkd", p, gones)
    dp = np.einsum("bhqd,bhkd->bhqk", gones, v.astype(np.float64))
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    dq_o = np.einsum("bhqk,bhkd->bhqd", ds, k.astype(np.float64)) * scale
    dk_o = np.einsum("bhqk,bhqd->bhkd", ds, q.astype(np.float64)) * scale
    onehot = np.eye(ta.LUT_SIZE, dtype=np.float64)[ids]
    dlut_o = np.einsum("bhij,bijl->lh", ds, onehot)
    dlut_o[0] = 0.0
    gscale = np.abs(dq_o).max()
    for name, a, o in (("dq", dq, dq_o), ("dk", dk, dk_o), ("dv", dv, dv_o), ("dlut", dlut, dlut_o)):
        err = np.abs(np.asarray(a, np.float64) - o).max()
        rel = err / max(np.abs(o).max(), 1e-6)
        ok = rel < 2e-2 and np.isfinite(np.asarray(a)).all()
        failures += not ok
        print(f"flash-bwd {name}: rel_err={rel:.2e} {'OK' if ok else 'FAIL'}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
