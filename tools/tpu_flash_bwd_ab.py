"""On-TPU A/B of the streaming (flash) tree-attention backward.

Times, at giant S (past ``_FLASH_MIN_S``):

- the residual FAST path (two streaming passes: q-major dq/dLUT +
  k-major dk/dv, consuming the forward-saved ``out``/``lse``), vs
- the no-residual FALLBACK (what every backward paid before the
  fused-LSE forward landed: a standalone LSE pass + a full streaming
  forward recompute for delta + the same two gradient passes), and
- the fused-LSE forward vs the plain flash forward (the fast path's
  extra forward cost: flushing one (TQ, 128) page per q-tile).

Context: the reference's only answer to giant trees is data-side pruning
(/root/reference/Pre-Processing/3-prune-trees.py:16-39) and attention
clipping (/root/reference/mDT/src/data/collator.py:122-126); this kernel
is what lets the TPU framework TRAIN on them instead. In the full-model
flash bench bucket (bench.py, S=769) the towers dominate FLOPs ~99:1, so
this kernel-level number is where the two-pass win is visible.

Usage: python tools/tpu_flash_bwd_ab.py [--shapes 769,1537]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, fence, n=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    fence(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    fence(r)
    return (time.perf_counter() - t0) / n * 1e6  # us/call


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="769,1537")
    p.add_argument("--heads", type=int, default=12)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta

    assert jax.default_backend() != "cpu", "this is an on-chip benchmark"
    rng = np.random.default_rng(0)
    failures = 0
    for s in (int(x) for x in a.shapes.split(",")):
        b, h, dh = 1, a.heads, 64
        assert -(-s // 8) * 8 >= ta._FLASH_MIN_S, (
            f"S={s} below the flash threshold {ta._FLASH_MIN_S}"
        )
        q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        template = np.zeros((b, s, s), np.float32)
        clip = rng.random((b, s - 1, s - 1)) < 0.3
        template[:, 1:, 1:][clip] = -1e9
        ids = rng.integers(0, 22, (b, s, s)).astype(np.int32)
        lut = rng.standard_normal((ta.LUT_SIZE, h)).astype(np.float32)
        lut[0] = 0
        g = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        scale = dh**-0.5
        jq, jk, jv, jt, ji, jl, jg = map(
            jnp.asarray, (q, k, v, template, ids, lut, g)
        )

        fence = lambda r: jax.block_until_ready(r)  # noqa: E731

        fwd_plain = jax.jit(
            lambda: ta._tree_forward_flash(jq, jk, jv, jt, ji, jl, scale, True)
        )
        fwd_lse = jax.jit(
            lambda: ta._tree_forward_flash(
                jq, jk, jv, jt, ji, jl, scale, True, with_lse=True
            )
        )
        out, lse = fwd_lse()
        bwd_fast = jax.jit(
            lambda: ta._tree_backward_flash(
                jq, jk, jv, jt, ji, jl, jg, scale, True, lse=lse, out=out
            )
        )
        bwd_slow = jax.jit(
            lambda: ta._tree_backward_flash(
                jq, jk, jv, jt, ji, jl, jg, scale, True
            )
        )
        # end-to-end grad through the public custom_vjp (the product path)
        e2e_grad = jax.jit(
            jax.grad(
                lambda q_: jnp.vdot(
                    ta.tree_attention(q_, jk, jv, jt, ji, jl, scale, True), jg
                )
            )
        )
        e2e = lambda: e2e_grad(jq)  # noqa: E731

        # correctness first: both backward paths must agree
        dq_f, dk_f, dv_f, dl_f = (np.asarray(x) for x in bwd_fast())
        dq_s, dk_s, dv_s, dl_s = (np.asarray(x) for x in bwd_slow())
        errs = {
            "dq": np.abs(dq_f - dq_s).max() / (np.abs(dq_s).max() + 1e-9),
            "dk": np.abs(dk_f - dk_s).max() / (np.abs(dk_s).max() + 1e-9),
            "dv": np.abs(dv_f - dv_s).max() / (np.abs(dv_s).max() + 1e-9),
            "dlut": np.abs(dl_f - dl_s).max() / (np.abs(dl_s).max() + 1e-9),
        }
        ok = all(np.isfinite(val) and val < 5e-3 for val in errs.values())
        failures += not ok
        err_str = " ".join(f"{kk}={vv:.1e}" for kk, vv in errs.items())
        print(f"S={s} fast-vs-fallback rel err: {err_str} "
              f"{'OK' if ok else 'FAIL'}")

        t_fp = _timeit(fwd_plain, fence)
        t_fl = _timeit(fwd_lse, fence)
        t_bf = _timeit(bwd_fast, fence)
        t_bs = _timeit(bwd_slow, fence)
        t_e2e = _timeit(e2e, fence)
        print(f"  fwd plain:          {t_fp:10.1f} us/call")
        print(f"  fwd + lse page:     {t_fl:10.1f} us/call "
              f"({(t_fl / t_fp - 1) * 100:+.1f}%)")
        print(f"  bwd fallback(4pass):{t_bs:10.1f} us/call")
        print(f"  bwd residual(2pass):{t_bf:10.1f} us/call "
              f"({t_bs / t_bf:.2f}x)")
        print(f"  train fwd+bwd: old {t_fp + t_bs:.1f} -> new "
              f"{t_fl + t_bf:.1f} us ({(t_fp + t_bs) / (t_fl + t_bf):.2f}x); "
              f"e2e grad-of-vjp {t_e2e:.1f} us")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
