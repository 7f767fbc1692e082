"""Biased-attention op tests (CPU: XLA path + custom-VJP gradient parity).

The Pallas kernel itself is validated on real TPU hardware by
tools/tpu_kernel_check.py (dispatch falls back to XLA off-TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.ops.biased_attention import (
    MASK_BIAS,
    _biased_attention_fused,
    biased_attention,
    biased_attention_reference,
)


def make_inputs(seed=0, b=2, h=3, s=17, dh=8, with_inf=True):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
    k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
    v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
    bias = rng.standard_normal((b, h, s, s)).astype(np.float32)
    if with_inf:
        # distance clipping writes -inf into the bias (collator.py:122-126)
        bias[:, :, :, -3:] = -np.inf
    pad = np.zeros((b, s), bool)
    pad[:, -2:] = True
    return map(jnp.asarray, (q, k, v, bias, pad))


def test_dispatch_cpu_matches_reference():
    q, k, v, bias, pad = make_inputs()
    out = biased_attention(q, k, v, bias, pad)
    ref = biased_attention_reference(q, k, v, bias, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_custom_vjp_matches_autodiff():
    """The hand-written backward must equal jax autodiff of the reference."""
    q, k, v, bias, pad = make_inputs(with_inf=False)
    scale = q.shape[-1] ** -0.5

    def f_ref(q, k, v, bias):
        return jnp.sum(
            biased_attention_reference(q, k, v, bias, pad, scale) ** 2
        )

    def f_fused(q, k, v, bias):
        return jnp.sum(_biased_attention_fused(q, k, v, bias, pad, scale) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-5
        )


def test_inf_bias_grad_safe():
    """-inf bias entries must not poison gradients (zero prob, zero grad)."""
    q, k, v, bias, pad = make_inputs(with_inf=True)
    scale = q.shape[-1] ** -0.5

    def f(q, k, v, bias):
        return jnp.sum(_biased_attention_fused(q, k, v, bias, pad, scale))

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v, bias)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
