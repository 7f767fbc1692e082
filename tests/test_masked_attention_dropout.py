"""In-kernel dropout of the TOWER attention kernel
(ops/masked_attention.py): determinism, rate-0 equivalence, statistics,
and a mask-extraction-oracle gradient check (the mask is regenerated from
the seed, never stored — forward and backward must agree bit-for-bit).

The TPU PRNG primitives have no CPU interpret-mode lowering, so these
tests only run on a real TPU backend (tools/tpu_masked_attention_check.py
drives them there); under the CPU test mesh they are skipped.

Reference semantics covered: HF ``self.dropout(attention_probs)`` inside
``BertSelfAttention`` / ``ViTSelfAttention`` (the towers the model
consumes at multigraphormer_graph_encoder.py:236-246)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.ops import masked_attention as ma

tpu_only = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_* not available in CPU interpret mode",
)


def _inputs(seed=0, b=3, h=2, s=16, dh=8):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    keep = rng.random((b, s)) < 0.8
    keep[:, 0] = True
    mask = jnp.where(jnp.asarray(keep), 0.0, ma.MASK_BIAS).astype(jnp.float32)
    return q, k, v, mask


@tpu_only
def test_rate_zero_matches_reference():
    """Scaled max-err bound: both sides feed the MXU bf16 operands on
    hardware, so agreement is bf16-rounding-bounded (exact-f32 parity is
    the CPU interpret-mode CI's job, tests/test_masked_attention.py)."""
    q, k, v, mask = _inputs()
    out = np.asarray(
        ma.masked_attention(
            q, k, v, mask, seed=jnp.asarray([5], jnp.int32), rate=0.0
        )
    )
    ref = np.asarray(ma.masked_attention_reference(q, k, v, mask))
    scale_ref = max(float(np.abs(ref).max()), 1.0)
    assert float(np.abs(out - ref).max()) < 2e-2 * scale_ref


@tpu_only
def test_determinism_and_seed_sensitivity():
    q, k, v, mask = _inputs(1)
    s7 = jnp.asarray([7], jnp.int32)
    s8 = jnp.asarray([8], jnp.int32)
    a1 = np.asarray(ma.masked_attention(q, k, v, mask, seed=s7, rate=0.3))
    a2 = np.asarray(ma.masked_attention(q, k, v, mask, seed=s7, rate=0.3))
    b1 = np.asarray(ma.masked_attention(q, k, v, mask, seed=s8, rate=0.3))
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b1)


@tpu_only
def test_dropout_statistics():
    """Uniform attention over ones-values: each output element is
    (kept keys / S) / (1 - rate); the mean over rows must approach 1."""
    b, h, s, dh = 2, 1, 64, 8
    q = jnp.zeros((b, h, s, dh), jnp.float32)
    k = jnp.zeros((b, h, s, dh), jnp.float32)
    v = jnp.ones((b, h, s, dh), jnp.float32)
    out = np.asarray(
        ma.masked_attention(
            q, k, v, None, seed=jnp.asarray([3], jnp.int32), rate=0.3
        )
    )
    assert abs(out.mean() - 1.0) < 0.1
    assert out.std() > 0.01  # dropout actually happened


@tpu_only
def test_backward_matches_mask_oracle():
    """Fused backward vs jax autodiff of a pure-XLA replica driven by the
    kernel's ACTUAL dropout mask, extracted exactly: with q=k=0 and v=I
    the fused output is M/(S*(1-rate)) per row, so rounding recovers the
    keep-mask both passes regenerate from the seed."""
    b, h, s, dh = 2, 2, 8, 8  # dh == s for the identity extraction
    q, k, v, mask = _inputs(2, b=b, h=h, s=s, dh=dh)
    mask = None  # zero bias keeps the probe rows exactly uniform
    scale = dh**-0.5
    seed = jnp.asarray([11], jnp.int32)
    rate = 0.25
    rng = np.random.default_rng(0)
    weights = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)

    qz = jnp.zeros((b, h, s, dh))
    eye = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), (b, h, s, s))
    probe = ma.masked_attention(
        qz, qz, eye, None, seed=seed, rate=rate, scale=scale
    )
    keep = jnp.asarray(np.round(np.asarray(probe) * s * (1 - rate)) > 0.5)

    def f_oracle(q_, k_, v_):
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q_.astype(jnp.float32) * scale, k_
        )
        p = jax.nn.softmax(scores, axis=-1)
        pd = jnp.where(keep, p, 0.0) / (1 - rate)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", pd, v_) * weights)

    def f_fused(q_, k_, v_):
        return jnp.sum(
            ma.masked_attention(
                q_, k_, v_, None, seed=seed, rate=rate, scale=scale
            )
            * weights
        )

    # the probe and the oracle agree on the forward first (bf16-MXU bound)
    fwd_fused = np.asarray(
        ma.masked_attention(q, k, v, None, seed=seed, rate=rate, scale=scale)
    )
    fwd_oracle = np.asarray(
        jax.jit(
            lambda q_, k_, v_: jnp.einsum(
                "bhqk,bhkd->bhqd",
                jnp.where(
                    keep,
                    jax.nn.softmax(
                        jnp.einsum("bhqd,bhkd->bhqk", q * scale, k), -1
                    ),
                    0.0,
                )
                / (1 - rate),
                v_,
            )
        )(q, k, v)
    )
    fscale = max(float(np.abs(fwd_oracle).max()), 1.0)
    assert float(np.abs(fwd_fused - fwd_oracle).max()) < 2e-2 * fscale

    g_oracle = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), g_oracle, g_fused):
        scale_ref = max(float(jnp.abs(a).max()), 1.0)
        err = float(jnp.abs(a - b_).max())
        assert err < 2e-2 * scale_ref, f"{name}: err {err} scale {scale_ref}"


@tpu_only
def test_module_dropout_is_unbiased_on_chip():
    """SelfAttention (models/bert.py) with the kernel dropout path: the
    Monte-Carlo mean over seeds converges to the deterministic output
    (inverted dropout on probabilities is linear in the mask)."""
    import multimodaldiscussiontransformer_tpu.models.bert as bert_mod

    rng = np.random.default_rng(5)
    b, s, d, h = 2, 12, 32, 4
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    attn_mask = jnp.asarray(
        (rng.random((b, s)) < 0.85).astype(np.float32)
    ).at[:, 0].set(1.0)
    bias = bert_mod.attention_mask_bias(attn_mask, jnp.float32)

    mod = bert_mod.SelfAttention(d, h, 0.5, use_pallas=True)
    params = mod.init(jax.random.PRNGKey(0), hidden, bias)
    det = np.asarray(mod.apply(params, hidden, bias, deterministic=True))

    import functools

    @functools.partial(jax.jit)
    def one(seed):
        return mod.apply(
            params, hidden, bias, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )

    n = 400
    acc = jnp.zeros_like(jnp.asarray(det))
    for i in range(n):
        acc = acc + one(i)
    mean = np.asarray(acc / n)
    err = np.abs(mean - det).max()
    scale = np.abs(det).max()
    assert err < 0.15 * scale, (err, scale)
