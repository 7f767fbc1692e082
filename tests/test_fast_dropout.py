"""Mask-regenerating dropout (models/fast_dropout.py): forward/backward
mask consistency, inverted-dropout semantics, unbiasedness, module parity
with the flax Dropout call contract."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.models.fast_dropout import (
    FastDropout,
    fast_dropout,
)


def test_deterministic_given_key_and_rate_zero_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(16, 32), jnp.float32)
    k = jax.random.PRNGKey(7)
    a = fast_dropout(x, k, 0.5)
    b = fast_dropout(x, k, 0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fast_dropout(x, jax.random.PRNGKey(8), 0.5)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # kept entries are exactly x / (1 - rate); dropped are exactly 0
    arr = np.asarray(a)
    kept = arr != 0
    np.testing.assert_allclose(arr[kept], np.asarray(x)[kept] / 0.5, rtol=1e-6)


def test_backward_regenerates_the_same_mask():
    """grad must be g/(1-rate) exactly on the kept entries of the FORWARD
    mask and 0 elsewhere — i.e. the backward regenerated the identical
    mask rather than storing it."""
    x = jnp.asarray(np.random.RandomState(1).randn(64, 128), jnp.float32)
    k = jax.random.PRNGKey(3)
    rate = 0.3
    out, vjp = jax.vjp(lambda xx: fast_dropout(xx, k, rate), x)
    g = jnp.ones_like(out)
    (dx,) = vjp(g)
    kept = np.asarray(out) != 0
    dx = np.asarray(dx)
    np.testing.assert_allclose(dx[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    assert np.all(dx[~kept] == 0)


def test_unbiased_mean():
    x = jnp.ones((32, 64), jnp.float32)
    vals = [
        float(jnp.mean(fast_dropout(x, jax.random.PRNGKey(i), 0.4)))
        for i in range(200)
    ]
    assert abs(np.mean(vals) - 1.0) < 0.02


def test_module_contract_matches_flax_dropout():
    """Same call signature + rng plumbing as nn.Dropout; deterministic=True
    is the identity; rbg typed keys work (the trainer's fast path)."""
    x = jnp.asarray(np.random.RandomState(2).randn(4, 8), jnp.float32)
    mod = FastDropout(0.5)
    y_det = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_det), np.asarray(x))

    y1 = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    y2 = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    rbg = jax.random.wrap_key_data(
        jnp.tile(jax.random.PRNGKey(5), 2), impl="rbg"
    )
    y3 = mod.apply({}, x, deterministic=False, rngs={"dropout": rbg})
    assert np.isfinite(np.asarray(y3)).all()

    zero = FastDropout(0.0).apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    np.testing.assert_array_equal(np.asarray(zero), np.asarray(x))
