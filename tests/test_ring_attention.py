"""Ring (sequence-parallel) tree attention vs the single-device reference
on the virtual 8-device CPU mesh: S sharded over dp, k/v blocks rotated by
ppermute, bias strips sliced locally."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.ops import tree_attention as ta
from multimodaldiscussiontransformer_tpu.ops.ring_attention import (
    ring_tree_attention,
)
from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh


def _inputs(seed, b, h, s, dh):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    template = jnp.where(
        jnp.asarray(rng.random((b, s, s))) < 0.2, ta.MASK_BIAS, 0.0
    ).astype(jnp.float32)
    template = template.at[:, :, 0].set(0.0)
    ids = jnp.asarray(rng.integers(0, ta.LUT_SIZE, (b, s, s)), jnp.int32)
    lut = jnp.asarray(rng.standard_normal((ta.LUT_SIZE, h)), jnp.float32)
    lut = lut.at[0].set(0.0)
    return q, k, v, template, ids, lut


def test_ring_matches_reference_dp4():
    mesh = make_mesh(4, 2)
    q, k, v, template, ids, lut = _inputs(0, b=2, h=2, s=32, dh=8)
    scale = q.shape[-1] ** -0.5
    ref = ta.tree_attention_reference(q, k, v, template, ids, lut, scale, True)
    got = ring_tree_attention(q, k, v, template, ids, lut, mesh, "dp", scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ring_matches_reference_dp8():
    mesh = make_mesh(8, 1)
    q, k, v, template, ids, lut = _inputs(1, b=1, h=3, s=64, dh=8)
    scale = q.shape[-1] ** -0.5
    ref = ta.tree_attention_reference(q, k, v, template, ids, lut, scale, True)
    got = ring_tree_attention(q, k, v, template, ids, lut, mesh, "dp", scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ring_rejects_indivisible_s():
    import pytest

    mesh = make_mesh(4, 1)
    q, k, v, template, ids, lut = _inputs(2, b=1, h=2, s=30, dh=8)
    with pytest.raises(ValueError, match="divisible"):
        ring_tree_attention(q, k, v, template, ids, lut, mesh, "dp")


def test_ring_gradients_match_reference():
    """The ring is built from differentiable XLA ops (scan + ppermute +
    einsum), so autodiff through shard_map gives sequence-parallel
    TRAINING for free — residuals are O(S^2/n) per device, the same
    scaling as the sharded bias. Verify grads vs the reference."""
    mesh = make_mesh(4, 1)
    q, k, v, template, ids, lut = _inputs(3, b=1, h=2, s=32, dh=8)
    scale = q.shape[-1] ** -0.5

    def loss_ring(q, k, v, lut):
        out = ring_tree_attention(
            q, k, v, template, ids, lut, mesh, "dp", scale
        )
        return jnp.sum(out * jnp.sin(out))

    def loss_ref(q, k, v, lut):
        out = ta.tree_attention_reference(
            q, k, v, template, ids, lut, scale, True
        )
        return jnp.sum(out * jnp.sin(out))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, lut)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, lut)
    for name, a, b in zip("q k v lut".split(), g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name}",
        )


def test_ring_dropout_decorrelated_across_dp_shards():
    """With the batch sharded over dp, identical rows on different dp
    shards must receive DIFFERENT in-ring dropout masks (the replicated
    seed gets a per-shard offset — same contract as
    tree_attention_dropout_dispatch's _shard_linear_index offset)."""
    from multimodaldiscussiontransformer_tpu.ops.ring_attention import (
        ring_tree_attention_dispatch,
    )

    mesh = make_mesh(2, 1, 4)  # dp=2 x sp=4
    q, k, v, template, ids, lut = _inputs(5, b=1, h=2, s=32, dh=8)
    # batch of two IDENTICAL rows -> dp shard 0 and shard 1 see the same data
    q2, k2, v2 = (jnp.tile(x, (2, 1, 1, 1)) for x in (q, k, v))
    t2, i2 = jnp.tile(template, (2, 1, 1)), jnp.tile(ids, (2, 1, 1))
    scale = q.shape[-1] ** -0.5

    # like the model path, the dispatch runs under jit (the ambient-mesh
    # probe reads the abstract mesh during tracing)
    dropped = jax.jit(
        lambda *xs: ring_tree_attention_dispatch(
            *xs, scale=scale,
            dropout_seed=jnp.asarray(7, jnp.int32), dropout_rate=0.4,
        )
    )
    plain = jax.jit(
        lambda *xs: ring_tree_attention_dispatch(*xs, scale=scale)
    )
    with mesh:
        drop = dropped(q2, k2, v2, t2, i2, lut)
        nodrop = plain(q2, k2, v2, t2, i2, lut)
    drop, nodrop = np.asarray(drop), np.asarray(nodrop)
    # dropout actually perturbed something
    assert not np.allclose(drop[0], nodrop[0])
    # identical inputs on different dp shards -> different masks
    assert not np.allclose(drop[0], drop[1])
    # the no-dropout path stays shard-invariant
    np.testing.assert_allclose(nodrop[0], nodrop[1], rtol=1e-5, atol=1e-5)
