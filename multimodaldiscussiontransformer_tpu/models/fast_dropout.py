"""Mask-regenerating dropout: HBM-cheap inverted dropout for TPU.

Standard ``flax.linen.Dropout`` keeps the boolean keep-mask alive as an
autodiff residual of ``jnp.where`` — an activation-sized tensor per dropout
site. This model applies dropout at ~13 sites per fused layer stack over
(C, T, D)/(C, T, 4D)-sized activations (reference rates 0.4/0.3/0.3,
run_train.sh:37), so those residuals dominate backward HBM traffic:
measured 58.7 vs 49.6 disc/s with dropout off vs flax dropout
(tools/tpu_perf_sweep.py ``nodropout_noremat``).

``fast_dropout`` stores only the PRNG KEY as the residual and regenerates
the mask in the backward pass — the same trick as the in-kernel-dropout
tree-attention pair (ops/tree_attention.py), applied at the XLA level.

Measured effect (v5e, canonical shapes): throughput-neutral (49.5 vs 49.6
disc/s — the remaining dropout cost is bits GENERATION, paid twice here
vs once + bool-residual traffic with flax), but the activation-sized mask
residuals disappear from HBM, which buys real headroom in the
memory-bound big-tree/remat regime. The residual-free property is pinned
by tests/test_fast_dropout.py::test_backward_regenerates_the_same_mask.

Numerics: standard inverted dropout, E[out] = x; the mask differs from
flax's (different bit-derivation) but is identically distributed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _keep_mask(key, shape, rate: float):
    # uint32 threshold compare — one bits tensor, no float conversion
    bits = jax.random.bits(key, shape, jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= threshold


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fast_dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    keep = _keep_mask(key, x.shape, rate)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _fd_fwd(x, key, rate):
    keep = _keep_mask(key, x.shape, rate)
    out = jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
    return out, key  # the ONLY residual — no activation-sized mask

def _fd_bwd(rate, key, g):
    keep = _keep_mask(key, g.shape, rate)  # regenerated, not stored
    dx = jnp.where(keep, g / (1.0 - rate), 0.0).astype(g.dtype)
    return dx, None


fast_dropout.defvjp(_fd_fwd, _fd_bwd)


class FastDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (same call signature for the
    uses in this repo: ``__call__(x, deterministic=...)``)."""

    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: Optional[bool] = None
    ) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        key = self.make_rng(self.rng_collection)
        return fast_dropout(x, key, self.rate)
