"""Tests for the prefetching loader and numerical-safety tooling."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.data.loader import ThreadedPrefetcher
from multimodaldiscussiontransformer_tpu.utils import debugging


def test_threaded_prefetcher_order_and_completion():
    batches = [{"x": np.full((2,), i)} for i in range(7)]
    out = list(ThreadedPrefetcher(iter(batches), lambda h: h["x"] * 2, depth=3))
    assert len(out) == 7
    for i, x in enumerate(out):
        np.testing.assert_array_equal(x, np.full((2,), i) * 2)


def test_threaded_prefetcher_propagates_errors():
    def gen():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    it = iter(ThreadedPrefetcher(gen(), lambda h: h["x"]))
    next(it)
    try:
        next(it)
        raised = False
    except RuntimeError as e:
        raised = "boom" in str(e)
    assert raised


def test_find_nonfinite():
    tree = {
        "a": {"good": np.ones(3), "bad": np.asarray([1.0, np.nan])},
        "ints": np.asarray([1, 2]),
        "inf": np.asarray([np.inf]),
    }
    bad = set(debugging.find_nonfinite(tree))
    assert bad == {"a/bad", "inf"}


def test_checkify_step_catches_nan():
    def step(x):
        return jnp.log(x)  # log(-1) -> NaN

    guarded = debugging.checkify_step(step)
    assert np.isclose(float(guarded(jnp.asarray(1.0))), 0.0)
    try:
        guarded(jnp.asarray(-1.0))
        raised = False
    except Exception:
        raised = True
    assert raised


def test_nan_guard():
    ok, bad = debugging.nan_guard({"loss": 1.0, "gnorm": float("nan")})
    assert not ok and bad == ["gnorm"]
    ok, bad = debugging.nan_guard({"loss": 1.0})
    assert ok and not bad
