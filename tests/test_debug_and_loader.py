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


def test_cast_images_for_transfer_is_invariant_for_bf16_model():
    """Host-side bf16 image cast (loader.cast_images_for_transfer): no-op
    without a float image buffer, and BIT-IDENTICAL model outputs for a
    bf16 model (the ViT tower casts pixels to bf16 at the patch embedding
    either way) — the H2D payload is what changes, not the numerics."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from multimodaldiscussiontransformer_tpu.core.config import (
        tiny_model_config,
    )
    from multimodaldiscussiontransformer_tpu.data.collator import collate
    from multimodaldiscussiontransformer_tpu.data.loader import (
        cast_images_for_transfer,
    )
    from multimodaldiscussiontransformer_tpu.data.synthetic import (
        synthetic_batch_items,
    )
    from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel

    img = (3, 32, 32)
    items = synthetic_batch_items(
        2, seed=11, seq_len=12, vocab_size=128, image_shape=img,
        max_nodes=8, image_prob=1.0,
    )
    host = collate(items, spatial_pos_max=5, image_shape=img).asdict()
    assert host["images"].dtype == np.float32

    # no-op cases
    assert cast_images_for_transfer(host, None) is host
    no_imgs = {k: v for k, v in host.items() if k != "images"}
    assert cast_images_for_transfer(no_imgs, ml_dtypes.bfloat16) is no_imgs

    cast = cast_images_for_transfer(host, ml_dtypes.bfloat16)
    assert cast["images"].dtype == ml_dtypes.bfloat16
    assert cast["images"].nbytes == host["images"].nbytes // 2
    assert cast["input_ids"] is host["input_ids"]  # others untouched

    model = MDTModel(
        tiny_model_config().replace(dtype="bfloat16"),
        dtype=jnp.bfloat16,
    )
    jb_f32 = {k: jnp.asarray(v) for k, v in host.items()}
    jb_bf16 = {k: jnp.asarray(v) for k, v in cast.items()}
    params = model.init(jax.random.PRNGKey(0), jb_f32, deterministic=True)
    out_f32 = model.apply(params, jb_f32, deterministic=True)
    out_bf16 = model.apply(params, jb_bf16, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(out_f32.logits), np.asarray(out_bf16.logits)
    )
