"""Layer-scan equivalence and layout-transform tests.

``ModelConfig.scan_layers`` (models/mdt.py::InterleavePairBlock + the tower
scans in models/{bert,vit}.py) must be numerically IDENTICAL to the unrolled
model — same ops, params sliced per scan iteration — with only the param
LAYOUT changed (utils/scan_params.py). These tests pin:

- bit-exact deterministic forward equality (unrolled params restacked into
  the scanned layout), for both the uniform-tail and ragged-tail interleave
  geometries (canonical sizes [2,2,2,2,1] have a ragged final fusion stack,
  multigraphormer_graph_encoder.py:145-158);
- transform round-trip exactness and init-structure agreement;
- training-mode gradients (remat x each policy incl. the round-5 "names"
  rung) finite and flowing to every scanned leaf;
- Trainer.load_params auto-adapting an unrolled checkpoint into a scanned
  model (and back);
- tp sharding rules handling the stacked leading axis (parallel/mesh.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodaldiscussiontransformer_tpu.core.config import tiny_model_config
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import (
    synthetic_batch_items,
)
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.utils.scan_params import (
    adapt_params,
    params_layout,
    scan_plan,
    to_scanned,
    to_unrolled,
)

IMG = (3, 32, 32)


def _batch(cfg, n=3, seed=0):
    items = synthetic_batch_items(
        n, seed=seed, min_nodes=3, max_nodes=8, seq_len=16,
        vocab_size=cfg.text_tower.vocab_size, image_shape=IMG,
        image_prob=0.5,
    )
    b = collate(
        items, spatial_pos_max=5, node_buckets=(8,),
        node_capacity_buckets=(32,), image_capacity_buckets=(4,),
        label_capacity_buckets=(16,), image_shape=IMG,
    )
    return {k: jnp.asarray(v) for k, v in b.asdict().items()}


GEOMETRIES = {
    # tiny default: sizes [1,1,1] -> 2 uniform pairs, towers 1 layer each
    "uniform": {},
    # canonical interleave geometry at tiny dims: sizes [2,2,2,2,1] ->
    # 3 scanned pairs + 1 ragged tail pair (fusion_stack_4 has 1 layer)
    "ragged": dict(num_fusion_layers=8, num_fusion_stack=2),
}


@pytest.mark.parametrize("geom", sorted(GEOMETRIES))
def test_scan_forward_bit_exact(geom):
    cfg_u = tiny_model_config(**GEOMETRIES[geom])
    cfg_s = cfg_u.replace(scan_layers=True)
    jb = _batch(cfg_u)
    m_u = MDTModel(cfg_u, dtype=jnp.float32)
    m_s = MDTModel(cfg_s, dtype=jnp.float32)
    p_u = m_u.init(jax.random.PRNGKey(0), jb, deterministic=True)
    p_s = to_scanned(p_u, cfg_s)
    assert params_layout(p_u) == "unrolled"
    assert params_layout(p_s) == "scanned"
    # converted params must agree exactly with the scanned model's own
    # init structure and shapes
    p_init = m_s.init(jax.random.PRNGKey(0), jb, deterministic=True)
    assert jax.tree_util.tree_structure(p_init) == jax.tree_util.tree_structure(p_s)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.shape == np.asarray(b).shape, p_init, p_s)
    )
    o_u = m_u.apply(p_u, jb, deterministic=True)
    o_s = m_s.apply(p_s, jb, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(o_u.logits), np.asarray(o_s.logits)
    )
    np.testing.assert_array_equal(
        np.asarray(o_u.global_embedding), np.asarray(o_s.global_embedding)
    )


def test_transform_round_trip_exact():
    cfg = tiny_model_config(**GEOMETRIES["ragged"])
    cfg_s = cfg.replace(scan_layers=True)
    jb = _batch(cfg)
    p_u = MDTModel(cfg, dtype=jnp.float32).init(
        jax.random.PRNGKey(1), jb, deterministic=True
    )
    p_rt = to_unrolled(to_scanned(p_u, cfg_s), cfg_s)
    assert jax.tree_util.tree_structure(p_u) == jax.tree_util.tree_structure(p_rt)
    assert jax.tree.all(
        jax.tree.map(
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            p_u, p_rt,
        )
    )
    # adapt_params is direction-aware and idempotent
    assert params_layout(adapt_params(p_u, cfg_s)) == "scanned"
    assert params_layout(adapt_params(p_u, cfg)) == "unrolled"


@pytest.mark.parametrize("policy", ["full", "names", "names_heavy", "dots_saveable"])
def test_scan_remat_training_grads(policy):
    """Training mode (dropout on, remat on at each policy rung): loss is
    finite and gradients reach every scanned leaf."""
    cfg = tiny_model_config(**GEOMETRIES["ragged"]).replace(
        scan_layers=True, remat=True, remat_policy=policy,
        dropout=0.1, attention_dropout=0.1, act_dropout=0.1,
    )
    jb = _batch(cfg)
    m = MDTModel(cfg, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0), jb, deterministic=True)

    def loss(params):
        out = m.apply(
            params, jb, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out.logits**2)

    val, g = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    assert jax.tree.all(jax.tree.map(lambda a: bool(jnp.isfinite(a).all()), g))
    # the scanned pair grads must be nonzero for at least one leaf (flow)
    pair_g = g["params"]["graph_encoder"]["scan_pairs"]
    total = sum(
        float(jnp.abs(x).sum()) for x in jax.tree.leaves(pair_g)
    )
    assert total > 0.0


def test_trainer_load_params_adapts_layout():
    """An unrolled params tree loads into a scan_layers Trainer (the
    checkpoint/HF-import boundary) and trains one step."""
    from multimodaldiscussiontransformer_tpu.core.config import (
        DataConfig, OptimConfig, TaskConfig, TrainConfig,
    )
    from multimodaldiscussiontransformer_tpu.parallel.mesh import make_mesh
    from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

    cfg_u = tiny_model_config()
    cfg_s = cfg_u.replace(scan_layers=True)
    jbh = _batch(cfg_u)
    host = {k: np.asarray(v) for k, v in jbh.items()}
    p_u = MDTModel(cfg_u, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jbh, deterministic=True
    )

    tc = TrainConfig(
        model=cfg_s,
        data=DataConfig(batch_size=3),
        optim=OptimConfig(update_freq=1, scan_microbatches=False),
        task_cfg=TaskConfig(dataset_name="synthetic"),
        fast_dropout_rng=False,
        dp_size=1,
    )
    trainer = Trainer(tc, mesh=make_mesh(1, 1), image_shape=IMG)
    state = trainer.init_state(host)
    state = trainer.load_params(state, p_u)
    assert params_layout(jax.device_get(state.params)) == "scanned"
    # forward through the loaded params equals the unrolled oracle
    o_u = MDTModel(cfg_u, dtype=jnp.float32).apply(
        p_u, jbh, deterministic=True
    )
    o_s = trainer.model.apply(
        jax.device_get(state.params), jbh, deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(o_u.logits), np.asarray(o_s.logits), rtol=0, atol=0
    )
    step = trainer._make_train_step()
    with trainer.mesh:
        from multimodaldiscussiontransformer_tpu.parallel.mesh import (
            shard_batch,
        )

        state, logs = step(state, shard_batch(trainer.mesh, host))
    assert np.isfinite(float(jax.device_get(logs["loss"])))


def test_tp_sharding_stacked_leading_axis():
    """tp rules shard the trailing per-layer dims of stacked params and
    leave the scan axis replicated (parallel/mesh.py::_spec_for_path)."""
    from jax.sharding import PartitionSpec as P

    from multimodaldiscussiontransformer_tpu.parallel.mesh import (
        make_mesh, param_sharding,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    # head dims divisible by tp=2: widen the tiny config
    cfg = tiny_model_config().replace(scan_layers=True)
    jb = _batch(cfg)
    p = MDTModel(cfg, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jb, deterministic=True
    )
    mesh = make_mesh(dp_size=-1, tp_size=2)
    shardings = param_sharding(mesh, p)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    hits = 0
    for path, sh in flat:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if "scan_pairs" in keys and "kernel" in keys and (
            "q_proj" in keys or "fc1" in keys
        ):
            leafp = jax.tree_util.tree_flatten_with_path(p)[0]
            shape = next(
                np.asarray(v).shape for kp, v in leafp if kp == path
            )
            assert len(shape) == 3  # stacked
            assert sh.spec == P(None, None, "tp"), (keys, sh.spec)
            hits += 1
    assert hits > 0
