"""Scan-accumulated gradient accumulation (OptimConfig.scan_microbatches):
FairSeq-exact update math (grads of summed losses / total sample size) and
fit-loop integration."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import (
    DataConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    tiny_model_config,
)
from multimodaldiscussiontransformer_tpu.data.loader import stack_microbatches
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_dataset
from multimodaldiscussiontransformer_tpu.parallel.mesh import (
    make_mesh,
    shard_stacked_batch,
)
from multimodaldiscussiontransformer_tpu.train.optimizer import (
    polynomial_decay_schedule,
    trainable_mask,
)
from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

IMG = (3, 32, 32)
SYN = dict(seq_len=16, vocab_size=128, image_shape=IMG, max_nodes=8)


def _apply_freeze(params, freeze):
    """FairSeq freeze semantics for the manual references: frozen modules
    have requires_grad=False, i.e. NO gradient exists for them (the train
    step mirrors this with per-leaf stop_gradient)."""
    labels = trainable_mask(params, freeze)
    return jax.tree.map(
        lambda p, l: jax.lax.stop_gradient(p) if l == "freeze" else p,
        params, labels,
    )


def make_cfg(**kw):
    base = dict(
        model=tiny_model_config(),
        data=DataConfig(
            batch_size=4,
            max_text_len=16,
            node_buckets=(8,),
            node_capacity_buckets=(64,),
            image_capacity_buckets=(16,),
            label_capacity_buckets=(32,),
        ),
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=20, update_freq=3,
            scan_microbatches=True,
        ),
        task_cfg=TaskConfig(dataset_name="synthetic", seed=0),
        log_interval=100,
        validate_interval_updates=0,
        # keep the equivalence check deterministic-friendly
        fast_dropout_rng=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_scan_step_matches_manual_fairseq_math():
    """One scan step over 3 stacked microbatches must equal: grads of the
    SUMMED losses accumulated across the microbatches, divided by the
    TOTAL sample size, applied once through the base optimizer."""
    import dataclasses

    base_model = tiny_model_config(
        dropout=0.0, attention_dropout=0.0, act_dropout=0.0
    )
    cfg = make_cfg(
        model=base_model.replace(
            text_tower=dataclasses.replace(
                base_model.text_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
            image_tower=dataclasses.replace(
                base_model.image_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
        ),
    )
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=40, seed=0, **SYN)
    batches = list(trainer.train_batches(ds, epoch=1))[:3]
    state = trainer.init_state(batches[0].asdict())
    step = trainer._make_train_step_scan(return_grads=True)

    # manual reference FIRST — the jitted step donates (and deletes) state
    model, criterion = trainer.model, trainer.criterion

    def loss_fn(params, b):
        params = _apply_freeze(params, cfg.model.freeze_initial_encoders)
        out = model.apply(params, b, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        loss, ssz, _ = criterion(out, b)
        return loss, ssz

    gacc = jax.tree.map(jnp.zeros_like, state.params)
    total = 0.0
    for b in batches:
        jb1 = {k: jnp.asarray(v) for k, v in b.asdict().items()}
        (loss, ssz), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, jb1
        )
        gacc = jax.tree.map(jnp.add, gacc, grads)
        total += float(ssz)
    grads_ref = jax.tree.map(lambda g: g / max(total, 1.0), gacc)
    updates, _ = trainer.tx.update(grads_ref, state.opt_state, state.params)
    params_ref = jax.tree.map(
        lambda p, u: p + u.astype(p.dtype), state.params, updates
    )
    params_ref = jax.device_get(params_ref)

    stacked = next(iter(stack_microbatches(iter(batches), 3)))
    with trainer.mesh:
        jb = shard_stacked_batch(trainer.mesh, stacked)
        new_state, logs = step(state, jb)

    # --- the accumulation math itself: accumulated summed grads / total
    # sample size, compared PRE-optimizer. The dp=2-sharded step reduces
    # grad sums in a different order than the unsharded manual loop, so
    # elements agree only to fp32 reassociation noise (measured ~7e-8 abs);
    # atol=1e-6 gives >10x margin while still pinning the semantics (a
    # MultiSteps-style per-microbatch normalization error would be O(grad)).
    g_ref = jax.tree.leaves(jax.device_get(grads_ref))
    g_got = jax.tree.leaves(jax.device_get(logs["grads"]))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=1e-6,
        )

    # --- params post-Adam, two-tier. Adam's first step is
    # lr0 * g/(|g|+eps) (m_hat=g, v_hat=g^2 at step 1), so:
    # * where |g| >> noise (floor 1e-4 >> 7e-8), the update direction and
    #   magnitude are stable under reassociation noise d:
    #   |d update| ~ lr0 * eps/(|g|+eps)^2 * d <= lr0 * 1e-8/1e-8 * 7e-8,
    #   far below atol -> compare tightly;
    # * where |g| <~ noise, the quotient g/(|g|+eps) can flip sign entirely:
    #   the two paths legitimately differ by up to 2*lr0 -> bound, don't
    #   compare. (This is the mode that made the old all-elements
    #   rtol=2e-4/atol=2e-5 comparison fail: 3/64 elements of a zero-init
    #   bias leaf with |g|~1e-8.)
    lr0 = float(
        polynomial_decay_schedule(
            cfg.optim.lr, cfg.optim.end_learning_rate,
            cfg.optim.warmup_updates, cfg.optim.total_num_update,
            cfg.optim.power,
        )(0)
    )
    got_leaves = jax.tree.leaves(jax.device_get(new_state.params))
    ref_leaves = jax.tree.leaves(params_ref)
    g_floor = 1e-4
    for a, b, g in zip(got_leaves, ref_leaves, g_ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        g = np.asarray(g, np.float32)
        big = np.abs(g) > g_floor
        np.testing.assert_allclose(a[big], b[big], rtol=2e-4, atol=2e-5)
        np.testing.assert_array_less(
            np.abs(a[~big] - b[~big]), 2.05 * lr0 + 1e-7
        )
    assert int(new_state.step) == 3
    assert np.isfinite(float(logs["loss"]))


def test_fit_with_scan_microbatches(tmp_path):
    cfg = make_cfg(save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=60, seed=1, **SYN)
    state = trainer.fit(ds, max_epoch=2)
    # microstep counter advanced in units of consumed microbatches
    assert int(state.step) > 0
    metrics = trainer.evaluate(state, ds, "valid")
    assert np.isfinite(metrics["loss"])


def test_stack_microbatches_shapes_and_tail():
    ds = synthetic_dataset(num_graphs=20, seed=2, **SYN)
    cfg = make_cfg()
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    batches = list(trainer.train_batches(ds, epoch=1))
    groups = list(stack_microbatches(iter(batches), 3))
    ks = [g["idx"].shape[0] for g in groups]
    assert sum(ks) == len(batches)
    assert all(x == 3 for x in ks[:-1])


def _dropout_free_cfg(**kw):
    import dataclasses

    base_model = tiny_model_config(
        dropout=0.0, attention_dropout=0.0, act_dropout=0.0
    )
    return make_cfg(
        model=base_model.replace(
            text_tower=dataclasses.replace(
                base_model.text_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
            image_tower=dataclasses.replace(
                base_model.image_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
        ),
        **kw,
    )


def test_pad_tail_group_update_is_bit_identical():
    """A ragged tail group padded to k with all-pad microbatches
    (stack_microbatches pad_tail=True) must produce the SAME update as the
    short group: the pads contribute exactly zero summed loss/grads/sample
    size, so both the normalized grads and the post-Adam params agree
    bitwise (g + 0.0 == g; real microbatches precede the pads in the scan,
    so they consume identical dropout keys)."""
    cfg = _dropout_free_cfg()
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=40, seed=4, **SYN)
    batches = list(trainer.train_batches(ds, epoch=1))[:2]

    short = next(iter(stack_microbatches(iter(batches), 3)))
    padded = next(iter(stack_microbatches(iter(batches), 3, pad_tail=True)))
    assert short["idx"].shape[0] == 2
    assert padded["idx"].shape[0] == 3
    # the pad member is all-pad: idx -1, no real node rows, no labels
    assert (padded["idx"][2] == -1).all()
    assert not padded["grid_mask"][2].any()
    assert not padded["y_slot_mask"][2].any()
    # real members are untouched by the padding
    for key in short:
        np.testing.assert_array_equal(padded[key][:2], short[key])

    step = None
    results = []
    for group in (short, padded):
        state = trainer.init_state(batches[0].asdict())
        if step is None:  # tx exists only after init_state
            step = trainer._make_train_step_scan(return_grads=True)
        with trainer.mesh:
            jb = shard_stacked_batch(trainer.mesh, group)
            new_state, logs = step(state, jb)
        results.append(
            (
                jax.device_get(logs["grads"]),
                jax.device_get(new_state.params),
                jax.device_get(
                    {k: v for k, v in logs.items() if k != "grads"}
                ),
            )
        )
    (g_s, p_s, l_s), (g_p, p_p, l_p) = results
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(p_p), jax.tree.leaves(p_s)):
        np.testing.assert_array_equal(a, b)
    # summed metric counts unchanged (pad graphs log nothing)
    for key in l_s:
        np.testing.assert_allclose(
            np.asarray(l_p[key]), np.asarray(l_s[key]), rtol=0, atol=0
        )


def test_fit_pads_ragged_tail_group(tmp_path):
    """End-to-end: an epoch whose microbatch count is not a multiple of
    update_freq runs the tail through the SAME compiled scan shape —
    state.step advances in exact multiples of k (pads count as consumed
    microbatches, mirroring state.step += k inside the step)."""
    cfg = make_cfg(save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, mesh=make_mesh(2, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=70, seed=5, **SYN)
    n_micro = len(list(trainer.train_batches(ds, epoch=1)))
    assert n_micro % 3 != 0, "fixture must produce a ragged tail"
    state = trainer.fit(ds, max_epoch=1)
    assert int(state.step) == -(-n_micro // 3) * 3


def test_stack_microbatches_pads_mixed_shapes_inertly():
    """Multi-entry bucket ladders: group members landing in different
    buckets are grown to the group max with inert padding — the padded
    scan step must accumulate EXACTLY the same grads as the manual loop
    over the raw (unpadded) microbatches."""
    import dataclasses

    base_model = tiny_model_config(
        dropout=0.0, attention_dropout=0.0, act_dropout=0.0
    )
    cfg = make_cfg(
        model=base_model.replace(
            text_tower=dataclasses.replace(
                base_model.text_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
            image_tower=dataclasses.replace(
                base_model.image_tower,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
        ),
        data=DataConfig(
            batch_size=4,
            max_text_len=16,
            node_buckets=(4, 8),
            node_capacity_buckets=(16, 32, 64),
            image_capacity_buckets=(4, 16),
            label_capacity_buckets=(8, 32),
            text_len_buckets=(8, 16),
        ),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    ds = synthetic_dataset(
        num_graphs=24, seed=3, min_nodes=2, **SYN
    )
    all_batches = list(trainer.train_batches(ds, epoch=1))
    # pick 3 microbatches guaranteed to span >= 2 distinct signatures
    by_sig = {}
    for b in all_batches:
        sig = tuple(
            (k, v.shape) for k, v in sorted(b.asdict().items())
        )
        by_sig.setdefault(sig, b)
    assert len(by_sig) > 1, "fixture must actually exercise mixed buckets"
    batches = (list(by_sig.values()) + all_batches)[:3]

    state = trainer.init_state(batches[0].asdict())
    step = trainer._make_train_step_scan(return_grads=True)

    model, criterion = trainer.model, trainer.criterion

    def loss_fn(params, b):
        params = _apply_freeze(params, cfg.model.freeze_initial_encoders)
        out = model.apply(params, b, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        loss, ssz, _ = criterion(out, b)
        return loss, ssz

    gacc = jax.tree.map(jnp.zeros_like, state.params)
    total = 0.0
    for b in batches:
        jb1 = {k: jnp.asarray(v) for k, v in b.asdict().items()}
        (_, ssz), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, jb1
        )
        gacc = jax.tree.map(jnp.add, gacc, grads)
        total += float(ssz)
    grads_ref = jax.tree.map(lambda g: g / max(total, 1.0), gacc)

    stacked = next(iter(stack_microbatches(iter(batches), 3)))
    assert stacked["input_ids"].shape[0] == 3
    with trainer.mesh:
        jb = shard_stacked_batch(trainer.mesh, stacked)
        _, logs = step(state, jb)

    for a, b in zip(
        jax.tree.leaves(jax.device_get(logs["grads"])),
        jax.tree.leaves(jax.device_get(grads_ref)),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=1e-6,
        )


def test_resume_after_completed_epochs_skips_nothing(tmp_path):
    """Resume math must use the scan mode's per-epoch microbatch stride
    ceil(bpe/k)*k (the padded tail group counts k), not bpe: a checkpoint
    taken at an epoch boundary with bpe % k != 0 must NOT look mid-epoch
    (that would silently skip fresh groups of the next epoch)."""
    cfg = make_cfg(
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=50, update_freq=2,
            scan_microbatches=True,
        ),
        save_dir=str(tmp_path / "ck"),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=16, seed=11, **SYN)  # 12 train
    bpe = len(ds.train_idx) // cfg.data.batch_size
    assert bpe == 3 and bpe % 2 == 1  # ragged tail: 2 groups, 4 micro/epoch

    batches = list(trainer.train_batches(ds, epoch=3))
    state = trainer.init_state(batches[0].asdict())
    # two COMPLETED epochs: 2 groups x k=2 each (tail group padded to k)
    state = state.replace(
        step=jnp.asarray(2 * 4, jnp.int32), epoch=jnp.asarray(2, jnp.int32)
    )

    consumed = []
    orig_step = trainer._make_train_step_scan()

    def counting_step(st, jb):
        consumed.append(int(jb["idx"].shape[1]))  # (k, B) leading dims
        return orig_step(st, jb)

    trainer._train_step = counting_step
    trainer.fit(ds, state=state, max_epoch=3)
    # ALL of epoch 3's groups must run (pre-fix: consumed=8-2*3=2 looked
    # mid-epoch and the first group was skipped)
    assert len(consumed) == 2


def test_mid_epoch_resume_in_scan_mode_skips_consumed_groups(tmp_path):
    """A mid-epoch scan-mode checkpoint resumes at the next GROUP."""
    cfg = make_cfg(
        optim=OptimConfig(
            lr=1e-3, warmup_updates=2, total_num_update=50, update_freq=2,
            scan_microbatches=True,
        ),
        save_dir=str(tmp_path / "ck"),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1, 1), image_shape=IMG)
    ds = synthetic_dataset(num_graphs=16, seed=12, **SYN)

    batches = list(trainer.train_batches(ds, epoch=2))
    state = trainer.init_state(batches[0].asdict())
    # epoch 1 complete (4 micro) + the first group of epoch 2 (2 micro)
    state = state.replace(
        step=jnp.asarray(4 + 2, jnp.int32), epoch=jnp.asarray(1, jnp.int32)
    )

    seen_first_idx = []
    orig_step = trainer._make_train_step_scan()

    def counting_step(st, jb):
        seen_first_idx.append(np.asarray(jb["idx"])[0, 0])
        return orig_step(st, jb)

    trainer._train_step = counting_step
    trainer.fit(ds, state=state, max_epoch=2)
    # exactly one group remains in epoch 2, and it is the SECOND group
    assert len(seen_first_idx) == 1
    from multimodaldiscussiontransformer_tpu.data.loader import (
        stack_microbatches,
    )

    groups = list(
        stack_microbatches(trainer.train_batches(ds, 2), 2, pad_tail=True)
    )
    assert seen_first_idx[0] == np.asarray(groups[1]["idx"])[0, 0]
