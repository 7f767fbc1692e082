"""Jit-compiled train/eval steps over a device mesh + the epoch loop.

Replaces the FairSeq trainer surface the reference rides
(fairseq_cli.train, SURVEY.md §3.1): epoch iteration with per-epoch seeded
shuffling, update-freq gradient accumulation, validate-interval-updates
validation, checkpoint save/restore, and summed-logging metric reduction.

TPU specifics:
- ONE jit program per distinct batch shape signature (the bucketed collator
  keeps the signature set small); params/opt-state sharded by
  parallel.mesh rules, batch sharded on dp, XLA inserts all collectives;
- gradients are normalized by the criterion's ``sample_size`` (FairSeq
  semantics: summed loss, grads divided by sample size);
- donated state buffers — the train step updates params in place in HBM.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multimodaldiscussiontransformer_tpu.core.config import TrainConfig
from multimodaldiscussiontransformer_tpu.core.registry import CRITERIONS
from multimodaldiscussiontransformer_tpu.data.dataset import (
    DiscussionDataset,
    iterate_batches,
)
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.parallel.mesh import (
    data_parallel_size,
    make_mesh,
    shard_params,
)
from multimodaldiscussiontransformer_tpu.train.metrics import (
    MetricAccumulator,
    MetricsWriter,
)
from multimodaldiscussiontransformer_tpu.train.optimizer import (
    apply_updates_trainable,
    freeze_stop_gradients,
    make_optimizer,
    trainable_gnorm,
    trainable_mask,
)


class TrainState(struct.PyTreeNode):
    step: jax.Array  # microbatch counter (drives MultiSteps)
    params: Any
    opt_state: Any
    rng: jax.Array
    epoch: jax.Array = struct.field(default_factory=lambda: jnp.asarray(0, jnp.int32))


class Trainer:
    """End-to-end training driver for one task/criterion pair."""

    def __init__(
        self,
        cfg: TrainConfig,
        model: Optional[MDTModel] = None,
        criterion: Optional[Callable] = None,
        mesh=None,
        image_shape=(3, 224, 224),
    ):
        self.cfg = cfg
        self.model = model or MDTModel(
            cfg.model,
            dtype=jnp.dtype(cfg.model.dtype),
            param_dtype=jnp.dtype(cfg.model.param_dtype),
        )
        self.criterion = criterion or self._build_criterion()
        self.mesh = mesh or make_mesh(
            cfg.dp_size, cfg.tp_size, cfg.sp_size,
            num_slices=getattr(cfg, "num_slices", 1),
        )
        self.image_shape = image_shape
        # global-batch semantics: the reference's --batch-size is per GPU
        # (run_train.sh:44, 8 GPUs -> global 96); mirror that as per-dp-
        # replica so every batch is dp-divisible by construction. On a
        # multi-slice mesh dp is the joint (dcn x dp) degree.
        dp = data_parallel_size(self.mesh)
        if cfg.data.batch_size_is_per_replica:
            self.global_batch_size = cfg.data.batch_size * dp
        else:
            if cfg.data.batch_size % dp:
                raise ValueError(
                    f"global batch_size {cfg.data.batch_size} is not "
                    f"divisible by dp={dp}; use batch_size_is_per_replica "
                    "or a divisible batch size"
                )
            self.global_batch_size = cfg.data.batch_size
        self.tx = None  # built at init_state (needs params for freeze mask)
        self._train_step = None
        self._eval_step = None
        self._predict_step = None
        self.contrastive = cfg.task == "contrastive_learning"
        # multi-process (one process per TPU host): each process collates
        # only its slice of every global batch and stages it with
        # parallel.input.put_host_local — the loop logic is unchanged
        # because batch ORDER is deterministic and identical across hosts
        self.host_count = jax.process_count()
        self.host_index = jax.process_index()
        # host-side transfer cast for the (H2D-dominant) image buffer —
        # numerically identical for a bf16 model (loader.
        # cast_images_for_transfer), half the transfer bytes
        if jnp.dtype(self.model.dtype) == jnp.bfloat16:
            import ml_dtypes

            self._image_transfer_dtype = ml_dtypes.bfloat16
        else:
            self._image_transfer_dtype = None

    # -- construction -----------------------------------------------------

    def _build_criterion(self):
        from multimodaldiscussiontransformer_tpu.core import registry

        registry.populate()
        cls = CRITERIONS.get(self.cfg.criterion)
        if self.cfg.criterion == "node_cross_entropy":
            return cls(
                positive_weight=self.cfg.positive_weight,
                negative_weight=self.cfg.negative_weight,
            )
        if self.cfg.criterion == "contrastive_loss":
            return cls(
                soft_negative_weight=self.cfg.soft_negative_weight,
                adaptive_soft_negative_weight=self.cfg.adaptive_soft_negative_weight,
                multiplication_scale=self.cfg.multiplication_scale,
            )
        return cls()

    def init_state(self, sample_batch: Dict[str, np.ndarray], seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(rng)
        jb = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        params = self.model.init(init_rng, jb, deterministic=True)
        if self.cfg.model.apply_graphormer_init:
            # reference --apply-graphormer-init: model-wide normal(0.02)
            # Linear/Embedding re-init (models/mdt.py docstring)
            from multimodaldiscussiontransformer_tpu.models.mdt import (
                apply_graphormer_init_params,
            )

            init_rng, gi_rng = jax.random.split(init_rng)
            params = apply_graphormer_init_params(params, gi_rng)
        if self.host_count > 1:
            # multi-process: init runs per-process on local device 0 with
            # the same seed (identical values everywhere); device_put of
            # HOST values onto the global-mesh shardings builds the global
            # arrays — committed single-device arrays would not place
            params = jax.device_get(params)
        params = shard_params(self.mesh, params, fsdp=self.cfg.fsdp)
        self.tx = make_optimizer(
            self.cfg.optim,
            params,
            freeze_initial_encoders=self.cfg.model.freeze_initial_encoders,
            wrap_multisteps=not self.cfg.optim.scan_microbatches,
        )
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=state_rng,
            epoch=jnp.asarray(0, jnp.int32),
        )
        if self.host_count > 1:
            state = self._globalize_state(state)
        return state

    def _globalize_state(self, state: "TrainState") -> "TrainState":
        """Multi-process: every state leaf must be a GLOBAL array over the
        mesh before it can feed the pjit-ed step. Params/opt moments built
        from sharded params already are; scalars (step/epoch/optimizer
        counters) and the rng key were created eagerly on the local default
        device with identical values on every process — re-place them
        replicated over the global mesh from their host values."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        n_global = len(self.mesh.devices.reshape(-1))

        def fix(x):
            if isinstance(x, jax.Array) and len(x.sharding.device_set) == n_global:
                return x  # already global over the mesh
            return jax.device_put(np.asarray(jax.device_get(x)), rep)

        return jax.tree.map(fix, state)

    def _rep_scalar(self, v, dtype=jnp.int32):
        """A scalar usable as a state leaf: replicated over the global
        mesh on multi-process runs, a plain device scalar otherwise."""
        if self.host_count > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(
                np.asarray(v, dtype), NamedSharding(self.mesh, P())
            )
        return jnp.asarray(v, dtype)

    def load_params(self, state: TrainState, params: Any) -> TrainState:
        """Swap in externally-built params (HF import / checkpoint restore);
        re-inits optimizer state (the --reset-optimizer path, run_train.sh:63).

        Layout-adapting: params written by an unrolled model load into a
        ``scan_layers`` model and vice versa (utils/scan_params.py)."""
        from multimodaldiscussiontransformer_tpu.utils.scan_params import (
            adapt_params,
        )

        params = adapt_params(params, self.cfg.model)
        if self.host_count > 1:
            params = jax.device_get(params)  # see init_state
        params = shard_params(self.mesh, params, fsdp=self.cfg.fsdp)
        self.tx = make_optimizer(
            self.cfg.optim,
            params,
            freeze_initial_encoders=self.cfg.model.freeze_initial_encoders,
            wrap_multisteps=not self.cfg.optim.scan_microbatches,
        )
        state = state.replace(params=params, opt_state=self.tx.init(params))
        if self.host_count > 1:
            state = self._globalize_state(state)
        return state

    # -- compiled steps ----------------------------------------------------

    def _make_train_step(self):
        model, criterion, tx = self.model, self.criterion, self.tx

        fast_rng = self.cfg.fast_dropout_rng
        freeze = self.cfg.model.freeze_initial_encoders

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
            labels = trainable_mask(state.params, freeze)
            rng, step_rng = jax.random.split(state.rng)
            if fast_rng:
                # hardware-RNG dropout bits (see TrainConfig.fast_dropout_rng)
                step_rng = jax.random.wrap_key_data(
                    jnp.tile(step_rng, 2), impl="rbg"
                )

            def loss_fn(params):
                out = model.apply(
                    freeze_stop_gradients(params, labels), batch,
                    deterministic=False, rngs={"dropout": step_rng},
                )
                loss, sample_size, logs = criterion(out, batch)
                denom = jnp.maximum(sample_size.astype(jnp.float32), 1.0)
                return loss / denom, logs

            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = apply_updates_trainable(state.params, updates, labels)
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state, rng=rng
            )
            logs["gnorm"] = trainable_gnorm(grads, labels)
            return new_state, logs

        return train_step

    def _make_train_step_scan(self, return_grads: bool = False):
        """One jitted step consuming an update's k microbatches (leaves
        stacked on a leading k axis) with in-step lax.scan accumulation.

        ``return_grads=True`` adds the normalized accumulated gradient tree
        to the returned logs (``logs["grads"]``) — a test/debug hook for
        pinning the FairSeq accumulation math pre-optimizer (Adam's first
        step is ~lr*sign(grad), which amplifies fp-reassociation noise in
        near-zero gradient elements into full-lr param deltas, so post-
        optimizer param comparison cannot pin the math tightly).

        Exact FairSeq update-freq semantics (fairseq trainer): gradients of
        the SUMMED per-microbatch losses, divided once by the update's
        TOTAL sample size — where optax.MultiSteps averages grads that were
        each normalized by their own microbatch's sample size (equal only
        for uniform sample sizes). Also removes the per-microstep
        accumulator-state read/write (~7% of throughput at update_freq=3,
        tools/tpu_perf_sweep.py)."""
        model, criterion, tx = self.model, self.criterion, self.tx
        fast_rng = self.cfg.fast_dropout_rng
        freeze = self.cfg.model.freeze_initial_encoders

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, stacked) -> Tuple[TrainState, Dict[str, jax.Array]]:
            labels = trainable_mask(state.params, freeze)
            # static per compiled program; epoch-tail groups may be shorter
            # than update_freq (one extra cached program)
            k = jax.tree.leaves(stacked)[0].shape[0]
            rng, step_rng = jax.random.split(state.rng)

            def micro(carry, batch_i):
                gacc, ssz_acc, sub = carry
                sub, use = jax.random.split(sub)
                if fast_rng:
                    use = jax.random.wrap_key_data(
                        jnp.tile(use, 2), impl="rbg"
                    )

                def loss_fn(params):
                    out = model.apply(
                        freeze_stop_gradients(params, labels), batch_i,
                        deterministic=False, rngs={"dropout": use},
                    )
                    loss, sample_size, logs = criterion(out, batch_i)
                    return loss, (sample_size, logs)  # summed, unnormalized

                (_, (ssz, logs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                # frozen leaves pass through untouched (no zero-add traffic)
                gacc = jax.tree.map(
                    lambda a, g, l: a if l == "freeze" else a + g,
                    gacc, grads, labels,
                )
                return (gacc, ssz_acc + ssz.astype(jnp.float32), sub), logs

            gacc0 = jax.tree.map(jnp.zeros_like, state.params)
            (gacc, total_ssz, _), logs_stack = jax.lax.scan(
                micro, (gacc0, jnp.asarray(0.0, jnp.float32), step_rng),
                stacked,
            )
            denom = jnp.maximum(total_ssz, 1.0)
            grads = jax.tree.map(
                lambda g, l: g if l == "freeze" else g / denom.astype(g.dtype),
                gacc, labels,
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = apply_updates_trainable(state.params, updates, labels)
            new_state = state.replace(
                step=state.step + k, params=params, opt_state=opt_state,
                rng=rng,
            )
            logs = jax.tree.map(lambda x: jnp.sum(x, axis=0), logs_stack)
            if return_grads:
                logs["grads"] = grads
            logs["gnorm"] = trainable_gnorm(grads, labels)
            return new_state, logs

        return train_step

    def _make_eval_step(self):
        model, criterion = self.model, self.criterion

        @jax.jit
        def eval_step(params, batch) -> Dict[str, jax.Array]:
            out = model.apply(params, batch, deterministic=True)
            _, _, logs = criterion(out, batch)
            return logs

        return eval_step

    # -- loops -------------------------------------------------------------

    def train_batches(self, dataset: DiscussionDataset, epoch: int) -> Iterator:
        return self._batches(
            dataset, dataset.train_idx,
            epoch=epoch, shuffle=self.cfg.task_cfg.train_epoch_shuffle,
        )

    def eval_batches(self, dataset: DiscussionDataset, split: str = "valid") -> Iterator:
        idx = dataset.valid_idx if split == "valid" else dataset.test_idx
        return self._batches(
            dataset, idx, epoch=1, shuffle=False,
            drop_last=False, pad_tail_to_batch=True,
        )

    def _batches(self, dataset, idx, **kw) -> Iterator:
        """Batch production: the in-process iterator by default, Grain
        worker PROCESSES when ``data.num_workers > 0`` (the reference's
        ``--num-workers 8`` torch DataLoader surface, run_train.sh:31) —
        same order/shape contract either way (tests/test_grain_loader.py)."""
        common = dict(
            contrastive=self.contrastive,
            shard_multiple=data_parallel_size(self.mesh),
            image_shape=self.image_shape,
            batch_size=self.global_batch_size,
            **kw,
        )
        if self.host_count > 1:
            # multi-process: this host collates only its contiguous slice
            # of every global batch (parallel/input.py contract); nsamples
            # carries the GLOBAL real count for put_host_local.
            # grain_batches divides the capacity ladders by host_count
            # itself (host_data_config: single-entry, so every host picks
            # the same static shape with no communication) — the assembled
            # global shapes then equal a single-process collation at the
            # ladder max (tests/test_host_sharded_input.py pins this)
            from multimodaldiscussiontransformer_tpu.data.grain_loader import (
                grain_batches,
            )

            return grain_batches(
                dataset, idx, self.cfg.data, self.cfg.task_cfg,
                worker_count=self.cfg.data.num_workers,
                host_index=self.host_index, host_count=self.host_count,
                global_nsamples=True, **common,
            )
        if self.cfg.data.num_workers > 0:
            from multimodaldiscussiontransformer_tpu.data.grain_loader import (
                grain_batches,
            )

            return grain_batches(
                dataset, idx, self.cfg.data, self.cfg.task_cfg,
                worker_count=self.cfg.data.num_workers, **common,
            )
        return iterate_batches(
            dataset, idx, self.cfg.data, self.cfg.task_cfg, **common,
        )

    def _put_batch(self, host: Dict[str, Any]):
        """Host batch -> globally-sharded device batch (single- or
        multi-process placement)."""
        if self.host_count > 1:
            from multimodaldiscussiontransformer_tpu.parallel.input import (
                put_host_local,
            )

            return put_host_local(
                self.mesh, host, self.host_index, self.host_count
            )
        from multimodaldiscussiontransformer_tpu.parallel.mesh import (
            shard_batch,
        )

        return shard_batch(self.mesh, host)

    def _put_stacked(self, host: Dict[str, Any]):
        """(k, ...)-stacked group -> device (scan accumulation path)."""
        if self.host_count > 1:
            from multimodaldiscussiontransformer_tpu.parallel.input import (
                put_host_local_stacked,
            )

            return put_host_local_stacked(
                self.mesh, host, self.host_index, self.host_count
            )
        from multimodaldiscussiontransformer_tpu.parallel.mesh import (
            shard_stacked_batch,
        )

        return shard_stacked_batch(self.mesh, host)

    def evaluate(self, state: TrainState, dataset: DiscussionDataset, split: str = "valid") -> Dict[str, float]:
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        acc = MetricAccumulator(self.criterion.reduce_metrics)
        from multimodaldiscussiontransformer_tpu.data.loader import (
            prefetch_to_device,
        )

        with self.mesh:
            for jb in prefetch_to_device(
                self.eval_batches(dataset, split), self.mesh,
                image_dtype=self._image_transfer_dtype,
                put_fn=self._put_batch,
            ):
                acc.update(self._eval_step(state.params, jb))
        return acc.reduce()

    def _make_predict_step(self):
        model = self.model
        from jax.sharding import NamedSharding, PartitionSpec as P

        from multimodaldiscussiontransformer_tpu.parallel.mesh import (
            data_axes,
        )

        # pin the logits to the batch (node-capacity) sharding so each host
        # can read exactly its own contiguous rows back from the global
        # array (multi-host predict; parallel/input.py layout contract)
        out_sharding = NamedSharding(self.mesh, P(data_axes(self.mesh), None))

        @jax.jit
        def predict_step(params, batch) -> jax.Array:
            out = model.apply(params, batch, deterministic=True)
            return jax.lax.with_sharding_constraint(out.logits, out_sharding)

        return predict_step

    def predict(
        self, state: TrainState, dataset: DiscussionDataset, split: str = "valid"
    ) -> Dict[str, np.ndarray]:
        """Per-node prediction rows for every REAL node of ``split``.

        The reference surfaces predictions two ways: the comment-only
        baseline writes a ``predictions.parquet`` after evaluation
        (Comment-Only Experiments/src/text_bert.py:68-80), and the full
        model computes a logit for EVERY node on each forward (``out_all``,
        multi_modal_discussion_transformer.py:263-276) with the loss merely
        masking to labelled nodes (hatespeech_loss.py:93-95). This export
        covers all real nodes; ``labeled`` marks the loss-bearing rows.

        Returns equal-length 1-D numpy columns: ``graph_idx`` (dataset
        index), ``node`` (position within the graph), ``logit_<k>`` /
        ``prob_<k>`` per class, ``pred`` (argmax), ``label`` (-1 =
        unlabelled) and ``labeled``. Write with ``write_predictions``.

        Multi-process: a COLLECTIVE call (every rank must enter). Each host
        assembles the rows for its contiguous slice of every global batch
        from the logits' addressable shards, then the ragged per-host row
        sets are allgathered so every rank returns the identical full
        columns (rank 0 writes; the reference's eval artifact surface has
        no single-host restriction, Comment-Only text_bert.py:68-80)."""
        if self.contrastive:
            raise ValueError(
                "predict() exports per-node rows; the contrastive task has "
                "per-graph targets — use evaluate() for its metrics"
            )
        if self._predict_step is None:
            self._predict_step = self._make_predict_step()
        from multimodaldiscussiontransformer_tpu.data.loader import (
            cast_images_for_transfer,
        )

        parts: Dict[str, list] = {}
        num_classes: Optional[int] = None
        with self.mesh:
            for b in self.eval_batches(dataset, split):
                host = b.asdict() if hasattr(b, "asdict") else b
                jb = self._put_batch(
                    cast_images_for_transfer(host, self._image_transfer_dtype)
                )
                garr = self._predict_step(state.params, jb)
                if self.host_count > 1:
                    # this host's contiguous node-capacity rows of the
                    # global (C_global, K) logits, in global row order —
                    # they line up 1:1 with the LOCAL ``host`` batch
                    # (put_host_local places host h at rows
                    # [h*cap_local, (h+1)*cap_local)). DEDUPE by row range:
                    # with tp/sp in the mesh the logits (P(data_axes, None))
                    # replicate over those axes, so each row range appears
                    # once per replicating device — concatenating raw
                    # addressable_shards would duplicate blocks and
                    # silently misalign ``slots`` (ADVICE r4 medium).
                    by_start = {}
                    for s in garr.addressable_shards:
                        by_start.setdefault(s.index[0].start or 0, s)
                    logits = np.concatenate(
                        [
                            np.asarray(by_start[k].data)
                            for k in sorted(by_start)
                        ],
                        axis=0,
                    ).astype(np.float32)
                else:
                    logits = np.asarray(
                        jax.device_get(garr), dtype=np.float32
                    )  # (C, K)
                if num_classes is None:
                    num_classes = logits.shape[1]
                    parts = {
                        key: []
                        for key in ["graph_idx", "node", "label", "labeled", "pred"]
                        + [f"logit_{k}" for k in range(num_classes)]
                        + [f"prob_{k}" for k in range(num_classes)]
                    }
                slots = np.nonzero(host["node_mask"].astype(bool))[0]
                label_full = np.full(logits.shape[0], -1, dtype=np.int64)
                lmask = host["y_slot_mask"].astype(bool)
                label_full[host["y_node"][lmask]] = host["y"][lmask]
                lg = logits[slots]
                z = lg - lg.max(axis=1, keepdims=True)
                prob = np.exp(z)
                prob /= prob.sum(axis=1, keepdims=True)
                parts["graph_idx"].append(host["idx"][host["node_graph"][slots]])
                parts["node"].append(host["node_pos"][slots])
                parts["label"].append(label_full[slots])
                parts["labeled"].append(label_full[slots] >= 0)
                parts["pred"].append(lg.argmax(axis=1))
                for k in range(num_classes):
                    parts[f"logit_{k}"].append(lg[:, k])
                    parts[f"prob_{k}"].append(prob[:, k])
        if num_classes is None:  # empty split
            return {
                key: np.asarray([])
                for key in ("graph_idx", "node", "label", "labeled", "pred")
            }
        cols = {key: np.concatenate(v) for key, v in parts.items()}
        if self.host_count > 1:
            cols = _allgather_columns(cols)
        return cols

    def fit(
        self,
        dataset: DiscussionDataset,
        state: Optional[TrainState] = None,
        max_epoch: Optional[int] = None,
        max_updates: Optional[int] = None,
        writer: Optional[MetricsWriter] = None,
        checkpointer=None,
        log_fn: Callable[[str], None] = print,
        should_stop: Optional[Callable[[], bool]] = None,
    ) -> TrainState:
        cfg = self.cfg
        max_epoch = max_epoch if max_epoch is not None else cfg.max_epoch

        if state is None:
            try:
                first = next(iter(self.train_batches(dataset, epoch=1)))
            except StopIteration:
                raise ValueError(
                    f"training split yields ZERO batches: "
                    f"{len(dataset.train_idx)} train items < global batch "
                    f"{cfg.data.batch_size * max(cfg.dp_size, 1)} with "
                    f"drop_last — shrink the batch or grow the dataset"
                ) from None
            state = self.init_state(first.asdict())
        scan_mode = (
            self.cfg.optim.scan_microbatches and self.cfg.optim.update_freq > 1
        )
        if self._train_step is None:
            self._train_step = (
                self._make_train_step_scan() if scan_mode
                else self._make_train_step()
            )

        import time

        from multimodaldiscussiontransformer_tpu.train.optimizer import (
            polynomial_decay_schedule,
        )

        acc = MetricAccumulator(self.criterion.reduce_metrics)
        if writer is None:
            # multi-process: every rank runs the loop (metrics are
            # replicated global values) but only rank 0 writes
            if self.host_index == 0:
                writer = MetricsWriter(cfg.save_dir)
            else:
                from multimodaldiscussiontransformer_tpu.train.metrics import (
                    NullMetricsWriter,
                )

                writer = NullMetricsWriter()
        # num_updates counts OPTIMIZER updates (FairSeq semantics): one
        # update = ``update_freq`` microbatches. state.step counts
        # microbatches (it drives MultiSteps).
        k = max(cfg.optim.update_freq, 1)
        micro_steps = int(state.step)
        num_updates = micro_steps // k
        last_logged = num_updates
        last_validated = num_updates
        last_saved = num_updates
        best_metric = None
        lr_fn = polynomial_decay_schedule(
            cfg.optim.lr, cfg.optim.end_learning_rate,
            cfg.optim.warmup_updates, cfg.optim.total_num_update,
            cfg.optim.power,
        )
        window_t0 = time.perf_counter()
        window_graphs = 0

        # --profile-trace: capture a device trace of a few steady-state
        # updates (starts after profile_trace_start so compile stays out)
        prof = {"active": False, "done": cfg.profile_trace_dir is None,
                "start": 0}

        def maybe_profile(num_updates, logs):
            if prof["done"]:
                return
            if not prof["active"]:
                if num_updates >= cfg.profile_trace_start:
                    import os

                    os.makedirs(cfg.profile_trace_dir, exist_ok=True)
                    jax.profiler.start_trace(cfg.profile_trace_dir)
                    prof["active"] = True
                    prof["start"] = num_updates
            elif num_updates >= prof["start"] + cfg.profile_trace_steps:
                finish_profile(logs)

        def finish_profile(logs=None):
            if not prof["active"]:
                prof["done"] = True
                return
            if logs is not None:  # fence: traced work must have executed
                jax.device_get(logs["loss"])
            jax.profiler.stop_trace()
            prof["active"], prof["done"] = False, True
            log_fn(f"profile trace written to {cfg.profile_trace_dir}")

        from multimodaldiscussiontransformer_tpu.data.loader import (
            prefetch_to_device,
        )

        start_epoch = int(jax.device_get(state.epoch)) + 1
        # mid-epoch resume: with deterministic per-epoch shuffling, skipping
        # the microbatches already consumed this epoch replays nothing and
        # keeps the lr schedule aligned with a non-preempted run
        bpe = (
            len(dataset.train_idx) // max(self.global_batch_size, 1)
            if cfg.data.drop_last
            else 0
        )
        # In scan mode a ragged epoch tail is padded to a full group of k
        # (pad_tail below), and the step counts all k pad-or-real
        # microbatches — so an epoch consumes ceil(bpe/k)*k micro_steps,
        # not bpe. Resume math must use the same per-epoch stride or a
        # completed-epochs checkpoint looks mid-epoch and skips fresh data.
        micro_per_epoch = (
            ((bpe + k - 1) // k) * k if scan_mode and bpe > 0 else bpe
        )
        skip_batches = 0
        if micro_per_epoch > 0:
            consumed = micro_steps - (start_epoch - 1) * micro_per_epoch
            if 0 < consumed < micro_per_epoch:
                skip_batches = consumed
        from multimodaldiscussiontransformer_tpu.data.loader import (
            ThreadedPrefetcher,
            stack_microbatches,
        )

        from multimodaldiscussiontransformer_tpu.data.loader import (
            cast_images_for_transfer,
        )

        def counted(groups):
            # real (non-pad) graphs per group, computed host-side before
            # transfer: pad graphs carry idx == -1 (collate / all_pad_like).
            # Multi-process: idx counts only this host's slice; nsamples
            # already carries the per-microbatch GLOBAL real count
            # (grain_loader global_nsamples contract)
            for h in groups:
                if self.host_count > 1:
                    yield h, int(np.sum(h["nsamples"]))
                else:
                    yield h, int((h["idx"] >= 0).sum())

        def epoch_stream(epoch):
            if scan_mode:
                # pad_tail: a ragged epoch-tail group is grown to k with
                # all-pad microbatches so the scan step keeps ONE compiled
                # shape per bucket signature (the update is bit-identical;
                # see stack_microbatches)
                return ThreadedPrefetcher(
                    counted(
                        stack_microbatches(
                            self.train_batches(dataset, epoch), k,
                            pad_tail=True,
                        )
                    ),
                    lambda item: (
                        self._put_stacked(
                            cast_images_for_transfer(
                                item[0], self._image_transfer_dtype
                            )
                        ),
                        item[1],
                    ),
                )
            return prefetch_to_device(
                self.train_batches(dataset, epoch), self.mesh,
                image_dtype=self._image_transfer_dtype,
                put_fn=self._put_batch,
            )

        with self.mesh:
            for epoch in range(start_epoch, max_epoch + 1):
                batch_index = -1
                for jb in epoch_stream(epoch):
                    batch_index += 1
                    if scan_mode:
                        jb, real_graphs = jb
                        # resume skipping in whole accumulation groups
                        if (
                            epoch == start_epoch
                            and batch_index < skip_batches // k
                        ):
                            continue
                        state, logs = self._train_step(state, jb)
                        acc.update(logs)
                        micro_steps += int(jb["idx"].shape[0])
                        # every scan-step invocation applies exactly ONE
                        # optimizer update — a short epoch-tail group still
                        # counts (FairSeq counts the tail as a full update),
                        # so count invocations, not micro_steps // k
                        num_updates += 1
                        window_graphs += real_graphs
                    else:
                        if epoch == start_epoch and batch_index < skip_batches:
                            continue
                        state, logs = self._train_step(state, jb)
                        acc.update(logs)
                        micro_steps += 1
                        num_updates = micro_steps // k
                        window_graphs += int(jb["idx"].shape[0])
                    maybe_profile(num_updates, logs)
                    if num_updates - last_logged >= cfg.log_interval:
                        last_logged = num_updates
                        m = acc.reduce()
                        acc.reset()
                        dt = time.perf_counter() - window_t0
                        m["lr"] = float(lr_fn(max(num_updates - 1, 0)))
                        m["ups"] = round(cfg.log_interval / dt, 3)
                        m["discussions_per_sec"] = round(window_graphs / dt, 2)
                        window_t0 = time.perf_counter()
                        window_graphs = 0
                        writer.write("train", num_updates, m)
                        log_fn(f"epoch {epoch} update {num_updates}: {m}")
                    if (
                        cfg.validate_interval_updates
                        and num_updates - last_validated >= cfg.validate_interval_updates
                        and len(dataset.valid_idx) > 0
                    ):
                        last_validated = num_updates
                        vm = self.evaluate(state, dataset, "valid")
                        writer.write("valid", num_updates, vm)
                        log_fn(f"valid @ {num_updates}: {vm}")
                        key = "f1" if "f1" in vm else "loss"
                        better = (
                            best_metric is None
                            or (key == "f1" and vm[key] > best_metric)
                            or (key == "loss" and vm[key] < best_metric)
                        )
                        if better:
                            best_metric = vm[key]
                            if checkpointer is not None:
                                checkpointer.save(state, num_updates, best=True)
                    if (
                        checkpointer is not None
                        and cfg.save_interval_updates
                        and num_updates - last_saved
                        >= cfg.save_interval_updates
                    ):
                        last_saved = num_updates
                        checkpointer.save(state, num_updates)
                    if max_updates is not None and num_updates >= max_updates:
                        finish_profile(logs)
                        if checkpointer is not None:
                            checkpointer.save(state, num_updates)
                        return state
                    # preemption (SIGTERM on TPU VMs, ~30s grace): persist
                    # a resumable checkpoint at the update boundary and
                    # return — auto-resume (launch.py restore-from-latest +
                    # the mid-epoch skip above) continues the run exactly
                    if should_stop is not None and should_stop():
                        finish_profile(logs)
                        log_fn(
                            f"stop requested at update {num_updates}: "
                            "checkpointing and exiting"
                        )
                        if checkpointer is not None:
                            checkpointer.save(state, num_updates)
                            checkpointer.wait()
                        return state
                state = state.replace(epoch=self._rep_scalar(epoch))
                # FairSeq --save-interval semantics: checkpoint every Nth
                # epoch end (default 1), always at the final epoch. Saves
                # are Orbax-async, but the D2H fence still stalls the loop
                # on slow links — raising the interval bounds that cost.
                if checkpointer is not None and (
                    epoch % max(cfg.save_interval, 1) == 0
                    or epoch == max_epoch
                ):
                    checkpointer.save(state, num_updates)
            finish_profile()
        return state


def _allgather_columns(cols: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather ragged per-host prediction rows so every rank holds the full
    table: pad each 1-D column to the global max row count, allgather over
    processes, trim per the true counts, concatenate in host order."""
    from jax.experimental import multihost_utils as mhu

    n_local = len(next(iter(cols.values())))
    counts = np.asarray(
        mhu.process_allgather(np.asarray(n_local, np.int64))
    ).reshape(-1)
    n_max = int(counts.max())
    out = {}
    for key in sorted(cols):  # identical traversal order on every rank
        col = np.asarray(cols[key])
        pad = np.zeros((n_max - len(col),), col.dtype)
        stacked = np.asarray(
            mhu.process_allgather(np.concatenate([col, pad]))
        )  # (H, n_max)
        out[key] = np.concatenate(
            [stacked[h, : counts[h]] for h in range(len(counts))]
        )
    return out


def write_predictions(path: str, columns: Dict[str, np.ndarray]) -> str:
    """Persist ``Trainer.predict`` columns as a table.

    The reference's prediction artifact is a parquet file
    (Comment-Only Experiments/src/text_bert.py:68-80 writes
    ``predictions.parquet``); ``.csv`` paths write CSV, and a missing
    parquet engine degrades to CSV next to the requested path instead of
    failing the run. Returns the path actually written."""
    import sys

    import pandas as pd

    df = pd.DataFrame(columns)
    if path.endswith(".csv"):
        df.to_csv(path, index=False)
        return path
    try:
        df.to_parquet(path)
        return path
    except (ImportError, ValueError) as e:
        alt = os.path.splitext(path)[0] + ".csv"
        df.to_csv(alt, index=False)
        print(
            f"warning: parquet engine unavailable ({e!r}); wrote {alt}",
            file=sys.stderr,
        )
        return alt
