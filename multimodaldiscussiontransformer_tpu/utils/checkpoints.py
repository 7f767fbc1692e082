"""Checkpointing: Orbax persistence + checkpoint transforms.

Replaces the reference's FairSeq checkpoint surface (SURVEY.md §5):
``--save-dir`` / ``--restore-file`` / ``--reset-optimizer``
(run_train.sh:57-63), the state-dict surgery hooks
(multi_modal_discussion_transformer.py:282-287 LM-head strip;
multihead_attention.py:219-248 legacy qkv merge), and the
contrastive -> node-prediction classifier reset *intent*
(node_prediction.py:44-54, whose reference implementation is a no-op —
SURVEY.md §2.1 quirk).

Design: async Orbax checkpointing with retention, auto-resume-from-latest
(the preemption-recovery story the reference lacks — its failure handling is
a SLURM wall-clock kill + manual restart, run_train.sh:3,58).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def reset_classifier_head(params: Any, rng: jax.Array) -> Any:
    """Fresh ``node_classifier`` Dense init (LeCun-normal kernel, zero bias)
    — the intended transfer-time head reset (node_prediction.py:47-54)."""
    import flax
    import jax.numpy as jnp

    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    # functional: rebuild the dict spine so the input tree is untouched
    # (leaves are shared except the reset classifier)
    params = jax.tree_util.tree_map_with_path(lambda _, x: x, params)

    def visit(tree):
        for k, v in tree.items():
            if k == "node_classifier" and isinstance(v, dict) and "kernel" in v:
                kernel = v["kernel"]
                init = flax.linen.initializers.lecun_normal()
                v["kernel"] = init(rng, kernel.shape, kernel.dtype)
                if "bias" in v:
                    v["bias"] = jnp.zeros_like(v["bias"])
            elif isinstance(v, dict):
                visit(v)

    visit(params["params"] if "params" in params else params)
    return params


class Checkpointer:
    """Orbax-backed save/restore with keep-last-K retention and
    best-checkpoint tracking (HF ``save_total_limit=3`` /
    ``load_best_model_at_end`` analogue, Comment-Only text_bert.py:42-46).

    Async saves are guarded by a WATCHDOG (``async_timeout_sec``): if an
    async save's background commit has not finished within the timeout
    (observed on CPU-starved multi-process hosts, where the cross-process
    finalize barriers can wedge — tests/test_two_process_checkpoint.py),
    the checkpointer warns, abandons the wedged async machinery, and
    downgrades itself to synchronous saves for the rest of the run — the
    deadlock is contained by code, and no later save can silently queue
    behind a stuck barrier."""

    def __init__(self, save_dir: str, keep: int = 3,
                 async_save: bool = True,
                 async_timeout_sec: float = 600.0):
        import orbax.checkpoint as ocp

        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ocp = ocp
        self._keep = keep
        self._async = bool(async_save)
        self._async_timeout = float(async_timeout_sec)
        # baseline of executor threads that exist BEFORE any orbax manager
        # is built: _downgrade_to_sync only unhooks threads created after
        # this point (orbax's save pools), never unrelated components'
        # (ADVICE r4: clearing the whole registry could drop other
        # executors' pending work at shutdown)
        try:
            import concurrent.futures.thread as _cft

            self._tq_baseline = set(_cft._threads_queues.keys())
        except Exception:  # private CPython detail (3.8-3.13); best-effort
            self._tq_baseline = set()
        self._build_managers(self._async)

    def _build_managers(self, async_save: bool) -> None:
        ocp = self._ocp
        options = ocp.CheckpointManagerOptions(
            max_to_keep=self._keep, create=True,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(self.save_dir, options=options)
        # best checkpoints live in their own manager so rolling retention of
        # the periodic saves can never garbage-collect the best step
        self._best_dir = os.path.join(self.save_dir, "best")
        self._best_manager = ocp.CheckpointManager(
            self._best_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def _timed(self, fn, what: str) -> bool:
        """Run ``fn`` on a helper thread, bounded by the watchdog timeout.
        Returns True on completion; on timeout the (possibly wedged) thread
        is abandoned and False is returned. Exceptions propagate."""
        import threading

        box = {}

        def run():
            try:
                fn()
                box["ok"] = True
            except BaseException as e:  # surfaced on the caller thread
                box["err"] = e

        t = threading.Thread(target=run, daemon=True, name=f"ckpt-{what}")
        t.start()
        t.join(self._async_timeout)
        if "err" in box:
            raise box["err"]
        if t.is_alive():
            import sys as _sys

            print(
                f"WARNING: async checkpoint {what} did not finish within "
                f"{self._async_timeout:.0f}s — abandoning the wedged async "
                "machinery and downgrading to synchronous saves for the "
                "rest of the run",
                file=_sys.stderr, flush=True,
            )
            return False
        return True

    def _downgrade_to_sync(self) -> None:
        """Abandon the wedged async managers (closing them would block on
        the same stuck barrier) and rebuild synchronous ones. Unhook the
        MANAGERS' executor threads from the interpreter's atexit join so a
        stuck commit thread cannot hang process shutdown — scoped to
        threads created after this Checkpointer was built (orbax's pools),
        so unrelated executors keep their shutdown join.

        ``_threads_queues`` is a private CPython internal (stable across
        3.8-3.13, checked at import via the try/except); if it moves, the
        downgrade still works and only the shutdown-join unhook is lost
        (worst case: interpreter exit blocks on the wedged thread)."""
        self._async = False
        try:
            import concurrent.futures.thread as _cft

            for t in list(_cft._threads_queues.keys()):
                if t not in self._tq_baseline:
                    _cft._threads_queues.pop(t, None)
        except Exception:
            pass
        self._build_managers(False)

    def _guarded_wait(self) -> bool:
        """wait_until_finished under the watchdog; downgrades on timeout.
        Returns False iff the wait timed out (that save may be lost)."""
        if not self._async:
            self.manager.wait_until_finished()
            self._best_manager.wait_until_finished()
            return True
        ok = self._timed(
            lambda: (
                self.manager.wait_until_finished(),
                self._best_manager.wait_until_finished(),
            ),
            "wait",
        )
        if not ok:
            self._downgrade_to_sync()
        return ok

    def save(self, state, step: int, best: bool = False) -> None:
        # Multi-process (one process per TPU host, the reference's DDP
        # world-size surface, run_train.sh:52,57-58): the state's leaves are
        # GLOBAL jax.Arrays whose shards span hosts (fsdp/tp), so host
        # materialization is impossible — hand Orbax the global arrays and
        # every process writes exactly its addressable shards. Every rank
        # must call save (Orbax coordinates via barriers). Single-process
        # keeps the host-numpy path (one D2H fence, tunnel-friendly).
        if jax.process_count() > 1:
            host = state
        else:
            host = _host_state(state)

        def do_save(manager, force=False):
            manager.save(
                step, args=self._ocp.args.StandardSave(host), force=force
            )

        if self._async:
            # the save call itself waits for any in-flight async commit, so
            # a wedged background barrier surfaces HERE — watchdog it
            ok = self._timed(lambda: do_save(self.manager), "save")
            if not ok:
                self._downgrade_to_sync()
                # the wedged attempt may have partially created the step
                # dir; force overwrites it synchronously. The abandoned
                # thread is not dead — if it later unwedges it could write
                # into the same dir, so the step is recorded as suspect
                # (restore-side operators can verify or prefer an earlier
                # step; ADVICE r4)
                self._mark_suspect(step)
                do_save(self.manager, force=True)
        else:
            do_save(self.manager)
        if best:
            if self._async:
                ok = self._timed(
                    lambda: do_save(self._best_manager), "save-best"
                )
                if not ok:
                    self._downgrade_to_sync()
                    self._mark_suspect(step)
                    do_save(self._best_manager, force=True)
            else:
                do_save(self._best_manager)
            if jax.process_index() == 0:
                with open(
                    os.path.join(self.save_dir, "best_step.txt"), "w"
                ) as f:
                    f.write(str(step))

    def _mark_suspect(self, step: int) -> None:
        """Append ``step`` to save_dir/suspect_steps.txt: its directory was
        force-rewritten after a watchdog timeout while the abandoned async
        thread might still hold a handle to it."""
        try:
            if jax.process_index() == 0:
                with open(
                    os.path.join(self.save_dir, "suspect_steps.txt"), "a"
                ) as f:
                    f.write(f"{step}\n")
        except OSError:
            pass

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def best_step(self) -> Optional[int]:
        best = self._best_manager.latest_step()
        return best if best is not None else self.latest_step()

    def restore(self, state, step: Optional[int] = None, best: bool = False):
        """Restore into the structure of ``state``; auto-latest by default,
        ``best=True`` reads from the best-checkpoint store."""
        manager = self._best_manager if best else self.manager
        step = step if step is not None else manager.latest_step()
        if step is None:
            if best:  # fall back to the rolling store
                return self.restore(state, None, False)
            return None
        if jax.process_count() > 1:
            # restore as GLOBAL arrays re-placed by the live state's
            # shardings: each host reads only its shards, and the result
            # can feed the pjit-ed step directly
            target = _abstract_state(state)
        else:
            target = jax.tree.map(np.asarray, _host_state(state))
        try:
            return manager.restore(
                step, args=self._ocp.args.StandardRestore(target)
            )
        except ValueError:
            # structure drift (e.g. checkpoints from before TrainState grew
            # a field): fall back to a structure-free restore; the caller's
            # field accessors handle missing keys
            return manager.restore(step)

    def restore_raw(self, step: Optional[int] = None, best: bool = False):
        """Structure-free restore (dict of arrays) for serving."""
        manager = self._best_manager if best else self.manager
        step = step if step is not None else manager.latest_step()
        if step is None and best:
            manager = self.manager
            step = manager.latest_step()
        if step is None:
            return None
        return manager.restore(step)

    def wait(self) -> None:
        self._guarded_wait()

    def close(self) -> None:
        if self._async:
            ok = self._timed(
                lambda: (self.manager.close(), self._best_manager.close()),
                "close",
            )
            if not ok:
                self._downgrade_to_sync()  # abandons the wedged managers
                self.manager.close()
                self._best_manager.close()
        else:
            self.manager.close()
            self._best_manager.close()


def average_checkpoints(
    save_dir: str,
    steps: Optional[list] = None,
    last_k: Optional[int] = None,
) -> Any:
    """Average the ``params`` of several checkpoints in one save dir —
    the FairSeq ``scripts/average_checkpoints.py`` tool re-provided (part
    of the consumed FairSeq runtime surface, SURVEY.md §2.3; commonly run
    over the last K epoch checkpoints before evaluation).

    ``steps`` selects explicit steps; ``last_k`` takes the newest K;
    default averages everything retained. Float leaves are averaged in
    float64 and cast back to their original dtype; non-float leaves (none
    in mDT params, but e.g. integer buffers in custom heads) are taken
    from the newest checkpoint. Returns the averaged params pytree.
    """
    ckpt = Checkpointer(save_dir)
    try:
        avail = sorted(ckpt.manager.all_steps())
        if not avail:
            raise FileNotFoundError(f"no checkpoints under {save_dir}")
        if steps is not None:
            missing = [s for s in steps if s not in avail]
            if missing:
                raise ValueError(
                    f"steps {missing} not in {save_dir} (available: {avail})"
                )
            chosen = sorted(int(s) for s in steps)
        elif last_k is not None:
            if int(last_k) <= 0:
                raise ValueError(f"last_k must be positive, got {last_k}")
            chosen = avail[-int(last_k):]
        else:
            chosen = avail

        def params_of(restored):
            if isinstance(restored, dict) and "params" in restored:
                return restored["params"]
            return getattr(restored, "params", restored)

        acc = None
        for s in chosen:
            p = params_of(ckpt.restore_raw(step=s))
            as64 = jax.tree.map(
                lambda x: (
                    np.asarray(x, np.float64)
                    if np.issubdtype(np.asarray(x).dtype, np.floating)
                    else np.asarray(x)
                ),
                p,
            )
            acc = (
                as64
                if acc is None
                else jax.tree.map(
                    lambda a, b: a + b if np.issubdtype(a.dtype, np.floating) else b,
                    acc,
                    as64,
                )
            )
        newest = params_of(ckpt.restore_raw(step=chosen[-1]))
        n = float(len(chosen))
        return jax.tree.map(
            lambda a, ref: (
                (a / n).astype(np.asarray(ref).dtype)
                if np.issubdtype(np.asarray(ref).dtype, np.floating)
                else np.asarray(ref)
            ),
            acc,
            newest,
        )
    finally:
        ckpt.close()


def save_params(save_dir: str, params: Any, step: int = 0) -> None:
    """Write a params-only checkpoint loadable by ``restore_raw`` /
    ``DiscussionScorer.from_checkpoint`` / ``--restore-file`` +
    ``--reset-optimizer`` (the fine-tune-from-params path)."""
    ckpt = Checkpointer(save_dir)
    try:
        host = _host_state({"params": params})
        ckpt.manager.save(step, args=ckpt._ocp.args.StandardSave(host))
        ckpt.wait()
    finally:
        ckpt.close()


def _host_state(state) -> Any:
    """Materialize a device pytree on host for serialization."""
    return jax.tree.map(lambda x: np.asarray(x), jax.device_get(state))


def _abstract_state(state) -> Any:
    """Multi-process restore target: each ``jax.Array`` leaf restores as a
    GLOBAL array placed by its current sharding (Orbax reads only the
    host's shards); non-device leaves restore as host numpy."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return np.asarray(x)

    return jax.tree.map(leaf, state)


def _get(restored, key):
    """Field access across restore container types (TrainState / dict)."""
    return restored[key] if isinstance(restored, dict) else getattr(restored, key)


def restore_params_into_state(trainer, state, restored, reset_optimizer: bool):
    """Apply a restored checkpoint: either full state (resume) or params-only
    with fresh optimizer (the --reset-optimizer fine-tune path,
    run_train.sh:63)."""
    if restored is None:
        return state
    if reset_optimizer:
        return trainer.load_params(state, _get(restored, "params"))
    import jax.numpy as jnp

    state = state.replace(
        step=jnp.asarray(_get(restored, "step"), jnp.int32),
        params=_get(restored, "params"),
        opt_state=_get(restored, "opt_state"),
        rng=jnp.asarray(_get(restored, "rng")),
    )
    try:  # older checkpoints may predate the epoch field
        state = state.replace(
            epoch=jnp.asarray(_get(restored, "epoch"), jnp.int32)
        )
    except (KeyError, AttributeError, TypeError):
        pass
    return state
