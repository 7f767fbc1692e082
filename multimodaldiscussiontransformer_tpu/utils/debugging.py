"""Numerical-safety tooling (SURVEY.md §5 "race detection / sanitizers").

The reference has no sanitizers; under jit, silent NaN/Inf propagation is the
TPU-world equivalent hazard. This module provides:

- ``find_nonfinite(tree)``: host-side sweep of any pytree (params, grads,
  activations) returning the paths of non-finite leaves;
- ``checkify_step(fn)``: wrap a jitted step with ``jax.experimental.checkify``
  float checks so NaN/Inf raise with a location instead of corrupting state;
- ``nan_guard(state, logs)``: cheap per-step loss/grad-norm finiteness gate
  for the trainer loop (skip-and-report semantics).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import numpy as np


def find_nonfinite(tree: Any) -> List[str]:
    """Paths of leaves containing NaN/Inf (host sweep — use sparingly)."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            parts = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
            bad.append("/".join(parts))
    return bad


def checkify_step(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap ``fn`` with checkify float-error tracking.

    Returns a callable with the same signature; raises
    ``jax.experimental.checkify.JaxRuntimeError`` (with the failing op's
    source location) if any NaN/Inf arises inside.
    """
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        checked = jax.jit(checked)

    def run(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return run


def nan_guard(logs: Dict[str, Any]) -> Tuple[bool, List[str]]:
    """Cheap per-step gate: returns (ok, offending keys) over scalar logs."""
    bad = [
        k
        for k, v in logs.items()
        if not np.isfinite(np.asarray(v, dtype=np.float64)).all()
    ]
    return (not bad, bad)
