"""Persistent XLA compilation cache.

TPU compiles of the full model take minutes (especially through tunneled
single-chip setups); enabling jax's persistent compilation cache makes every
re-run of an already-seen program shape start instantly. Called by the
training CLI and bench entry points; safe to call multiple times."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    try:
        import jax

        # Only worth it (and only safe) off-CPU: the cache exists to hide
        # the tunnel's minutes-long TPU compiles, while CPU AOT entries are
        # pinned to the exact host machine features — reloading them on a
        # different box trips "machine type doesn't match" XLA errors.
        if jax.default_backend() == "cpu":
            return None
        cache_dir = path or os.environ.get(
            "MDT_JAX_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "mdt_jax_cache"
            ),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except OSError as e:
        import sys

        print(
            f"warning: compilation cache disabled ({e}); compiles will not "
            "persist across runs",
            file=sys.stderr,
        )
        return None
