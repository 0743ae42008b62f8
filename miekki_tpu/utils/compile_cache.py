"""Persistent XLA compilation cache setup.

TPU compiles of the sketch/intersect pipelines are expensive (tens of
seconds; minutes through a remote-compile tunnel).  Enabling JAX's
persistent cache makes every shape compile once per machine.  Call early —
before the first jit — from CLI/bench entry points.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/miekki_jax_cache")


def enable(cache_dir: str | None = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    import jax

    path = cache_dir or os.environ.get("MIEKKI_COMPILE_CACHE", _DEFAULT_DIR)
    if not path or path == "0":
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
