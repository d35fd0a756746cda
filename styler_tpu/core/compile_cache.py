"""Persistent XLA compilation cache for cold-start latency.

Every CLI stage runs in a fresh process, and first-compile dominates its
wall time (the full model is ~20-60 s to compile; the train step worse —
the hardware-validated lifecycle run was compile-dominated at ~35 min).
The reference has no equivalent concern (PyTorch eager). JAX's
persistent compilation cache eliminates recompiles across processes:
measured on the axon TPU tunnel, a 12.9 s first-call program drops to
0.39 s in the next process (2026-08-17).

Call :func:`enable_persistent_cache` early in every entry point (safe
any time before the first compile; importing jax first is fine). Library
code does NOT call it implicitly — process-global config belongs to the
application, so the CLIs/bench wire it and embedders opt in themselves.

Env:
  STYLER_TPU_CACHE_DIR          cache location (default ~/.cache/styler_tpu/xla)
  STYLER_TPU_NO_COMPILE_CACHE=1 disable entirely
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "styler_tpu", "xla"
)


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path``.

    Returns the cache dir in effect, or None when disabled via
    ``STYLER_TPU_NO_COMPILE_CACHE=1`` or an unwritable directory.
    Programs compiling faster than 1 s are not cached (JAX default) —
    the disk/bookkeeping cost outweighs the win for trivial programs.
    """
    if os.environ.get("STYLER_TPU_NO_COMPILE_CACHE", "") == "1":
        return None
    path = path or os.environ.get("STYLER_TPU_CACHE_DIR") or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path
