"""XLA flag workarounds.

Call :func:`apply_workarounds` BEFORE the first jax import/compile.

- ``space-to-batch-converter``: XLA:TPU's space-to-batch pass crashes
  (``Check failed: PropagateOnBackpropFilterConv ... Operands to select
  must be the same shape; got f32[...] and pred[...]``) while converting
  a backprop-filter convolution of the audio-encoder conv stack at small
  batch sizes (observed: batch 4, 2026-08 toolchain). The pass is a
  small-batch conv optimization only; disabling it is safe.
"""

from __future__ import annotations

import os

_DISABLED_PASSES = ("space-to-batch-converter",)


def apply_workarounds() -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_disable_hlo_passes" in flags:
        return  # caller manages pass disabling explicitly
    extra = "--xla_disable_hlo_passes=" + ",".join(_DISABLED_PASSES)
    os.environ["XLA_FLAGS"] = (flags + " " + extra).strip()
