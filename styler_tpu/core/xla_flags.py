"""XLA flag workarounds.

Call :func:`apply_workarounds` BEFORE the first jax import/compile.

- ``space-to-batch-converter``: XLA:TPU's space-to-batch pass crashes
  (``Check failed: PropagateOnBackpropFilterConv ... Operands to select
  must be the same shape; got f32[...] and pred[...]``) while converting
  a backprop-filter convolution of the audio-encoder conv stack at small
  batch sizes (observed: batch 4, 2026-08 toolchain) — and the trigger
  is not purely batch-keyed: a batch-16 train step over the short
  64-frame mel bucket also trips it (observed 2026-08-20). Any training
  run whose conv batch is < 8 OR whose mel bucket is short should apply
  this. The pass is a small-batch conv optimization only; disabling it
  is safe for training (it is also the ~4x B=1 inference conv speedup,
  so do NOT disable it globally in serving processes).
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
