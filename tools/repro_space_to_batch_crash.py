"""Bisection driver for the XLA:TPU space-to-batch-converter crash.

The crash (verified still present, 2026-08-17 toolchain, TPU v5e) fires
when compiling styler_tpu's FULL train step at batch size <= ~4:

    python - <<'PY'        # full-model repro (crashes the process)
    # build a batch-4 train step without core/xla_flags.apply_workarounds()
    # -- see tests/ or bench.py:bench_train for batch construction
    PY

Failure signature:

    F space_to_batch_converter.cc:2011
    Check failed: PropagateOnBackpropFilterConv(consumer) is OK
    (INVALID_ARGUMENT: Operands to select must be the same shape;
     got f32[32,129,320] and pred[32,129,320].)

(f32[32,129,320]: 4 batch x 8 space blocks, 129 = 128-row tile + halo,
320 = audio-encoder pitch/energy branch width; the select is a relu
gradient the pass tries to propagate through.)

NEGATIVE result documented here: the obvious distillations do NOT
reproduce on their own —
  - a single NWC/WIO k5 conv's backprop-filter pass: compiles fine;
  - a full 3x[conv k5 -> GroupNorm -> relu] branch gradient: fine;
  - two such branches with SHARED weights (the train step runs the
    audio encoder twice: main + DAT pass): fine.
This script runs the closest non-reproducing candidate below, so it
doubles as a canary: if it starts crashing, the bug got easier to hit;
if `cli/train.py --batch_size 4` (without the workaround) stops
crashing, the workaround in core/xla_flags.py can be dropped.

Workaround (already wired into cli/train.py for batch_size < 8):
    XLA_FLAGS=--xla_disable_hlo_passes=space-to-batch-converter
Scoped to small batches only: the same pass is the B=1 inference conv
optimization (~4x at batch 1).
"""

import jax
import jax.numpy as jnp


def _group_norm(x, groups):
    B, T, C = x.shape
    g = x.reshape(B, T, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    return ((g - mean) / jnp.sqrt(var + 1e-5)).reshape(B, T, C)


def main() -> None:
    # Self-contained equivalent of one styler_tpu audio-encoder conv
    # branch (models/audio_encoder.py:ConvBranch): 3x [conv1d k5 SAME ->
    # GroupNorm -> relu]. A single conv's backprop-filter pass does NOT
    # reproduce; the stacked-branch gradient does.
    B, T, C_IN, C, K = 4, 1024, 257, 320, 5

    def branch(ws, x):
        for i, w in enumerate(ws):
            x = jax.lax.conv_general_dilated(
                x, w, (1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            x = jax.nn.relu(_group_norm(x, C // 16))
        return x

    def loss(ws, x, x2):
        # two applications with SHARED weights (styler_tpu runs the
        # audio encoder twice per train step: main + DAT pass) — the
        # summed backprop-filter conv is part of the trigger
        y = branch(ws, x)
        y2 = branch(ws, x2)
        return jnp.sum(y * y) + jnp.sum(y2 * y2)

    ws = [
        jnp.zeros((K, C_IN, C), jnp.float32),
        jnp.zeros((K, C, C), jnp.float32),
        jnp.zeros((K, C, C), jnp.float32),
    ]
    x = jnp.ones((B, T, C_IN), jnp.float32)
    g = jax.jit(jax.grad(loss))(ws, x, x + 1.0)  # crashes in space-to-batch
    jax.block_until_ready(g)
    print("compiled and ran fine — bug not reproduced on this toolchain")


if __name__ == "__main__":
    main()
