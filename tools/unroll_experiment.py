"""LSTM-scan unroll-factor experiment (TODO #3 train-step ceiling).

The audio encoder's merged 4-branch BiLSTM (ops/recurrent.py:
fused_bilstm_branches) runs one lax.scan per layer over T=1024 frames;
the step matmul is tiny ([2B, Ht] x [Ht, 4Ht], Ht~=212), so the scan is
bound by while-loop iteration latency, not FLOPs. `unroll=k` folds k
steps into each loop iteration so XLA can schedule them together.

All variants are timed in ONE process (per-process timings on the axon
tunnel are bimodal ~3.4x — see CLAUDE.md; cross-process comparison is
meaningless). `scan_unroll()` reads the env var at trace time, so each
variant sets it and jits a fresh program.

Times two programs per unroll factor on the real chip:
  train  the full jitted optimizer step @ batch 16 (the audio encoder
         runs twice: clean forward + DAT second pass)
  fwd1   the B=1 inference forward (bench `single` model part; the
         audio-encoder scan is ~half of it)

Run on an idle box: python tools/unroll_experiment.py
One JSON line per (program, unroll); record the outcome in TODO.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 4, 8, 16])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _example_batch, _time
    from styler_tpu import default_config
    from styler_tpu.train import create_train_state, make_jitted_train_step

    cfg = default_config()
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)

    # train-step inputs (same construction as bench_train)
    B, L, M = 16, 128, 1024
    tbatch = _example_batch(cfg, B, L, M)
    d = np.full((B, L), M // L, dtype=np.int32)
    tbatch.update(
        d_target=jnp.asarray(d),
        p_target=jnp.asarray((rng_np.random((B, M)) * 300 + 80).astype(np.float32)),
        e_target=jnp.asarray((rng_np.random((B, M)) * 100).astype(np.float32)),
        log_d_target=jnp.asarray(np.log(d + cfg.log_offset).astype(np.float32)),
        f0_norm_aug=jnp.asarray(rng_np.random((B, M)).astype(np.float32)),
        e_input_aug=jnp.asarray(rng_np.random((B, M)).astype(np.float32)),
    )
    model, state = create_train_state(cfg, rng, tbatch)

    # B=1 inference forward inputs (bench `single` model part)
    sbatch = _example_batch(cfg, 1, 128, 1024)
    svars = jax.jit(model.init)(rng, **sbatch)

    for unroll in args.unrolls:
        os.environ["STYLER_TPU_SCAN_UNROLL"] = str(unroll)
        step_fn = make_jitted_train_step(model, cfg, donate=False)

        @jax.jit
        def tstep(state, batch, carry, step_fn=step_fn):
            batch = dict(batch, mel_target=batch["mel_target"] + carry)
            new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
            leaf = jax.tree_util.tree_leaves(new_state.params)[0]
            return metrics["total"] + jnp.sum(jnp.abs(leaf)) * 1e-30

        @jax.jit
        def fwd1(variables, batch, carry):
            batch = dict(batch, mel_target=batch["mel_target"] + carry)
            out = model.apply(variables, **batch, max_mel_len=1024)
            return jnp.sum(out.mel_postnet) * 1e-30

        for name, fn in (
            ("train", lambda c: tstep(state, tbatch, c)),
            ("fwd1", lambda c: fwd1(svars, sbatch, c)),
        ):
            try:
                dt = _time(fn)
                print(
                    json.dumps(
                        {"unroll": unroll, "program": name,
                         "step_ms": round(dt * 1e3, 2)}
                    ),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 - report and continue
                print(
                    json.dumps(
                        {"unroll": unroll, "program": name,
                         "error": str(e)[:200]}
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
