"""Rematerialization-policy tuning experiment for the train step
(TODO #3 / VERDICT r1 #10).

The full f32 step (89.6 ms @ 16x1024) is decoder+audio-encoder
compute-bound, but backward-pass activation traffic is a candidate
bottleneck on HBM: remat trades recompute (cheap on the idle MXU) for
activation reads/writes. This times the jitted train step under
jax.checkpoint policies applied to the whole loss function:

  none            baseline (XLA's own scheduling, current production)
  dots_saveable   keep matmul outputs, recompute elementwise chains
  nothing         recompute everything
  dots_no_batch   keep only non-batch matmuls (weight-like reuse)

Run on an idle box: python tools/remat_experiment.py [--batch 16]
One JSON line per policy; record the outcome (win or negative) in
TODO.md like the 2B-decode experiment.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--src", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _example_batch, _time
    from styler_tpu import default_config
    from styler_tpu.train import create_train_state
    from styler_tpu.train.losses import styler_loss
    from styler_tpu.train.step import _forward_kwargs

    cfg = default_config()
    B, L, M = args.batch, args.src, args.frames
    rng_np = np.random.default_rng(0)
    batch = _example_batch(cfg, B, L, M)
    d = np.full((B, L), M // L, dtype=np.int32)
    batch.update(
        d_target=jnp.asarray(d),
        p_target=jnp.asarray((rng_np.random((B, M)) * 300 + 80).astype(np.float32)),
        e_target=jnp.asarray((rng_np.random((B, M)) * 100).astype(np.float32)),
        log_d_target=jnp.asarray(np.log(d + cfg.log_offset).astype(np.float32)),
        f0_norm_aug=jnp.asarray(rng_np.random((B, M)).astype(np.float32)),
        e_input_aug=jnp.asarray(rng_np.random((B, M)).astype(np.float32)),
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    policies = {
        "none": None,
        "dots_saveable": jax.checkpoint_policies.dots_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }

    rng = jax.random.PRNGKey(0)

    for name, policy in policies.items():

        def loss_fn(params, bstats, batch, rng):
            variables = {"params": params, "batch_stats": bstats}
            out, mutated = model.apply(
                variables,
                **_forward_kwargs(batch),
                deterministic=False,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            dat_aug = model.apply(
                variables,
                batch["mel_aug"],
                batch["f0_norm_aug"],
                batch["e_input_aug"],
                batch["mel_len"],
                batch["src_len"],
                out.src_mask,
                method="forward_dat",
            )
            total, components = styler_loss(
                out,
                batch["mel_target"],
                batch["mel_aug"],
                batch["log_d_target"],
                batch["p_target"],
                batch["e_target"],
                dat_aug,
                cfg.dat_weight,
            )
            return total, (components, mutated["batch_stats"])

        wrapped = (
            loss_fn
            if policy is None
            else jax.checkpoint(loss_fn, policy=policy, static_argnums=())
        )

        @jax.jit
        def step(state, batch, rng, carry):
            batch = dict(batch, mel_target=batch["mel_target"] + carry)
            (total, (_, nbs)), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(state.params, state.batch_stats, batch, rng)
            new_state = state.apply_gradients(grads=grads, batch_stats=nbs)
            # fence depends on updated params + loss
            leaf = jax.tree_util.tree_leaves(new_state.params)[0]
            return total * 1e-30 + jnp.sum(leaf) * 1e-30

        try:
            dt = _time(lambda c: step(state, batch, rng, c))
            print(
                json.dumps({"policy": name, "step_ms": round(dt * 1e3, 2)}),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"policy": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
