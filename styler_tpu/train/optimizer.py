"""Noam-scheduled Adam via optax (reference optimizer.py:4-32).

lr(step) = d_model^-0.5 * min(step^-0.5, warmup^-1.5 * step), with the
reference's 1-indexed step counting (it increments before computing,
optimizer.py:26-29). Adam betas (0.9, 0.98), eps 1e-9, weight decay 0
(hparams.py:99-101); global-norm gradient clip 1.0 (train.py:181-182).
"""

from __future__ import annotations

import optax

from styler_tpu.core.config import Config


def noam_schedule(d_model: int, warmup_steps: int) -> optax.Schedule:
    init_lr = float(d_model) ** -0.5

    def schedule(count):
        import jax.numpy as jnp

        step = count + 1.0  # reference steps are 1-indexed
        return init_lr * jnp.minimum(
            step**-0.5, float(warmup_steps) ** -1.5 * step
        )

    return schedule


def make_optimizer(config: Config) -> optax.GradientTransformation:
    sched = noam_schedule(config.decoder_hidden, config.n_warm_up_step)
    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip_thresh),
        optax.adam(
            learning_rate=sched,
            b1=config.betas[0],
            b2=config.betas[1],
            eps=config.eps,
        ),
    )
    if config.acc_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.acc_steps)
    return tx
