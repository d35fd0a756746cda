"""Jitted train / eval steps.

One fused XLA computation per optimizer update (reference train.py:99-186
does ~6 separate GPU dispatches + a host round-trip per step):
teacher-forced forward + Residual Decoding + DAT second pass + loss +
backward + clip + Noam Adam update.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from styler_tpu.core.config import Config
from styler_tpu.models import STYLER
from styler_tpu.train.losses import styler_loss
from styler_tpu.train.state import TrainState

# Batch keys consumed by the teacher-forced forward.
FORWARD_KEYS = (
    "src_seq",
    "mel_target",
    "mel_aug",
    "p_norm",
    "e_input",
    "src_len",
    "mel_len",
    "d_target",
    "p_target",
    "e_target",
    "speaker_embed",
)


def _forward_kwargs(batch: Dict) -> Dict:
    return {k: batch[k] for k in FORWARD_KEYS}


def train_step(
    model: STYLER,
    state: TrainState,
    batch: Dict,
    dropout_rng: jax.Array,
    dat_weight: float = 1.0,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer update. batch additionally carries the augmented
    features for the DAT second pass: f0_norm_aug, e_input_aug, log_d_target."""

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mutated = model.apply(
            variables,
            **_forward_kwargs(batch),
            deterministic=False,
            train=True,
            rngs={"dropout": dropout_rng},
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
            dat_weight,
        )
        return total, (components, mutated["batch_stats"])

    (_, (components, new_batch_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads=grads, batch_stats=new_batch_stats)
    return new_state, components


def eval_step(
    model: STYLER, state: TrainState, batch: Dict, dat_weight: float = 1.0
) -> Dict[str, jnp.ndarray]:
    """Teacher-forced evaluation of all 9+1 loss components
    (reference evaluate.py:27-142)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, **_forward_kwargs(batch))
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
    _, components = styler_loss(
        out,
        batch["mel_target"],
        batch["mel_aug"],
        batch["log_d_target"],
        batch["p_target"],
        batch["e_target"],
        dat_aug,
        dat_weight,
    )
    return components


def make_jitted_train_step(model: STYLER, config: Config, donate: bool = True):
    """jit-compiled train step with state donation (in-place buffers)."""
    fn = functools.partial(train_step, model, dat_weight=config.dat_weight)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
