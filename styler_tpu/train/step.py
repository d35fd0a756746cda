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


def train_step_accum(
    model: STYLER,
    state: TrainState,
    batch: Dict,
    dropout_rng: jax.Array,
    dat_weight: float = 1.0,
    acc_steps: int = 2,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Gradient accumulation (reference train.py:175-178, hparams.py:97).

    TPU-first re-expression of the reference's host-side "divide the
    loss, step the optimizer every acc_steps iterations": the [B] batch
    is split into acc_steps microbatches scanned inside ONE jitted
    program — grads are summed in the scan carry, averaged, and applied
    in a single optimizer update (one dispatch per update instead of
    acc_steps). BatchNorm stats chain through the carry (one momentum
    step per microbatch, like the reference's per-forward updates) and
    dropout keys fold per microbatch.

    Practically important on this chip: XLA's space-to-batch pass
    crashes on the audio-encoder backprop filter conv at small batch
    (CLAUDE.md "Known XLA bug") — small-microbatch accumulation
    composes with core/xla_flags.apply_workarounds(), which
    cli/train.py applies whenever batch_size/acc_steps < 8.
    """
    B = batch["src_seq"].shape[0]
    assert B % acc_steps == 0, f"batch {B} not divisible by acc_steps {acc_steps}"
    mb = B // acc_steps
    split = jax.tree.map(
        lambda x: x.reshape(acc_steps, mb, *x.shape[1:]), batch
    )
    rngs = jax.random.split(dropout_rng, acc_steps)

    def body(carry, inp):
        grads_acc, bstats = carry
        mbatch, rng = inp

        def loss_fn(params):
            variables = {"params": params, "batch_stats": bstats}
            out, mutated = model.apply(
                variables,
                **_forward_kwargs(mbatch),
                deterministic=False,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            dat_aug = model.apply(
                variables,
                mbatch["mel_aug"],
                mbatch["f0_norm_aug"],
                mbatch["e_input_aug"],
                mbatch["mel_len"],
                mbatch["src_len"],
                out.src_mask,
                method="forward_dat",
            )
            total, components = styler_loss(
                out,
                mbatch["mel_target"],
                mbatch["mel_aug"],
                mbatch["log_d_target"],
                mbatch["p_target"],
                mbatch["e_target"],
                dat_aug,
                dat_weight,
            )
            return total, (components, mutated["batch_stats"])

        (_, (components, new_bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        return (grads_acc, new_bstats), components

    zeros = jax.tree.map(jnp.zeros_like, state.params)
    (grads_sum, new_bstats), comps = jax.lax.scan(
        body, (zeros, state.batch_stats), (split, rngs)
    )
    grads = jax.tree.map(lambda g: g / acc_steps, grads_sum)
    components = jax.tree.map(lambda c: c.mean(0), comps)
    new_state = state.apply_gradients(grads=grads, batch_stats=new_bstats)
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


def make_jitted_eval_step(model: STYLER, config: Config):
    """jit-compiled eval_step. Eager flax apply costs one tunnel RPC per
    op on the axon platform (CLAUDE.md) — a full-val-split eval loop
    must run compiled. Recompiles are bounded by the shape buckets."""
    return jax.jit(
        functools.partial(eval_step, model, dat_weight=config.dat_weight)
    )


def make_jitted_train_step(model: STYLER, config: Config, donate: bool = True):
    """jit-compiled train step with state donation (in-place buffers).
    ``config.acc_steps > 1`` selects the gradient-accumulation step
    (microbatch scan, one optimizer update)."""
    if config.acc_steps > 1:
        fn = functools.partial(
            train_step_accum,
            model,
            dat_weight=config.dat_weight,
            acc_steps=config.acc_steps,
        )
    else:
        fn = functools.partial(train_step, model, dat_weight=config.dat_weight)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
