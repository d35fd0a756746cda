"""STYLER losses (reference loss.py:7-68), masked-mean formulation.

The reference uses masked_select + mean; here every term is
sum(loss * valid) / sum(valid) — identical value, static shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def _masked_mean(err: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    valid = valid.astype(err.dtype)
    return (err * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def masked_mse(pred, target, valid):
    return _masked_mean((pred - target) ** 2, valid)


def masked_mae(pred, target, valid):
    return _masked_mean(jnp.abs(pred - target), valid)


def nll_loss(log_posterior: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.NLLLoss on log-softmax outputs: mean over batch of
    -log_posterior[b, label_b]."""
    picked = jnp.take_along_axis(log_posterior, labels[:, None], axis=-1)[:, 0]
    return -picked.mean()


def dat_loss(posteriors: Tuple, labels: jnp.ndarray) -> jnp.ndarray:
    """Sum of NLL over the 3 augmentation classifiers (loss.py:46-48,65-67)."""
    d, p, e = posteriors
    return nll_loss(d, labels) + nll_loss(p, labels) + nll_loss(e, labels)


def styler_loss(
    out,
    mel_target: jnp.ndarray,
    mel_aug: jnp.ndarray,
    log_d_target: jnp.ndarray,
    p_target: jnp.ndarray,
    e_target: jnp.ndarray,
    dat_posteriors_aug: Tuple,
    dat_weight: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total training loss (reference train.py:134-160).

    out: StylerOutput from the teacher-forced forward.
    dat_posteriors_aug: posteriors from the second (fully augmented) pass.
    Returns (total, components dict matching the reference's 10 log scalars).
    """
    src_valid = ~out.src_mask  # [B, L]
    mel_valid = (~out.mel_mask)[..., None]  # [B, M, 1]
    mel_valid_1d = ~out.mel_mask  # [B, M]

    mel_loss = masked_mse(out.mel, mel_target, mel_valid)
    mel_postnet_loss = masked_mse(out.mel_postnet, mel_target, mel_valid)
    mel_noisy_loss = masked_mse(out.mel_noisy, mel_aug, mel_valid)
    mel_postnet_noisy_loss = masked_mse(out.mel_postnet_noisy, mel_aug, mel_valid)

    d_loss = masked_mae(out.log_d_prediction, log_d_target, src_valid)
    f_loss = masked_mae(out.p_prediction, p_target, mel_valid_1d)
    e_loss = masked_mae(out.e_prediction, e_target, mel_valid_1d)

    batch = mel_target.shape[0]
    cl_clean = dat_loss(out.dat_posteriors, jnp.zeros(batch, dtype=jnp.int32))
    cl_aug = dat_loss(dat_posteriors_aug, jnp.ones(batch, dtype=jnp.int32))

    total = (
        mel_loss
        + mel_postnet_loss
        + mel_noisy_loss
        + mel_postnet_noisy_loss
        + d_loss
        + f_loss
        + e_loss
        + dat_weight * (cl_clean + cl_aug)
    )
    components = {
        "total": total,
        "mel": mel_loss,
        "mel_postnet": mel_postnet_loss,
        "mel_noisy": mel_noisy_loss,
        "mel_postnet_noisy": mel_postnet_noisy_loss,
        "duration": d_loss,
        "f0": f_loss,
        "energy": e_loss,
        "dat_clean": cl_clean,
        "dat_aug": cl_aug,
    }
    return total, components
