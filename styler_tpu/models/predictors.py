"""Style predictors and domain-adversarial (DAT) classifier heads.

Parity targets:
- StylePredictor (reference modules.py:426-465): 2x [Conv1d k3 → ReLU →
  LayerNorm → Dropout 0.5] → Linear → scalar per position, masked to 0.
- AugmentationClassifier (reference modules.py:23-45): gradient-reversal
  → Linear → LayerNorm → ReLU → Linear(2) → LogSoftmax, pooled over time.
  The reference pools over *all* (incl. padded) positions; here pooling
  is masked when a mask is provided — correct under bucketed padding.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from styler_tpu.ops.grl import gradient_reversal


class StylePredictor(nn.Module):
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray], deterministic: bool = True
    ) -> jnp.ndarray:
        """x: [B, T, C]; mask: [B, T] True at padding. Returns [B, T]."""
        out = x
        for i in range(2):
            out = nn.Conv(
                self.filter_size, (self.kernel_size,), padding="SAME",
                dtype=self.dtype, name=f"conv1d_{i+1}"
            )(out)
            out = nn.relu(out)
            out = nn.LayerNorm(name=f"layer_norm_{i+1}")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.Dense(1, name="linear_layer")(out)[..., 0]
        if mask is not None:
            out = jnp.where(mask, 0.0, out)
        return out


class AugmentationClassifier(nn.Module):
    hidden: int = 256
    alpha: float = 1.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """x: [B, T, C] -> log-posterior [B, 2]."""
        rev = gradient_reversal(x, self.alpha)
        h = nn.Dense(self.hidden, name="d_fc1")(rev)
        h = nn.LayerNorm(name="d_bn1")(h)
        h = nn.relu(h)
        score = nn.log_softmax(nn.Dense(2, name="d_fc2")(h), axis=-1)  # [B, T, 2]
        if score.ndim > 2:
            if mask is not None:
                valid = (~mask)[..., None].astype(score.dtype)
                score = (score * valid).sum(axis=1) / jnp.maximum(
                    valid.sum(axis=1), 1.0
                )
            else:
                score = score.mean(axis=1)
        return score
