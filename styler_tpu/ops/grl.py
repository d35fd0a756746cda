"""Gradient reversal (domain adversarial training).

Identity forward; backward multiplies the cotangent by ``-alpha``
(reference modules.py:48-81 RevGrad/GradientReversalLayer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return x


def _grl_fwd(x, alpha):
    return x, alpha


def _grl_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)
