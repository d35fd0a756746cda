"""Mask construction (reference utils.py:223-232 semantics).

Masks are True at PADDING positions, matching the reference convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask, True where t >= length."""
    ids = jnp.arange(max_len)[None, :]
    return ids >= lengths[:, None]


def masked_fill(x: jnp.ndarray, mask: jnp.ndarray, value=0.0) -> jnp.ndarray:
    """torch masked_fill: set x to value where mask is True (broadcasts)."""
    return jnp.where(mask, jnp.asarray(value, dtype=x.dtype), x)
