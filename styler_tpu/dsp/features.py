"""Feature normalizations and quantizers.

Host (numpy) versions are used by the offline preprocessing pipeline;
device (jnp) versions by the jitted model input path. Semantics match the
reference (utils.py:387-429).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# Host-side (numpy) — offline preprocessing
# ----------------------------------------------------------------------

def speaker_normalization_np(f0: np.ndarray) -> np.ndarray:
    """Speaker-relative f0 normalization (reference utils.py:387-397).

    Note the reference's ``index_nonzero = f0 > -1e10`` selects *every*
    frame (f0 >= 0 always), so the z-score statistics include unvoiced
    zeros; we reproduce that faithfully: z-score / 4, clip to [-1, 1],
    shift to [0, 1].
    """
    f0 = f0.astype(float).copy()
    sel = f0 > -1e10
    mean_f0, std_f0 = np.mean(f0[sel]), np.std(f0[sel])
    f0[sel] = (f0[sel] - mean_f0) / std_f0 / 4.0
    f0[sel] = np.clip(f0[sel], -1, 1)
    f0[sel] = (f0[sel] + 1) / 2.0
    return f0


def f0_normalization_np(f0: np.ndarray) -> np.ndarray:
    """speaker_normalization with a zeros fallback on degenerate inputs
    (reference utils.py:400-407 converts numpy warnings to exceptions)."""
    with np.errstate(all="raise"):
        try:
            std = np.std(f0.astype(float))
            if not np.isfinite(std) or std == 0.0 or f0.size == 0:
                return np.zeros_like(f0, dtype=float)
            return speaker_normalization_np(f0)
        except FloatingPointError:
            return np.zeros_like(f0, dtype=float)


def energy_rescaling_np(energy: np.ndarray, energy_min: float, energy_max: float) -> np.ndarray:
    """Min-max rescale energy to [0, 1] (reference utils.py:410-414)."""
    out = (energy - energy_min) / (energy_max - energy_min)
    return np.clip(out, 0, 1)


# ----------------------------------------------------------------------
# Device-side (jnp) — jitted model input path
# ----------------------------------------------------------------------

def quantize_one_hot(x: jnp.ndarray, num_bins: int = 256) -> jnp.ndarray:
    """256-bin one-hot quantizer with an unvoiced/zero bin.

    Reference ``utils.quantize_1D_torch`` (utils.py:417-429): values in
    (0, 1] map to bins 1..256 via round(x*255)+1; values <= 0 map to
    bin 0. Output has num_bins+1 = 257 channels.

    x: [..., T] in [0, 1]. Returns [..., T, num_bins+1] float32.
    """
    uv = x <= 0
    idx = jnp.round(x * (num_bins - 1)).astype(jnp.int32) + 1
    idx = jnp.where(uv, 0, idx)
    return jax.nn.one_hot(idx, num_bins + 1, dtype=jnp.float32)


def bucketize(x: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(x, boundaries, right=False) equivalent.

    torch's right=False picks the first boundary index i with
    x <= boundaries[i]  (i.e. boundaries[i-1] < x <= boundaries[i]),
    which is jnp.searchsorted side='left'. Used for the pitch/energy
    embedding lookups (reference modules.py:366-382).
    """
    return jnp.searchsorted(boundaries, x, side="left").astype(jnp.int32)


def pitch_bin_edges(f0_min: float, f0_max: float, n_bins: int = 256) -> np.ndarray:
    """Log-spaced pitch bin boundaries (reference modules.py:278-279)."""
    return np.exp(np.linspace(np.log(f0_min), np.log(f0_max), n_bins - 1)).astype(np.float32)


def energy_bin_edges(energy_min: float, energy_max: float, n_bins: int = 256) -> np.ndarray:
    """Linear energy bin boundaries (reference modules.py:280-281)."""
    return np.linspace(energy_min, energy_max, n_bins - 1).astype(np.float32)
