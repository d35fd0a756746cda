"""Static-shape, fully vectorized length regulation and mel calibration.

These replace the reference's two Python-loop CPU bottlenecks with
TPU-friendly closed-form index maps:

- ``length_regulate``: FastSpeech-style phoneme→frame expansion
  (reference modules.py:396-419 loops per batch element per phoneme).
  Here: duration cumsum → per-frame searchsorted gather. O(B·M) gathers,
  static [B, M, C] output.

- ``mel_calibrate``: frame-domain → phoneme-domain resampling
  (reference utils.py:351-384 loops with pad_sequence/repeat_interleave).
  The reference's ``get_scale(src, tgt)`` split (first ``src % tgt``
  groups get ``src//tgt + 1`` elements) has a closed form, so both
  compression (grouped mean) and expansion (repeat-interleave) become a
  per-example [S, M] calibration matrix applied as one batched matmul —
  which XLA maps straight onto the MXU.

Both are exact reproductions of the reference's remainder distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulate(
    x: jnp.ndarray, durations: jnp.ndarray, max_mel_len: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand phoneme-domain encodings by integer durations.

    x:         [B, L, C] float
    durations: [B, L] int (>= 0)
    Returns (expanded [B, max_mel_len, C], mel_len [B]).

    Frame t copies phoneme l where cumsum(d)[l-1] <= t < cumsum(d)[l],
    exactly the reference's concatenated ``vec.expand`` layout
    (modules.py:411-419). Frames >= mel_len are zeros.
    """
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=1)  # [B, L]
    mel_len = ends[:, -1]

    frames = jnp.arange(max_mel_len, dtype=jnp.int32)  # [M]
    # index of first phoneme whose end exceeds t == searchsorted right
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frames, side="right"))(ends)
    idx = jnp.minimum(idx, x.shape[1] - 1)  # [B, M]

    expanded = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = frames[None, :] < mel_len[:, None]
    expanded = jnp.where(valid[..., None], expanded, 0.0)
    return expanded, mel_len


def duration_to_alignment(durations: jnp.ndarray, max_mel_len: int) -> jnp.ndarray:
    """[B, L] durations -> [B, max_mel_len, L] one-hot alignment matrix
    (reference utils.get_alignment_2D, utils.py:73-84, vectorized)."""
    ends = jnp.cumsum(durations.astype(jnp.int32), axis=1)
    frames = jnp.arange(max_mel_len, dtype=jnp.int32)
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frames, side="right"))(ends)
    mel_len = ends[:, -1]
    onehot = jax.nn.one_hot(idx, durations.shape[1], dtype=jnp.float32)
    valid = frames[None, :] < mel_len[:, None]
    return onehot * valid[..., None]


def _group_index(i: jnp.ndarray, q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Group id of element ``i`` when splitting ``n = q*k + r`` elements
    into ``k`` groups sized q+1 (first r groups) then q — the closed form
    of the reference's get_scale (utils.py:351-352)."""
    qp1 = q + 1
    boundary = r * qp1
    q_safe = jnp.maximum(q, 1)
    return jnp.where(i < boundary, i // qp1, r + (i - boundary) // q_safe)


def calibration_matrix(
    mel_len: jnp.ndarray, seq_len: jnp.ndarray, max_mel: int, max_src: int
) -> jnp.ndarray:
    """Per-example [max_src, max_mel] resampling matrix A with
    out = A @ mel reproducing the reference mel_calibrator exactly.

    mel_len, seq_len: scalars (int32).
    - mel_len > seq_len: compression — A[s, m] = 1/|group s| for m in group s
    - mel_len < seq_len: expansion  — A[s, m] = 1 where m == source(s)
    - equal: identity (a degenerate case of both formulas)
    Rows s >= seq_len and columns m >= mel_len are zero.
    """
    ml = jnp.maximum(mel_len.astype(jnp.int32), 1)
    sl = jnp.maximum(seq_len.astype(jnp.int32), 1)

    s_ids = jnp.arange(max_src, dtype=jnp.int32)[:, None]  # [S, 1]
    m_ids = jnp.arange(max_mel, dtype=jnp.int32)[None, :]  # [1, M]

    # Compression: frame m belongs to group g_m; group sizes q + (s < r).
    qc, rc = ml // sl, ml % sl
    g_m = _group_index(m_ids, qc, rc)  # [1, M]
    size_s = qc + (s_ids < rc).astype(jnp.int32)  # [S, 1]
    a_comp = (g_m == s_ids).astype(jnp.float32) / jnp.maximum(size_s, 1)

    # Expansion: output position s copies source frame g_s.
    qe, re_ = sl // ml, sl % ml
    g_s = _group_index(s_ids, qe, re_)  # [S, 1]
    a_exp = (g_s == m_ids).astype(jnp.float32)

    a = jnp.where(ml > sl, a_comp, a_exp)
    valid = (s_ids < sl) & (m_ids < ml)
    return a * valid.astype(jnp.float32)


def mel_calibrate(
    mel: jnp.ndarray, mel_len: jnp.ndarray, seq_len: jnp.ndarray, max_src: int
) -> jnp.ndarray:
    """Resample [B, M, C] frame-domain features to [B, max_src, C]
    phoneme-domain (reference utils.py:355-384), as a batched matmul."""
    max_mel = mel.shape[1]
    a = jax.vmap(calibration_matrix, in_axes=(0, 0, None, None))(
        mel_len, seq_len, max_mel, max_src
    )  # [B, S, M]
    # precision='highest': full f32 accumulation — the calibrator feeds the
    # mel-parity-critical path, and default (bf16-ish) matmul precision
    # costs ~4e-3 absolute error on grouped means.
    return jnp.einsum(
        "bsm,bmc->bsc",
        a,
        mel,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
