"""On-device (TPU) batched f0 tracking.

The same NCCF algorithm as the host trackers (dsp/pitch.py numpy golden
model and native/styler_dsp.cpp), vectorized over frames AND utterances
so preprocessing can run the f0 stage on the accelerator: per frame the
lag cross-correlation is a batched FFT, peak pick / parabolic refine /
median-3 smoothing are elementwise — everything jits to one program.

The reference delegates f0 to external native libs (pyworld DIO /
pysptk RAPT, reference dataset.py:32-45); SURVEY.md §7.1 calls for a
host C++ library (done) "plus an on-device option" — this is that
option: `track_f0(..., backend="device")` / `track_f0_batch(...,
backend="device")` in dsp/pitch.py route here.

Known deviation vs the host trackers (documented, tested): the host
model truncates the analysis segment at the signal end, shrinking the
window of the last ~2 frames; here the padded signal is zero-extended
instead, so the final frames can differ in voicing. Interior frames
match the numpy golden model to the same tolerance as the native
tracker (test_native_dsp.py: >=95% voicing agreement, voiced values
within 2 Hz).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from styler_tpu.dsp.pitch import _OCTAVE_DELTA


def _params(sr: int, hop: int, f0_min: float, f0_max: float):
    lag_min = max(2, int(sr / f0_max))
    lag_max = int(sr / f0_min) + 1
    win = int(min(2.5 * lag_max, 4 * hop))
    nfft = 1
    while nfft < win + lag_max:
        nfft *= 2
    return lag_min, lag_max, win, nfft


@functools.partial(
    jax.jit,
    static_argnames=("sr", "hop", "f0_min", "f0_max", "robust"),
)
def track_f0_padded(
    x: jnp.ndarray,
    n_real: jnp.ndarray,
    sr: int = 22050,
    hop: int = 256,
    f0_min: float = 71.0,
    f0_max: float = 797.9,
    robust: bool = False,
) -> jnp.ndarray:
    """x: [B, N] zero-padded wavs; n_real: [B] valid sample counts
    (each must exceed the lag range, i.e. > sr/f0_min + 1). Returns
    [B, N//hop + 1] f0 in Hz, 0.0 where unvoiced; frames past an
    utterance's n_real//hop + 1 are 0.
    """
    B, N = x.shape
    lag_min, lag_max, win, nfft = _params(sr, hop, f0_min, f0_max)
    thresh = 0.50 if robust else 0.45
    F = N // hop + 1

    def one(xu, n):
        mask = (jnp.arange(N) < n).astype(jnp.float32)
        mean = jnp.sum(xu * mask) / jnp.maximum(n, 1)
        xz = (xu - mean) * mask
        global_peak = jnp.max(jnp.abs(xz)) + 1e-12

        xpad = jnp.pad(xz, (0, win + lag_max))
        centers = jnp.arange(F, dtype=jnp.int32) * hop
        start = jnp.maximum(0, centers - win // 2)  # [F]
        idx = start[:, None] + jnp.arange(win + lag_max)[None, :]
        seg = xpad[idx]  # [F, win+lag_max]
        frame = seg[:, :win]
        e0 = jnp.sum(frame * frame, axis=1)  # [F]

        # NCCF numerator by FFT cross-correlation (same as the numpy
        # golden model's rfft path)
        spec_seg = jnp.fft.rfft(seg, nfft)
        spec_frm = jnp.fft.rfft(frame, nfft)
        cross = jnp.fft.irfft(jnp.conj(spec_frm) * spec_seg, nfft)[
            :, : lag_max + 1
        ]
        csum = jnp.cumsum(seg * seg, axis=1)
        ks = jnp.arange(lag_max + 1)
        e_k = csum[:, win - 1 + ks] - jnp.where(
            ks > 0, csum[:, jnp.maximum(ks - 1, 0)], 0.0
        )
        nccf = cross / jnp.sqrt(e0[:, None] * jnp.maximum(e_k, 1e-10))

        # valid lags: the host model truncates seg at the signal end
        # (max_lag = len(seg) - win); frames with < lag_min+8 samples of
        # segment are unvoiced
        seg_len = jnp.maximum(0, n - start)  # samples of real signal
        max_lag_f = jnp.minimum(lag_max, seg_len - win)  # [F]
        lag_ok = (ks[None, :] >= lag_min) & (ks[None, :] <= max_lag_f[:, None])
        nccf_b = jnp.where(lag_ok, nccf, -jnp.inf)

        best = jnp.max(nccf_b, axis=1)  # [F]
        # Octave guard (matches the numpy golden model, dsp/pitch.py):
        # smallest-lag LOCAL MAXIMUM within _OCTAVE_DELTA of the best
        # score wins — subharmonic lags tie with the true period, and at
        # non-integer periods score strictly higher than it.
        neg = jnp.full((nccf_b.shape[0], 1), -jnp.inf)
        left = jnp.concatenate([neg, nccf_b[:, :-1]], axis=1)
        right = jnp.concatenate([nccf_b[:, 1:], neg], axis=1)
        floor = jnp.maximum(best - _OCTAVE_DELTA, thresh)
        cand = (
            (nccf_b >= left) & (nccf_b >= right) & (nccf_b >= floor[:, None])
        )
        k = jnp.argmax(cand, axis=1)  # [F]
        score = jnp.take_along_axis(nccf, k[:, None], axis=1)[:, 0]

        frame_peak = jnp.max(jnp.abs(frame), axis=1)
        voiced = (
            (score >= thresh)
            & jnp.isfinite(best)
            & (e0 >= 1e-10)
            & (frame_peak >= 0.02 * global_peak)
            & (seg_len >= lag_min + 8)
            & (max_lag_f > lag_min)
        )

        # parabolic refinement around the peak
        km = jnp.clip(k - 1, 0, lag_max)
        kp = jnp.clip(k + 1, 0, lag_max)
        y0 = jnp.take_along_axis(nccf, km[:, None], axis=1)[:, 0]
        y1 = score
        y2 = jnp.take_along_axis(nccf, kp[:, None], axis=1)[:, 0]
        denom = y0 - 2 * y1 + y2
        delta = jnp.where(
            jnp.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0
        )
        delta = jnp.clip(delta, -0.5, 0.5)
        delta = jnp.where((k > 0) & (k < max_lag_f), delta, 0.0)

        f0 = jnp.where(voiced, sr / (k + delta), 0.0)

        # median-3 smoothing on voiced runs; kill isolated voiced frames
        a = jnp.concatenate([jnp.zeros(1), f0[:-1]])
        c = jnp.concatenate([f0[1:], jnp.zeros(1)])
        nv = (a > 0).astype(jnp.int32) + (f0 > 0).astype(jnp.int32) + (
            c > 0
        ).astype(jnp.int32)
        med3 = a + f0 + c - jnp.maximum(jnp.maximum(a, f0), c) - jnp.minimum(
            jnp.minimum(a, f0), c
        )
        mean2 = (a + f0 + c) / 2.0
        sm = jnp.where(
            f0 > 0,
            jnp.where(nv >= 3, med3, jnp.where(nv == 2, mean2, 0.0)),
            f0,
        )
        # first/last frames keep their raw value (host model smooths
        # interior indices only)
        sm = sm.at[0].set(f0[0]).at[-1].set(f0[-1])
        out = jnp.where((sm >= f0_min) & (sm <= f0_max), sm, 0.0)
        return jnp.where(jnp.arange(F) <= n // hop, out, 0.0)

    return jax.vmap(one)(x, n_real.astype(jnp.int32))
