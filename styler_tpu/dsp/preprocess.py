"""Fused on-device preprocessing: mel + energy + f0 in ONE program.

The reference preprocesses serially on the host: librosa-style STFT/mel
per utterance (reference audio/stft.py, audio/tools.py) plus a native
f0 tracker per utterance (reference dataset.py:32-45). The rebuild's
batched stages (`MelFrontend.batch` + `track_f0_batch(backend="device")`)
already vectorize both, but as TWO device programs with TWO uploads of
the same waveforms. On a bandwidth-constrained host<->device link the
uploads dominate preprocessing wall time, so this module fuses the whole
acoustic front end into ONE jitted program per frame bucket over ONE
wav upload — sent as int16 PCM whenever the input values allow it
(half the bytes of float32, bit-exact since PCM samples are integers).

Buffer layout (per frame bucket Fb): each utterance is reflect-padded
by n_fft//2 on both sides (exactly `MelFrontend.batch`'s prepadding)
and zero-extended to (Fb-1)*hop + n_fft + hop samples. Mel/energy frame
over the first (Fb-1)*hop + n_fft samples — identical math, identical
outputs. The f0 tracker slices the raw-signal region starting at
n_fft//2 (Fb*hop samples — the extra `hop` tail guarantees every raw
sample is visible even when len(wav) overshoots (Fb-1)*hop) and runs
the same `track_f0_padded` program as `track_f0_batch(backend=
"device")`; reflected samples beyond ``n_real`` are masked off inside
the tracker, so outputs match it exactly.

Parity: mel/energy equal `MelFrontend.__call__` bit-for-bit (scaling by
1/max_wav is a power-of-two multiply and commutes with the reflect
copy); f0 equals the device tracker exactly, which carries the
documented end-of-signal deviation vs the host trackers
(dsp/pitch_device.py docstring). Pinned by
tests/test_dsp.py::test_fused_preprocess_matches_separate_paths.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from styler_tpu.dsp.mel import MelFrontend, dynamic_range_compression
from styler_tpu.dsp.pitch_device import track_f0_padded


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_frames", "sr", "hop", "n_fft", "f0_min", "f0_max", "robust",
        "max_wav",
    ),
)
def _fused_padded(
    xp, n_real, window, mel_basis, n_frames, sr, hop, n_fft,
    f0_min, f0_max, robust, max_wav,
):
    """xp: [B, (n_frames-1)*hop + n_fft + hop] reflect+zero padded
    PCM-scale wavs (int16 or float32); n_real: [B] raw sample counts.
    Returns (mel [B, n_mels, n_frames], energy [B, n_frames],
    f0 [B, n_frames + 1])."""
    xf = xp.astype(jnp.float32)
    pad = n_fft // 2

    def mel_one(xn):
        idx = (
            jnp.arange(n_frames)[:, None] * hop
            + jnp.arange(n_fft)[None, :]
        )
        frames = xn[idx] * window[None, :]
        mag = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1)).T.astype(
            jnp.float32
        )
        mel = dynamic_range_compression(mel_basis @ mag)
        energy = jnp.linalg.norm(mag, axis=0)
        return mel, energy

    mel, energy = jax.vmap(mel_one)(xf * np.float32(1.0 / max_wav))
    x_f0 = xf[:, pad: pad + n_frames * hop]
    f0 = track_f0_padded(x_f0, n_real, sr, hop, f0_min, f0_max, robust)
    return mel, energy, f0


def _as_pcm(w) -> np.ndarray:
    """int16 when the values are exactly representable (PCM read from
    disk always is — half the upload bytes), float32 PCM otherwise."""
    w = np.asarray(w)
    if w.dtype == np.int16:
        return w
    w32 = np.ascontiguousarray(w, dtype=np.float32)
    if w32.size and float(np.max(np.abs(w32))) < 32767.5:
        wi = w32.astype(np.int16)
        if np.array_equal(wi.astype(np.float32), w32):
            return wi
    return w32


def preprocess_batch(
    config,
    wavs,
    robust: bool = False,
    frontend: Optional[MelFrontend] = None,
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Batched acoustic front end, one device dispatch per frame bucket.

    ``wavs``: PCM-scale waveforms (int16, or float with |w| < 32768 —
    the scale `load_aligned` stages and the f0 trackers expect; mel
    internally normalizes by ``config.max_wav_value``). Returns one
    ``(mel [n_mels, F], energy [F], f0 [F])`` triple per wav with
    ``F = len(wav) // hop_length + 1`` (f0 as float64, matching
    ``track_f0_batch``'s contract).
    """
    fe = frontend or MelFrontend(config)
    hop, n_fft = fe.hop_length, fe.n_fft
    pad = n_fft // 2
    base = fe._FRAME_BUCKET_BASE

    prepped, groups = [], {}
    for i, w in enumerate(wavs):
        w = _as_pcm(w)
        n = len(w)
        F = n // hop + 1
        Fb = base
        while Fb < F:
            Fb *= 2
        total = (Fb - 1) * hop + n_fft + hop
        if n < 2:  # reflect pad needs >= 2 samples
            w = np.zeros(2, w.dtype)
        xp = np.pad(w, (pad, pad), mode="reflect")
        xp = np.pad(xp, (0, total - len(xp)))
        prepped.append((xp, F, n))
        # dtype in the key: int16 and float32 rows can't share a stack
        groups.setdefault((Fb, xp.dtype.str), []).append(i)

    out = [None] * len(wavs)
    for (Fb, _), idxs in groups.items():
        # Pad the batch axis to the next power of two: group sizes vary
        # with the corpus's length mix, and every distinct (batch, Fb)
        # pair is otherwise a fresh multi-minute compile over the axon
        # tunnel. Pow-2 padding caps the program count at
        # log2(chunk) per frame bucket, all persistently cached.
        B = len(idxs)
        Bp = 1
        while Bp < B:
            Bp *= 2
        rows = [prepped[i][0] for i in idxs]
        rows += [np.zeros_like(rows[0])] * (Bp - B)
        stack = jnp.asarray(np.stack(rows))
        n_real = jnp.asarray(
            np.asarray(
                [prepped[i][2] for i in idxs] + [hop] * (Bp - B), np.int32
            )
        )
        mel, energy, f0 = _fused_padded(
            stack, n_real, fe.window, fe.mel_basis, Fb,
            config.sampling_rate, hop, n_fft,
            config.f0_min, config.f0_max, robust,
            float(config.max_wav_value),
        )
        mel, energy, f0 = np.asarray(mel), np.asarray(energy), np.asarray(f0)
        for j, i in enumerate(idxs):
            F = prepped[i][1]
            out[i] = (
                mel[j][:, :F],
                energy[j][:F],
                f0[j][:F].astype(np.float64),
            )
    return out
