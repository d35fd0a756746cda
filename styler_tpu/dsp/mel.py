"""Jitted STFT / mel-spectrogram / frame-energy front end.

Numerically equivalent to the reference audio chain
(reference audio/stft.py:14-160, audio/audio_processing.py:80-95) but
TPU-native: one jitted function, no host round-trips (the reference
hard-codes a ``.cuda()``/``.cpu()`` per call, stft.py:66-69).

Reference semantics reproduced exactly:
- reflect-pad ``filter_length//2`` on both sides (stft.py:57-62),
- frames of ``filter_length`` at ``hop_length`` stride
  => ``n_frames = len(x)//hop + 1``,
- periodic Hann window of ``win_length`` centered in ``filter_length``
  (stft.py:38-43),
- magnitude spectrum (stft.py:71-76),
- mel = slaney-normalized librosa filterbank @ magnitude (stft.py:126-129),
- log compression ``log(clamp(x, 1e-5))`` (audio_processing.py:80-86),
- energy = L2 norm of the *linear* magnitudes per frame (stft.py:158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# Host-side (numpy) constant construction
# ----------------------------------------------------------------------

def hann_periodic(win_length: int) -> np.ndarray:
    """Periodic Hann window == scipy.signal.get_window('hann', N, fftbins=True)."""
    n = np.arange(win_length)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad a window symmetrically to ``size`` (librosa.util.pad_center)."""
    lpad = (size - len(window)) // 2
    out = np.zeros(size, dtype=window.dtype)
    out[lpad:lpad + len(window)] = window
    return out


def _hz_to_mel_slaney(f):
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank.

    Matches ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` with the
    defaults used by the reference (htk=False, norm='slaney';
    stft.py:128-129). Returns [n_mels, n_fft//2 + 1].
    """
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization.
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ----------------------------------------------------------------------
# Jitted device kernels
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Reflect-pad and slice a 1-D signal into overlapping frames.

    x: [T] in [-1, 1]. Returns [n_frames, n_fft] with
    n_frames = T // hop_length + 1 (reference stft.py:57-70 frame count).
    """
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = x.shape[0] // hop_length + 1
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return xp[idx]


def stft_magnitude(
    x: jnp.ndarray, window: jnp.ndarray, n_fft: int, hop_length: int
) -> jnp.ndarray:
    """Magnitude STFT of a 1-D signal. Returns [n_freq, n_frames]."""
    frames = frame_signal(x, n_fft, hop_length) * window[None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec).T.astype(jnp.float32)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip_val)) — reference audio_processing.py:80-86."""
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


class MelFrontend:
    """Precomputed-constant mel front end with jitted __call__.

    Functional analog of the reference's module-level TacotronSTFT
    singleton (audio/tools.py:10-13).
    """

    # Frame-count buckets: utterance lengths vary per file, and jit
    # compiles per shape — without bucketing, preprocessing a real corpus
    # would recompile for every utterance. The reflect padding is applied
    # on the host BEFORE zero-padding to the bucket, so the first F true
    # frames see exactly the reference framing (values match to f32 FFT
    # rounding; the batched FFT vectorizes differently per bucket size).
    _FRAME_BUCKET_BASE = 32

    def __init__(self, config):
        self.config = config
        self.n_fft = config.filter_length
        self.hop_length = config.hop_length
        window = pad_center(hann_periodic(config.win_length), config.filter_length)
        self.window = jnp.asarray(window, dtype=jnp.float32)
        self.mel_basis = jnp.asarray(
            mel_filterbank(
                config.sampling_rate,
                config.filter_length,
                config.n_mel_channels,
                config.mel_fmin,
                config.mel_fmax,
            )
        )
        self._jitted = jax.jit(self._mel_energy_prepadded)
        self._jitted_batch = jax.jit(jax.vmap(self._mel_energy_prepadded))

    def _mel_energy_prepadded(self, xp: jnp.ndarray):
        """xp: already reflect+bucket padded; valid framing only."""
        n_frames = (xp.shape[0] - self.n_fft) // self.hop_length + 1
        idx = (
            jnp.arange(n_frames)[:, None] * self.hop_length
            + jnp.arange(self.n_fft)[None, :]
        )
        frames = xp[idx] * self.window[None, :]
        mag = jnp.abs(jnp.fft.rfft(frames, n=self.n_fft, axis=-1)).T.astype(
            jnp.float32
        )
        mel = dynamic_range_compression(self.mel_basis @ mag)
        energy = jnp.linalg.norm(mag, axis=0)
        return mel, energy

    def __call__(self, audio) -> tuple:
        """audio: [T] float in [-1, 1]. Returns (mel [n_mels, F], energy [F])
        with F = T // hop + 1 (reference stft.py frame count)."""
        audio = np.asarray(audio, dtype=np.float32)
        pad = self.n_fft // 2
        xp = np.pad(audio, (pad, pad), mode="reflect")
        F = len(audio) // self.hop_length + 1
        base = self._FRAME_BUCKET_BASE
        Fb = base
        while Fb < F:
            Fb *= 2
        total = (Fb - 1) * self.hop_length + self.n_fft
        # pad OR truncate to the bucket length: when F lands exactly on a
        # bucket and len(audio) % hop != 0, xp overshoots `total` by the
        # remainder; those samples are beyond the last frame's reach
        # (frame F-1 spans [(F-1)*hop, (F-1)*hop + n_fft) <= total).
        xp = np.pad(xp, (0, max(0, total - len(xp))))[:total]
        mel, energy = self._jitted(jnp.asarray(xp))
        return np.asarray(mel)[:, :F], np.asarray(energy)[:F]

    def mel_spectrogram(self, audio: jnp.ndarray):
        """Alias matching the reference TacotronSTFT API (stft.py:141-160)."""
        return self(audio)

    def batch(self, audios) -> list:
        """Batched front end: list of [T_i] wavs -> list of
        (mel [n_mels, F_i], energy [F_i]) — utterances sharing a frame
        bucket run as ONE vmapped jitted program (the preprocessing-
        throughput path; per-utterance outputs identical to ``__call__``).
        """
        pad = self.n_fft // 2
        base = self._FRAME_BUCKET_BASE
        prepped, groups = [], {}
        for i, audio in enumerate(audios):
            audio = np.asarray(audio, dtype=np.float32)
            F = len(audio) // self.hop_length + 1
            Fb = base
            while Fb < F:
                Fb *= 2
            xp = np.pad(audio, (pad, pad), mode="reflect")
            total = (Fb - 1) * self.hop_length + self.n_fft
            # see __call__: truncation to `total` is safe and keeps all
            # shapes in a bucket identical (bucket-boundary utterances
            # with len % hop != 0 otherwise overshoot and break np.stack)
            prepped.append((np.pad(xp, (0, max(0, total - len(xp))))[:total], F))
            groups.setdefault(Fb, []).append(i)

        out = [None] * len(audios)
        for idxs in groups.values():
            stack = jnp.asarray(np.stack([prepped[i][0] for i in idxs]))
            mels, energies = self._jitted_batch(stack)
            mels, energies = np.asarray(mels), np.asarray(energies)
            for j, i in enumerate(idxs):
                F = prepped[i][1]
                out[i] = (mels[j][:, :F], energies[j][:F])
        return out

    def mel_to_wav(
        self, mel_log: jnp.ndarray, n_iters: int = 30, momentum: float = 0.99
    ) -> jnp.ndarray:
        """Griffin-Lim vocoder fallback (reference audio/tools.py:58-74):
        log-mel [n_mels, F] -> waveform, fully on device. Inverts the log
        compression, maps mel -> linear magnitudes with the pseudo-inverse
        filterbank, then runs accelerated Griffin-Lim phase
        reconstruction (momentum=0 for the reference's plain variant)."""
        if not hasattr(self, "_mel_pinv"):
            import numpy as _np

            self._mel_pinv = jnp.asarray(
                _np.linalg.pinv(_np.asarray(self.mel_basis))
            )

        def invert(m):
            mag = jnp.maximum(self._mel_pinv @ dynamic_range_decompression(m), 0.0)
            return griffin_lim(
                mag, self.window, self.n_fft, self.hop_length, n_iters,
                momentum=momentum,
            )

        return jax.jit(invert, static_argnames=())(mel_log)


def griffin_lim(
    magnitudes: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    n_iters: int = 30,
    key: jax.Array | None = None,
    momentum: float = 0.0,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction (reference audio_processing.py:61-77).

    magnitudes: [n_freq, n_frames]. Returns the time-domain signal.
    Uses jnp.fft.irfft + overlap-add; runs fully on device under jit.

    momentum > 0 enables the accelerated ("fast") variant (Perraudin et
    al. 2013): extrapolate the projected spectrum by
    ``c + momentum * (c - c_prev)`` each iteration — converges in far
    fewer iterations. momentum = 0 is the reference's plain algorithm.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n_frames = magnitudes.shape[1]
    angles = jax.random.uniform(key, (magnitudes.shape[0], n_frames)) * 2 * jnp.pi

    def istft(mag, phase):
        spec = mag * jnp.exp(1j * phase)
        frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1) * window[None, :]
        out_len = n_fft + hop_length * (n_frames - 1)
        idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
        sig = jnp.zeros(out_len).at[idx.reshape(-1)].add(frames.reshape(-1))
        wss = jnp.zeros(out_len).at[idx.reshape(-1)].add(
            jnp.tile(window**2, (n_frames,))
        )
        sig = jnp.where(wss > 1e-11, sig / jnp.maximum(wss, 1e-11), sig)
        return sig[n_fft // 2: -(n_fft // 2)]

    def reprojected(phase):
        sig = istft(magnitudes, phase)
        frames = frame_signal(sig, n_fft, hop_length) * window[None, :]
        return jnp.fft.rfft(frames, n=n_fft, axis=-1).T[:, :n_frames]

    def body(_, carry):
        phase, prev_spec = carry
        spec = reprojected(phase)
        accel = spec + momentum * (spec - prev_spec)
        return jnp.angle(accel), spec

    init_spec = magnitudes * jnp.exp(1j * angles)
    phase, _ = jax.lax.fori_loop(0, n_iters, body, (angles, init_spec))
    return istft(magnitudes, phase)
