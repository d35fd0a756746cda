"""DSP parity tests: STFT/mel/energy vs a torch re-implementation of the
reference formulas (reference audio/stft.py, audio/audio_processing.py),
plus normalization/quantizer golden tests (reference utils.py:387-429)."""

import numpy as np
import pytest
import torch

from styler_tpu.core.config import default_config
from styler_tpu.dsp import (
    MelFrontend,
    bucketize,
    energy_rescaling_np,
    f0_normalization_np,
    hann_periodic,
    mel_filterbank,
    quantize_one_hot,
    speaker_normalization_np,
)

cfg = default_config()


def torch_reference_stft_mag(x: np.ndarray, n_fft=1024, hop=256, win=1024):
    """The reference's conv1d-based STFT (stft.py:27-79), reimplemented
    minimally in torch to serve as the golden value."""
    fourier_basis = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    fb = np.vstack(
        [np.real(fourier_basis[:cutoff, :]), np.imag(fourier_basis[:cutoff, :])]
    )
    window = hann_periodic(win)
    fb = fb * window[None, :]
    basis = torch.FloatTensor(fb[:, None, :])
    xt = torch.FloatTensor(x)[None, None, :]
    xt = torch.nn.functional.pad(
        xt.unsqueeze(1), (n_fft // 2, n_fft // 2, 0, 0), mode="reflect"
    ).squeeze(1)
    out = torch.nn.functional.conv1d(xt, basis, stride=hop)
    real, imag = out[:, :cutoff, :], out[:, cutoff:, :]
    return torch.sqrt(real**2 + imag**2)[0].numpy()


def test_stft_magnitude_matches_reference_formula(rng):
    x = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    golden = torch_reference_stft_mag(x)
    fe = MelFrontend(cfg)
    from styler_tpu.dsp.mel import stft_magnitude

    got = np.asarray(stft_magnitude(x, fe.window, cfg.filter_length, cfg.hop_length))
    assert got.shape == golden.shape
    assert got.shape[1] == len(x) // cfg.hop_length + 1
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=2e-3)


def test_mel_filterbank_matches_librosa_formula():
    # Golden values from librosa.filters.mel(22050, 1024, 80, 0, 8000)
    # (computed offline; spot-check structural invariants here).
    mb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert mb.shape == (80, 513)
    # Triangles: every filter nonneg, has a peak, and covers disjoint ranges.
    assert (mb >= 0).all()
    assert (mb.sum(axis=1) > 0).all()
    # Slaney norm: peak value = 2/(f_hi - f_lo); first filters are the tallest.
    peaks = mb.max(axis=1)
    assert peaks[0] > peaks[-1]
    # Frequencies above fmax get zero weight.
    freqs = np.linspace(0, 22050 / 2, 513)
    assert mb[:, freqs > 8000.0 + 50].sum() == 0


def test_mel_energy_shapes_and_energy_is_l2(rng):
    x = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    fe = MelFrontend(cfg)
    mel, energy = fe(x)
    n_frames = len(x) // cfg.hop_length + 1
    assert mel.shape == (80, n_frames)
    assert energy.shape == (n_frames,)
    golden_mag = torch_reference_stft_mag(x)
    np.testing.assert_allclose(
        np.asarray(energy), np.linalg.norm(golden_mag, axis=0), rtol=1e-3, atol=2e-3
    )
    # log compression floor
    assert float(np.asarray(mel).min()) >= np.log(1e-5) - 1e-6


def test_speaker_normalization_matches_reference(rng):
    f0 = np.abs(rng.standard_normal(200) * 50 + 150)
    f0[rng.random(200) < 0.3] = 0.0
    got = speaker_normalization_np(f0)
    # reference formula applied to ALL entries (utils.py:389-396)
    mean, std = f0.mean(), f0.std()
    ref = np.clip((f0 - mean) / std / 4.0, -1, 1)
    ref = (ref + 1) / 2.0
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_f0_normalization_zero_fallback():
    assert (f0_normalization_np(np.zeros(50)) == 0).all()
    const = np.full(50, 100.0)
    assert (f0_normalization_np(const) == 0).all()  # std==0 -> fallback


def test_energy_rescaling():
    e = np.array([cfg.energy_min, cfg.energy_max, -5.0, 1e9])
    out = energy_rescaling_np(e, cfg.energy_min, cfg.energy_max)
    np.testing.assert_allclose(out, [0.0, 1.0, 0.0, 1.0])


def test_quantize_one_hot_matches_reference(rng):
    x = rng.random(100).astype(np.float32)
    x[rng.random(100) < 0.2] = 0.0
    got = np.asarray(quantize_one_hot(x[None]))  # [1, 100, 257]
    assert got.shape == (1, 100, 257)
    # Reference: uv -> bin 0; else round(x*255)+1 (utils.py:417-429)
    idx = np.where(x <= 0, 0, np.round(x * 255).astype(int) + 1)
    assert (got.argmax(-1)[0] == idx).all()
    assert (got.sum(-1) == 1).all()


@pytest.mark.parametrize("right", [False])
def test_bucketize_matches_torch(rng, right):
    import jax.numpy as jnp

    boundaries = np.sort(rng.random(255).astype(np.float32))
    vals = rng.random(1000).astype(np.float32)
    vals = np.concatenate([vals, boundaries[:10]])  # exact-boundary cases
    golden = torch.bucketize(
        torch.from_numpy(vals), torch.from_numpy(boundaries), right=right
    ).numpy()
    got = np.asarray(bucketize(jnp.asarray(vals), jnp.asarray(boundaries)))
    np.testing.assert_array_equal(got, golden)


def test_pitch_energy_bin_edges():
    from styler_tpu.dsp import energy_bin_edges, pitch_bin_edges

    pb = pitch_bin_edges(cfg.f0_min, cfg.f0_max, cfg.n_bins)
    eb = energy_bin_edges(cfg.energy_min, cfg.energy_max, cfg.n_bins)
    assert pb.shape == (255,) and eb.shape == (255,)
    np.testing.assert_allclose(pb[0], cfg.f0_min, rtol=1e-6)
    np.testing.assert_allclose(pb[-1], cfg.f0_max, rtol=1e-6)
    np.testing.assert_allclose(eb[0], cfg.energy_min, rtol=1e-6)
    np.testing.assert_allclose(eb[-1], cfg.energy_max, rtol=1e-5)
    # golden: torch.linspace/exp equivalence
    golden_pb = torch.exp(
        torch.linspace(np.log(cfg.f0_min), np.log(cfg.f0_max), cfg.n_bins - 1)
    ).numpy()
    np.testing.assert_allclose(pb, golden_pb, rtol=1e-5)


def test_griffin_lim_mel_roundtrip(config):
    """mel_to_wav reconstructs a tone whose mel re-analysis matches the
    original mel (Griffin-Lim fallback vocoder path)."""
    import numpy as np

    from styler_tpu.dsp import MelFrontend

    fe = MelFrontend(config)
    t = np.arange(int(22050 * 0.5)) / 22050
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel, _ = fe(wav)
    rec = np.asarray(fe.mel_to_wav(mel, n_iters=16))
    assert np.isfinite(rec).all()
    # re-analyze: mel of the reconstruction correlates strongly with the original
    n = min(len(rec), len(wav))
    mel2, _ = fe(rec[:n].astype(np.float32))
    a = np.asarray(mel)[:, : np.asarray(mel2).shape[1]]
    b = np.asarray(mel2)[:, : a.shape[1]]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9, corr


def test_frontend_bucketing_exact(config, rng):
    import jax.numpy as jnp

    """Bucket-padded front end matches the direct reflect-pad STFT for
    arbitrary (odd) signal lengths (to f32 rounding — the batched FFT
    vectorizes differently per bucket size)."""
    from styler_tpu.dsp import MelFrontend, dynamic_range_compression, stft_magnitude

    fe = MelFrontend(config)
    for n in (1000, 22050, 30001, 8191):
        wav = rng.standard_normal(n).astype(np.float32) * 0.3
        mel, en = fe(wav)
        F = n // config.hop_length + 1
        assert mel.shape == (config.n_mel_channels, F) and en.shape == (F,)
        mag = stft_magnitude(
            jnp.asarray(wav), fe.window, fe.n_fft, fe.hop_length
        )
        mel_direct = np.asarray(dynamic_range_compression(fe.mel_basis @ mag))
        np.testing.assert_allclose(mel, mel_direct, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(
            en, np.asarray(jnp.linalg.norm(mag, axis=0)), rtol=2e-6, atol=2e-6
        )


# ----------------------------------------------------------------------
# on-device f0 tracker (dsp/pitch_device.py) vs the numpy golden model
# ----------------------------------------------------------------------


def _voiced_wav(sr=22050, seconds=1.2, f0_hz=150.0, seed=0):
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(seed)
    wav = sum(
        (0.6 / (k + 1)) * np.sin(2 * np.pi * f0_hz * (k + 1) * t)
        for k in range(4)
    )
    gap = slice(int(0.42 * len(t)), int(0.54 * len(t)))
    wav[gap] = 0.05 * rng.standard_normal(gap.stop - gap.start)
    return wav.astype(np.float32)


def test_device_f0_matches_numpy_golden():
    """backend="device" matches the numpy model at the native tracker's
    tolerance (interior frames; the last 2 frames may differ — the
    device tracker zero-extends instead of truncating, see
    pitch_device.py docstring)."""
    from styler_tpu.dsp.pitch import _frame_f0_numpy, track_f0_batch

    sr, hop = 22050, 256
    wavs = [_voiced_wav(f0_hz=hz, seed=s) for hz, s in ((150.0, 0), (220.0, 1))]
    got = track_f0_batch(wavs, sr, hop, backend="device")
    for w, g in zip(wavs, got):
        golden = _frame_f0_numpy(w, sr, hop, 71.0, 797.9, robust=False)
        assert g.shape == golden.shape
        g, golden = g[:-2], golden[:-2]
        agree = (g > 0) == (golden > 0)
        assert agree.mean() > 0.95, f"voicing agreement {agree.mean():.3f}"
        both = (g > 0) & (golden > 0)
        assert np.abs(g[both] - golden[both]).max() < 2.0


def test_device_f0_batch_mixed_lengths():
    """Shorter padded utterances get correct frame counts and zeros
    beyond their real length inside the padded program."""
    from styler_tpu.dsp.pitch import track_f0_batch

    sr, hop = 22050, 256
    wavs = [_voiced_wav(seconds=1.0), _voiced_wav(seconds=0.4, f0_hz=200.0)]
    got = track_f0_batch(wavs, sr, hop, backend="device")
    for w, g in zip(wavs, got):
        assert g.shape == (len(w) // hop + 1,)
        voiced = g > 0
        assert voiced.mean() > 0.5  # mostly voiced synthetic signals
        assert (g[voiced] > 71.0).all() and (g[voiced] < 798.0).all()


def test_f0_synthetic_benchmark_bounds():
    """Pin the tracker's error bounds on the DIO-characterization signal
    families (tools/f0_benchmark.py; VERDICT r1 #8): steady/vibrato/
    ramp/creaky/noisy pitch, with known ground truth. Bounds are ~2x the
    measured 2026-08-17 numbers (GPE 0.006, FPE 3.8c, VDE 0.031) so real
    regressions (e.g. octave-guard breakage: GPE 0.21 before the
    local-maximum guard) trip while platform jitter does not."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.f0_benchmark import run as bench_run

    rows = bench_run("numpy")
    agg = {
        k: float(np.nanmean([m[k] for m in rows.values()]))
        for k in ("GPE", "FPE_cents", "VDE")
    }
    assert agg["GPE"] < 0.02, rows
    assert agg["FPE_cents"] < 8.0, rows
    assert agg["VDE"] < 0.07, rows
    # clean (non-noise, non-vuv) cases: near-perfect tracking
    clean = [m for n, m in rows.items() if not n.startswith(("noise", "vuv"))]
    assert max(m["GPE"] for m in clean) < 0.03, rows


def test_melfrontend_batch_matches_serial():
    """fe.batch == fe(...) per utterance, across different frame buckets."""
    from styler_tpu.core.config import default_config
    from styler_tpu.dsp import MelFrontend

    fe = MelFrontend(default_config())
    rng = np.random.default_rng(0)
    wavs = [
        (0.3 * np.sin(2 * np.pi * 200 * np.arange(n) / 22050)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
        for n in (22050, 5000, 40000)
    ]
    batched = fe.batch(wavs)
    for w, (mel_b, en_b) in zip(wavs, batched):
        mel_s, en_s = fe(w)
        np.testing.assert_allclose(mel_b, mel_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(en_b, en_s, rtol=1e-5, atol=1e-5)


def test_melfrontend_bucket_boundary_lengths():
    """Utterances whose frame count lands exactly on a bucket with
    len % hop != 0 must not break the bucket shape (regression: batch
    raised ValueError on mixed shapes; found in review 2026-08-17)."""
    from styler_tpu.core.config import default_config
    from styler_tpu.dsp import MelFrontend

    fe = MelFrontend(default_config())
    hop = fe.hop_length
    rng = np.random.default_rng(0)
    # F = 31*... len = 31*hop + 7 -> F = 32 == bucket, len % hop = 7
    w_boundary = rng.standard_normal(31 * hop + 7).astype(np.float32) * 0.1
    w_short = rng.standard_normal(20 * hop).astype(np.float32) * 0.1
    out = fe.batch([w_boundary, w_short])
    for w, (mel_b, en_b) in zip([w_boundary, w_short], out):
        F = len(w) // hop + 1
        assert mel_b.shape == (80, F) and en_b.shape == (F,)
        mel_s, en_s = fe(w)
        np.testing.assert_allclose(mel_b, mel_s, rtol=1e-5, atol=1e-5)


def test_fused_preprocess_matches_separate_paths():
    """dsp/preprocess.py (ONE program: mel + energy + f0, int16 upload)
    matches the separate stages exactly: mel/energy == MelFrontend per
    utterance, f0 == track_f0_batch(backend="device") — including a
    bucket-boundary length with len % hop != 0 and a length that
    overshoots (Fb-1)*hop (the +hop tail guard)."""
    from styler_tpu.core.config import default_config
    from styler_tpu.dsp import MelFrontend
    from styler_tpu.dsp.pitch import track_f0_batch
    from styler_tpu.dsp.preprocess import preprocess_batch

    cfg = default_config()
    fe = MelFrontend(cfg)
    hop = fe.hop_length
    rng = np.random.default_rng(3)
    t = np.arange(45000) / cfg.sampling_rate
    base = 0.4 * np.sin(2 * np.pi * 170 * t) + 0.02 * rng.standard_normal(
        len(t)
    )
    pcm = np.round(base * 20000).astype(np.int16)
    wavs = [
        pcm[:22050],              # mid-bucket
        pcm[: 31 * hop + 7],      # F == 32 bucket, len % hop != 0
        pcm[: 31 * hop + hop - 1],  # overshoots (Fb-1)*hop: tail guard
        pcm[:5000],               # small bucket
    ]
    fused = preprocess_batch(cfg, wavs, frontend=fe)
    f0_ref = track_f0_batch(
        [w.astype(np.float32) for w in wavs],
        cfg.sampling_rate, hop, cfg.f0_min, cfg.f0_max, backend="device",
    )
    for w, (mel_f, en_f, f0_f), f0_r in zip(wavs, fused, f0_ref):
        F = len(w) // hop + 1
        assert mel_f.shape == (80, F) and en_f.shape == (F,)
        assert f0_f.shape == (F,)
        mel_s, en_s = fe(w.astype(np.float32) / cfg.max_wav_value)
        np.testing.assert_allclose(mel_f, mel_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(en_f, en_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(f0_f, f0_r[:F], rtol=0, atol=1e-4)
    # float PCM inputs with non-integer values go through unquantized
    fl = (base[:22050] * 20000.5).astype(np.float32)
    out_fl = preprocess_batch(cfg, [fl], frontend=fe)
    mel_s, _ = fe(fl / cfg.max_wav_value)
    np.testing.assert_allclose(out_fl[0][0], mel_s, rtol=1e-5, atol=1e-5)
