"""Native C++ f0 tracker (native/styler_dsp.cpp) vs the numpy golden model."""

import ctypes
import os

import numpy as np
import pytest

from styler_tpu.dsp.pitch import _frame_f0_numpy, _load_native, track_f0

SR, HOP = 22050, 256


def _synthetic_voiced(sr=SR, seconds=1.2, f0_hz=150.0, seed=0):
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(seed)
    # harmonic-rich signal with an unvoiced (noise) gap in the middle
    wav = sum(
        (0.6 / (k + 1)) * np.sin(2 * np.pi * f0_hz * (k + 1) * t) for k in range(4)
    )
    gap = slice(int(0.5 * sr), int(0.7 * sr))
    wav[gap] = 0.05 * rng.standard_normal(gap.stop - gap.start)
    return (wav * 0.5).astype(np.float32)


needs_native = pytest.mark.skipif(
    _load_native() is None, reason="native library not built"
)


@needs_native
def test_native_matches_numpy_clean():
    wav = _synthetic_voiced()
    f_native = track_f0(wav, SR, HOP, backend=None)
    f_numpy = _frame_f0_numpy(wav, SR, HOP, 71.0, 797.9, robust=False)
    assert f_native.shape == f_numpy.shape
    both_voiced = (f_native > 0) & (f_numpy > 0)
    # voicing decisions agree on ≥95% of frames; voiced values within 2 Hz
    agree = (f_native > 0) == (f_numpy > 0)
    assert agree.mean() > 0.95, f"voicing agreement {agree.mean():.3f}"
    assert np.abs(f_native[both_voiced] - f_numpy[both_voiced]).max() < 2.0


@needs_native
def test_native_matches_numpy_robust():
    rng = np.random.default_rng(3)
    wav = _synthetic_voiced(f0_hz=220.0)
    wav = wav + 0.1 * rng.standard_normal(len(wav)).astype(np.float32)
    f_native = track_f0(wav, SR, HOP, robust=True)
    f_numpy = _frame_f0_numpy(wav, SR, HOP, 71.0, 797.9, robust=True)
    both = (f_native > 0) & (f_numpy > 0)
    assert ((f_native > 0) == (f_numpy > 0)).mean() > 0.9
    if both.any():
        assert np.abs(f_native[both] - f_numpy[both]).max() < 2.0


@needs_native
def test_native_finds_true_pitch():
    for hz in (110.0, 150.0, 320.0):
        wav = _synthetic_voiced(f0_hz=hz)
        f = track_f0(wav, SR, HOP)
        voiced = f[f > 0]
        assert len(voiced) > 20
        assert abs(np.median(voiced) - hz) < 3.0, f"{hz=} got {np.median(voiced)}"


@needs_native
def test_native_batch_api():
    lib = _load_native()
    lib.styler_track_f0_batch.restype = ctypes.c_int
    wavs = [_synthetic_voiced(f0_hz=hz, seconds=0.8) for hz in (120.0, 240.0)]
    lengths = np.array([len(w) for w in wavs], dtype=np.int32)
    cat = np.concatenate(wavs).astype(np.float32)
    n_out = int(sum(len(w) // HOP + 1 for w in wavs))
    out = np.zeros(n_out, dtype=np.float32)
    rc = lib.styler_track_f0_batch(
        cat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        2, SR, HOP,
        ctypes.c_float(71.0), ctypes.c_float(797.9),
        0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert rc == 0
    off = 0
    for w in wavs:
        nf = len(w) // HOP + 1
        single = track_f0(w, SR, HOP)
        chunk = out[off: off + nf]
        both = (chunk > 0) & (single > 0)
        assert ((chunk > 0) == (single > 0)).mean() > 0.95
        assert np.abs(chunk[both] - single[both]).max() < 1.0
        off += nf


@needs_native
def test_native_rejects_bad_args():
    lib = _load_native()
    rc = lib.styler_track_f0(None, 0, SR, HOP, ctypes.c_float(71.0),
                             ctypes.c_float(797.9), 0, None)
    assert rc == 1


def test_track_f0_batch_python_api():
    """dsp.pitch.track_f0_batch matches per-utterance track_f0 on every
    backend (native when built, numpy fallback otherwise)."""
    from styler_tpu.dsp.pitch import track_f0_batch

    wavs = [
        _synthetic_voiced(f0_hz=hz, seconds=s)
        for hz, s in ((120.0, 0.8), (200.0, 1.0), (300.0, 0.9))
    ]
    batch = track_f0_batch(wavs, SR, HOP)
    assert len(batch) == len(wavs)
    for w, got in zip(wavs, batch):
        single = track_f0(w, SR, HOP)
        assert got.shape == single.shape == (len(w) // HOP + 1,)
        both = (got > 0) & (single > 0)
        assert ((got > 0) == (single > 0)).mean() > 0.95
        if both.any():
            assert np.abs(got[both] - single[both]).max() < 1.0


def test_track_f0_batch_numpy_backend():
    from styler_tpu.dsp.pitch import track_f0_batch

    wavs = [_synthetic_voiced(f0_hz=150.0, seconds=0.8)]
    got = track_f0_batch(wavs, SR, HOP, backend="numpy")[0]
    single = track_f0(wavs[0], SR, HOP, backend="numpy")
    np.testing.assert_array_equal(got, single)


# ----------------------------------------------------------------------
# native resampler (styler_resample) vs scipy.signal.resample_poly
# ----------------------------------------------------------------------


def test_resample_matches_scipy_golden():
    """The native polyphase resampler replicates scipy resample_poly's
    default (kaiser 5.0) design numerically."""
    from scipy.signal import resample_poly

    from styler_tpu.dsp.resample import _lib, resample, resample_len

    if _lib() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    for sr_in, sr_out in ((48000, 22050), (16000, 22050), (44100, 22050)):
        x = rng.standard_normal(sr_in // 2).astype(np.float32)
        got = resample(x, sr_in, sr_out)
        from math import gcd

        g = gcd(sr_in, sr_out)
        golden = resample_poly(x.astype(np.float64), sr_out // g, sr_in // g)
        assert got.shape == golden.shape == (resample_len(len(x), sr_in, sr_out),)
        np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


def test_resample_preserves_sine():
    """A 440 Hz tone stays a 440 Hz tone (amplitude within 1%) through
    48k -> 22.05k, checked via zero-crossing rate."""
    from styler_tpu.dsp.resample import resample

    sr_in, sr_out, f = 48000, 22050, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    mid = y[len(y) // 4 : -len(y) // 4]
    assert abs(mid.max() - 1.0) < 0.01 and abs(mid.min() + 1.0) < 0.01
    crossings = np.sum(np.diff(np.signbit(mid)))
    f_est = crossings / 2 * sr_out / len(mid)
    assert abs(f_est - f) < 2.0


def test_resample_identity_and_cli(tmp_path):
    """sr_in == sr_out copies; the CLI tool round-trips a wav tree."""
    import subprocess
    import sys

    from scipy.io import wavfile

    from styler_tpu.dsp.resample import resample

    x = np.linspace(-0.5, 0.5, 1000).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 22050, 22050), x)

    src_dir = tmp_path / "in" / "spk1"
    src_dir.mkdir(parents=True)
    sr_in = 48000
    t = np.arange(sr_in // 4) / sr_in
    wav = (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    wavfile.write(str(src_dir / "a.wav"), sr_in, wav)

    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "cli/resample.py", "--in_dir", str(tmp_path / "in"),
         "--out_dir", str(out_dir), "--sr", "22050", "--jobs", "1"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert r.returncode == 0, r.stderr
    sr, data = wavfile.read(str(out_dir / "spk1" / "a.wav"))
    assert sr == 22050 and data.dtype == np.int16
    assert abs(len(data) - (sr_in // 4) * 22050 // sr_in) <= 1
    assert 0.3 < np.abs(data / 32767.0).max() < 0.5
