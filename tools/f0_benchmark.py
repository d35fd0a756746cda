"""Synthetic-benchmark harness for the f0 trackers (VERDICT r1 #8).

The reference extracts f0 with pyworld DIO (clean) / pysptk RAPT (noisy)
(reference dataset.py:32-45); this repo ships a from-scratch NCCF
tracker with the same contract (dsp/pitch.py). pyworld/pysptk are not
installed here, so algorithmic parity is quantified against *synthetic
ground truth* on the signal families where DIO's published behavior is
characterized (Morise et al. 2009): steady vowels, vibrato, glissandi
(f0 ramps), low/creaky voice (jitter+shimmer), and additive-noise ramps.

Metrics (standard pitch-eval definitions, e.g. Rabiner 1976 / FDA):
  GPE  gross pitch error  — voiced frames (both) with >20% f0 deviation
  FPE  fine pitch error   — mean |cents| over non-gross voiced frames
  VDE  voicing decision error — fraction of frames misclassified v/uv
  dNORM downstream delta  — mean |f0_norm(track) - f0_norm(truth)|
        through features.f0_normalization_np, the quantity the model
        actually consumes (256-bin quantized => 1/256 = 0.0039 LSB).

Run: python tools/f0_benchmark.py [--backend native|numpy|device]
Pinned bounds live in tests/test_dsp.py::test_f0_synthetic_benchmark.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from styler_tpu.dsp.features import f0_normalization_np
from styler_tpu.dsp.pitch import track_f0

SR = 22050
HOP = 256


def glottal_wave(f0_track: np.ndarray, sr: int = SR, jitter: float = 0.0,
                 shimmer: float = 0.0, seed: int = 0) -> np.ndarray:
    """Harmonic-rich voiced signal following a per-sample f0 contour.

    Sum of ~12 harmonics with 1/h amplitude decay (glottal-like spectral
    tilt). `jitter` perturbs the instantaneous frequency per period and
    `shimmer` the amplitude (creaky-voice model, ~% std).
    """
    rng = np.random.default_rng(seed)
    n = len(f0_track)
    f_inst = f0_track.copy()
    if jitter > 0:
        # period-rate random walk approximated at 100 Hz modulation
        mod = rng.standard_normal(n // 220 + 2) * jitter
        f_inst = f_inst * (1 + np.interp(np.arange(n), np.arange(0, n, 220)[: len(mod)], mod[: len(np.arange(0, n, 220))]))
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    x = np.zeros(n)
    for h in range(1, 13):
        if (h * f_inst.max()) < sr / 2:
            x += np.sin(h * phase) / h
    if shimmer > 0:
        env = 1 + rng.standard_normal(n // 441 + 2) * shimmer
        x *= np.interp(np.arange(n), np.arange(0, n, 441)[: len(env)], env[: len(np.arange(0, n, 441))])
    return (x / np.abs(x).max() * 0.5).astype(np.float32)


def truth_frames(f0_track: np.ndarray, n_samples: int) -> np.ndarray:
    """Ground-truth f0 at hop-aligned frame centers (contract of
    dsp/pitch.track_f0: len(wav)//hop + 1 frames, frame i at sample i*hop)."""
    n_frames = n_samples // HOP + 1
    idx = np.minimum(np.arange(n_frames) * HOP, n_samples - 1)
    return f0_track[idx]


def make_cases():
    """(name, wav, truth_f0_per_frame, robust_mode) tuples."""
    dur = int(1.2 * SR)
    t = np.arange(dur)
    cases = []

    def drift(f0):
        # +-1% slow drift: real "steady" phonation is never constant, and
        # a constant track degenerates f0_normalization_np (std == 0) so
        # dNORM would compare against an all-zeros fallback
        return f0 * (1 + 0.01 * np.sin(2 * np.pi * 1.3 * t / SR))

    # steady vowels across the speaking range
    for f0 in (90.0, 120.0, 220.0, 350.0):
        track = drift(f0)
        wav = glottal_wave(track)
        cases.append((f"steady_{int(f0)}", wav, truth_frames(track, dur), False))

    # vibrato: 5.5 Hz, +-3% (operatic vibrato upper bound)
    for f0 in (140.0, 260.0):
        track = f0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t / SR))
        wav = glottal_wave(track)
        cases.append((f"vibrato_{int(f0)}", wav, truth_frames(track, dur), False))

    # glissando / f0 ramp: one octave per second up and down
    track = 110.0 * 2 ** (t / SR)
    cases.append(("ramp_up_110_220", glottal_wave(track), truth_frames(track, dur), False))
    track = 320.0 * 2 ** (-t / SR)
    cases.append(("ramp_dn_320_160", glottal_wave(track), truth_frames(track, dur), False))

    # creaky/low voice: 75 Hz with 2% jitter + 6% shimmer
    track = drift(75.0)
    wav = glottal_wave(track, jitter=0.02, shimmer=0.06, seed=1)
    cases.append(("creaky_75", wav, truth_frames(track, dur), False))

    # noise ramps: steady 150 Hz vowel in white noise, SNR 20 -> 0 dB
    rng = np.random.default_rng(7)
    track = drift(150.0)
    clean = glottal_wave(track)
    sig_pow = np.mean(clean ** 2)
    for snr_db in (20.0, 10.0, 5.0, 0.0):
        noise = rng.standard_normal(dur).astype(np.float32)
        noise *= np.sqrt(sig_pow / 10 ** (snr_db / 10) / np.mean(noise ** 2))
        cases.append((f"noise_snr{int(snr_db)}", clean + noise,
                      truth_frames(track, dur), True))

    # voiced/unvoiced alternation: 200 ms voiced / 200 ms silence
    gate = (t // int(0.2 * SR)) % 2 == 0
    track = np.where(gate, 180.0, 0.0)
    wav = glottal_wave(np.full(dur, 180.0)) * gate.astype(np.float32)
    cases.append(("vuv_alternating", wav, truth_frames(track, dur), False))

    return cases


def score(est: np.ndarray, truth: np.ndarray):
    n = min(len(est), len(truth))
    est, truth = est[:n], truth[:n]
    v_t, v_e = truth > 0, est > 0
    vde = float(np.mean(v_t != v_e))
    both = v_t & v_e
    if both.sum() == 0:
        return {"GPE": 1.0, "FPE_cents": float("nan"), "VDE": vde, "dNORM": float("nan")}
    rel = np.abs(est[both] - truth[both]) / truth[both]
    gross = rel > 0.2
    gpe = float(np.mean(gross))
    fine = est[both][~gross], truth[both][~gross]
    fpe = float(np.mean(np.abs(1200 * np.log2(fine[0] / fine[1])))) if len(fine[0]) else float("nan")
    dnorm = float(np.mean(np.abs(f0_normalization_np(est) - f0_normalization_np(truth))))
    return {"GPE": gpe, "FPE_cents": fpe, "VDE": vde, "dNORM": dnorm}


def run(backend: str | None):
    rows = {}
    for name, wav, truth, robust in make_cases():
        est = track_f0(wav, SR, HOP, robust=robust, backend=backend)
        rows[name] = score(np.asarray(est), truth)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    choices=["native", "numpy", "device"])
    args = ap.parse_args()
    rows = run(args.backend)
    for name, m in rows.items():
        print(f"{name:20s} GPE={m['GPE']:6.3f}  FPE={m['FPE_cents']:6.1f}c  "
              f"VDE={m['VDE']:6.3f}  dNORM={m['dNORM']:.4f}")
    agg = {k: float(np.nanmean([m[k] for m in rows.values()]))
           for k in ("GPE", "FPE_cents", "VDE", "dNORM")}
    print(json.dumps({"backend": args.backend or "auto", **agg}))


if __name__ == "__main__":
    main()
