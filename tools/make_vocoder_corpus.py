"""Synthetic speech-like corpus generator for on-box vocoder training.

No real speech ships with this checkout (reference audio blobs are
stripped), so vocoder *quality* claims are demonstrated on a corpus that
is synthetic but speech-shaped: a small Klatt-style formant synthesizer
producing utterances made of

  - voiced segments: glottal pulse train (random-walk F0 contour with
    declination, per-speaker base pitch) through 3 second-order formant
    resonators + aspiration noise,
  - fricatives: band-passed noise (/s/-like high band, /sh/-like mid),
  - plosives: closure silence + wideband burst,
  - pauses,

with per-segment amplitude envelopes. The result has the three things a
neural vocoder must actually learn to reconstruct from a mel: harmonic
structure under formant envelopes, broadband noise, and transients.

Usage:
  python tools/make_vocoder_corpus.py --out /tmp/voc_corpus \
      [--n_train 240] [--n_val 24] [--seed 0]

Writes <out>/train/*.wav and <out>/val/*.wav (22050 Hz, 16-bit).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy import signal
from scipy.io import wavfile

SR = 22050

# (F1, F2, F3) Hz for a small vowel inventory (male-ish reference; a
# per-speaker scale factor shifts the whole set)
VOWELS = {
    "a": (730, 1090, 2440),
    "i": (270, 2290, 3010),
    "u": (300, 870, 2240),
    "e": (530, 1840, 2480),
    "o": (570, 840, 2410),
    "ae": (660, 1720, 2410),
}

FRICS = {"s": (3500, 8000), "sh": (1500, 4500), "f": (1000, 8000)}


def _resonator(x: np.ndarray, freq: float, bw: float) -> np.ndarray:
    """Second-order IIR resonator (Klatt formant filter)."""
    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * freq / SR
    a = [1.0, -2 * r * np.cos(theta), r * r]
    b = [1 - 2 * r * np.cos(theta) + r * r]
    return signal.lfilter(b, a, x)


def _glottal_pulses(f0: np.ndarray, rng) -> np.ndarray:
    """Impulse-train source following a per-sample F0 contour, with a
    touch of jitter, differentiated to a rough glottal-flow shape."""
    phase = np.cumsum(f0 / SR)
    pulses = np.zeros(len(f0))
    marks = np.floor(phase)
    onsets = np.where(np.diff(marks) > 0)[0]
    pulses[onsets] = 1.0
    # low-pass the impulse train a little (glottal pulse is not a delta)
    b, a = signal.butter(1, 4000 / (SR / 2))
    return signal.lfilter(b, a, pulses)


def _voiced(dur_s: float, base_f0: float, vowel: str, fscale: float, rng):
    n = int(dur_s * SR)
    # F0 contour: declination + random walk, clipped to a plausible range
    walk = np.cumsum(rng.standard_normal(n)) * 0.02
    decl = np.linspace(1.05, 0.9, n)
    f0 = np.clip(base_f0 * decl * (1 + walk * 0.05), 60, 400)
    src = _glottal_pulses(f0, rng)
    src += 0.02 * rng.standard_normal(n)  # aspiration
    f1, f2, f3 = (f * fscale for f in VOWELS[vowel])
    y = (
        _resonator(src, f1, 60)
        + 0.6 * _resonator(src, f2, 90)
        + 0.25 * _resonator(src, f3, 120)
    )
    return y


def _fricative(dur_s: float, kind: str, rng):
    n = int(dur_s * SR)
    lo, hi = FRICS[kind]
    noise = rng.standard_normal(n)
    sos = signal.butter(4, [lo / (SR / 2), min(hi / (SR / 2), 0.99)],
                        btype="band", output="sos")
    return signal.sosfilt(sos, noise) * 0.35


def _plosive(rng):
    closure = np.zeros(int(0.03 * SR))
    burst = rng.standard_normal(int(0.012 * SR))
    burst *= np.exp(-np.linspace(0, 6, len(burst)))
    return np.concatenate([closure, burst * 0.5])


def _envelope(n: int, rng) -> np.ndarray:
    """Attack-sustain-release envelope with mild random sustain tilt."""
    atk = max(int(0.015 * SR), 1)
    rel = max(int(0.03 * SR), 1)
    env = np.ones(n)
    env[:atk] = np.linspace(0, 1, atk)
    env[-rel:] *= np.linspace(1, 0, rel)
    tilt = rng.uniform(0.7, 1.0)
    env *= np.linspace(1.0, tilt, n)
    return env


def make_utterance(rng, base_f0: float, fscale: float,
                   min_s: float = 2.0, max_s: float = 4.0) -> np.ndarray:
    parts = [np.zeros(int(0.05 * SR))]
    total = 0.1
    target = rng.uniform(min_s, max_s)
    vowel_keys = list(VOWELS)
    fric_keys = list(FRICS)
    while total < target:
        kind = rng.choice(["v", "v", "v", "f", "p", "pause"])
        if kind == "v":
            d = rng.uniform(0.08, 0.35)
            seg = _voiced(d, base_f0 * rng.uniform(0.9, 1.15),
                          vowel_keys[rng.integers(len(vowel_keys))],
                          fscale, rng)
            seg *= _envelope(len(seg), rng)
        elif kind == "f":
            d = rng.uniform(0.06, 0.18)
            seg = _fricative(d, fric_keys[rng.integers(len(fric_keys))], rng)
            seg *= _envelope(len(seg), rng)
        elif kind == "p":
            seg = _plosive(rng)
            d = len(seg) / SR
        else:
            d = rng.uniform(0.05, 0.2)
            seg = np.zeros(int(d * SR))
        parts.append(seg)
        total += d
    parts.append(np.zeros(int(0.05 * SR)))
    wav = np.concatenate(parts)
    peak = np.max(np.abs(wav)) + 1e-9
    return (wav / peak * 0.7).astype(np.float32)


def build(out: str, n_train: int, n_val: int, seed: int,
          n_speakers: int = 12) -> None:
    rng = np.random.default_rng(seed)
    speakers = [
        (rng.uniform(85, 135) if s % 2 == 0 else rng.uniform(160, 260),
         rng.uniform(0.95, 1.25) if s % 2 else rng.uniform(0.85, 1.05))
        for s in range(n_speakers)
    ]
    for split, count in (("train", n_train), ("val", n_val)):
        d = os.path.join(out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            f0, fs = speakers[int(rng.integers(n_speakers))]
            wav = make_utterance(rng, f0, fs)
            wavfile.write(os.path.join(d, f"{split}_{i:04d}.wav"), SR,
                          (wav * 32767).astype(np.int16))
        secs = count * 3.0
        print(f"{split}: {count} utts (~{secs / 60:.1f} min)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=240)
    ap.add_argument("--n_val", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    build(a.out, a.n_train, a.n_val, a.seed)
