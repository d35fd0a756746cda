"""Phone-conditioned synthetic corpus for on-box ACOUSTIC-model training.

The vocoder corpus (tools/make_vocoder_corpus.py) generates speech-like
audio with no text conditioning — every dat_demo utterance shares one
TextGrid, so text carries no information and the acoustic model cannot
learn a text→speech mapping from it. This tool closes that gap: each
utterance is built from a RANDOM ARPAbet phone sequence, each phone maps
deterministically to a formant-synthesizer segment (phone identity →
formants / noise band / burst; speaker → base F0, formant scale,
speaking rate), and the TextGrid intervals are derived from the exact
sample counts of the synthesized segments. The result is a corpus where

  - duration is predictable from (phone, speaker-rate),
  - pitch is predictable from (speaker, position),
  - spectral content is predictable from (phone, speaker),

i.e. the STYLER objective (reference train.py:134-160) is genuinely
learnable to low mel error, unlike the fixed-text dat_demo corpus.

Also writes a WHAM!-style noise dir (band/white/low noise) so the
standard noisy-augmentation pass (data/noise_mixer.py) can run.

Usage:
  python tools/make_acoustic_corpus.py --workdir /tmp/acoustic \
      [--n_speakers 12] [--utts_per_speaker 60] [--val_per_speaker 3]
      [--seed 0] [--f0_backend device]

Writes <workdir>/raw/<spk>/*.{wav,txt}, TextGrids + the full
preprocessed tree under <workdir>/preprocessed/VCTK (vctk builder +
noise mixer), and rebalances val.txt to val_per_speaker utterances per
speaker for a meaningful held-out split.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_vocoder_corpus import (  # noqa: E402
    FRICS,
    SR,
    VOWELS,
    _envelope,
    _fricative,
    _plosive,
    _voiced,
)

# ARPAbet phone → synthesizer recipe. Vowels carry stress-1 markers the
# way MFA TextGrids do; silences use the reference's sil/sp labels
# (textgrid.py SIL_PHONES).
VOWEL_PHONES = {
    "AA1": "a",
    "IY1": "i",
    "UW1": "u",
    "EH1": "e",
    "OW1": "o",
    "AE1": "ae",
}
FRIC_PHONES = {"S": "s", "SH": "sh", "F": "f"}
PLOSIVE_PHONES = ("T",)
# sampling weights: vowel-heavy so every utterance is mostly voiced
PHONE_POOL = (
    list(VOWEL_PHONES) * 3 + list(FRIC_PHONES) * 2 + list(PLOSIVE_PHONES) * 2
)


def speaker_table(n_speakers: int, seed: int):
    """Per-speaker (base_f0, formant_scale, rate). Alternates low/high
    pitch registers like make_vocoder_corpus.build."""
    rng = np.random.default_rng(seed + 7)
    out = []
    for s in range(n_speakers):
        f0 = rng.uniform(85, 135) if s % 2 == 0 else rng.uniform(160, 260)
        fscale = rng.uniform(0.85, 1.05) if s % 2 == 0 else rng.uniform(0.95, 1.25)
        rate = rng.uniform(0.85, 1.2)
        out.append((float(f0), float(fscale), float(rate)))
    return out


def _phone_segment(phone: str, rng, base_f0: float, fscale: float, rate: float):
    """Synthesize one phone; returns (samples, label). Duration ranges are
    per-class so the duration predictor has real phone-identity signal."""
    if phone in VOWEL_PHONES:
        d = rng.uniform(0.09, 0.26) * rate
        seg = _voiced(d, base_f0 * rng.uniform(0.95, 1.08),
                      VOWEL_PHONES[phone], fscale, rng)
        seg = seg * _envelope(len(seg), rng)
    elif phone in FRIC_PHONES:
        d = rng.uniform(0.07, 0.16) * rate
        seg = _fricative(d, FRIC_PHONES[phone], rng)
        seg = seg * _envelope(len(seg), rng)
    elif phone in PLOSIVE_PHONES:
        seg = _plosive(rng)
    elif phone == "sp":
        seg = np.zeros(int(rng.uniform(0.06, 0.14) * SR))
    else:
        raise ValueError(phone)
    return np.asarray(seg, dtype=np.float64)


def make_utterance(rng, base_f0: float, fscale: float, rate: float,
                   min_s: float = 1.3, max_s: float = 2.8):
    """One utterance: edge sil + random phone sequence (+ occasional sp)
    → (wav float32, [(phone, n_samples), ...] incl. the sil edges).

    Total length is bounded at ``max_s`` (≤ ~250 mel frames at hop 256)
    so the whole corpus shares one preprocessing frame bucket and one
    (src=32, mel=256) training bucket pair — static shapes keep the
    compile count O(1) (core/config.py bucket rationale)."""
    target = rng.uniform(min_s, max_s)
    plan = [("sil", np.zeros(int(0.08 * SR)))]
    total = 0.16
    n_since_pause = 0
    last = None
    while total < target:
        p = PHONE_POOL[int(rng.integers(len(PHONE_POOL)))]
        while p == last:  # no immediate repeats (degenerate steadies)
            p = PHONE_POOL[int(rng.integers(len(PHONE_POOL)))]
        seg = _phone_segment(p, rng, base_f0, fscale, rate)
        if total + len(seg) / SR > max_s:
            break
        plan.append((p, seg))
        total += len(seg) / SR
        last = p
        n_since_pause += 1
        if n_since_pause >= 6 and total + 0.15 < max_s:
            sp = _phone_segment("sp", rng, base_f0, fscale, rate)
            plan.append(("sp", sp))
            total += len(sp) / SR
            n_since_pause = 0
            last = "sp"
    plan.append(("sil", np.zeros(int(0.08 * SR))))

    wav = np.concatenate([seg for _, seg in plan])
    peak = np.max(np.abs(wav)) + 1e-9
    wav = (wav / peak * 0.7).astype(np.float32)
    return wav, [(p, len(seg)) for p, seg in plan]


def write_textgrid(path: str, plan, total_samples: int) -> None:
    """Exact-boundary phones-tier TextGrid (MFA long format, matching
    data/textgrid.py's parser)."""
    xmax = total_samples / SR
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {xmax:.6f}",
        "tiers? <exists>",
        "size = 1",
        "item []:",
        "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"',
        "        xmin = 0",
        f"        xmax = {xmax:.6f}",
        f"        intervals: size = {len(plan)}",
    ]
    pos = 0
    for i, (phone, n) in enumerate(plan):
        lines += [
            f"        intervals [{i + 1}]:",
            f"            xmin = {pos / SR:.6f}",
            f"            xmax = {(pos + n) / SR:.6f}",
            f'            text = "{phone}"',
        ]
        pos += n
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def build_raw(workdir: str, n_speakers: int, utts_per_speaker: int,
              seed: int):
    from scipy.io import wavfile

    in_dir = os.path.join(workdir, "raw")
    out_dir = os.path.join(workdir, "preprocessed", "VCTK")
    rng = np.random.default_rng(seed)
    speakers = speaker_table(n_speakers, seed)
    for s, (f0, fscale, rate) in enumerate(speakers):
        spk = f"p{s + 1:03d}"
        os.makedirs(os.path.join(in_dir, spk), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "TextGrid", spk), exist_ok=True)
        for i in range(utts_per_speaker):
            base = f"{spk}_{i:03d}"
            wav, plan = make_utterance(rng, f0, fscale, rate)
            wavfile.write(
                os.path.join(in_dir, spk, f"{base}.wav"), SR,
                (np.clip(wav, -1, 1) * 32767).astype(np.int16),
            )
            # transcript: the phone string (no orthography exists for
            # synthetic phones; preprocessing reads phones from the
            # TextGrid, reference vctk.py:169-188)
            with open(os.path.join(in_dir, spk, f"{base}.txt"), "w") as f:
                f.write(" ".join(p for p, _ in plan if p not in ("sil", "sp")) + "\n")
            write_textgrid(
                os.path.join(out_dir, "TextGrid", spk, f"{base}.TextGrid"),
                plan, len(wav),
            )
    print(f"[corpus] raw: {n_speakers} speakers x {utts_per_speaker} utts")
    return in_dir, out_dir


def build_noise(workdir: str, seed: int) -> str:
    """WHAM!-style noise dir: band-limited, white, and low-frequency
    rumble files for the SNR mixer (data/noise_mixer.py)."""
    from scipy import signal
    from scipy.io import wavfile

    noise_dir = os.path.join(workdir, "noise")
    os.makedirs(noise_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 99)

    def _write(name, x):
        x = x / (np.abs(x).max() + 1e-9) * 0.5
        wavfile.write(os.path.join(noise_dir, name), SR,
                      (x * 32767).astype(np.int16))

    n = 8 * SR
    sos = signal.butter(6, [4000 / (SR / 2), 7000 / (SR / 2)],
                        btype="band", output="sos")
    _write("band.wav", signal.sosfilt(sos, rng.standard_normal(n)))
    _write("white.wav", rng.standard_normal(n))
    sos_lo = signal.butter(4, 300 / (SR / 2), btype="low", output="sos")
    _write("rumble.wav", signal.sosfilt(sos_lo, rng.standard_normal(n)))
    return noise_dir


def rebalance_val(out_dir: str, val_per_speaker: int) -> None:
    """Move the last N train utterances per speaker into val.txt so the
    held-out split is big enough for a quality eval (the builder's
    default keeps exactly one, reference vctk.py:129-132)."""
    def _read(name):
        with open(os.path.join(out_dir, name), encoding="utf-8") as f:
            return [ln for ln in f.read().splitlines() if ln.strip()]

    train, val = _read("train.txt"), _read("val.txt")
    per_spk = {}
    for ln in train:
        per_spk.setdefault(ln.split("_")[0], []).append(ln)
    moved = []
    for spk in sorted(per_spk):
        take = per_spk[spk][-max(val_per_speaker - 1, 0):] if val_per_speaker > 1 else []
        moved += take
    keep = [ln for ln in train if ln not in set(moved)]
    from styler_tpu.data.vctk import write_metadata

    write_metadata(keep, val + moved, out_dir)
    print(f"[corpus] split rebalanced: {len(keep)} train / {len(val) + len(moved)} val")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n_speakers", type=int, default=12)
    ap.add_argument("--utts_per_speaker", type=int, default=60)
    ap.add_argument("--val_per_speaker", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--f0_backend", default="device",
                    choices=["native", "numpy", "device"])
    args = ap.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data.noise_mixer import build_from_path as build_noisy
    from styler_tpu.data.vctk import build_from_path, write_metadata

    cfg = default_config().replace(
        preprocessed_basedir=os.path.join(args.workdir, "preprocessed")
    )
    in_dir, out_dir = build_raw(
        args.workdir, args.n_speakers, args.utts_per_speaker, args.seed
    )
    noise_dir = build_noise(args.workdir, args.seed)

    train, val = build_from_path(in_dir, out_dir, cfg,
                                 f0_backend=args.f0_backend)
    write_metadata(train, val, out_dir)
    build_noisy(in_dir, out_dir, cfg, noise_dir=noise_dir)
    rebalance_val(out_dir, args.val_per_speaker)
    print(f"[corpus] done: {out_dir}")


if __name__ == "__main__":
    main()
