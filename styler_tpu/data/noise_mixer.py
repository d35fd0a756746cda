"""WHAM! noise augmentation (reference data/noise_mixer.py).

MS-SNSD-style mixing with the reference's exact recipe: RMS-normalize
clean and noise to -25 dBFS, SNR uniform-integer in [5, 25] dB, noise
looped/concatenated (0.2 s silence joints) to the utterance length, seed
9420, noise files shuffled with a 27900-file train split
(noise_mixer.py:21,118-176). Per clean utterance it writes ``mel_aug``,
``f0_norm_aug`` (noise-robust tracker, clean-f0 fallback on degenerate
normalization, noise_mixer.py:189-204), ``energy_0to1_aug``, and asserts
the aug mel shape equals the clean mel shape (noise_mixer.py:211-212).
"""

from __future__ import annotations

import glob
import os
import random
from typing import List, Optional, Tuple

import numpy as np

from styler_tpu.core.config import Config
from styler_tpu.data.audio_io import audioread, audiowrite
from styler_tpu.data.textgrid import alignment_from_file
from styler_tpu.dsp.features import (
    energy_rescaling_np,
    f0_normalization_np,
    speaker_normalization_np,
)
from styler_tpu.dsp.mel import MelFrontend
from styler_tpu.dsp.pitch import get_f0, get_f0_noisy


def snr_mixer(
    clean: np.ndarray, noise: np.ndarray, snr: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mix at a given SNR after -25 dBFS normalization (noise_mixer.py:72-88)."""
    rmsclean = (clean**2).mean() ** 0.5
    clean = clean * (10 ** (-25 / 20) / rmsclean)
    rmsclean = (clean**2).mean() ** 0.5

    rmsnoise = (noise**2).mean() ** 0.5
    noise = noise * (10 ** (-25 / 20) / rmsnoise)
    rmsnoise = (noise**2).mean() ** 0.5

    noisescalar = np.sqrt(rmsclean / (10 ** (snr / 20)) / rmsnoise)
    noisenewlevel = noise * noisescalar
    return clean, noisenewlevel, clean + noisenewlevel


def extend_noise(
    noise: np.ndarray,
    target_len: int,
    noise_files: List[str],
    first_path: str,
    sr: int,
    silence_length: float = 0.2,
) -> np.ndarray:
    """Loop/concatenate noise to cover the utterance (noise_mixer.py:159-172)."""
    if len(noise) >= target_len:
        return noise[:target_len]
    while len(noise) <= target_len:
        aux_path = noise_files[random.randint(0, len(noise_files) - 1)]
        if aux_path == first_path:
            continue
        newnoise, sr_new, _ = audioread(aux_path)
        noise = np.append(
            np.append(noise, np.zeros(int(sr_new * silence_length))), newnoise
        )
    return noise[:target_len]


def mix_clean_with_noise(
    clean: np.ndarray,
    noise_files: List[str],
    idx: int,
    snr_lower: int = 5,
    snr_upper: int = 25,
) -> Tuple[np.ndarray, int, str]:
    """One augmented utterance; returns (noisy, snr, noise_name)."""
    noise_path = noise_files[idx % len(noise_files)]
    noise_name = os.path.basename(noise_path).replace(".wav", "")
    noise, _, _ = audioread(noise_path)
    noise = extend_noise(noise, len(clean), noise_files, noise_path, 22050)
    snr = random.randint(snr_lower, snr_upper)
    _, _, noisy = snr_mixer(clean, noise, snr)
    return noisy, snr, noise_name


def compute_aug_features(
    noisy: np.ndarray,
    f0_clean: np.ndarray,
    duration: List[int],
    config: Config,
    frontend: MelFrontend,
):
    """(mel_aug.T, f0_aug, f0_norm_aug, energy, energy_0to1_aug)
    (reference compute_mel, noise_mixer.py:178-216)."""
    total = sum(duration)
    mel, energy = frontend(np.clip(noisy, -1.0, 1.0))
    mel = np.asarray(mel).astype(np.float32)[:, :total]
    energy = np.asarray(energy).astype(np.float32)[:total]
    energy_rescaled = energy_rescaling_np(energy, config.energy_min, config.energy_max)

    f0 = get_f0_noisy(noisy, config, duration)
    with np.errstate(all="raise"):
        try:
            f0_norm = speaker_normalization_np(f0)
        except FloatingPointError:
            # reference noise_mixer.py:197-204 falls back to the clean
            # f0; its last resort for degenerate clean f0 is the zeros
            # guard of utils.f0_normalization (utils.py:400-407)
            f0_norm = f0_normalization_np(f0_clean)
    return mel.T, f0, f0_norm, energy, energy_rescaled


def build_from_path(
    in_dir: str,
    out_dir: str,
    config: Config,
    noise_dir: Optional[str] = None,
    snr_lower: int = 5,
    snr_upper: int = 25,
    save_aux_max: int = 10,
) -> int:
    """Augment every utterance listed in train.txt/val.txt
    (reference noise_mixer.py:118-304). Returns count processed."""
    random.seed(9420)
    noise_dir = noise_dir or config.noise_dir
    frontend = MelFrontend(config)

    noise_files = glob.glob(os.path.join(noise_dir, "*.wav"))
    print("Number of total noise files:", len(noise_files))
    random.shuffle(noise_files)
    train_divider = min(27900, max(1, len(noise_files) - 1))
    noise_train = noise_files[:train_divider]
    noise_val = noise_files[train_divider:] or noise_files[-1:]

    os.makedirs(os.path.join(out_dir, "mel_aug"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "f0_norm_aug"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "energy_0to1_aug"), exist_ok=True)
    aux_dir = os.path.join(out_dir, "noise_mixer_results")
    os.makedirs(aux_dir, exist_ok=True)

    processed = 0
    for split, noise_pool in (("train.txt", noise_train), ("val.txt", noise_val)):
        meta = os.path.join(out_dir, split)
        if not os.path.isfile(meta):
            continue
        with open(meta, encoding="utf-8") as f:
            basenames = [line.split("|")[0] for line in f if line.strip()]
        for idx, basename in enumerate(basenames):
            speaker = basename.split("_")[0]
            wav_path = os.path.join(in_dir, speaker, f"{basename}.wav")
            tg_path = os.path.join(
                out_dir, "TextGrid", speaker, f"{basename}.TextGrid"
            )
            if not (os.path.exists(wav_path) and os.path.exists(tg_path)):
                continue
            _, duration, start, end = alignment_from_file(
                tg_path, config.sampling_rate, config.hop_length
            )
            clean, sr, _ = audioread(wav_path, norm=False)
            clean = clean[
                int(config.sampling_rate * start): int(config.sampling_rate * end)
            ]
            f0_clean = get_f0(
                (clean * config.max_wav_value).astype(np.float32) / config.max_wav_value,
                config,
                duration,
            )
            noisy, snr, noise_name = mix_clean_with_noise(
                clean, noise_pool, idx, snr_lower, snr_upper
            )
            mel_aug, _, f0_norm_aug, _, e01_aug = compute_aug_features(
                noisy, f0_clean, duration, config, frontend
            )

            ds = config.dataset
            clean_mel_path = os.path.join(out_dir, "mel_clean", f"{ds}-mel-{basename}.npy")
            if os.path.exists(clean_mel_path):
                mel_clean = np.load(clean_mel_path)
                assert mel_clean.shape == mel_aug.shape, (
                    f"aug mel {mel_aug.shape} != clean mel {mel_clean.shape}"
                )
            np.save(os.path.join(out_dir, "mel_aug", f"{ds}-mel-{basename}.npy"),
                    mel_aug, allow_pickle=False)
            np.save(os.path.join(out_dir, "f0_norm_aug", f"{ds}-f0-{basename}.npy"),
                    f0_norm_aug, allow_pickle=False)
            np.save(os.path.join(out_dir, "energy_0to1_aug", f"{ds}-energy-{basename}.npy"),
                    e01_aug, allow_pickle=False)
            if processed < save_aux_max:
                audiowrite(
                    noisy,
                    config.sampling_rate,
                    os.path.join(aux_dir, f"{basename}_a_SNRdb_{snr}_{noise_name}.wav"),
                )
            processed += 1
    print(f"noise_mixer: processed {processed} utterances")
    return processed
