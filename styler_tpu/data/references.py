"""Reference-audio preprocessing (reference data/references.py,
preprocess_refs.py): same extraction as VCTK for a flat dir of wav+txt
pairs, plus the ``wav_tg_pairs.txt`` mapping. Noisy-reference variant
mixes WHAM! noise into each reference (data/noise_mixer_refs.py)."""

from __future__ import annotations

import glob
import os
import random
from typing import List, Optional, Tuple

import numpy as np

from styler_tpu.core.config import Config
from styler_tpu.data.audio_io import audioread, audiowrite, read_wav_int
from styler_tpu.data.noise_mixer import mix_clean_with_noise
from styler_tpu.data.textgrid import alignment_from_file
from styler_tpu.data.vctk import prepare_align  # same transcript cleaning
from styler_tpu.dsp.features import energy_rescaling_np, f0_normalization_np
from styler_tpu.dsp.mel import MelFrontend
from styler_tpu.dsp.pitch import get_f0

__all__ = ["prepare_align", "build_from_path", "build_noisy_refs"]

SUBDIRS = ("mel", "alignment", "f0", "f0_norm", "energy", "energy_0to1")


def process_utterance(
    in_dir: str, out_dir: str, basename: str, config: Config, frontend: MelFrontend
) -> Optional[Tuple[str, float, float, float, float, int]]:
    wav_path = os.path.join(in_dir, f"{basename}.wav")
    tg_path = os.path.join(out_dir, "TextGrid", f"{basename}.TextGrid")

    phone, duration, start, end = alignment_from_file(
        tg_path, config.sampling_rate, config.hop_length
    )
    text = "{" + "}{".join(phone) + "}"
    text = text.replace("{$}", " ").replace("}{", " ")
    if start >= end:
        return None

    _, wav = read_wav_int(wav_path)
    wav = wav[
        int(config.sampling_rate * start): int(config.sampling_rate * end)
    ].astype(np.float32)

    total = sum(duration)
    f0 = get_f0(wav, config, duration)
    mel, energy = frontend(np.asarray(wav) / config.max_wav_value)
    mel = np.asarray(mel).astype(np.float32)[:, :total]
    energy = np.asarray(energy).astype(np.float32)[:total]
    if mel.shape[1] >= config.max_seq_len:
        return None

    ds = config.dataset
    np.save(os.path.join(out_dir, "alignment", f"{ds}-ali-{basename}.npy"),
            np.asarray(duration), allow_pickle=False)
    np.save(os.path.join(out_dir, "f0", f"{ds}-f0-{basename}.npy"), f0,
            allow_pickle=False)
    np.save(os.path.join(out_dir, "f0_norm", f"{ds}-f0-{basename}.npy"),
            f0_normalization_np(f0), allow_pickle=False)
    np.save(os.path.join(out_dir, "energy", f"{ds}-energy-{basename}.npy"),
            energy, allow_pickle=False)
    np.save(os.path.join(out_dir, "energy_0to1", f"{ds}-energy-{basename}.npy"),
            energy_rescaling_np(energy, config.energy_min, config.energy_max),
            allow_pickle=False)
    np.save(os.path.join(out_dir, "mel", f"{ds}-mel-{basename}.npy"),
            mel.T, allow_pickle=False)

    voiced = [f for f in f0 if f != 0]
    return (
        "|".join([basename, text]),
        float(max(f0)) if len(f0) else 0.0,
        float(min(voiced)) if voiced else 0.0,
        float(max(energy)) if len(energy) else 0.0,
        float(min(energy)) if len(energy) else 0.0,
        mel.shape[1],
    )


def build_from_path(in_dir: str, out_dir: str, config: Config):
    """Process a flat wav+txt reference dir (references.py:29-79);
    writes <dirname>.txt filelist + wav_tg_pairs.txt."""
    for d in SUBDIRS:
        os.makedirs(os.path.join(out_dir, d), exist_ok=True)
    frontend = MelFrontend(config)

    ref_dir_name = os.path.basename(in_dir.rstrip("/"))
    basenames: List[str] = []
    audio_paths = sorted(glob.glob(os.path.join(in_dir, "*.wav")))
    filelist: List[str] = []
    for ref_path in audio_paths:
        basename = os.path.basename(ref_path).replace(".wav", "")
        txt_path = ref_path.replace(".wav", ".txt")
        if os.path.exists(txt_path):
            with open(txt_path, encoding="utf-8") as f:
                filelist.append("|".join([basename, f.readline().strip()]))
        try:
            ret = process_utterance(in_dir, out_dir, basename, config, frontend)
            if ret is not None:
                basenames.append(basename)
        except Exception as e:
            print(f"Can't process: {basename} ({e})")

    with open(os.path.join(out_dir, f"{ref_dir_name}.txt"), "w", encoding="utf-8") as f:
        for row in filelist:
            f.write(row + "\n")
    with open(os.path.join(out_dir, "wav_tg_pairs.txt"), "w", encoding="utf-8") as f:
        for audio_path in audio_paths:
            basename = os.path.basename(audio_path).replace(".wav", "")
            if basename in basenames:
                tg = os.path.join(out_dir, "TextGrid", basename + ".TextGrid")
                f.write("|".join([audio_path, tg]) + "\n")
    return basenames, audio_paths


def build_noisy_refs(
    in_dir: str,
    out_dir: str,
    config: Config,
    noise_dir: Optional[str] = None,
    snr_lower: int = 5,
    snr_upper: int = 25,
) -> List[str]:
    """WHAM!-mix each reference wav and write noisy wavs + a filelist with
    SNR/noise name (reference data/noise_mixer_refs.py:103-196)."""
    random.seed(9420)
    noise_dir = noise_dir or config.noise_dir
    noise_files = glob.glob(os.path.join(noise_dir, "*.wav"))
    assert noise_files, f"no noise wavs in {noise_dir}"
    random.shuffle(noise_files)

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for idx, ref_path in enumerate(sorted(glob.glob(os.path.join(in_dir, "*.wav")))):
        basename = os.path.basename(ref_path).replace(".wav", "")
        clean, sr, _ = audioread(ref_path, norm=False)
        noisy, snr, noise_name = mix_clean_with_noise(
            clean, noise_files, idx, snr_lower, snr_upper
        )
        out_wav = os.path.join(out_dir, f"{basename}_SNRdb_{snr}_{noise_name}.wav")
        audiowrite(noisy, config.sampling_rate, out_wav)
        txt_path = ref_path.replace(".wav", ".txt")
        if os.path.exists(txt_path):
            out_txt = out_wav.replace(".wav", ".txt")
            with open(txt_path, encoding="utf-8") as fi, open(out_txt, "w", encoding="utf-8") as fo:
                fo.write(fi.read())
        rows.append("|".join([basename, str(snr), noise_name]))
    with open(os.path.join(out_dir, "noisy_refs.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))
    return rows
