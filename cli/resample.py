"""Resample a wav corpus tree to the model sample rate, ffmpeg-free.

Mirrors the directory layout like the reference's data/resample.sh
(reference repo root resample.sh) but runs in-process via the native
polyphase resampler (native/styler_dsp.cpp:styler_resample; scipy
fallback). Handles .wav only — for .flac corpora (VCTK 0.92 ships flac)
use styler_tpu/data/resample.sh (ffmpeg) or convert to wav first.

Usage: python cli/resample.py --in_dir IN --out_dir OUT [--sr 22050] [--jobs N]
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _convert(src: str, dst: str, sr_out: int) -> int:
    import numpy as np
    from scipy.io import wavfile

    from styler_tpu.data.audio_io import read_wav
    from styler_tpu.dsp.resample import resample

    wav, sr_in = read_wav(src)  # the data pipeline's int->float contract
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    out = resample(wav, int(sr_in), sr_out)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    pcm = np.clip(out * 32767.0, -32768, 32767).astype(np.int16)
    wavfile.write(dst, sr_out, pcm)
    return len(out)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--in_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--sr", type=int, default=22050)
    parser.add_argument("--jobs", type=int, default=os.cpu_count() or 1,
                        help="concurrent files (the native resampler "
                             "releases the GIL)")
    args = parser.parse_args()

    tasks = []
    for root, _, files in os.walk(args.in_dir):
        for f in sorted(files):
            if not f.lower().endswith(".wav"):
                continue
            src = os.path.join(root, f)
            rel = os.path.relpath(src, args.in_dir)
            tasks.append((src, os.path.join(args.out_dir, rel)))

    done = 0
    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        for _ in ex.map(lambda t: _convert(t[0], t[1], args.sr), tasks):
            done += 1
    print(f"resampled {done} wav files to {args.sr} Hz under {args.out_dir}")


if __name__ == "__main__":
    main()
