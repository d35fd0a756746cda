"""Held-out quality evaluation for natively-trained vocoder generators.

Loads a checkpoint from cli/train_vocoder.py (orbax dir of numbered
steps) and measures, on a held-out wav directory:

  mel_recon_mae  — L1 between the log-mel of the SYNTHESIZED waveform
                   (generator fed the ground-truth mel) and the
                   ground-truth log-mel, masked to true frames. The
                   mel-parity metric of record (BASELINE.md north star
                   uses the same mel-MAE currency).
  mr_stft        — multi-resolution STFT loss (spectral convergence +
                   log-magnitude L1) vs the ground-truth waveform.

Usage:
  python tools/vocoder_eval.py --ckpt /tmp/voc_run_istft --arch istft \
      --wav_dir /tmp/voc_corpus/val [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--arch", choices=["hifigan", "istft"], default="hifigan")
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--max_files", type=int, default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from styler_tpu.core.checkpoint import load_vocoder_params
    from styler_tpu.core.config import default_config
    from styler_tpu.data.audio_io import read_wav
    from styler_tpu.dsp.mel import MelFrontend
    from styler_tpu.train.vocoder import make_mr_stft_loss_fn

    cfg = default_config()
    fe = MelFrontend(cfg)
    params = load_vocoder_params(args.ckpt)

    if args.arch == "istft":
        from styler_tpu.vocoder.istft_net import ISTFTNetConfig, ISTFTNetGenerator

        gen = ISTFTNetGenerator(ISTFTNetConfig(), compute_dtype=jnp.float32)
    else:
        from styler_tpu.vocoder.hifigan import Generator

        gen = Generator(compute_dtype=jnp.float32)

    paths = sorted(
        os.path.join(args.wav_dir, f)
        for f in os.listdir(args.wav_dir)
        if f.lower().endswith(".wav")
    )
    if args.max_files:
        paths = paths[: args.max_files]
    wavs = []
    for p in paths:
        audio, sr = read_wav(p)
        assert sr == cfg.sampling_rate, (p, sr)
        wavs.append(audio.astype(np.float32))
    mels = [m.T for (m, _) in fe.batch(wavs)]  # [F, 80]

    apply_jit = jax.jit(lambda v, m: gen.apply(v, m))
    mr_fn = jax.jit(make_mr_stft_loss_fn())

    # frame-bucket the mels so each shape compiles once
    def bucket(F):
        b = 64
        while b < F:
            b *= 2
        return b

    mae_num = mae_den = 0.0
    mr_total = 0.0
    hop = cfg.hop_length
    for wav, mel in zip(wavs, mels):
        F = mel.shape[0]
        Fb = bucket(F)  # all shapes bucketed: ~2 compiles total
        Tb = Fb * hop
        mpad = np.pad(mel, ((0, Fb - F), (0, 0)))
        wav_hat = np.asarray(apply_jit({"params": params}, mpad[None]))[0]
        wav_t = np.pad(wav, (0, max(0, Tb - len(wav))))[:Tb]
        mel_hat, _ = fe(wav_hat[: F * hop])
        mel_hat = np.asarray(mel_hat).T[:F]  # [F, 80]
        mae_num += float(np.abs(mel_hat - mel).sum())
        mae_den += mel.size
        # both signals zero-padded to the same bucketed length: the
        # padding frames contribute ~0 to either MR-STFT term
        mr_total += float(
            mr_fn(jnp.asarray(wav_hat[None, :Tb]), jnp.asarray(wav_t[None]))
        )

    out = {
        "ckpt": os.path.abspath(args.ckpt),
        "arch": args.arch,
        "n_files": len(wavs),
        "mel_recon_mae": round(mae_num / mae_den, 5),
        "mr_stft": round(mr_total / len(wavs), 4),
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
