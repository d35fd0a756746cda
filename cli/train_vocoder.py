"""Vocoder (HiFi-GAN) GAN training CLI — beyond-reference capability
(the reference only loads pretrained vocoders, utils.py:250-271).

Trains / fine-tunes the JAX Generator on a directory of wavs: mels are
computed with the data pipeline's MelFrontend (batched), segments are
randomly cropped each step, and every optimizer update (D then G) is
one fused jitted program (styler_tpu/train/vocoder.py).

Usage:
  python cli/train_vocoder.py --wav_dir DIR [--steps N] [--batch_size B]
      [--segment_frames 32] [--init_ckpt generator.pth.tar]
      [--out_dir ckpt/vocoder]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav_dir", required=True,
                        help="directory tree of 22.05 kHz wavs")
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--segment_frames", type=int, default=32,
                        help="mel frames per training segment "
                             "(32 frames = 8192 samples at hop 256)")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--decay_gamma", type=float, default=0.999)
    parser.add_argument("--decay_every", type=int, default=1000)
    parser.add_argument("--mr_stft", type=float, default=0.0,
                        help="weight of the multi-resolution STFT loss "
                             "added to the generator objective (0 = off)")
    parser.add_argument("--weight_norm", action="store_true",
                        help="train in the weight-norm (g, v) "
                             "parameterization like the published HiFi-GAN "
                             "recipe (checkpoints are saved folded)")
    parser.add_argument("--arch", choices=["hifigan", "istft"],
                        default="hifigan",
                        help="generator architecture: HiFi-GAN V1 or the "
                             "2.8x-faster iSTFTNet C8C8I head")
    parser.add_argument("--init_ckpt", type=str, default=None,
                        help="warm-start generator from a torch HiFi-GAN "
                             "checkpoint (core/import_torch importer)")
    parser.add_argument("--out_dir", type=str, default="ckpt/vocoder")
    parser.add_argument("--save_every", type=int, default=5000)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--max_files", type=int, default=None)
    args = parser.parse_args()

    # training-only CLI: disable the space-to-batch pass unconditionally
    # (core/xla_flags.py — the crash is not purely batch-keyed)
    from styler_tpu.core.xla_flags import apply_workarounds

    apply_workarounds()

    import numpy as np

    import jax

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data.audio_io import read_wav
    from styler_tpu.dsp.mel import MelFrontend
    from styler_tpu.train.vocoder import (
        create_gan_state,
        make_gan_train_step,
        make_optimizer,
        sample_segments,
    )

    cfg = default_config()
    hop = cfg.hop_length

    paths = []
    for root, _, files in os.walk(args.wav_dir):
        for f in sorted(files):
            if f.lower().endswith(".wav"):
                paths.append(os.path.join(root, f))
    if args.max_files:
        paths = paths[: args.max_files]
    if not paths:
        raise SystemExit(f"no wavs under {args.wav_dir}")
    print(f"loading {len(paths)} wavs...")
    wavs = []
    for p in paths:
        audio, sr = read_wav(p)
        if sr != cfg.sampling_rate:
            from styler_tpu.dsp.resample import resample

            audio = resample(audio, sr, cfg.sampling_rate)
        if len(audio) >= (args.segment_frames + 2) * hop:
            wavs.append(audio.astype(np.float32))
    print(f"{len(wavs)} usable; computing mels (batched front end)...")
    fe = MelFrontend(cfg)
    mels = [m.T for (m, _) in fe.batch(wavs)]  # [F, n_mels] each

    gen_params = None
    if args.init_ckpt:
        if args.arch != "hifigan":
            raise SystemExit("--init_ckpt (torch HiFi-GAN) requires --arch hifigan")
        from styler_tpu.core.checkpoint import load_reference_vocoder

        gen_params = load_reference_vocoder(args.init_ckpt, "HiFi-GAN")
        print(f"warm-started generator from {args.init_ckpt}")

    generator = None
    if args.arch == "istft":
        import jax.numpy as jnp

        from styler_tpu.vocoder.istft_net import ISTFTNetConfig, ISTFTNetGenerator

        generator = ISTFTNetGenerator(ISTFTNetConfig(), compute_dtype=jnp.float32)

    opt = make_optimizer(
        args.lr, decay_gamma=args.decay_gamma, decay_every=args.decay_every
    )
    gen, disc, opt, state = create_gan_state(
        cfg, jax.random.PRNGKey(cfg.seed), args.segment_frames,
        generator=generator, gen_params=gen_params, optimizer=opt,
        weight_norm=args.weight_norm,
    )
    step_fn = make_gan_train_step(
        gen, disc, opt, cfg, mr_stft_weight=args.mr_stft,
        weight_norm=args.weight_norm,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(cfg.seed)
    log_path = os.path.join(args.out_dir, "vocoder_metrics.jsonl")
    t0 = time.time()
    for step in range(1, args.steps + 1):
        mb, wb = sample_segments(
            rng, wavs, mels, args.batch_size, args.segment_frames, hop
        )
        state, metrics = step_fn(state, mb, wb)
        if step % args.log_every == 0 or step == 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, sec=round(time.time() - t0, 2))
            print(
                f"step {step}: d={m['d_loss']:.3f} g={m['g_loss']:.3f} "
                f"mel_l1={m['g_mel_l1']:.4f} ({m['sec']}s)"
            )
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
        if step % args.save_every == 0 or step == args.steps:
            from styler_tpu.core.checkpoint import save_vocoder_params
            from styler_tpu.train.vocoder import wn_fold

            out_params = state.gen_params
            if args.weight_norm:  # checkpoints stay inference-ready
                out_params = wn_fold(out_params)
            path = save_vocoder_params(
                args.out_dir, step, jax.device_get(out_params)
            )
            print(f"saved generator -> {path}")


if __name__ == "__main__":
    main()
