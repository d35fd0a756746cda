"""Export an AOT serving bundle (StableHLO programs + weights).

Serializes one jitted text+reference->waveform program per
(src_bucket, mel_bucket) pair via jax.export, so a serving process can
run synthesis without the model-building code (see
styler_tpu/core/export.py). No reference equivalent — its serving path
re-runs eager PyTorch per sentence (reference synthesize.py:344-385).

Usage:
  python cli/export.py --ckpt ckpt/VCTK/v1/100000 --out bundle/ \
      [--vocoder_ckpt g.pth.tar] [--platforms tpu cpu] [--fused] \
      [--batch 1] [--src_buckets 64 128] [--mel_buckets 512 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--vocoder_ckpt", type=str, default=None)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--version", type=str, default="")
    parser.add_argument("--vocoder", type=str, default=None,
                        choices=["HiFi-GAN", "MelGAN", "WaveGlow", "iSTFTNet"])
    parser.add_argument(
        "--batch", type=int, nargs="+", default=[1],
        help="batch sizes to export (e.g. --batch 1 8: interactive "
        "requests use the 1-programs, batched serve requests keep "
        "single-dispatch batching through the 8-programs)",
    )
    parser.add_argument("--src_buckets", type=int, nargs="+", default=None)
    parser.add_argument("--mel_buckets", type=int, nargs="+", default=None)
    parser.add_argument(
        "--platforms", type=str, nargs="+", default=None,
        help="lowering platforms (e.g. 'tpu cpu' for a cross-platform "
        "bundle); default = the current backend only",
    )
    parser.add_argument(
        "--fused", action="store_true",
        help="bake the Pallas fused-vocoder path into the artifact "
        "(TPU-only; fastest)",
    )
    args = parser.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.core.export import save_serving_bundle
    from styler_tpu.synthesis import load_synthesizer

    cfg = default_config().replace(version=args.version)
    if args.src_buckets:
        cfg = cfg.replace(src_buckets=tuple(args.src_buckets))
    if args.mel_buckets:
        cfg = cfg.replace(mel_buckets=tuple(args.mel_buckets))

    synth = load_synthesizer(cfg, args.ckpt, args.vocoder_ckpt,
                             vocoder_arch=args.vocoder)
    t0 = time.perf_counter()
    manifest = save_serving_bundle(
        synth,
        args.out,
        src_buckets=args.src_buckets,
        mel_buckets=args.mel_buckets,
        batch=tuple(args.batch),
        platforms=args.platforms,
        fused=args.fused,
    )
    size = sum(
        os.path.getsize(os.path.join(args.out, f)) for f in os.listdir(args.out)
    )
    print(
        f"exported {len(manifest['entries'])} programs to {args.out} "
        f"({size / 1e6:.1f} MB) in {time.perf_counter() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
