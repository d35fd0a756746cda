"""WHAM! noise augmentation CLI (reference preprocess_noisy.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--noise_dir", type=str, default=None)
    parser.add_argument("--snr_lower", type=int, default=5)
    parser.add_argument("--snr_upper", type=int, default=25)
    args = parser.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data import noise_mixer

    cfg = default_config()
    in_dir = args.data_dir or cfg.data_dir
    out_dir = args.out_dir or cfg.preprocessed_path
    noise_mixer.build_from_path(
        in_dir, out_dir, cfg,
        noise_dir=args.noise_dir,
        snr_lower=args.snr_lower,
        snr_upper=args.snr_upper,
    )


if __name__ == "__main__":
    main()
