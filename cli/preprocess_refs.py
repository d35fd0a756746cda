"""Reference-audio preprocessing CLI (reference preprocess_refs.py),
with --noisy to also build WHAM!-mixed noisy references
(reference preprocess_noisy.py + data/noise_mixer_refs.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--skip_mfa", action="store_true")
    parser.add_argument("--noisy", action="store_true")
    parser.add_argument("--noise_dir", type=str, default=None)
    args = parser.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data import references
    from styler_tpu.data.vctk import mfa_align

    cfg = default_config()
    in_dir = args.data_dir
    out_dir = args.out_dir or os.path.join(
        cfg.preprocessed_basedir, os.path.basename(in_dir.rstrip("/"))
    )
    os.makedirs(out_dir, exist_ok=True)

    references.prepare_align(in_dir, cfg)
    if not args.skip_mfa:
        mfa_align(in_dir, out_dir)
    basenames, audio_paths = references.build_from_path(in_dir, out_dir, cfg)
    print(f"processed {len(basenames)} references")

    if args.noisy:
        noisy_dir = out_dir.rstrip("/") + "_noisy"
        rows = references.build_noisy_refs(
            in_dir, noisy_dir, cfg, noise_dir=args.noise_dir
        )
        print(f"wrote {len(rows)} noisy references to {noisy_dir}")


if __name__ == "__main__":
    main()
