"""VCTK preprocessing CLI (reference preprocess.py): clean transcripts,
run MFA, build the npy dataset, write train/val filelists."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--skip_mfa", action="store_true",
                        help="TextGrids already present")
    parser.add_argument("--skip_align_prep", action="store_true")
    parser.add_argument("--f0_backend", type=str, default=None,
                        choices=["native", "numpy", "device"],
                        help="f0 tracker: native C++ (default when "
                             "built), numpy golden model, or 'device' "
                             "(batched on-accelerator, "
                             "dsp/pitch_device.py)")
    args = parser.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data import vctk

    cfg = default_config()
    in_dir = args.data_dir or cfg.data_dir
    out_dir = args.out_dir or cfg.preprocessed_path
    vctk.ensure_dirs(out_dir)

    if not args.skip_align_prep:
        vctk.prepare_align(in_dir, cfg)
    if not args.skip_mfa:
        vctk.mfa_align(in_dir, out_dir)

    train, val = vctk.build_from_path(in_dir, out_dir, cfg,
                                      f0_backend=args.f0_backend)
    vctk.write_metadata(train, val, out_dir)
    print(f"wrote {len(train)} train / {len(val)} val entries to {out_dir}")


if __name__ == "__main__":
    main()
