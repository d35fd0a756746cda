"""Export a natively-trained vocoder generator to a committed repo asset.

Converts an orbax checkpoint (cli/train_vocoder.py output) into one
compressed .npz of float16 leaves (core/checkpoint.py:save_vocoder_npz),
small enough to commit, loadable with numpy alone. bench.py picks these
up from assets/vocoder/ to measure the vocoder lines on TRAINED weights.

Usage:
  python tools/export_vocoder_asset.py --ckpt /tmp/voc_run_istft \
      --out assets/vocoder/istft_gen.npz
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from styler_tpu.core.checkpoint import (
        load_vocoder_npz,
        load_vocoder_params,
        save_vocoder_npz,
    )

    params = load_vocoder_params(args.ckpt)
    save_vocoder_npz(args.out, params)
    back = load_vocoder_npz(args.out)  # round-trip sanity
    import jax

    n = sum(v.size for v in jax.tree_util.tree_leaves(back))
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: {n / 1e6:.2f} M params, {mb:.1f} MB "
          "(f16 compressed)")


if __name__ == "__main__":
    main()
