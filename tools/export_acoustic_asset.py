"""Export a natively-trained STYLER acoustic model to a committed asset.

Converts an orbax train checkpoint (cli/train.py output: params +
batch_stats + opt_state) into one compressed .npz of float16 leaves
(core/checkpoint.py:save_acoustic_npz) — the committable analog of the
reference's published 560k-step checkpoint (reference README.md:14-15).
`load_synthesizer` resolves assets/acoustic/styler_gen.npz by default,
so committing the export makes the whole serving pipeline trained.

Usage:
  python tools/export_acoustic_asset.py --ckpt /tmp/run/ckpt/<step> \
      --out assets/acoustic/styler_gen.npz
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (cli/train.py layout: "
                         "<ckpt_dir>/<step>)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from styler_tpu.core.checkpoint import load_acoustic_npz, save_acoustic_npz

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
    step = int(restored.get("step", 0))
    save_acoustic_npz(args.out, restored["params"], restored["batch_stats"])
    params, stats = load_acoustic_npz(args.out)  # round-trip sanity
    import jax

    n = sum(v.size for v in jax.tree_util.tree_leaves(params))
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: step {step}, {n / 1e6:.2f} M params "
          f"(+{sum(v.size for v in jax.tree_util.tree_leaves(stats))} "
          f"batch-stat scalars), {mb:.1f} MB (f16 compressed)")


if __name__ == "__main__":
    main()
