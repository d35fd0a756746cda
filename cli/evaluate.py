"""Evaluation CLI (reference evaluate.py): teacher-forced val-set losses."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--version", type=str, default="")
    parser.add_argument("--preprocessed", type=str, default=None)
    parser.add_argument("--max_batches", type=int, default=None)
    args = parser.parse_args()

    import numpy as np

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data.dataset import Dataset, batch_iterator, strip_host_fields
    from styler_tpu.train import create_train_state, make_jitted_eval_step
    import jax

    cfg = default_config().replace(version=args.version)
    if args.preprocessed:
        cfg = cfg.replace(preprocessed_basedir=args.preprocessed)

    dataset = Dataset(cfg, "val.txt", sort=False)
    first = strip_host_fields(
        next(batch_iterator(dataset, cfg, shuffle=False, drop_last=False))
    )
    from cli.train import _forward_only

    model, state = create_train_state(cfg, jax.random.PRNGKey(0), _forward_only(first))
    if args.ckpt and args.ckpt.endswith((".pth.tar", ".pth", ".tar")):
        from styler_tpu.core.checkpoint import load_reference_checkpoint

        params, batch_stats = load_reference_checkpoint(args.ckpt, cfg)
        state = state.replace(params=params, batch_stats=batch_stats)
    elif args.restore_step:
        from styler_tpu.core.checkpoint import restore_checkpoint

        state = restore_checkpoint(cfg.checkpoint_path(), args.restore_step, state)

    eval_fn = make_jitted_eval_step(model, cfg)
    sums, count = {}, 0
    for batch in batch_iterator(dataset, cfg, shuffle=False, drop_last=False):
        comps = eval_fn(state, strip_host_fields(batch))
        for k, v in comps.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        if args.max_batches and count >= args.max_batches:
            break

    for k in sorted(sums):
        print(f"{k}: {sums[k] / max(count, 1):.5f}")


if __name__ == "__main__":
    main()
