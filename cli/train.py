"""Training CLI (reference train.py surface: --restore_step, --batch_size,
--version) driving the jitted data-parallel train step."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0,
                        help="checkpoint step to resume from; -1 = latest")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace for N steps "
                             "(written under <log_path>/profile)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--version", type=str, default="")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--preprocessed", type=str, default=None,
                        help="override preprocessed base dir")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: coordinator host:port for "
                             "jax.distributed (one process per host)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--bf16", action="store_true",
                        help="mixed precision: bf16 compute in the "
                             "matmul/conv-heavy model paths (params, "
                             "norms, LSTMs, losses, optimizer stay f32)")
    args = parser.parse_args()

    # XLA:TPU's space-to-batch pass crashes on the backprop convs at small
    # batch sizes (see core/xla_flags.py). It is also a small-batch conv
    # OPTIMIZATION, so only disable it where the crash bites — keeping the
    # 4x inference speedup it provides elsewhere.
    if (args.batch_size or 16) < 8:
        from styler_tpu.core.xla_flags import apply_workarounds

        apply_workarounds()

    import jax
    import numpy as np

    from styler_tpu.core.config import default_config
    from styler_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
    from styler_tpu.data.dataset import (
        Dataset,
        batch_iterator,
        prefetch,
        strip_host_fields,
    )
    from styler_tpu.parallel import (
        init_distributed,
        make_hybrid_mesh,
        make_mesh,
        replicate_state,
        shard_batch,
    )

    if init_distributed(args.coordinator, args.num_processes, args.process_id):
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()},"
            f" {jax.device_count()} global devices"
        )
    from styler_tpu.train import create_train_state, eval_step, make_jitted_train_step
    from styler_tpu.utils import (
        StepTimer,
        SummaryLogger,
        alignment_2d_from_durations,
        figure_to_array,
        plot_alignment,
        plot_spectrogram,
    )

    cfg = default_config().replace(version=args.version)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    if args.epochs:
        cfg = cfg.replace(epochs=args.epochs)
    if args.preprocessed:
        cfg = cfg.replace(preprocessed_basedir=args.preprocessed)
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")

    dataset = Dataset(cfg, "train.txt")
    val_dataset = Dataset(cfg, "val.txt")
    print(f"train: {len(dataset)} utterances, val: {len(val_dataset)}")

    # Reference semantics drop the last incomplete batch_size² pool
    # (DataLoader drop_last=True); keep ragged batches when the dataset is
    # smaller than one pool so tiny corpora still train.
    drop_last = len(dataset) >= cfg.batch_size**2

    # First batch defines shapes for init
    first = strip_host_fields(
        next(batch_iterator(dataset, cfg, shuffle=False, drop_last=drop_last))
    )
    rng = jax.random.PRNGKey(cfg.seed)
    model, state = create_train_state(cfg, rng, _forward_only(first))
    n_params = sum(
        np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params)
    )
    print(f"Number of Model Parameters: {int(n_params)}")

    ckpt_dir = cfg.checkpoint_path()
    if args.restore_step:
        state = restore_checkpoint(ckpt_dir, args.restore_step, state)
        print(f"--- Model Restored at Step {int(state.step)} ---")
    os.makedirs(ckpt_dir, exist_ok=True)

    # data axis must divide the per-step batch; use as many devices as fit
    import math

    num_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
    if num_slices > 1:
        # multi-slice: DP spans DCN, anything else stays on ICI
        mesh = make_hybrid_mesh(cfg)
        assert cfg.batch_size % mesh.shape[cfg.mesh_data_axis] == 0, (
            f"batch {cfg.batch_size} not divisible over "
            f"{mesh.shape[cfg.mesh_data_axis]} data-parallel devices"
        )
    else:
        n_data = math.gcd(cfg.batch_size, len(jax.devices()))
        mesh = make_mesh(cfg, data=n_data, devices=jax.devices()[:n_data])
        if n_data < len(jax.devices()):
            print(f"mesh: using {n_data}/{len(jax.devices())} devices (batch divisibility)")
    step_fn = make_jitted_train_step(model, cfg, donate=True)
    log_path = cfg.log_path()
    os.makedirs(log_path, exist_ok=True)
    metrics_log = open(os.path.join(log_path, "train_metrics.jsonl"), "a")
    tb_train = SummaryLogger(log_path, "train")
    tb_val = SummaryLogger(log_path, "validation")
    timer = StepTimer()

    current_step = int(state.step)
    profile_until = current_step + args.profile_steps if args.profile_steps else None
    if profile_until:
        import jax.profiler

        jax.profiler.start_trace(os.path.join(log_path, "profile"))
    t_step = time.perf_counter()
    with jax.set_mesh(mesh):
        state = replicate_state(state, mesh)
        for epoch in range(cfg.epochs):
            for batch in prefetch(
                batch_iterator(
                    dataset, cfg, seed=cfg.seed, epoch=epoch, drop_last=drop_last
                )
            ):
                batch = shard_batch(strip_host_fields(batch), mesh, cfg)
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, batch, sub)
                current_step += 1
                timer.tick()

                if profile_until and current_step >= profile_until:
                    import jax.profiler

                    jax.profiler.stop_trace()
                    print(f"profile trace written to {log_path}/profile")
                    profile_until = None

                if current_step == 1 or current_step % cfg.log_step == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.perf_counter() - t_step
                    t_step = time.perf_counter()
                    m.update(step=current_step, epoch=epoch, sec=round(dt, 3))
                    print(
                        f"Step {current_step}: total={m['total']:.4f} "
                        f"mel={m['mel']:.4f} d={m['duration']:.4f} "
                        f"f0={m['f0']:.4f} e={m['energy']:.4f} ({dt:.2f}s)"
                    )
                    metrics_log.write(json.dumps(m) + "\n")
                    metrics_log.flush()
                    tb_train.scalars(
                        {k: v for k, v in m.items() if k not in ("step", "epoch")},
                        current_step,
                    )
                    tb_train.scalar("perf/step_sec", timer.mean, current_step)
                    tb_train.flush()

                if current_step % cfg.synth_step == 0:
                    # image panels: predicted vs target mel + duration alignment
                    vb = next(
                        batch_iterator(val_dataset, cfg, shuffle=False, drop_last=False)
                    )
                    fwd = _forward_only(strip_host_fields(vb))
                    out = model.apply(
                        {"params": state.params, "batch_stats": state.batch_stats},
                        **fwd,
                    )
                    ml = int(np.asarray(fwd["mel_len"])[0])
                    sl = int(np.asarray(fwd["src_len"])[0])
                    tb_train.image(
                        "mel/predicted",
                        figure_to_array(
                            plot_spectrogram(
                                np.asarray(out.mel_postnet)[0, :ml],
                                f"postnet step {current_step}",
                            )
                        ),
                        current_step,
                    )
                    tb_train.image(
                        "mel/target",
                        figure_to_array(
                            plot_spectrogram(
                                np.asarray(fwd["mel_target"])[0, :ml], "ground truth"
                            )
                        ),
                        current_step,
                    )
                    d_round = np.asarray(fwd["d_target"])[0, :sl]
                    tb_train.image(
                        "alignment/duration",
                        figure_to_array(
                            plot_alignment(
                                alignment_2d_from_durations(d_round, mel_len=ml)
                            )
                        ),
                        current_step,
                    )
                    tb_train.flush()

                if current_step % cfg.eval_step == 0:
                    val_losses = []
                    for vb in batch_iterator(
                        val_dataset, cfg, shuffle=False, drop_last=False
                    ):
                        val_losses.append(
                            {
                                k: float(v)
                                for k, v in eval_step(
                                    model, state, strip_host_fields(vb), cfg.dat_weight
                                ).items()
                            }
                        )
                        if len(val_losses) >= 8:
                            break
                    if val_losses:
                        avg = {
                            k: float(np.mean([v[k] for v in val_losses]))
                            for k in val_losses[0]
                        }
                        print(f"  val total: {avg['total']:.4f}")
                        tb_val.scalars(avg, current_step)
                        tb_val.flush()

                if current_step % cfg.save_step == 0:
                    save_checkpoint(ckpt_dir, current_step, state)
                    print(f"  checkpoint saved @ {current_step}")

                if args.max_steps and current_step >= args.max_steps:
                    save_checkpoint(ckpt_dir, current_step, state)
                    print("max_steps reached")
                    return


def _forward_only(batch):
    from styler_tpu.train.step import FORWARD_KEYS

    return {k: batch[k] for k in FORWARD_KEYS if k in batch}


if __name__ == "__main__":
    main()
