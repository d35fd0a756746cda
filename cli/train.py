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
    parser.add_argument("--acc_steps", type=int, default=None,
                        help="gradient accumulation: split each batch "
                             "into N microbatches scanned inside one "
                             "jitted update (reference train.py:175-178)")
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
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="vocoder checkpoint for the synth_step "
                             "audio monitoring channels (random-init "
                             "generator if absent)")
    parser.add_argument("--eval_batches", type=int, default=None,
                        help="cap val batches per eval_step "
                             "(default: full split)")
    parser.add_argument("--synth_step", type=int, default=None,
                        help="override monitoring cadence (cfg.synth_step)")
    parser.add_argument("--eval_step", type=int, default=None,
                        help="override val-eval cadence (cfg.eval_step)")
    parser.add_argument("--save_step", type=int, default=None,
                        help="override checkpoint cadence (cfg.save_step)")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed precision: bf16 compute in the "
                             "matmul/conv-heavy model paths (params, "
                             "norms, LSTMs, losses, optimizer stay f32)")
    args = parser.parse_args()

    # XLA:TPU's space-to-batch pass crashes on the backprop convs — at
    # small conv batches AND at batch 16 over the short 64-frame mel
    # bucket (see core/xla_flags.py), so the trigger is conv spatial
    # size vs batch, not batch alone. The pass only matters as a B=1
    # INFERENCE optimization (~4x); this CLI is training-only, so
    # disable it unconditionally rather than keying on the microbatch.
    from styler_tpu.core.xla_flags import apply_workarounds

    apply_workarounds()

    import jax
    import numpy as np

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
    from styler_tpu.data.dataset import (
        Dataset,
        batch_iterator,
        batches_per_epoch,
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
    from styler_tpu.train import (
        create_train_state,
        make_jitted_eval_step,
        make_jitted_train_step,
    )
    from styler_tpu.utils import (
        StepTimer,
        SummaryLogger,
        alignment_2d_from_durations,
        figure_to_array,
        plot_alignment,
    )

    cfg = default_config().replace(version=args.version)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    if args.acc_steps:
        cfg = cfg.replace(acc_steps=args.acc_steps)
    if args.eval_batches is not None:
        cfg = cfg.replace(eval_batches=args.eval_batches)
    if args.synth_step:
        cfg = cfg.replace(synth_step=args.synth_step)
    if args.eval_step:
        cfg = cfg.replace(eval_step=args.eval_step)
    if args.save_step:
        cfg = cfg.replace(save_step=args.save_step)
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
    eval_fn = make_jitted_eval_step(model, cfg)
    # jitted inference forward for the synth_step monitoring panels —
    # eager flax apply costs one tunnel RPC per op on axon (CLAUDE.md)
    monitor_fwd = jax.jit(lambda variables, fwd: model.apply(variables, **fwd))
    vocode = _make_monitor_vocoder(cfg, args.vocoder_ckpt)
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
    # Mid-epoch resume determinism: a restored step maps to
    # (start_epoch, offset) on the fixed per-epoch batch sequence, and the
    # per-step dropout key is fold_in(seed_key, step) — a pure function of
    # the step counter — so a resumed run reproduces the exact batch order
    # AND rng stream of an uninterrupted one (tests/test_cli.py).
    steps_in_epoch = batches_per_epoch(len(dataset), cfg, drop_last)
    start_epoch, skip = divmod(current_step, max(steps_in_epoch, 1))
    if current_step:
        print(f"resuming at epoch {start_epoch}, batch offset {skip}")

    t_step = time.perf_counter()
    with jax.set_mesh(mesh):
        state = replicate_state(state, mesh)
        for epoch in range(start_epoch, cfg.epochs):
            it = batch_iterator(
                dataset, cfg, seed=cfg.seed, epoch=epoch, drop_last=drop_last
            )
            if skip:
                import itertools

                it = itertools.islice(it, skip, None)
                skip = 0
            for batch in prefetch(it):
                batch = shard_batch(strip_host_fields(batch), mesh, cfg)
                sub = jax.random.fold_in(rng, current_step)
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
                    # The reference's full synth_step monitoring surface
                    # (train.py:230-332): overlay panels + duration
                    # alignment + 6 vocoded audio channels, to both the
                    # synth dir and TensorBoard.
                    vb = next(
                        batch_iterator(val_dataset, cfg, shuffle=False, drop_last=False)
                    )
                    fwd = _forward_only(strip_host_fields(vb))
                    out = monitor_fwd(
                        {"params": state.params, "batch_stats": state.batch_stats},
                        fwd,
                    )
                    _log_synth_panels(
                        cfg, tb_train, vocode, fwd, out, current_step,
                        alignment_2d_from_durations, figure_to_array,
                        plot_alignment,
                    )
                    tb_train.flush()

                if current_step % cfg.eval_step == 0:
                    # full val split by default (reference
                    # evaluate.py:27-142); cfg.eval_batches>0 caps it
                    # for smoke runs
                    val_losses = []
                    for vb in batch_iterator(
                        val_dataset, cfg, shuffle=False, drop_last=False
                    ):
                        val_losses.append(
                            {
                                k: float(v)
                                for k, v in eval_fn(
                                    state, strip_host_fields(vb)
                                ).items()
                            }
                        )
                        if cfg.eval_batches and len(val_losses) >= cfg.eval_batches:
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


def _make_monitor_vocoder(cfg, vocoder_ckpt=None):
    """Jitted mel[B,T,80] -> wav[B,T*hop] for the synth_step audio
    channels (reference utils.vocoder_infer, utils.py:250-280). Uses the
    fused Pallas resblock path on TPU when the shape supports it; the
    XLA conv path maps row-by-row to bound HBM intermediates."""
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from styler_tpu.vocoder import make_generator
    from styler_tpu.vocoder.hifigan import (
        generator_apply_fused,
        generator_fused_supported,
    )

    gen = make_generator(cfg.vocoder)
    if vocoder_ckpt and os.path.exists(vocoder_ckpt):
        if os.path.isdir(vocoder_ckpt):
            from styler_tpu.core.checkpoint import load_vocoder_params

            variables = {"params": load_vocoder_params(vocoder_ckpt)}
        else:
            from styler_tpu.core.checkpoint import load_reference_vocoder

            variables = {"params": load_reference_vocoder(vocoder_ckpt, cfg.vocoder)}
    else:
        # no explicit vocoder: prefer the committed trained asset so the
        # synth_step audio panels are listenable (random init only when
        # no asset matches the arch)
        from styler_tpu.synthesis import default_vocoder_asset

        asset = default_vocoder_asset(cfg.vocoder)
        if asset:
            from styler_tpu.core.checkpoint import load_vocoder_npz

            variables = {"params": load_vocoder_npz(asset)}
            print(f"monitor vocoder: trained {cfg.vocoder} asset {asset}")
        else:
            variables = jax.jit(gen.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.n_mel_channels))
            )

    @jax.jit
    def vocode(mel):
        if (
            jax.default_backend() == "tpu"
            and cfg.vocoder == "HiFi-GAN"
            and generator_fused_supported(mel.shape[1], gen.config)
        ):
            return generator_apply_fused(
                variables, mel, gen.config, compute_dtype=gen.compute_dtype
            )
        return jax.lax.map(
            lambda m: gen.apply(variables, m), mel[:, None]
        ).reshape(mel.shape[0], -1)

    return vocode


def _log_synth_panels(
    cfg, tb, vocode, fwd, out, step,
    alignment_2d_from_durations, figure_to_array, plot_alignment,
):
    """The reference's synth_step monitoring surface (train.py:230-332):
    6 vocoded audio channels (ground-truth / pre-postnet / postnet mels,
    clean and noisy) written to the synth dir + TensorBoard, overlay
    panels (mel + f0 + energy, predicted vs target, utils.py:103-149),
    and the predicted-duration alignment image."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from styler_tpu.data.audio_io import audiowrite
    from styler_tpu.utils import plot_mel_f0_energy

    ml = int(np.asarray(fwd["mel_len"])[0])
    sl = int(np.asarray(fwd["src_len"])[0])
    synth_path = cfg.synth_path()
    os.makedirs(synth_path, exist_ok=True)

    # (tb tag, synth-dir filename stem) in stack order
    channels = [
        ("Clean/wav_ground_truth", f"step_{step}_c_ground-truth_{cfg.vocoder}"),
        ("Clean/wav_mel", f"step_{step}_c_{cfg.vocoder}"),
        ("Clean/wav_mel_postnet", f"step_{step}_c_postnet_{cfg.vocoder}"),
        ("Noisy/wav_aug", f"step_{step}_n_ground-truth_{cfg.vocoder}"),
        ("Noisy/wav_mel_noisy", f"step_{step}_n_{cfg.vocoder}"),
        ("Noisy/wav_mel_postnet_noisy", f"step_{step}_n_postnet_{cfg.vocoder}"),
    ]
    mels = np.stack(
        [
            np.asarray(fwd["mel_target"])[0],
            np.asarray(out.mel)[0],
            np.asarray(out.mel_postnet)[0],
            np.asarray(fwd["mel_aug"])[0],
            np.asarray(out.mel_noisy)[0],
            np.asarray(out.mel_postnet_noisy)[0],
        ]
    )
    wavs = np.asarray(vocode(jnp.asarray(mels)))[:, : ml * cfg.hop_length]
    for (tag, stem), wav in zip(channels, wavs):
        peak = float(np.abs(wav).max()) or 1.0  # reference normalizes
        audiowrite(wav / peak, cfg.sampling_rate, os.path.join(synth_path, stem + ".wav"))
        tb.audio(tag, wav / peak, step, sample_rate=cfg.sampling_rate)

    f0_gt = np.asarray(fwd["p_target"])[0, :ml]
    e_gt = np.asarray(fwd["e_target"])[0, :ml]
    f0_pr = np.asarray(out.p_prediction)[0, :ml]
    e_pr = np.asarray(out.e_prediction)[0, :ml]
    for tag, suffix, pred_mel, gt_mel, gt_title in (
        ("mel_predicted/Clean", "c", mels[2], mels[0], "Ground-Truth Spectrogram"),
        ("mel_predicted/Noisy", "n", mels[5], mels[3], "Aug Spectrogram"),
    ):
        fig = plot_mel_f0_energy(
            [(pred_mel[:ml], f0_pr, e_pr), (gt_mel[:ml], f0_gt, e_gt)],
            [f"Synthesized Spectrogram {'Clean' if suffix == 'c' else 'Noisy'}", gt_title],
        )
        fig.savefig(os.path.join(synth_path, f"step_{step}_{suffix}.png"))
        tb.image(tag, figure_to_array(fig), step)  # closes fig

    d_pred = np.clip(
        np.round(np.exp(np.asarray(out.log_d_prediction)[0, :sl]) - cfg.log_offset),
        0, None,
    ).astype(np.int32)
    if d_pred.sum() > 0:
        tb.image(
            "model_duration",
            figure_to_array(
                plot_alignment(alignment_2d_from_durations(d_pred))
            ),
            step,
        )


if __name__ == "__main__":
    main()
