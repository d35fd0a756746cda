"""Synthesis CLI (reference synthesize.py surface).

Flags preserved: --ckpt, --ref_name, --speaker_id, --noisy_input,
--inspection, --cont --r1 --r2, --duration_control/--pitch_control/
--energy_control, --version. Outputs wav (+ mel npy) per sentence,
clean and noisy (Residual Decoding) variants.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None,
                        help="orbax dir or reference .pth.tar")
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="reference generator_universal.pth.tar")
    parser.add_argument("--ref_name", type=str, default=None)
    parser.add_argument("--ref_audio_dir", type=str, default=None)
    parser.add_argument("--ref_tg_dir", type=str, default=None)
    parser.add_argument("--speaker_id", type=str, default=None)
    parser.add_argument("--noisy_input", action="store_true")
    parser.add_argument("--inspection", action="store_true")
    parser.add_argument("--cont", action="store_true")
    parser.add_argument("--r1", type=str, default=None)
    parser.add_argument("--r2", type=str, default=None)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--version", type=str, default="")
    parser.add_argument("--sentence", type=str, default=None,
                        help="synthesize a single sentence instead of the built-in list")
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--src_buckets", type=int, nargs="+", default=None,
                        help="override phoneme-axis shape buckets")
    parser.add_argument("--mel_buckets", type=int, nargs="+", default=None,
                        help="override mel-frame-axis shape buckets")
    parser.add_argument("--batch", action="store_true",
                        help="synthesize all sentences in ONE jitted batched "
                             "forward, sharded over all devices")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision acoustic model (bf16 "
                             "compute; ~1.5x batched throughput — mel "
                             "MAE vs f32 ~1e-2, duration rounding may "
                             "shift a frame at bucket boundaries)")
    parser.add_argument("--vocoder", type=str, default=None,
                        choices=["HiFi-GAN", "MelGAN", "WaveGlow", "iSTFTNet"],
                        help="vocoder family (reference hp.vocoder, "
                             "hparams.py:19); default HiFi-GAN")
    args = parser.parse_args()

    import numpy as np

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data.audio_io import audiowrite
    from styler_tpu.data.sentences import sentences
    from styler_tpu.synthesis import load_reference, load_synthesizer
    from styler_tpu.utils import plot_mel_f0_energy, save_figure

    def save_overlay(path, mel, f0, energy, title):
        """Overlay png next to every output wav (reference
        synthesize.py:366-379 writes plot_data panels per variant)."""
        save_figure(plot_mel_f0_energy([(mel, f0, energy)], [title]), path)

    cfg = default_config().replace(version=args.version)
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    if args.ref_audio_dir:
        cfg = cfg.replace(ref_audio_dir=args.ref_audio_dir)
    if args.ref_tg_dir:
        cfg = cfg.replace(ref_tg_dir=args.ref_tg_dir)
    if args.src_buckets:
        cfg = cfg.replace(src_buckets=tuple(args.src_buckets))
    if args.mel_buckets:
        cfg = cfg.replace(mel_buckets=tuple(args.mel_buckets))

    synth = load_synthesizer(cfg, args.ckpt, args.vocoder_ckpt,
                             vocoder_arch=args.vocoder)
    outdir = args.outdir or cfg.test_path()
    os.makedirs(outdir, exist_ok=True)

    def load_ref(name):
        return load_reference(
            cfg, synth.frontend, name, args.speaker_id, args.noisy_input
        )

    assert args.ref_name or (args.cont and args.r1 and args.r2), (
        "need --ref_name, or --cont with --r1/--r2"
    )

    if args.cont:
        import shutil

        ref1, spk1 = load_ref(args.r1)
        ref2, spk2 = load_ref(args.r2)
        s1 = args.sentence or sentences[0]
        s2 = args.sentence or sentences[1]
        t0 = time.perf_counter()
        results = synth.mix_and_match((s1, s2), (ref1, ref2), (spk1, spk2))
        print(f"mix_and_match 2^5 combos in {time.perf_counter()-t0:.2f}s")
        # Reference file inventory (reference synthesize.py:227-231,
        # 277-279): a control_r1_X_r2_Y dir holding each reference's own
        # wav copy + feature-overlay png, then {comb}.png/{comb}.wav per
        # combination (plus mel npy, a rebuild extra).
        outdir = os.path.join(outdir, f"control_r1_{args.r1}_r2_{args.r2}")
        os.makedirs(outdir, exist_ok=True)
        for name, ref in ((args.r1, ref1), (args.r2, ref2)):
            src_wav = os.path.join(cfg.ref_audio_dir, name + ".wav")
            if os.path.exists(src_wav):
                shutil.copy(src_wav, os.path.join(outdir, name + ".wav"))
            save_overlay(os.path.join(outdir, name + ".png"),
                         ref.mel[: ref.mel_len], ref.f0_norm[: ref.mel_len],
                         ref.energy01[: ref.mel_len], name)
        for comb, r in results.items():
            audiowrite(r["wav"], cfg.sampling_rate,
                       os.path.join(outdir, f"{comb}.wav"))
            np.save(os.path.join(outdir, f"{comb}.npy"), r["mel"])
            save_overlay(os.path.join(outdir, f"{comb}.png"),
                         r["mel"], r["f0"], r["energy"], comb)
        return

    ref, speaker_embed = load_ref(args.ref_name)
    todo = [args.sentence] if args.sentence else sentences
    start_time = time.perf_counter()

    if args.batch:
        import jax

        from styler_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        mesh = make_mesh(cfg, data=n_dev) if n_dev > 1 else None
        results = synth.synthesize_batch(
            todo, [ref] * len(todo), [speaker_embed] * len(todo), mesh=mesh,
            d_control=args.duration_control, p_control=args.pitch_control,
            e_control=args.energy_control,
        )
        for i, (sentence, r) in enumerate(zip(todo, results)):
            stem = f"{i}_{synth.config.vocoder}_{sentence[:10].replace(' ', '_')}"
            audiowrite(r["wav"], cfg.sampling_rate, os.path.join(outdir, stem + ".wav"))
            audiowrite(r["wav_noisy"], cfg.sampling_rate,
                       os.path.join(outdir, stem + "_noisy.wav"))
            np.save(os.path.join(outdir, stem + "_mel.npy"), r["mel"])
            save_overlay(os.path.join(outdir, stem + ".png"),
                         r["mel"], r["f0"], r["energy"],
                         "Synthesized Spectrogram Clean")
            save_overlay(os.path.join(outdir, stem + "_noisy.png"),
                         r["mel_noisy"], r["f0"], r["energy"],
                         "Synthesized Spectrogram Noisy")
        dt = time.perf_counter() - start_time
        audio_sec = sum(r["mel_len"] for r in results) * cfg.hop_length / cfg.sampling_rate
        print(f"Batched {len(todo)} sentences: {audio_sec:.1f}s audio in "
              f"{dt:.2f}s (RTF {audio_sec/dt:.1f}x)")
        return
    for i, sentence in enumerate(todo):
        t0 = time.perf_counter()
        r = synth.synthesize(
            sentence, ref, speaker_embed,
            args.duration_control, args.pitch_control, args.energy_control,
        )
        dt = time.perf_counter() - t0
        stem = f"{i}_{synth.config.vocoder}_{sentence[:10].replace(' ', '_')}"
        audiowrite(r["wav"], cfg.sampling_rate, os.path.join(outdir, stem + ".wav"))
        audiowrite(r["wav_noisy"], cfg.sampling_rate,
                   os.path.join(outdir, stem + "_noisy.wav"))
        np.save(os.path.join(outdir, stem + "_mel.npy"), r["mel"])
        save_overlay(os.path.join(outdir, stem + ".png"),
                     r["mel"], r["f0"], r["energy"],
                     "Synthesized Spectrogram Clean")
        save_overlay(os.path.join(outdir, stem + "_noisy.png"),
                     r["mel_noisy"], r["f0"], r["energy"],
                     "Synthesized Spectrogram Noisy")
        audio_sec = r["mel_len"] * cfg.hop_length / cfg.sampling_rate
        print(f"[{i}] {audio_sec:.2f}s audio in {dt:.3f}s (RTF {audio_sec/dt:.1f}x): {sentence}")

        if args.inspection:
            # Reference inventory (reference synthesize.py:284-289,
            # 341-344): a "Reference Spectrogram" overlay row (png only)
            # + per-ablation wav AND overlay png.
            grid = synth.inspect(sentence, ref, speaker_embed)
            save_overlay(
                os.path.join(outdir, f"{stem}_inspect_Reference.png"),
                ref.mel[: ref.mel_len], ref.f0_norm[: ref.mel_len],
                ref.energy01[: ref.mel_len], "Reference Spectrogram",
            )
            for title, g in grid.items():
                istem = f"{stem}_inspect_{title.replace('+', '')}"
                audiowrite(
                    g["wav"], cfg.sampling_rate,
                    os.path.join(outdir, istem + ".wav"),
                )
                save_overlay(
                    os.path.join(outdir, istem + ".png"),
                    g["mel"], g["f0"], g["energy"], title,
                )
    print(f"Synthesized {len(todo)} in {time.perf_counter()-start_time:.3f}s")


if __name__ == "__main__":
    main()
