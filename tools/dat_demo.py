"""DAT / Residual-Decoding disentanglement demonstration (VERDICT r3 #2).

The per-op machinery (GRL custom_vjp, dual decode with stop_gradient)
is parity-tested; this tool demonstrates the EMERGENT behavior the
paper claims (reference train.py:140-160, styler.py:51-55): train
2-5k steps on a synthetic speech-like corpus augmented with noise of a
KNOWN spectral signature (band-limited 4-7 kHz), and record

  (a) augmentation-classifier accuracy on clean vs augmented inputs
      over training — the GRL pushes the audio-encoder d/p/e encodings
      toward noise-invariance, so classifier accuracy should collapse
      toward chance after its early peak;
  (b) denoising: feeding the AUGMENTED features to both input channels
      (the --noisy_input serving contract) must yield a CLEAN decode
      closer to the clean target mel than to the augmented mel — noise
      removal learned without noise labels;
  (c) the residual: mel_postnet_noisy - mel_postnet must correlate with
      the injected noise signature mean(mel_aug - mel_clean) — the
      noise ends up in the residual branch, nowhere else.

Writes the trajectory + final gates to artifacts/dat_demo.json and
asserts the invariants. Run on the real chip (~10 min at 3k steps):

  python tools/dat_demo.py [--steps 3000] [--workdir /tmp/dat_demo]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from e2e_synthetic import TG  # noqa: E402  (MFA-style 2 s TextGrid)


def build_corpus(work, cfg, n_speakers=3, n_utts=40, band=(4000.0, 7000.0)):
    """Speech-like corpus (formant synthesizer from make_vocoder_corpus)
    + band-limited noise whose mel signature is known by construction."""
    from scipy import signal
    from scipy.io import wavfile

    from make_vocoder_corpus import make_utterance
    from styler_tpu.data.noise_mixer import build_from_path as build_noisy
    from styler_tpu.data.vctk import build_from_path, write_metadata

    sr = cfg.sampling_rate
    in_dir = os.path.join(work, "raw")
    out_dir = os.path.join(work, "preprocessed", cfg.dataset)
    rng = np.random.default_rng(0)
    speakers = [(110.0, 0.95), (190.0, 1.1), (250.0, 1.2)][:n_speakers]
    for s, (f0, fscale) in enumerate(speakers):
        spk = f"p{s + 1:03d}"
        os.makedirs(os.path.join(in_dir, spk), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "TextGrid", spk), exist_ok=True)
        for i in range(n_utts):
            base = f"{spk}_{i:03d}"
            # retry until the 2 s cut is meaningfully voiced — an
            # all-unvoiced utterance has a degenerate f0 track
            for _ in range(20):
                wav = make_utterance(rng, f0, fscale, min_s=2.2, max_s=2.6)
                wav = wav[: 2 * sr]  # exactly the TextGrid's 2 s span
                if np.abs(wav).mean() > 0.01:
                    break
            wavfile.write(
                os.path.join(in_dir, spk, f"{base}.wav"), sr,
                (np.clip(wav, -1, 1) * 32767).astype(np.int16),
            )
            with open(os.path.join(in_dir, spk, f"{base}.txt"), "w") as f:
                f.write("hi\n")
            with open(os.path.join(
                out_dir, "TextGrid", spk, f"{base}.TextGrid"), "w") as f:
                f.write(TG)

    train, val = build_from_path(in_dir, out_dir, cfg, f0_backend="device")
    write_metadata(train, val, out_dir)

    # band-limited noise: all its mel energy sits in a known bin range
    noise_dir = os.path.join(work, "noise")
    os.makedirs(noise_dir, exist_ok=True)
    sos = signal.butter(
        6, [band[0] / (sr / 2), band[1] / (sr / 2)], btype="band", output="sos"
    )
    nz = signal.sosfilt(sos, rng.standard_normal(8 * sr))
    nz = (nz / np.abs(nz).max() * 0.5 * 32767).astype(np.int16)
    wavfile.write(os.path.join(noise_dir, "band.wav"), sr, nz)
    build_noisy(in_dir, out_dir, cfg, noise_dir=noise_dir)
    print(f"[dat] corpus: {len(train)} train / {len(val)} val, "
          f"noise band {band[0]:.0f}-{band[1]:.0f} Hz")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--probe_every", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/dat_demo")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "dat_demo.json"))
    args = ap.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache
    from styler_tpu.core.xla_flags import apply_workarounds

    # the space-to-batch backprop-filter crash (core/xla_flags.py) is NOT
    # purely batch-keyed: this tool's batch-16 train step over the short
    # 64-frame mel bucket also trips it (observed 2026-08-20,
    # f32[40,17,320] select shape check). Training-only tool -> disable
    # the pass unconditionally.
    apply_workarounds()
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from styler_tpu.core.config import default_config
    from styler_tpu.data.dataset import (
        Dataset, batch_iterator, prefetch, strip_host_fields,
    )
    from styler_tpu.models import STYLER
    from styler_tpu.train import create_train_state, make_jitted_train_step
    from styler_tpu.train.step import FORWARD_KEYS

    cfg = default_config().replace(batch_size=16)
    work = args.workdir
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
    out_dir = build_corpus(work, cfg)
    cfg = cfg.replace(preprocessed_basedir=os.path.join(work, "preprocessed"))

    dataset = Dataset(cfg, "train.txt")
    first = strip_host_fields(
        next(batch_iterator(dataset, cfg, shuffle=False, drop_last=False))
    )
    fwd_first = {k: first[k] for k in FORWARD_KEYS}
    rng = jax.random.PRNGKey(cfg.seed)
    model, state = create_train_state(cfg, rng, fwd_first)
    step_fn = make_jitted_train_step(model, cfg)

    probe = first  # fixed probe batch; its shapes define one compile

    @jax.jit
    def probe_metrics(state, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fwd = {k: batch[k] for k in FORWARD_KEYS}
        out = model.apply(variables, **fwd)
        acc0 = jnp.mean(
            jnp.stack([
                jnp.mean((jnp.argmax(p, -1) == 0).astype(jnp.float32))
                for p in out.dat_posteriors
            ])
        )
        dat_aug = model.apply(
            variables, batch["mel_aug"], batch["f0_norm_aug"],
            batch["e_input_aug"], batch["mel_len"], batch["src_len"],
            out.src_mask, method="forward_dat",
        )
        acc1 = jnp.mean(
            jnp.stack([
                jnp.mean((jnp.argmax(p, -1) == 1).astype(jnp.float32))
                for p in dat_aug
            ])
        )
        valid = (~out.mel_mask).astype(jnp.float32)[..., None]  # [B, M, 1]
        denom = jnp.sum(valid) * cfg.n_mel_channels

        def mmae(a, b):
            return jnp.sum(jnp.abs(a - b) * valid) / denom

        # (c) residual profile vs the injected signature
        prof = jnp.sum(
            (out.mel_postnet_noisy - out.mel_postnet) * valid, axis=(0, 1)
        ) / jnp.maximum(jnp.sum(valid), 1.0)
        sig = jnp.sum(
            (batch["mel_aug"] - batch["mel_target"]) * valid, axis=(0, 1)
        ) / jnp.maximum(jnp.sum(valid), 1.0)

        def corr(a, b):
            a = a - a.mean()
            b = b - b.mean()
            return jnp.sum(a * b) / jnp.maximum(
                jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-9
            )

        # (b) denoise probe: augmented features on BOTH input channels
        # (the --noisy_input contract, reference synthesize.py:420-433),
        # teacher-forced durations only so frames align with the targets
        noisy = dict(
            fwd,
            mel_target=batch["mel_aug"],
            p_norm=batch["f0_norm_aug"],
            e_input=batch["e_input_aug"],
            p_target=None,
            e_target=None,
        )
        out2 = model.apply(variables, **noisy)

        # band-restricted denoise MAE: the injected noise only moves the
        # mel bins covering its 4-7 kHz band, so clean and aug targets are
        # IDENTICAL elsewhere — the full-band margin dilutes the denoise
        # signal ~5x under reconstruction noise. Weight by the bins where
        # the measured signature actually lives (data-derived mask).
        band = (jnp.abs(sig) > 0.5 * jnp.max(jnp.abs(sig))).astype(
            jnp.float32
        )
        bdenom = jnp.sum(valid) * jnp.maximum(jnp.sum(band), 1.0)

        def bmae(a, b):
            return jnp.sum(jnp.abs(a - b) * valid * band) / bdenom

        return {
            "acc_clean": acc0,
            "acc_aug": acc1,
            "residual_corr": corr(prof, sig),
            "noisy_in_mae_to_clean": mmae(out2.mel_postnet, batch["mel_target"]),
            "noisy_in_mae_to_aug": mmae(out2.mel_postnet, batch["mel_aug"]),
            "band_mae_to_clean": bmae(out2.mel_postnet, batch["mel_target"]),
            "band_mae_to_aug": bmae(out2.mel_postnet, batch["mel_aug"]),
            "clean_mel_mae": mmae(out.mel_postnet, batch["mel_target"]),
        }

    def record(step):
        m = {k: float(v) for k, v in probe_metrics(state, probe).items()}
        m["step"] = step
        m["dat_acc"] = 0.5 * (m["acc_clean"] + m["acc_aug"])
        traj.append(m)
        print(
            f"[dat] step {step}: dat_acc={m['dat_acc']:.3f} "
            f"(clean {m['acc_clean']:.2f} / aug {m['acc_aug']:.2f}) "
            f"residual_corr={m['residual_corr']:.3f} "
            f"denoise {m['noisy_in_mae_to_clean']:.3f} vs "
            f"{m['noisy_in_mae_to_aug']:.3f}"
        )
        return m

    traj = []
    record(0)
    import time

    t0 = time.time()
    step = 0
    while step < args.steps:
        for batch in prefetch(
            batch_iterator(
                dataset, cfg, seed=cfg.seed, epoch=step, drop_last=False
            )
        ):
            step += 1
            sub = jax.random.fold_in(rng, step)
            state, metrics = step_fn(state, strip_host_fields(batch), sub)
            if step % args.probe_every == 0:
                record(step)
            if step >= args.steps:
                break
    final = traj[-1]
    peak_acc = max(m["dat_acc"] for m in traj)
    early_corr = traj[0]["residual_corr"]
    # adversarial training fluctuates probe-to-probe; every gate is
    # evaluated on the TRAILING MEAN of the last 5 probes, not on one
    # arbitrary final step. Never let the step-0 (untrained) probe into
    # the tail on short runs — it would skew the gates either way.
    tail = [m for m in traj[-5:] if m["step"] > 0] or traj[-1:]

    def tmean(key):
        return float(np.mean([m[key] for m in tail]))

    tail_acc = tmean("dat_acc")
    tail_corr = tmean("residual_corr")
    tail_margin = tmean("band_mae_to_aug") - tmean("band_mae_to_clean")
    tail_margin_fullband = tmean("noisy_in_mae_to_aug") - tmean(
        "noisy_in_mae_to_clean"
    )

    result = {
        "config": {
            "steps": args.steps,
            "batch_size": cfg.batch_size,
            "corpus": "3 speakers x 40 formant-synthesized utterances",
            "noise": "4-7 kHz band-limited, SNR 5-25 dB (WHAM! recipe)",
            "probe_every": args.probe_every,
            "wall_s": round(time.time() - t0, 1),
        },
        "trajectory": traj,
        "gates": {
            "dat_acc_tail": tail_acc,
            "dat_acc_peak": peak_acc,
            "residual_corr_tail": tail_corr,
            "residual_corr_initial": early_corr,
            "denoise_band_margin_tail": tail_margin,
            "denoise_margin_tail_fullband": tail_margin_fullband,
            "tail_probes": len(tail),
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[dat] wrote {args.out}")

    # ---- the paper's claims, as hard gates ----------------------------
    # (a) adversarial equilibrium: classifiers end BELOW their early
    # peak (encoder wins ground back) — not a fixed chance threshold,
    # synthetic corpora separate more easily than VCTK
    assert tail_acc < peak_acc - 0.05, (tail_acc, peak_acc)
    # (b) denoising: in the mel bins the injected noise occupies, the
    # clean decode of noisy-reference inputs sits closer to the clean
    # target than to the noisy input it was fed
    assert tail_margin > 0, (tail_margin, tail_margin_fullband)
    # (c) the injected noise lands in the residual branch
    assert tail_corr > 0.8, tail_corr
    print("[dat] OK — all three disentanglement gates hold")
    if not args.keep:
        shutil.rmtree(work)


if __name__ == "__main__":
    main()
