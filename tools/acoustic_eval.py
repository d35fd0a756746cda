"""Held-out quality eval for a trained STYLER acoustic model.

The vocoder analog is tools/vocoder_eval.py; this is the acoustic side
the reference demonstrates only as TensorBoard loss panels of its
560k-step run (reference README.md:143-153, train.py:334-363). Reports,
over the val split of a preprocessed corpus:

  - mel_mae_tf        teacher-forced (d/p/e targets) masked MAE of the
                      clean postnet mel vs ground truth — the primary
                      convergence number (same units as the BASELINE
                      mel-MAE north star),
  - mel_mae_free      free-running (predicted durations/pitch/energy,
                      the serving path) MAE over the overlapping
                      prefix of predicted vs ground-truth frames,
  - dur_mae_frames    per-phoneme |round(exp(log_d)-1) - d_target|,
  - len_rel_err       |sum(d_pred) - mel_len| / mel_len,
  - f0_mae / energy_mae  frame-level prediction MAEs (normalized units),
  - *_random_init     the same mel numbers from untrained weights, for
                      scale (matches assets/vocoder/*_eval.json style).

Usage:
  python tools/acoustic_eval.py --preprocessed /path/preprocessed \
      [--ckpt /run/ckpt/<step> | --asset assets/acoustic/styler_gen.npz] \
      [--json out.json] [--wav_dir out/] [--max_batches N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _metrics_fns(model):
    import functools

    import jax
    import jax.numpy as jnp

    @jax.jit
    def teacher_forced(variables, batch):
        out = model.apply(
            variables,
            batch["src_seq"], batch["mel_target"], batch["mel_aug"],
            batch["p_norm"], batch["e_input"], batch["src_len"],
            batch["mel_len"],
            d_target=batch["d_target"], p_target=batch["p_target"],
            e_target=batch["e_target"], speaker_embed=batch["speaker_embed"],
        )
        mel_valid = (~out.mel_mask)[..., None]  # True at real frames
        n_frames = jnp.maximum(mel_valid.sum(), 1)
        mel_mae = (
            jnp.abs(out.mel_postnet - batch["mel_target"]) * mel_valid
        ).sum() / (n_frames * batch["mel_target"].shape[-1])
        src_valid = ~out.src_mask
        d_pred = jnp.maximum(
            jnp.round(jnp.exp(out.log_d_prediction) - 1.0), 0.0
        )
        dur_mae = (
            jnp.abs(d_pred - batch["d_target"]) * src_valid
        ).sum() / jnp.maximum(src_valid.sum(), 1)
        len_pred = (d_pred * src_valid).sum(-1)
        len_rel = jnp.abs(
            len_pred - batch["mel_len"]
        ) / jnp.maximum(batch["mel_len"], 1)
        frame_valid = ~out.mel_mask
        nf = jnp.maximum(frame_valid.sum(), 1)
        f0_mae = (
            jnp.abs(out.p_prediction - batch["p_target"]) * frame_valid
        ).sum() / nf
        e_mae = (
            jnp.abs(out.e_prediction - batch["e_target"]) * frame_valid
        ).sum() / nf
        return dict(
            mel_mae=mel_mae,
            dur_mae=dur_mae,
            len_rel=len_rel.mean(),
            f0_mae=f0_mae,
            e_mae=e_mae,
            n=jnp.asarray(batch["mel_target"].shape[0], jnp.float32),
        )

    @jax.jit
    def free_running(variables, batch):
        out = model.apply(
            variables,
            batch["src_seq"], batch["mel_target"], batch["mel_aug"],
            batch["p_norm"], batch["e_input"], batch["src_len"],
            batch["mel_len"],
            speaker_embed=batch["speaker_embed"],
        )
        M = batch["mel_target"].shape[1]
        overlap = jnp.minimum(
            jnp.minimum(out.mel_len, batch["mel_len"]), M
        )  # [B]
        idx = jnp.arange(M)[None, :]
        valid = (idx < overlap[:, None])[..., None]
        mae = (
            jnp.abs(out.mel_postnet - batch["mel_target"]) * valid
        ).sum() / jnp.maximum(valid.sum() * batch["mel_target"].shape[-1], 1)
        return dict(mel_mae_free=mae, mel_pred=out.mel_postnet,
                    mel_len_pred=out.mel_len)

    return teacher_forced, free_running


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preprocessed", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax dir")
    ap.add_argument("--asset", default=None, help="acoustic .npz asset")
    ap.add_argument("--json", default=None)
    ap.add_argument("--wav_dir", default=None,
                    help="also synthesize N free-running val wavs through "
                         "the trained vocoder asset")
    ap.add_argument("--n_wavs", type=int, default=4)
    ap.add_argument("--max_batches", type=int, default=None)
    args = ap.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from styler_tpu.core.config import default_config
    from styler_tpu.data.dataset import Dataset, batch_iterator, strip_host_fields
    from styler_tpu.models import STYLER

    cfg = default_config().replace(preprocessed_basedir=args.preprocessed)
    model = STYLER(cfg)
    dataset = Dataset(cfg, "val.txt", sort=False)

    def batches():
        it = batch_iterator(dataset, cfg, shuffle=False, drop_last=False)
        for i, b in enumerate(it):
            if args.max_batches and i >= args.max_batches:
                return
            yield strip_host_fields(b)

    first = next(batches())
    init_vars = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        first["src_seq"], first["mel_target"], first["mel_aug"],
        first["p_norm"], first["e_input"], first["src_len"],
        first["mel_len"], speaker_embed=first["speaker_embed"],
    )
    if args.asset:
        from styler_tpu.core.checkpoint import load_acoustic_npz

        params, batch_stats = load_acoustic_npz(args.asset)
        src = args.asset
    elif args.ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.ckpt))
        params, batch_stats = restored["params"], restored["batch_stats"]
        src = args.ckpt
    else:
        raise SystemExit("need --ckpt or --asset")

    teacher_forced, free_running = _metrics_fns(model)

    def run(variables):
        agg, n_b = {}, 0
        free_mae = []
        for batch in batches():
            tf = teacher_forced(variables, batch)
            fr = free_running(variables, batch)
            for k, v in tf.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            free_mae.append(float(fr["mel_mae_free"]))
            n_b += 1
        out = {k: v / n_b for k, v in agg.items() if k != "n"}
        out["mel_mae_free"] = float(np.mean(free_mae))
        out["n_batches"] = n_b
        return out

    trained = run({"params": params, "batch_stats": batch_stats})
    rnd = run({"params": init_vars["params"],
               "batch_stats": init_vars.get("batch_stats", {})})

    record = {
        "source": src,
        "val_split": os.path.join(args.preprocessed, "VCTK", "val.txt"),
        "mel_mae_tf": round(trained["mel_mae"], 5),
        "mel_mae_free": round(trained["mel_mae_free"], 5),
        "dur_mae_frames": round(trained["dur_mae"], 5),
        "len_rel_err": round(trained["len_rel"], 5),
        "f0_mae": round(trained["f0_mae"], 5),
        "energy_mae": round(trained["e_mae"], 5),
        "mel_mae_tf_random_init": round(rnd["mel_mae"], 5),
        "mel_mae_free_random_init": round(rnd["mel_mae_free"], 5),
        "n_batches": trained["n_batches"],
    }

    if args.wav_dir:
        from styler_tpu.core.checkpoint import load_vocoder_npz
        from styler_tpu.synthesis import default_vocoder_asset
        from styler_tpu.vocoder import make_generator

        os.makedirs(args.wav_dir, exist_ok=True)
        asset = default_vocoder_asset("iSTFTNet")
        gen = make_generator("iSTFTNet")
        vparams = load_vocoder_npz(asset)
        vfn = jax.jit(lambda m: gen.apply({"params": vparams}, m))
        variables = {"params": params, "batch_stats": batch_stats}
        batch = first
        fr = free_running(variables, batch)
        mel = np.asarray(fr["mel_pred"])
        mlen = np.asarray(fr["mel_len_pred"])
        from scipy.io import wavfile

        # AUDIO-level quality of the full text->wav pipeline: re-analyze
        # each free-running waveform (through the trained vocoder) with
        # the serving mel front end and compare against the ground-truth
        # mel over the overlapping prefix — the through-the-stack analog
        # of mel_mae_free (which stops at the acoustic model's mel).
        from styler_tpu.dsp import MelFrontend

        frontend = MelFrontend(cfg)
        gt_mel = np.asarray(batch["mel_target"])
        gt_len = np.asarray(batch["mel_len"])
        audio_maes = []
        for i in range(min(args.n_wavs, mel.shape[0])):
            wav = np.asarray(vfn(mel[i:i + 1]))[0]
            wav = wav[: int(mlen[i]) * cfg.hop_length]
            wavfile.write(
                os.path.join(args.wav_dir, f"val_free_{i:02d}.wav"),
                cfg.sampling_rate,
                (np.clip(wav, -1, 1) * 32767).astype(np.int16),
            )
            remel = np.asarray(frontend(np.clip(wav, -1, 1))[0]).T  # [F,80]
            n = min(remel.shape[0], int(gt_len[i]))
            if n > 0:
                audio_maes.append(
                    float(np.abs(remel[:n] - gt_mel[i, :n]).mean())
                )
        record["wav_dir"] = args.wav_dir
        if audio_maes:
            record["mel_mae_free_audio"] = round(
                float(np.mean(audio_maes)), 5)
            record["mel_mae_free_audio_n"] = len(audio_maes)

    print(json.dumps(record))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
