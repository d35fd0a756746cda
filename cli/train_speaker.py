"""Speaker-encoder training CLI — beyond-reference capability (the
reference only loads a frozen pretrained DeepSpeaker, reference
deepspeaker/embedding.py:8-24; no speaker training exists upstream).

Trains styler_tpu.speaker.SpeakerEncoder with a cosine-softmax head on
a directory tree of per-speaker wavs (the raw/ layout of the on-box
corpora and of VCTK). Features are the exact DeepSpeaker pipeline
(trim → 64-band fbank → per-frame normalize, reference audio_ds.py),
computed once per utterance on the host; each step samples random
160-frame crops (reference batcher.py:23-29 semantics) and runs one
fused jitted update.

Held-out eval: the last --val_per_speaker utterances per speaker are
excluded from training; speaker-ID accuracy is measured with
enrollment = mean training-utterance embedding per speaker, probe =
each held-out utterance (nearest-centroid by cosine), plus the
same/different-speaker cosine margin.

Usage:
  python cli/train_speaker.py --wav_root /work/acoustic/raw \
      --steps 3000 --out assets/speaker/encoder_gen.npz \
      --eval_json assets/speaker/encoder_eval.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav_root", required=True,
                    help="dir of <speaker>/<utt>.wav subdirs")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--crop_frames", type=int, default=160)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--val_per_speaker", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="write trained encoder npz asset here")
    ap.add_argument("--eval_json", default=None)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--max_files", type=int, default=None)
    args = ap.parse_args()

    from styler_tpu.core.xla_flags import apply_workarounds

    apply_workarounds()  # training-only CLI (see core/xla_flags.py)

    import numpy as np

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from styler_tpu.core.config import default_config
    from styler_tpu.data.audio_io import read_wav
    from styler_tpu.speaker import (
        CosineClassifier,
        SpeakerEncoder,
        fbank_features,
        normalize_frames,
        trim_silence,
    )

    cfg = default_config()
    rng = np.random.default_rng(args.seed)

    # ------------------------------------------------------------------
    # host: load wavs, compute full-length normalized fbanks once
    # ------------------------------------------------------------------
    speakers = sorted(
        d for d in os.listdir(args.wav_root)
        if os.path.isdir(os.path.join(args.wav_root, d))
    )
    feats, labels, names = [], [], []
    for si, spk in enumerate(speakers):
        files = sorted(
            f for f in os.listdir(os.path.join(args.wav_root, spk))
            if f.endswith(".wav")
        )
        if args.max_files:
            files = files[: args.max_files]
        for f in files:
            audio, _ = read_wav(os.path.join(args.wav_root, spk, f))
            feat = normalize_frames(fbank_features(
                trim_silence(audio), cfg.sampling_rate,
                winlen=cfg.win_length / cfg.sampling_rate,
            ))
            if feat.shape[0] < args.crop_frames:
                feat = np.vstack([feat, np.zeros(
                    (args.crop_frames - feat.shape[0], feat.shape[1]),
                    np.float32)])
            feats.append(feat.astype(np.float32))
            labels.append(si)
            names.append(f"{spk}/{f}")
    labels = np.asarray(labels)
    n_spk = len(speakers)
    print(f"[speaker] {len(feats)} utterances, {n_spk} speakers")

    # held-out split: last val_per_speaker utts of each speaker
    val_idx = []
    for si in range(n_spk):
        mine = np.where(labels == si)[0]
        val_idx += list(mine[-args.val_per_speaker:])
    val_idx = set(val_idx)
    train_idx = np.array([i for i in range(len(feats)) if i not in val_idx])
    val_idx = np.array(sorted(val_idx))

    # ------------------------------------------------------------------
    # model + fused jitted update
    # ------------------------------------------------------------------
    encoder = SpeakerEncoder()
    head = CosineClassifier(n_classes=n_spk)

    C = args.crop_frames
    key = jax.random.PRNGKey(args.seed)
    enc_vars = jax.jit(lambda k, x: encoder.init(k, x, train=False))(
        key, jnp.zeros((1, C, 64, 1)))
    head_vars = jax.jit(head.init)(key, jnp.zeros((1, encoder.embed_dim)))
    params = {"enc": enc_vars["params"], "head": head_vars["params"]}
    batch_stats = enc_vars["batch_stats"]

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.01)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            emb, mut = encoder.apply(
                {"params": p["enc"], "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            logits = head.apply({"params": p["head"]}, emb)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            acc = (logits.argmax(-1) == y).mean()
            return loss, (mut["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, acc

    @jax.jit
    def embed(params, batch_stats, x):
        return encoder.apply(
            {"params": params["enc"], "batch_stats": batch_stats}, x)

    def sample_batch():
        idx = rng.choice(train_idx, size=args.batch_size)
        xs = np.zeros((args.batch_size, C, 64, 1), np.float32)
        for j, i in enumerate(idx):
            f = feats[i]
            s = rng.integers(0, max(f.shape[0] - C, 0) + 1)
            xs[j, :, :, 0] = f[s: s + C]
        return jnp.asarray(xs), jnp.asarray(labels[idx])

    t0 = time.time()
    for step in range(1, args.steps + 1):
        x, y = sample_batch()
        params, batch_stats, opt_state, loss, acc = train_step(
            params, batch_stats, opt_state, x, y)
        if step % args.log_every == 0 or step == 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"acc {float(acc):.3f} "
                  f"({step / (time.time() - t0):.1f} steps/s)",
                  flush=True)

    # ------------------------------------------------------------------
    # held-out eval: enrollment centroids from TRAIN utts, probe = val
    # ------------------------------------------------------------------
    def center_crop(f):
        s = max((f.shape[0] - C) // 2, 0)
        out = f[s: s + C]
        if out.shape[0] < C:
            out = np.vstack([out, np.zeros((C - out.shape[0], 64),
                                           np.float32)])
        return out

    def embed_many(idx_arr):
        out = []
        B = 32
        for c0 in range(0, len(idx_arr), B):
            chunk = idx_arr[c0: c0 + B]
            xs = np.stack([center_crop(feats[i]) for i in chunk])[..., None]
            pad = B - len(chunk)
            if pad:
                xs = np.vstack([xs, np.zeros((pad, C, 64, 1), np.float32)])
            e = np.asarray(embed(params, batch_stats, jnp.asarray(xs)))
            out.append(e[: len(chunk)])
        return np.vstack(out)

    emb_train = embed_many(train_idx)
    emb_val = embed_many(val_idx)
    cents = np.zeros((n_spk, encoder.embed_dim), np.float32)
    for si in range(n_spk):
        c = emb_train[labels[train_idx] == si].mean(0)
        cents[si] = c / np.linalg.norm(c)
    sims = emb_val @ cents.T  # [n_val, n_spk]
    pred = sims.argmax(-1)
    gold = labels[val_idx]
    acc = float((pred == gold).mean())
    same = sims[np.arange(len(gold)), gold]
    other = sims.copy()
    other[np.arange(len(gold)), gold] = -np.inf
    margin = float((same - other.max(-1)).mean())
    record = {
        "n_speakers": n_spk,
        "n_train_utts": int(len(train_idx)),
        "n_val_utts": int(len(val_idx)),
        "steps": args.steps,
        "heldout_id_accuracy": acc,
        "mean_margin": round(margin, 4),
        "mean_same_cos": round(float(same.mean()), 4),
        "trained": f"cli/train_speaker.py --steps {args.steps} on "
                   f"{os.path.basename(os.path.abspath(args.wav_root))}",
    }
    print(json.dumps(record))

    if args.out:
        from styler_tpu.core.checkpoint import save_acoustic_npz

        save_acoustic_npz(args.out, params["enc"], batch_stats)
        print(f"wrote {args.out} "
              f"({os.path.getsize(args.out) / 1e6:.1f} MB)")
    if args.eval_json:
        with open(args.eval_json, "w", encoding="utf-8") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
