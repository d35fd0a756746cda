"""Persistent synthesis server (JSON lines over stdin/stdout).

Production-serving surface beyond the reference's one-shot CLI: the
model, vocoder, and per-bucket compiled programs stay warm in one
process; reference features and speaker embeddings are cached, so
steady-state latency is one jitted forward (~19 ms/sentence on a v5e).

Protocol — one JSON object per line on stdin, one reply per line on
stdout (stderr carries logs):

  {"sentence": "...", "ref": "p225_001",          # required
   "id": any,                                      # echoed back
   "speaker_id": "p225",                           # optional
   "noisy_input": false,                           # optional
   "d_control": 1.0, "p_control": 1.0, "e_control": 1.0,
   "out": "custom/path.wav"}                       # optional

  -> {"id":..., "ok": true, "wav": ".../x.wav", "wav_noisy": "...",
      "mel_len": N, "ms": 12.3}
  -> {"id":..., "ok": false, "error": "..."}

Batched requests run N sentences through ONE jitted forward
(`synthesize_batch`; the batch is padded to the next power of two so
distinct request sizes reuse a handful of compiled programs):

  {"sentences": ["...", "..."], "ref": "p225_001",  # or per-sentence
   "refs": ["p225_001", "p226_002"], ...}           # "refs" list
  -> {"id":..., "ok": true, "wavs": [...], "wavs_noisy": [...],
      "mel_lens": [...], "ms": ...,
      "truncated": [...]}   # present iff some item was clamped to the
                            # largest bucket (batch paths clamp; the
                            # single-sentence path chunks instead)

A line of the form {"cmd": "ping"} replies {"ok": true, "pong": true};
{"cmd": "shutdown"} exits after replying. EOF on stdin also exits.

Usage:
  python cli/serve.py --ckpt ckpt/VCTK/v1/100000 \
      --ref_audio_dir refs/ --ref_tg_dir refs/ [--bf16] [--outdir wavs/]
  python cli/serve.py --bundle bundle/ ...   # serve from an AOT export
      (cli/export.py artifact; no model-building code on the hot path)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument(
        "--bundle", type=str, default=None,
        help="serve from an AOT bundle (cli/export.py output) instead of "
        "building the model; export with the same src/mel buckets",
    )
    parser.add_argument("--vocoder_ckpt", type=str, default=None)
    parser.add_argument("--ref_audio_dir", type=str, default=None)
    parser.add_argument("--ref_tg_dir", type=str, default=None)
    parser.add_argument("--version", type=str, default="")
    parser.add_argument("--outdir", type=str, default="serve_out")
    parser.add_argument("--vocoder", type=str, default=None,
                        choices=["HiFi-GAN", "MelGAN", "WaveGlow", "iSTFTNet"])
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--src_buckets", type=int, nargs="+", default=None)
    parser.add_argument("--mel_buckets", type=int, nargs="+", default=None)
    parser.add_argument(
        "--warmup", action="store_true",
        help="compile before serving: precompile EVERY (src, mel) bucket "
        "pair (and, with --bundle, every exported program) so no real "
        "request pays a compile — mostly cache loads when the persistent "
        "XLA compile cache is warm.",
    )
    parser.add_argument(
        "--warmup_batches", type=int, nargs="+", default=[1],
        help="largest batch size to warm on the live path; expanded to "
        "every power of two up to it (batched requests pad to powers of "
        "two, so e.g. --warmup_batches 8 warms 1 2 4 8 and no request "
        "of <=8 sentences pays a compile). Ignored with --bundle (its "
        "exported batches are warmed as-is).",
    )
    args = parser.parse_args()

    # Own stdout exclusively: replies go to a private dup of the original
    # stdout fd; sys.stdout is repointed at stderr BEFORE any library
    # import so stray prints (third-party warnings, library notices)
    # can never corrupt the JSON-lines protocol.
    reply_stream = os.fdopen(os.dup(sys.stdout.fileno()), "w", buffering=1)
    sys.stdout = sys.stderr

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config
    from styler_tpu.data.audio_io import audiowrite
    from styler_tpu.synthesis import load_reference, load_synthesizer

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

    if args.bundle:
        from styler_tpu.core.export import BundleSynthesizer

        synth = BundleSynthesizer(args.bundle, cfg)
    else:
        synth = load_synthesizer(cfg, args.ckpt, args.vocoder_ckpt,
                             vocoder_arch=args.vocoder)
    os.makedirs(args.outdir, exist_ok=True)

    if args.warmup:
        # Live path: every (batch, src, mel) bucket triple; bundle path:
        # every exported program (buckets come from the bundle manifest,
        # which may differ from cfg's).
        t0 = time.perf_counter()
        # expand to every power-of-two pad target: a batched request of
        # any size <= max(--warmup_batches) lands on a warmed program
        top = 1 << (max(args.warmup_batches) - 1).bit_length()
        batches = [1]
        while batches[-1] < top:
            batches.append(batches[-1] * 2)
        n_warm = (
            synth.warmup()
            if args.bundle
            else synth.warmup(batches=tuple(batches))
        )
        print(
            f"warmup: {n_warm} programs compiled in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
            flush=True,
        )

    ref_cache = {}

    def get_ref(name, speaker_id, noisy):
        key = (name, speaker_id, bool(noisy))
        if key not in ref_cache:
            ref_cache[key] = load_reference(
                cfg, synth.frontend, name, speaker_id, noisy
            )
        return ref_cache[key]

    def reply(obj):
        reply_stream.write(json.dumps(obj) + "\n")
        reply_stream.flush()

    print("serving (JSON lines on stdin)...", file=sys.stderr, flush=True)
    n = 0
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            reply({"ok": False, "error": f"bad json: {e}"})
            continue
        rid = req.get("id")
        if req.get("cmd") == "ping":
            reply({"id": rid, "ok": True, "pong": True})
            continue
        if req.get("cmd") == "shutdown":
            reply({"id": rid, "ok": True, "bye": True})
            return
        if "sentence" not in req and "sentences" not in req:
            # unknown shape: answer with the contract instead of the
            # KeyError the missing field would raise downstream
            reply({
                "id": rid, "ok": False,
                "error": "request needs 'sentence' or 'sentences' "
                         "(plus 'ref'/'refs'), or cmd ping|shutdown",
            })
            continue
        try:
            t0 = time.perf_counter()
            if "sentences" in req:
                sents = list(req["sentences"])
                if not sents:
                    raise ValueError("empty 'sentences' list")
                # explicit-but-empty "refs" is a length mismatch, not a
                # silent fallback to "ref"
                names = (
                    list(req["refs"]) if "refs" in req
                    else [req["ref"]] * len(sents)
                )
                if len(names) != len(sents):
                    raise ValueError(
                        f"refs ({len(names)}) must match sentences ({len(sents)})"
                    )
                pairs = [
                    get_ref(
                        nm, req.get("speaker_id"), req.get("noisy_input", False)
                    )
                    for nm in names
                ]
                # pad to the next power of two: bounded set of compiled
                # batch sizes across request shapes
                pad = (1 << max(len(sents) - 1, 0).bit_length()) - len(sents)
                results = synth.synthesize_batch(
                    sents + [sents[-1]] * pad,
                    [p[0] for p in pairs] + [pairs[-1][0]] * pad,
                    [p[1] for p in pairs] + [pairs[-1][1]] * pad,
                    d_control=float(req.get("d_control", 1.0)),
                    p_control=float(req.get("p_control", 1.0)),
                    e_control=float(req.get("e_control", 1.0)),
                )[: len(sents)]
                wavs, wavs_noisy, mel_lens = [], [], []
                for r in results:
                    base = os.path.join(args.outdir, f"{n:06d}.wav")
                    noisy_path = base[:-4] + "_noisy.wav"
                    audiowrite(r["wav"], cfg.sampling_rate, base)
                    audiowrite(r["wav_noisy"], cfg.sampling_rate, noisy_path)
                    n += 1
                    wavs.append(base)
                    wavs_noisy.append(noisy_path)
                    mel_lens.append(int(r["mel_len"]))
                batch_reply = {
                    "id": rid,
                    "ok": True,
                    "wavs": wavs,
                    "wavs_noisy": wavs_noisy,
                    "mel_lens": mel_lens,
                    "ms": round((time.perf_counter() - t0) * 1e3, 2),
                }
                # the batch path clamps over-long inputs (it cannot
                # chunk like the single path): tell the client which
                # items lost content instead of a silently-short wav
                if any(r.get("truncated") for r in results):
                    batch_reply["truncated"] = [
                        bool(r.get("truncated")) for r in results
                    ]
                reply(batch_reply)
                continue
            ref, spk = get_ref(
                req["ref"], req.get("speaker_id"), req.get("noisy_input", False)
            )
            result = synth.synthesize(
                req["sentence"], ref, spk,
                d_control=float(req.get("d_control", 1.0)),
                p_control=float(req.get("p_control", 1.0)),
                e_control=float(req.get("e_control", 1.0)),
            )
            base = req.get("out") or os.path.join(args.outdir, f"{n:06d}.wav")
            root, ext = os.path.splitext(base)
            if ext.lower() != ".wav":  # only wav output is supported
                root, base = base, base + ".wav"
            noisy_path = root + "_noisy.wav"
            audiowrite(result["wav"], cfg.sampling_rate, base)
            audiowrite(result["wav_noisy"], cfg.sampling_rate, noisy_path)
            n += 1
            reply(
                {
                    "id": rid,
                    "ok": True,
                    "wav": base,
                    "wav_noisy": noisy_path,
                    "mel_len": int(result["mel_len"]),
                    "ms": round((time.perf_counter() - t0) * 1e3, 2),
                }
            )
        except Exception as e:  # keep serving on per-request failures
            reply({"id": rid, "ok": False, "error": f"{type(e).__name__}: {e}"})


if __name__ == "__main__":
    main()
