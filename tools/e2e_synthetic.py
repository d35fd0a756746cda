"""Full-lifecycle validation on a synthetic corpus, on whatever backend
jax picks (the real chip in the main env; CPU under the test config).

Builds a small multi-speaker sine corpus with MFA-style TextGrids, then
drives the REAL surfaces in order:

  preprocess (library build_from_path + WHAM-style noise mixing, f0
  backend selectable) -> cli/train.py (N steps, checkpoint) ->
  cli/evaluate.py -> cli/synthesize.py (clean + noisy wavs through the
  fused vocoder when on TPU) -> style grids (--inspection + --cont,
  per-combo overlay pngs) -> cli/export.py (AOT StableHLO bundle,
  batches 1+2) -> cli/serve.py sessions against BOTH the live
  checkpoint and the bundle (ping + single + batched requests)

and asserts each stage's artifacts. Each stage is a fresh process.
This is the script of record for "validated on hardware" claims in
CLAUDE.md. Pass --skip_grids / --skip_serving to run the shorter
round-1 lifecycle only.

Usage: python tools/e2e_synthetic.py [--workdir DIR] [--steps N]
       [--f0_backend native|numpy|device] [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.0
        intervals: size = 5
        intervals [1]:
            xmin = 0.0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 0.5
            text = "HH"
        intervals [3]:
            xmin = 0.5
            xmax = 0.75
            text = "sp"
        intervals [4]:
            xmin = 0.75
            xmax = 1.0
            text = "AY1"
        intervals [5]:
            xmin = 1.0
            xmax = 2.0
            text = "sil"
"""


def build_corpus(work, cfg, f0_backend):
    from scipy.io import wavfile

    from styler_tpu.data.noise_mixer import build_from_path as build_noisy
    from styler_tpu.data.vctk import build_from_path, write_metadata

    in_dir = os.path.join(work, "raw")
    out_dir = os.path.join(work, "preprocessed", cfg.dataset)
    rng = np.random.default_rng(0)
    for s in range(3):
        spk = f"p{s + 1:03d}"
        os.makedirs(os.path.join(in_dir, spk), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "TextGrid", spk), exist_ok=True)
        for i in range(4):
            base = f"{spk}_{i:03d}"
            t = np.arange(22050) / 22050
            f0 = 120 + 40 * s + 15 * i
            wav = sum(
                (0.5 / (k + 1)) * np.sin(2 * np.pi * f0 * (k + 1) * t)
                for k in range(3)
            )
            wav += 0.01 * rng.standard_normal(len(t))
            wavfile.write(
                os.path.join(in_dir, spk, f"{base}.wav"),
                22050,
                (np.clip(wav, -1, 1) * 32767).astype(np.int16),
            )
            with open(os.path.join(in_dir, spk, f"{base}.txt"), "w") as f:
                f.write("hi\n")
            with open(
                os.path.join(out_dir, "TextGrid", spk, f"{base}.TextGrid"), "w"
            ) as f:
                f.write(TG)

    train, val = build_from_path(in_dir, out_dir, cfg, f0_backend=f0_backend)
    assert len(train) + len(val) == 12, (len(train), len(val))
    write_metadata(train, val, out_dir)

    noise_dir = os.path.join(work, "noise")
    os.makedirs(noise_dir, exist_ok=True)
    from scipy.io import wavfile as wf

    nz = (rng.standard_normal(60000) * 3000).astype(np.int16)
    wf.write(os.path.join(noise_dir, "nz.wav"), 22050, nz)
    build_noisy(in_dir, out_dir, cfg, noise_dir=noise_dir)
    print(f"[e2e] corpus built: {len(train)} train / {len(val)} val")
    return in_dir, out_dir


def run(args_list, cwd):
    print("[e2e] $", " ".join(args_list))
    subprocess.run([sys.executable] + args_list, cwd=cwd, check=True)


def serve_session(extra_args, requests, cwd):
    """Drive one cli/serve.py process over its JSON-lines protocol;
    returns the replies (shutdown reply excluded)."""
    cmd = [sys.executable, os.path.join(REPO, "cli/serve.py")] + extra_args
    print("[e2e] $", " ".join(cmd[1:]))
    p = subprocess.Popen(
        cmd, cwd=cwd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True
    )
    replies = []
    try:
        for req in requests + [{"cmd": "shutdown"}]:
            p.stdin.write(json.dumps(req) + "\n")
            p.stdin.flush()
            line = p.stdout.readline()
            assert line, f"serve.py died on {req}"
            replies.append(json.loads(line))
    finally:
        p.stdin.close()
        p.wait(timeout=300)
    assert p.returncode == 0, f"serve.py exited {p.returncode}"
    return replies[:-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/styler_e2e")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--f0_backend", default=None,
                    choices=[None, "native", "numpy", "device"])
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir on success")
    ap.add_argument("--skip_grids", action="store_true",
                    help="skip the --inspection/--cont grid stages")
    ap.add_argument("--skip_serving", action="store_true",
                    help="skip the export + serve-session stages")
    args = ap.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from styler_tpu.core.config import default_config

    cfg = default_config()
    work = args.workdir
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)

    in_dir, out_dir = build_corpus(work, cfg, args.f0_backend)

    train_cmd = [
        os.path.join(REPO, "cli/train.py"),
        "--preprocessed", "preprocessed",
        "--batch_size", "4",
        "--max_steps", str(args.steps),
        "--version", "e2e",
    ]
    if args.bf16:
        train_cmd.append("--bf16")
    run(train_cmd, cwd=work)
    ckpt = os.path.join(work, "ckpt", cfg.dataset, "e2e", str(args.steps))
    assert os.path.isdir(ckpt), f"missing checkpoint {ckpt}"
    metrics_path = os.path.join(
        work, "log", cfg.dataset, "e2e", "train_metrics.jsonl"
    )
    with open(metrics_path) as f:
        rows = [json.loads(l) for l in f]
    first, last = rows[0], rows[-1]
    print(
        f"[e2e] train total loss {first['total']:.1f} -> {last['total']:.1f} "
        f"({len(rows)} logged steps)"
    )
    assert np.isfinite(last["total"])

    run(
        [
            os.path.join(REPO, "cli/evaluate.py"),
            "--preprocessed", "preprocessed",
            "--restore_step", str(args.steps),
            "--version", "e2e",
            "--max_batches", "1",
        ],
        cwd=work,
    )

    ref_dir = os.path.join(work, "raw", "p001")
    outdir = os.path.join(work, "synth_out")
    run(
        [
            os.path.join(REPO, "cli/synthesize.py"),
            "--ckpt", ckpt,
            "--version", "e2e",
            "--ref_name", "p001_000",
            "--ref_audio_dir", ref_dir,
            "--ref_tg_dir", ref_dir,
            "--sentence", "Hello world.",
            "--outdir", outdir,
        ],
        cwd=work,
    )
    wavs = [f for f in os.listdir(outdir) if f.endswith(".wav")]
    assert any("noisy" in f for f in wavs) and any(
        "noisy" not in f for f in wavs
    ), wavs
    from scipy.io import wavfile

    for w in wavs:
        sr, data = wavfile.read(os.path.join(outdir, w))
        assert sr == cfg.sampling_rate and len(data) > 1000
        assert np.isfinite(data.astype(np.float64)).all()
    print(f"[e2e] OK — {len(wavs)} wavs synthesized")

    # refs dir spanning two speakers for the grid + serve stages
    refs_dir = os.path.join(work, "refs")
    os.makedirs(refs_dir, exist_ok=True)
    for name in ("p001_000", "p002_000"):
        spk = name.split("_")[0]
        shutil.copy(
            os.path.join(work, "raw", spk, name + ".wav"),
            os.path.join(refs_dir, name + ".wav"),
        )

    if not args.skip_grids:
        # ---- inspection grid: per-ablation wav + overlay png + the
        # reference-spectrogram row (reference synthesize.py:284-289) ----
        grid_out = os.path.join(work, "grid_out")
        run(
            [
                os.path.join(REPO, "cli/synthesize.py"),
                "--ckpt", ckpt, "--version", "e2e",
                "--ref_name", "p001_000",
                "--ref_audio_dir", refs_dir, "--ref_tg_dir", refs_dir,
                "--sentence", "Hello world.",
                "--inspection", "--outdir", grid_out,
            ],
            cwd=work,
        )
        gridfiles = os.listdir(grid_out)
        assert any("inspect_Reference" in f and f.endswith(".png")
                   for f in gridfiles), gridfiles
        n_wav = sum("_inspect_" in f and f.endswith(".wav") for f in gridfiles)
        n_png = sum("_inspect_" in f and f.endswith(".png") for f in gridfiles)
        assert n_wav >= 4 and n_png >= n_wav + 1, (n_wav, n_png)
        print(f"[e2e] inspection grid OK ({n_wav} ablations + overlays)")

        # ---- cont grid: 2^5 mix-and-match combos, each with wav + mel
        # npy + overlay png, plus the two references' own rows ----------
        cont_out = os.path.join(work, "cont_out")
        run(
            [
                os.path.join(REPO, "cli/synthesize.py"),
                "--ckpt", ckpt, "--version", "e2e",
                "--cont", "--r1", "p001_000", "--r2", "p002_000",
                "--ref_audio_dir", refs_dir, "--ref_tg_dir", refs_dir,
                "--sentence", "Hello world.",
                "--outdir", cont_out,
            ],
            cwd=work,
        )
        cdir = os.path.join(cont_out, "control_r1_p001_000_r2_p002_000")
        cfiles = set(os.listdir(cdir))
        for comb in (f"{c:05b}" for c in range(32)):
            for ext in (".wav", ".npy", ".png"):
                assert comb + ext in cfiles, (comb + ext, sorted(cfiles)[:8])
        for name in ("p001_000", "p002_000"):
            assert name + ".wav" in cfiles and name + ".png" in cfiles
        print(f"[e2e] cont grid OK ({len(cfiles)} files)")

    if not args.skip_serving:
        # ---- AOT export: batches 1+2 at one small bucket pair ----------
        bundle = os.path.join(work, "bundle")
        run(
            [
                os.path.join(REPO, "cli/export.py"),
                "--ckpt", ckpt, "--version", "e2e", "--out", bundle,
                "--batch", "1", "2",
                "--src_buckets", "32", "--mel_buckets", "128",
            ],
            cwd=work,
        )
        with open(os.path.join(bundle, "manifest.json")) as f:
            man = json.load(f)
        assert len(man["entries"]) == 2, man["entries"]
        assert man["model_weight_keys"] and man["vocoder_weight_keys"]

        # ---- serve sessions: live checkpoint, then the AOT bundle ------
        reqs = [
            {"cmd": "ping"},
            {"sentence": "Hello world.", "ref": "p001_000", "id": 1},
            {"sentences": ["Hello world.", "Hi."],
             "refs": ["p001_000", "p002_000"], "id": 2},
        ]
        common = [
            "--ref_audio_dir", refs_dir, "--ref_tg_dir", refs_dir,
            "--outdir", os.path.join(work, "serve_out"), "--version", "e2e",
            "--warmup",
        ]
        for label, extra in (
            ("live", ["--ckpt", ckpt, "--src_buckets", "32",
                      "--mel_buckets", "128", "--warmup_batches", "1", "2"]),
            ("bundle", ["--bundle", bundle]),
        ):
            replies = serve_session(common + extra, reqs, cwd=work)
            assert replies[0].get("pong"), replies[0]
            assert all(r.get("ok") for r in replies), replies
            for w in [replies[1]["wav"], replies[1]["wav_noisy"],
                      *replies[2]["wavs"], *replies[2]["wavs_noisy"]]:
                path = w if os.path.isabs(w) else os.path.join(work, w)
                assert os.path.getsize(path) > 1000, w
            print(f"[e2e] serve session OK ({label}: "
                  f"single {replies[1]['ms']:.0f} ms, "
                  f"batched-2 {replies[2]['ms']:.0f} ms)")

    print("[e2e] OK — lifecycle complete")
    if not args.keep:
        shutil.rmtree(work)


if __name__ == "__main__":
    main()
