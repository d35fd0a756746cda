"""Full-lifecycle validation on a synthetic corpus, on whatever backend
jax picks (the real chip in the main env; CPU under the test config).

Builds a small multi-speaker sine corpus with MFA-style TextGrids, then
drives the REAL surfaces in order:

  preprocess (library build_from_path + WHAM-style noise mixing, f0
  backend selectable) -> cli/train.py (N steps, checkpoint) ->
  cli/evaluate.py -> cli/synthesize.py (clean + noisy wavs through the
  fused vocoder when on TPU)

and asserts each stage's artifacts. ~5 minutes for --steps 50 on a v5e
(compiles dominate). This is the script of record for "validated on
hardware" claims in CLAUDE.md.

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/styler_e2e")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--f0_backend", default=None,
                    choices=[None, "native", "numpy", "device"])
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir on success")
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
    print(f"[e2e] OK — {len(wavs)} wavs synthesized; lifecycle complete")
    if not args.keep:
        shutil.rmtree(work)


if __name__ == "__main__":
    main()
