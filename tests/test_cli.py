"""CLI smoke tests: drive cli/train.py end-to-end on a synthetic corpus
(2 optimizer steps, TensorBoard + jsonl logging, checkpoint save)."""

import os
import sys

import numpy as np
import pytest
from scipy.io import wavfile

from styler_tpu.core.config import default_config

from .test_data import TG_SAMPLE

cfg = default_config()


@pytest.fixture
def corpus(tmp_path):
    in_dir = tmp_path / "raw"
    out_dir = tmp_path / "preprocessed" / cfg.dataset
    (in_dir / "p001").mkdir(parents=True)
    (out_dir / "TextGrid" / "p001").mkdir(parents=True)
    for i in range(3):
        base = f"p001_{i:03d}"
        t = np.arange(22050) / 22050
        wav = (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t) * 32767).astype(np.int16)
        wavfile.write(str(in_dir / "p001" / f"{base}.wav"), 22050, wav)
        (in_dir / "p001" / f"{base}.txt").write_text("hi\n")
        (out_dir / "TextGrid" / "p001" / f"{base}.TextGrid").write_text(TG_SAMPLE)
    from styler_tpu.data.noise_mixer import build_from_path as build_noisy
    from styler_tpu.data.vctk import build_from_path, write_metadata

    train, val = build_from_path(str(in_dir), str(out_dir), cfg)
    write_metadata(train, val, str(out_dir))
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    nz = (np.random.default_rng(1).standard_normal(30000) * 3000).astype(np.int16)
    wavfile.write(str(noise_dir / "nz.wav"), 22050, nz)
    build_noisy(str(in_dir), str(out_dir), cfg, noise_dir=str(noise_dir))
    return tmp_path


def test_train_cli_two_steps(corpus, monkeypatch):
    monkeypatch.chdir(corpus)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train.py",
            "--preprocessed", "preprocessed",
            "--batch_size", "2",
            "--max_steps", "2",
            "--synth_step", "2",
            "--version", "smoke",
        ],
    )
    sys.path.insert(0, "/root/repo")
    from cli.train import main

    main()
    # checkpoint written at max_steps
    assert os.path.isdir(os.path.join("ckpt", cfg.dataset, "smoke", "2"))
    # jsonl metrics written
    metrics = os.path.join("log", cfg.dataset, "smoke", "train_metrics.jsonl")
    assert os.path.isfile(metrics) and os.path.getsize(metrics) > 0
    # tensorboard event files exist for the train writer
    tb_dir = os.path.join("log", cfg.dataset, "smoke", "train")
    assert os.path.isdir(tb_dir) and len(os.listdir(tb_dir)) > 0
    # synth_step monitoring fired: 6 audio channels + overlay pngs in
    # the synth dir (reference train.py:230-332 surface)
    synth_dir = os.path.join("synth", cfg.dataset, "smoke")
    files = os.listdir(synth_dir)
    assert sum(f.endswith(".wav") for f in files) == 6, files
    assert sum(f.endswith(".png") for f in files) == 2, files


def test_synthesize_cli(tmp_path, monkeypatch):
    ref_dir = tmp_path / "refs"
    ref_dir.mkdir()
    t = np.arange(int(22050 * 0.6)) / 22050
    wav = (0.4 * np.sin(2 * np.pi * 170 * t) * 32767).astype(np.int16)
    wavfile.write(str(ref_dir / "p001_001.wav"), 22050, wav)
    outdir = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "synthesize.py",
            "--ref_name", "p001_001",
            "--ref_audio_dir", str(ref_dir),
            "--ref_tg_dir", str(ref_dir),
            "--sentence", "Hi.",
            "--outdir", str(outdir),
            "--src_buckets", "32",
            "--mel_buckets", "64",
        ],
    )
    sys.path.insert(0, "/root/repo")
    from cli.synthesize import main

    main()
    wavs = [f for f in os.listdir(outdir) if f.endswith(".wav")]
    assert any("noisy" in f for f in wavs) and any("noisy" not in f for f in wavs)
    mels = [f for f in os.listdir(outdir) if f.endswith("_mel.npy")]
    assert mels
    m = np.load(outdir / mels[0])
    assert m.ndim == 2 and m.shape[1] == 80 and np.isfinite(m).all()
    # per-output overlay pngs, clean + noisy (reference synthesize.py:366-379)
    pngs = [f for f in os.listdir(outdir) if f.endswith(".png")]
    assert any("noisy" in f for f in pngs) and any("noisy" not in f for f in pngs)


def test_synthesize_cli_grids(tmp_path, monkeypatch):
    """--cont and --inspection write the reference's full artifact
    inventory: per-combo overlay pngs + wavs, plus the references' own
    wav copies and feature rows (reference synthesize.py:227-231,
    277-279, 284-289, 341-344)."""
    ref_dir = tmp_path / "refs"
    ref_dir.mkdir()
    t = np.arange(int(22050 * 0.6)) / 22050
    for name, f in (("p001_001", 170), ("p002_001", 120)):
        wav = (0.4 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
        wavfile.write(str(ref_dir / f"{name}.wav"), 22050, wav)
    outdir = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    from cli.synthesize import main

    monkeypatch.setattr(
        sys, "argv",
        ["synthesize.py", "--cont", "--r1", "p001_001", "--r2", "p002_001",
         "--ref_audio_dir", str(ref_dir), "--ref_tg_dir", str(ref_dir),
         "--sentence", "Hi.", "--outdir", str(outdir),
         "--src_buckets", "32", "--mel_buckets", "64"],
    )
    main()
    cont_dir = outdir / "control_r1_p001_001_r2_p002_001"
    files = set(os.listdir(cont_dir))
    for name in ("p001_001", "p002_001"):  # reference rows
        assert f"{name}.wav" in files and f"{name}.png" in files
    for comb in range(32):  # per-combo wav + overlay png + mel npy
        for ext in (".wav", ".png", ".npy"):
            assert f"{comb:05b}{ext}" in files, f"{comb:05b}{ext}"

    monkeypatch.setattr(
        sys, "argv",
        ["synthesize.py", "--ref_name", "p001_001", "--inspection",
         "--ref_audio_dir", str(ref_dir), "--ref_tg_dir", str(ref_dir),
         "--sentence", "Hi.", "--outdir", str(outdir),
         "--src_buckets", "32", "--mel_buckets", "64"],
    )
    main()
    files = set(os.listdir(outdir))
    inspect_pngs = {f for f in files if "_inspect_" in f and f.endswith(".png")}
    inspect_wavs = {f for f in files if "_inspect_" in f and f.endswith(".wav")}
    assert any(f.endswith("_inspect_Reference.png") for f in files)
    assert len(inspect_wavs) == 10  # the 10 ablation rows
    assert len(inspect_pngs) == 11  # + the reference row (png only)


def test_evaluate_cli(corpus, monkeypatch, capsys):
    monkeypatch.chdir(corpus)
    monkeypatch.setattr(
        sys,
        "argv",
        ["evaluate.py", "--preprocessed", "preprocessed", "--max_batches", "1"],
    )
    sys.path.insert(0, "/root/repo")
    from cli.evaluate import main

    main()
    out = capsys.readouterr().out
    # all 10 averaged loss components printed
    for key in ("total", "mel", "mel_postnet", "duration", "f0", "energy",
                "dat_clean", "dat_aug"):
        assert f"{key}:" in out, out


def test_serve_cli(tmp_path, monkeypatch):
    """The JSON-lines server synthesizes per request, caches references,
    survives bad requests, and shuts down on command."""
    import json
    import subprocess

    ref_dir = tmp_path / "refs"
    ref_dir.mkdir()
    t = np.arange(int(22050 * 0.6)) / 22050
    wav = (0.4 * np.sin(2 * np.pi * 170 * t) * 32767).astype(np.int16)
    wavfile.write(str(ref_dir / "p001_001.wav"), 22050, wav)
    outdir = tmp_path / "out"

    proc = subprocess.Popen(
        [sys.executable, os.path.join("/root/repo", "cli/serve.py"),
         "--ref_audio_dir", str(ref_dir), "--ref_tg_dir", str(ref_dir),
         "--outdir", str(outdir),
         "--src_buckets", "32", "--mel_buckets", "64", "--warmup"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        cwd=str(tmp_path),
    )
    try:
        reqs = [
            {"id": 0, "cmd": "ping"},
            {"id": 1, "sentence": "Hi.", "ref": "p001_001"},
            {"id": 2, "sentence": "Hi again.", "ref": "missing_ref"},
            # a non-.wav client path must be normalized, not silently
            # truncated (regression: "x.flac" used to become "x._noisy.wav")
            {"id": 3, "sentence": "Hi.", "ref": "p001_001",
             "out": str(outdir / "custom.flac")},
            # batched: N sentences through ONE jitted synthesize_batch
            {"id": 5, "sentences": ["One two.", "Three."],
             "ref": "p001_001"},
            # clean per-request errors, not opaque crashes:
            {"id": 6, "sentences": [], "ref": "p001_001"},
            {"id": 7, "sentences": ["Hi."], "refs": [], "ref": "p001_001"},
            # long sentence: chunked synthesis, not a broadcast crash
            {"id": 8, "ref": "p001_001",
             "sentence": "The quick brown fox jumps over the lazy dog, " * 4},
            # unknown request shape: a contract message, not a KeyError
            {"id": 9, "ref": "p001_001"},
            {"id": 4, "cmd": "shutdown"},
        ]
        proc.stdin.write("".join(json.dumps(r) + "\n" for r in reqs))
        proc.stdin.flush()
        proc.stdin.close()
        lines = [json.loads(l) for l in proc.stdout if l.strip()]
        assert proc.wait(timeout=600) == 0
    finally:
        proc.kill()

    by_id = {l["id"]: l for l in lines}
    assert by_id[0]["pong"] and by_id[4]["bye"]
    assert by_id[1]["ok"], by_id[1]
    assert by_id[3]["ok"], by_id[3]
    assert by_id[3]["wav"].endswith("custom.flac.wav")
    assert by_id[3]["wav_noisy"].endswith("custom.flac_noisy.wav")
    assert os.path.exists(by_id[3]["wav"])
    assert os.path.exists(by_id[3]["wav_noisy"])
    sr, data = wavfile.read(by_id[1]["wav"])
    # random weights predict near-zero durations, so assert the written
    # audio is consistent with the reported mel_len (hop 256), not an
    # absolute length
    assert sr == 22050 and len(data) == by_id[1]["mel_len"] * 256 > 0
    assert os.path.exists(by_id[1]["wav_noisy"])
    assert not by_id[2]["ok"] and "error" in by_id[2]
    assert by_id[5]["ok"], by_id[5]
    assert len(by_id[5]["wavs"]) == 2 == len(by_id[5]["mel_lens"])
    for w, ml in zip(by_id[5]["wavs"], by_id[5]["mel_lens"]):
        sr, data = wavfile.read(w)
        assert sr == 22050 and len(data) == ml * 256 > 0
    # empty sentences / explicitly-empty refs are clean per-request errors
    assert not by_id[6]["ok"] and "empty" in by_id[6]["error"]
    assert not by_id[7]["ok"] and "must match" in by_id[7]["error"]
    # long sentence (past the 32-phoneme src bucket) serves via chunking
    assert by_id[8]["ok"], by_id[8]
    sr, data = wavfile.read(by_id[8]["wav"])
    assert sr == 22050 and len(data) == by_id[8]["mel_len"] * 256 > 0
    # request with neither sentence nor sentences: contract message
    assert not by_id[9]["ok"] and "sentence" in by_id[9]["error"]


def test_enable_persistent_cache(tmp_path, monkeypatch):
    """Compile-cache helper points jax at the dir, honors the env
    override and the opt-out, and never clobbers explicit config."""
    import jax

    from styler_tpu.core.compile_cache import enable_persistent_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        p = enable_persistent_cache(str(tmp_path / "xla"))
        assert p == str(tmp_path / "xla")
        assert os.path.isdir(p)
        assert jax.config.jax_compilation_cache_dir == p

        monkeypatch.setenv("STYLER_TPU_CACHE_DIR", str(tmp_path / "env"))
        assert enable_persistent_cache() == str(tmp_path / "env")

        monkeypatch.setenv("STYLER_TPU_NO_COMPILE_CACHE", "1")
        assert enable_persistent_cache(str(tmp_path / "no")) is None
        assert not (tmp_path / "no").exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_train_cli_mid_epoch_resume_determinism(corpus, monkeypatch):
    """VERDICT r3 #7: restoring at step k reproduces the uninterrupted
    run exactly — same batch order (epoch fast-forward + intra-epoch
    offset) and same per-step rng (fold_in on the step counter), so the
    final checkpoints match bitwise.

    The 2-utterance train split at batch_size 1 gives 2 steps/epoch:
    restore at step 3 lands mid-epoch (epoch 1, offset 1)."""
    import shutil

    monkeypatch.chdir(corpus)
    sys.path.insert(0, "/root/repo")
    from cli.train import main

    def run(version, extra):
        monkeypatch.setattr(
            sys,
            "argv",
            ["train.py", "--preprocessed", "preprocessed",
             "--batch_size", "1", "--version", version,
             "--save_step", "3", "--max_steps", "5"] + extra,
        )
        main()

    run("resume_a", [])
    a_dir = os.path.join("ckpt", cfg.dataset, "resume_a")
    assert os.path.isdir(os.path.join(a_dir, "3"))
    assert os.path.isdir(os.path.join(a_dir, "5"))

    # second version dir seeded with only the step-3 checkpoint
    b_dir = os.path.join("ckpt", cfg.dataset, "resume_b")
    os.makedirs(b_dir)
    shutil.copytree(os.path.join(a_dir, "3"), os.path.join(b_dir, "3"))
    run("resume_b", ["--restore_step", "3"])
    assert os.path.isdir(os.path.join(b_dir, "5"))

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    a = ckptr.restore(os.path.abspath(os.path.join(a_dir, "5")))
    b = ckptr.restore(os.path.abspath(os.path.join(b_dir, "5")))
    import jax

    leaves_a, treedef_a = jax.tree_util.tree_flatten(a)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
