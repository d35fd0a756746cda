"""AOT serving-bundle export (styler_tpu/core/export.py): export the
jitted synthesis program per bucket via jax.export, reload it from disk
with no model code, and check it reproduces the live Synthesizer."""

import json
import os

import numpy as np
import pytest

from styler_tpu.core.config import default_config
from styler_tpu.core.export import ServingBundle, save_serving_bundle
from styler_tpu.synthesis import extract_reference_features, load_synthesizer

cfg = default_config().replace(src_buckets=(32,), mel_buckets=(64,))


@pytest.fixture(scope="module")
def synth():
    return load_synthesizer(cfg)


@pytest.fixture(scope="module")
def bundle_dir(synth, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bundle"))
    manifest = save_serving_bundle(synth, out, platforms=["cpu"])
    assert len(manifest["entries"]) == 1
    return out


def test_bundle_files(bundle_dir):
    files = set(os.listdir(bundle_dir))
    assert "manifest.json" in files and "weights.npz" in files
    with open(os.path.join(bundle_dir, "manifest.json")) as f:
        manifest = json.load(f)
    name = manifest["entries"][0]["name"]
    assert name + ".jaxexp" in files
    assert manifest["audio"]["hop_length"] == cfg.hop_length


def test_bundle_matches_live_synthesizer(synth, bundle_dir):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(cfg.hop_length * 60) * 0.1).astype(np.float32)
    ref = extract_reference_features(wav, cfg, synth.frontend)
    spk = np.zeros(cfg.speaker_embed_dim, np.float32)
    spk[0] = 1.0

    sentence = "Hello world."
    live = synth.synthesize(sentence, ref, spk)

    bundle = ServingBundle(bundle_dir)
    ids = synth.text_to_ids(sentence)
    out = bundle.synthesize(
        ids,
        ref.mel[: ref.mel_len],
        ref.f0_norm[: ref.mel_len],
        ref.energy01[: ref.mel_len],
        spk,
    )
    assert out["mel_len"] == live["mel_len"]
    np.testing.assert_allclose(out["mel"], live["mel"], atol=2e-4)
    np.testing.assert_allclose(out["wav"], live["wav"], atol=2e-4)
    assert np.isfinite(out["wav_noisy"]).all()


def test_bundle_synthesizer_adapter(synth, bundle_dir):
    """BundleSynthesizer (the `serve --bundle` backend) matches the live
    Synthesizer through the same text front end."""
    from styler_tpu.core.export import BundleSynthesizer

    bs = BundleSynthesizer(bundle_dir, cfg)
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(cfg.hop_length * 60) * 0.1).astype(np.float32)
    ref = extract_reference_features(wav, cfg, bs.frontend)
    spk = np.zeros(cfg.speaker_embed_dim, np.float32)
    spk[0] = 1.0
    live = synth.synthesize("Bundle serving.", ref, spk)
    out = bs.synthesize("Bundle serving.", ref, spk)
    assert out["mel_len"] == live["mel_len"]
    np.testing.assert_allclose(out["mel"], live["mel"], atol=2e-4)
    batch = bs.synthesize_batch(["One.", "Two."], [ref, ref], [spk, spk])
    assert len(batch) == 2 and all(np.isfinite(b["wav"]).all() for b in batch)


@pytest.fixture(scope="module")
def batched_bundle_dir(synth, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bundle_b14"))
    manifest = save_serving_bundle(synth, out, batch=(1, 4), platforms=["cpu"])
    assert len(manifest["entries"]) == 2  # batch 1 + batch 4
    return out


def test_batched_bundle_single_dispatch(synth, batched_bundle_dir):
    """A batched request against a multi-batch bundle runs ONE dispatch
    through the smallest exported batch program that holds it (the
    round-2 adapter looped sentences through the batch-1 program)."""
    from styler_tpu.core.export import BundleSynthesizer

    bs = BundleSynthesizer(batched_bundle_dir, cfg)
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(cfg.hop_length * 60) * 0.1).astype(np.float32)
    ref = extract_reference_features(wav, cfg, bs.frontend)
    spk = np.zeros(cfg.speaker_embed_dim, np.float32)
    spk[0] = 1.0

    calls = []
    orig = bs.bundle.call

    def counting_call(B, L, M, *arrays):
        calls.append((B, L, M))
        return orig(B, L, M, *arrays)

    bs.bundle.call = counting_call
    out = bs.synthesize_batch(
        ["One.", "Two.", "Three."], [ref] * 3, [spk] * 3
    )
    assert len(out) == 3
    assert len(calls) == 1 and calls[0][0] == 4  # one dispatch, batch-4
    # matches the live path per item
    live = synth.synthesize("Two.", ref, spk)
    assert out[1]["mel_len"] == live["mel_len"]
    np.testing.assert_allclose(out[1]["mel"], live["mel"], atol=2e-4)
    # oversize requests chunk by the largest exported batch
    calls.clear()
    out = bs.synthesize_batch(["Hi."] * 6, [ref] * 6, [spk] * 6)
    assert len(out) == 6
    assert [c[0] for c in calls] == [4, 2] or [c[0] for c in calls] == [4, 4]


def test_bundle_warmup(batched_bundle_dir):
    bundle = ServingBundle(batched_bundle_dir)
    assert bundle.warmup() == len(bundle.manifest["entries"])


def test_weight_ordering_contract(tmp_path):
    """>=1000-leaf weight blobs round-trip in order: the manifest key
    list (new bundles) and the numeric-sort fallback (old bundles) both
    avoid the lexicographic trap ('m1000' < 'm999')."""
    n = 1100
    keys = [f"m{i:05d}" for i in range(n)]
    vals = {k: np.full(1, i, np.float32) for i, k in enumerate(keys)}
    vals["v00000"] = np.zeros(1, np.float32)
    np.savez(tmp_path / "weights.npz", **vals)

    manifest = {
        "entries": [],
        "weights": "weights.npz",
        "model_weight_keys": keys,
        "vocoder_weight_keys": ["v00000"],
    }
    with open(tmp_path / "manifest.json", "w") as f:
        json.dump(manifest, f)
    b = ServingBundle(str(tmp_path))
    got = np.concatenate(b._model_flat)
    np.testing.assert_array_equal(got, np.arange(n, dtype=np.float32))

    # legacy bundle without key lists: numeric-sort fallback, including
    # the old 3-digit padding past 999
    legacy_keys = [f"m{i:03d}" for i in range(n)]
    legacy = {k: np.full(1, i, np.float32) for i, k in enumerate(legacy_keys)}
    legacy["v000"] = np.zeros(1, np.float32)
    np.savez(tmp_path / "weights.npz", **legacy)
    with open(tmp_path / "manifest.json", "w") as f:
        json.dump({"entries": [], "weights": "weights.npz"}, f)
    b = ServingBundle(str(tmp_path))
    got = np.concatenate(b._model_flat)
    np.testing.assert_array_equal(got, np.arange(n, dtype=np.float32))


def test_export_mel_out_follows_override(synth, tmp_path):
    """A mel_buckets override larger than the config's raises the
    exported output cap with it (round-2 silently capped outputs at the
    config's largest bucket)."""
    out = str(tmp_path / "bundle128")
    manifest = save_serving_bundle(
        synth, out, mel_buckets=(128,), platforms=["cpu"]
    )
    assert manifest["audio"]["mel_out"] == 128
    bundle = ServingBundle(out)
    assert bundle.warmup() == 1


def test_bundle_controls_change_output(synth, bundle_dir):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(cfg.hop_length * 60) * 0.1).astype(np.float32)
    ref = extract_reference_features(wav, cfg, synth.frontend)
    bundle = ServingBundle(bundle_dir)
    ids = synth.text_to_ids("Testing controls now.")
    args = (
        ids,
        ref.mel[: ref.mel_len],
        ref.f0_norm[: ref.mel_len],
        ref.energy01[: ref.mel_len],
    )
    fast = bundle.synthesize(*args, d_control=0.5)
    slow = bundle.synthesize(*args, d_control=1.5)
    assert fast["mel_len"] <= slow["mel_len"]
