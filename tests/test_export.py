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
