"""Synthesis engine tests: text -> waveform with a synthetic style
reference, the inspection ablation grid, and the 2^5 mix-and-match
controllability path (random weights; contract/shape/finiteness checks).

Small shape buckets keep CPU compiles fast.
"""

import numpy as np
import pytest

from styler_tpu.core.config import default_config
from styler_tpu.synthesis import ReferenceFeatures, extract_reference_features, load_synthesizer

cfg = default_config().replace(src_buckets=(32,), mel_buckets=(64,))


@pytest.fixture(scope="module")
def synth():
    return load_synthesizer(cfg)


@pytest.fixture(scope="module")
def ref(synth):
    t = np.arange(int(22050 * 0.6)) / 22050
    wav = (0.4 * np.sin(2 * np.pi * 180 * t) * 32768.0).astype(np.float32)
    r = extract_reference_features(wav, cfg, synth.frontend)
    assert isinstance(r, ReferenceFeatures)
    assert r.mel.shape[1] == cfg.n_mel_channels
    assert r.mel_len <= cfg.mel_buckets[-1]
    assert (r.f0_norm >= 0).all() and (r.f0_norm <= 1).all()
    assert (r.energy01 >= 0).all() and (r.energy01 <= 1).all()
    return r


@pytest.fixture(scope="module")
def spk():
    e = np.random.default_rng(0).standard_normal(512).astype(np.float32)
    return e / np.linalg.norm(e)


def test_synthesize_contract(synth, ref, spk):
    out = synth.synthesize("Hi.", ref, spk)
    ml = out["mel_len"]
    assert 0 < ml <= cfg.mel_buckets[-1]
    assert out["mel"].shape == (ml, cfg.n_mel_channels)
    assert out["mel_noisy"].shape == (ml, cfg.n_mel_channels)
    assert out["wav"].shape == (ml * cfg.hop_length,)
    assert out["wav_noisy"].shape == (ml * cfg.hop_length,)
    assert np.isfinite(out["mel"]).all() and np.isfinite(out["wav"]).all()
    for key in ("t", "t_neck", "p_down", "s_down", "d", "s", "e", "n"):
        assert key in out["encodings"], f"missing encoding {key}"


def test_controls_change_duration(synth, ref, spk):
    slow = synth.synthesize("Hi.", ref, spk, d_control=1.6)
    fast = synth.synthesize("Hi.", ref, spk, d_control=0.4)
    assert slow["mel_len"] >= fast["mel_len"]


def test_inspection_grid(synth, ref, spk):
    grid = synth.inspect("Hi.", ref, spk)
    expected = {
        "T", "T+D", "T+D+P", "T+D+P+E", "T+D+P+E+S",
        "T+N", "T+D+N", "T+D+P+N", "T+D+P+E+N", "T+D+P+E+S+N",
    }
    assert set(grid) == expected
    for title, g in grid.items():
        assert g["mel"].shape[1] == cfg.n_mel_channels, title
        assert np.isfinite(g["wav"]).all(), title


def test_mix_and_match_32_combos(synth, ref, spk):
    t = np.arange(int(22050 * 0.5)) / 22050
    wav2 = (0.3 * np.sin(2 * np.pi * 120 * t) * 32768.0).astype(np.float32)
    ref2 = extract_reference_features(wav2, cfg, synth.frontend)
    spk2 = -np.asarray(spk)
    results = synth.mix_and_match(("Hi.", "No."), (ref, ref2), (spk, spk2))
    assert len(results) == 32
    assert set(results) == {f"{c:05b}" for c in range(32)}
    for comb, r in results.items():
        assert np.isfinite(r["mel"]).all(), comb
        assert r["wav"].shape[0] == r["mel_len"] * cfg.hop_length, comb


def test_synthesize_batch_matches_single(synth, ref, spk):
    """Batched path returns per-item results consistent with the single
    path (same jitted forward, batch axis only)."""
    t = np.arange(int(22050 * 0.5)) / 22050
    wav2 = (0.3 * np.sin(2 * np.pi * 140 * t) * 32768.0).astype(np.float32)
    ref2 = extract_reference_features(wav2, cfg, synth.frontend)
    res = synth.synthesize_batch(
        ["Hi.", "No."], [ref, ref2], [spk, -np.asarray(spk)]
    )
    assert len(res) == 2
    single = synth.synthesize("Hi.", ref, spk)
    assert res[0]["mel_len"] == single["mel_len"]
    np.testing.assert_allclose(res[0]["mel"], single["mel"], atol=2e-4, rtol=1e-4)


def test_synthesize_batch_sharded_over_mesh(synth, ref, spk):
    """SPMD serving path: batch axis sharded over the 8-device CPU mesh."""
    import jax

    from styler_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    mesh = make_mesh(cfg, data=8)
    t = np.arange(int(22050 * 0.4)) / 22050
    wav2 = (0.3 * np.sin(2 * np.pi * 200 * t) * 32768.0).astype(np.float32)
    ref2 = extract_reference_features(wav2, cfg, synth.frontend)
    res = synth.synthesize_batch(
        ["Hi.", "No.", "Go."], [ref, ref2, ref], [spk, spk, spk], mesh=mesh
    )
    assert len(res) == 3
    for r in res:
        assert np.isfinite(r["wav"]).all()
        assert r["wav"].shape[0] == r["mel_len"] * cfg.hop_length
