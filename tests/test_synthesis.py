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


def test_encode_style_matches_full_forward(synth, ref, spk):
    """The decode-free encodings producer (STYLER.encode_style) used by
    inspect/mix_and_match returns the same encodings, mask, and
    predicted length as the full forward."""
    out = synth.synthesize("Hi.", ref, spk)
    ids = synth.text_to_ids("Hi.")
    arrays = synth._pack_rows([ids], [ref], [spk])
    enc, src_mask, mel_len = synth._encode(
        *arrays, 1.0, 1.0, 1.0, cfg.mel_buckets[-1]
    )
    np.testing.assert_array_equal(np.asarray(src_mask), out["src_mask"])
    assert int(np.asarray(mel_len)[0]) == out["mel_len"]
    for k, v in out["encodings"].items():
        np.testing.assert_allclose(
            np.asarray(enc[k]), np.asarray(v), atol=1e-5, rtol=1e-5,
        )


def test_mixed_decode_bucket_invariance(synth, ref, spk):
    """Valid-frame outputs of the mixed decode are independent of the
    decode bucket size — the guarantee mix_and_match's length-bounded
    bucket selection relies on (masked decoder; postnet sees identical
    padding around uncapped sequences)."""
    import jax.numpy as jnp

    out = synth.synthesize("Hi.", ref, spk)
    enc = out["encodings"]
    args = (
        enc["t"], enc["t_neck"], enc["d"], enc["s"], enc["e"], enc["n"],
        enc["p_down"], enc["s_down"], jnp.asarray(out["src_mask"]),
    )
    small = synth._inspect_jit(*args, 64)
    big = synth._inspect_jit(*args, 128)
    ml_small = (~np.asarray(small[4])).sum(-1)
    ml_big = (~np.asarray(big[4])).sum(-1)
    uncapped = [i for i in range(len(ml_small)) if ml_small[i] < 64]
    assert uncapped, "all rows hit the 64-frame cap; test needs a shorter input"
    for i in uncapped:
        assert ml_small[i] == ml_big[i]
        m = int(ml_small[i])
        np.testing.assert_allclose(
            np.asarray(small[0])[i, :m], np.asarray(big[0])[i, :m],
            atol=2e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(small[2])[i, :m], np.asarray(big[2])[i, :m],
            atol=2e-4, rtol=1e-4,
        )


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


def test_long_reference_trimmed(synth):
    """A reference past the largest mel bucket is trimmed at extraction
    (reference drops >=1000-frame mels at preprocess, vctk.py:198-199)
    instead of crashing the bucketed packers downstream."""
    t = np.arange(int(22050 * 2.0)) / 22050  # ~172 frames >> 64 bucket
    wav = (0.4 * np.sin(2 * np.pi * 150 * t) * 32768.0).astype(np.float32)
    r = extract_reference_features(wav, cfg, synth.frontend)
    assert r.mel_len == cfg.mel_buckets[-1]
    assert r.mel.shape[0] == cfg.mel_buckets[-1]
    assert len(r.f0_norm) == cfg.mel_buckets[-1]


def test_long_sentence_chunked(synth, ref, spk):
    """A sentence past the largest src bucket synthesizes via chunking
    (reference handles 1000 phonemes in one forward,
    transformer/Models.py:69-71; the static-shape equivalent is chunked
    decode + concatenation)."""
    sentence = "The quick brown fox jumps over the lazy dog, " * 4
    ids = synth.text_to_ids(sentence)
    assert len(ids) > cfg.src_buckets[-1], "test sentence must overflow"
    out = synth.synthesize(sentence, ref, spk)
    assert out["chunks"] > 1
    assert out["mel_len"] > 0
    assert out["mel"].shape == (out["mel_len"], cfg.n_mel_channels)
    assert out["wav"].shape == (out["mel_len"] * cfg.hop_length,)
    assert np.isfinite(out["wav"]).all() and np.isfinite(out["mel"]).all()
    # chunk boundaries land on pause (sp) tokens when available
    from styler_tpu.textproc import to_phoneme_string

    chunks = synth._phoneme_chunks(to_phoneme_string(sentence, synth.g2p))
    assert sum(len(c) for c in chunks) == len(ids)
    assert all(len(c) <= cfg.src_buckets[-1] for c in chunks)
    assert out["chunks"] == len(chunks)


def test_batch_clamps_long_inputs(synth, ref, spk):
    """Batch/grid paths truncate over-long rows instead of raising the
    round-2 broadcast ValueError."""
    long_ref = ReferenceFeatures(
        mel=np.zeros((100, cfg.n_mel_channels), np.float32),
        f0_norm=np.full(100, 0.5, np.float32),
        energy01=np.full(100, 0.5, np.float32),
        mel_len=100,  # > 64 bucket
    )
    long_sentence = "The quick brown fox jumps over the lazy dog " * 4
    res = synth.synthesize_batch(
        [long_sentence, "Hi."], [long_ref, ref], [spk, spk]
    )
    assert len(res) == 2
    for r in res:
        assert np.isfinite(r["wav"]).all()
    # the clamp is not silent: the result flags which items lost content
    assert res[0]["truncated"] and not res[1]["truncated"]


def test_chunked_batch_pads_to_power_of_two(synth, ref, spk, monkeypatch):
    """The chunked long-sentence path pads its chunk batch to the next
    power of two so the compiled batch sizes stay bounded (a 3-chunk
    sentence must not compile a fresh B=3 program that warmup never
    covered)."""
    seen = []
    orig = synth.synthesize_batch

    def spy(sentences, *a, **kw):
        seen.append(len(sentences))
        return orig(sentences, *a, **kw)

    monkeypatch.setattr(synth, "synthesize_batch", spy)
    from styler_tpu.textproc import to_phoneme_string

    sentence = "The quick brown fox jumps over the lazy dog, " * 6
    k = len(synth._phoneme_chunks(to_phoneme_string(sentence, synth.g2p)))
    assert k >= 3, "test sentence must split into >=3 chunks"
    out = synth.synthesize(sentence, ref, spk)
    assert out["chunks"] == k
    assert seen == [1 << (k - 1).bit_length()]
    assert out["wav"].shape == (out["mel_len"] * cfg.hop_length,)


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
