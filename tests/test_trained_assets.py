"""Committed trained-vocoder assets: the f16 npz generators trained
on-box (cli/train_vocoder.py, see assets/vocoder/*_eval.json) must keep
loading through the production path and producing finite, non-silent
audio. Guards against asset corruption in git and loader/tree drift —
the quality numbers themselves are pinned in the eval records measured
on the real chip (re-measure with tools/vocoder_eval.py)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "vocoder",
)


@pytest.mark.parametrize(
    "asset,arch,eval_json",
    [
        ("istft_gen.npz", "iSTFTNet", "istft_eval.json"),
        ("hifigan_gen.npz", "HiFi-GAN", "hifigan_eval.json"),
    ],
)
def test_trained_asset_loads_and_vocode(asset, arch, eval_json):
    from styler_tpu.core.checkpoint import load_vocoder_params
    from styler_tpu.vocoder import make_generator

    path = os.path.join(ASSET_DIR, asset)
    if not os.path.isfile(path):
        pytest.skip(f"{asset} not present in this checkout")

    params = load_vocoder_params(path)
    gen = make_generator(arch, compute_dtype=jnp.float32)
    # structure must match a fresh init of the same architecture
    init = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
    got = jax.tree_util.tree_structure({"params": params})
    want = jax.tree_util.tree_structure(init)
    assert got == want, f"{asset} tree drifted from {arch} definition"

    mel_path = os.path.join(ASSET_DIR, "val_mel.npy")
    have_real_mel = os.path.isfile(mel_path)
    mel = np.load(mel_path)[:64] if have_real_mel else (
        np.random.default_rng(0).standard_normal((64, 80)).astype(np.float32)
    )
    wav = np.asarray(
        jax.jit(gen.apply)({"params": params}, jnp.asarray(mel[None]))
    )[0]
    assert wav.shape == (64 * 256,)
    assert np.isfinite(wav).all()
    # trained generators produce real audio, not near-silence — but only
    # on in-domain input: N(0,1) random mels are far outside the
    # natural-log-mel domain, so the amplitude gate would be checking
    # out-of-distribution behavior (could flake or mask corruption)
    if have_real_mel:
        assert 1e-3 < np.abs(wav).max() < 4.0

    # the eval record the README/bench quote must exist, parse, and show
    # a trained-vs-random improvement
    with open(os.path.join(ASSET_DIR, eval_json)) as f:
        ev = json.load(f)
    assert ev["asset"] == asset
    assert ev["mel_recon_mae"] < 0.5
    assert ev["mel_recon_mae"] < ev["mel_recon_mae_random_init"] / 5


def test_trained_speaker_encoder_asset():
    """The committed on-box-trained speaker encoder
    (assets/speaker/encoder_gen.npz, cli/train_speaker.py) must load
    through the production SpeakerEmbedder tier, produce L2-normalized
    embeddings, and its eval record must show the learned margin that
    motivates it over the envelope fallback (heldout nearest-centroid
    ID == 1.0, mean margin 0.66 vs the fallback's 0.044 cosine gap —
    tests/test_data.py::test_speaker_fallback_separates_speakers)."""
    from styler_tpu.core.config import default_config
    from styler_tpu.data.vctk import SpeakerEmbedder, default_speaker_asset

    asset = default_speaker_asset()
    if not asset:
        pytest.skip("speaker encoder asset not present in this checkout")

    cfg = default_config()
    emb = SpeakerEmbedder(cfg, backend="native")
    assert emb.model is not None

    rng = np.random.default_rng(0)
    t = np.arange(int(cfg.sampling_rate * 1.2)) / cfg.sampling_rate
    wav = (0.3 * np.sin(2 * np.pi * 180 * t)
           + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    e = emb.embed_wav(wav)[0]
    assert e.shape == (cfg.speaker_embed_dim,)
    assert np.isfinite(e).all()
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-4)

    eval_json = os.path.join(
        os.path.dirname(ASSET_DIR), "speaker", "encoder_eval.json")
    with open(eval_json) as f:
        ev = json.load(f)
    assert ev["heldout_id_accuracy"] >= 0.95
    assert ev["mean_margin"] >= 0.3
    assert ev["n_speakers"] >= 10


def test_trained_acoustic_asset():
    """The committed on-box-trained STYLER acoustic model
    (assets/acoustic/styler_gen.npz — cli/train.py on the
    phone-conditioned synthetic corpus, exported by
    tools/export_acoustic_asset.py) must resolve through the serving
    default (synthesis.default_acoustic_asset), load as a valid
    param/batch-stat tree, run the full forward at a small bucket, and
    its held-out eval record (tools/acoustic_eval.py on the real chip)
    must show trained-vs-random convergence on every predicted factor.
    The acoustic analog of test_trained_asset_loads_and_vocode."""
    import jax.numpy as jnp

    from styler_tpu.core.checkpoint import load_acoustic_npz
    from styler_tpu.core.config import default_config
    from styler_tpu.models import STYLER
    from styler_tpu.synthesis import default_acoustic_asset

    asset = default_acoustic_asset()
    if not asset:
        pytest.skip("acoustic asset not present in this checkout")

    params, batch_stats = load_acoustic_npz(asset)
    n = sum(v.size for v in jax.tree_util.tree_leaves(params))
    assert 25e6 < n < 35e6, f"param count drifted: {n}"
    assert all(
        np.isfinite(np.asarray(v)).all()
        for v in jax.tree_util.tree_leaves((params, batch_stats))
    )

    # full forward (inference path: predicted d/p/e) at the smallest
    # bucket pair — validates the tree against the model definition
    cfg = default_config()
    model = STYLER(cfg)
    B, S, M = 2, 32, 64
    rng = np.random.default_rng(0)
    out = jax.jit(model.apply)(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(rng.integers(1, 40, (B, S))),
        jnp.asarray(rng.standard_normal((B, M, 80)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, M, 80)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (B, M)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (B, M)), jnp.float32),
        jnp.asarray([S, S - 4]),
        jnp.asarray([M, M - 8]),
        speaker_embed=jnp.asarray(
            rng.standard_normal((B, cfg.speaker_embed_dim)), jnp.float32),
    )
    assert np.isfinite(np.asarray(out.mel_postnet)).all()

    eval_json = os.path.join(
        os.path.dirname(ASSET_DIR), "acoustic", "styler_eval.json")
    with open(eval_json) as f:
        ev = json.load(f)
    # teacher-forced mel MAE converged well below random-init scale
    # (measured 2026-08-21: 0.227 vs 4.207 random = 18.5x; the 20k-step
    # checkpoint won the 10k/20k/30k/40k ladder on both mel MAEs)
    assert ev["mel_mae_tf"] < 0.3
    assert ev["mel_mae_tf"] < ev["mel_mae_tf_random_init"] / 10
    assert ev["mel_mae_free"] < ev["mel_mae_free_random_init"] / 2
    # predicted style factors learned. Units: duration in frames per
    # phoneme (corpus phones average ~13 frames); f0 in raw Hz with
    # unvoiced zero-target frames included (reference loss.py:38-41
    # semantics — boundary frames dominate the MAE); energy in raw
    # L2-magnitude units (corpus max ~115)
    assert ev["dur_mae_frames"] < 4.0
    assert ev["len_rel_err"] < 0.15
    assert ev["f0_mae"] < 90.0
    assert ev["energy_mae"] < 10.0
    # AUDIO-level: free-running wavs through the trained vocoder,
    # re-analyzed with the serving front end vs ground-truth mel
    # (measured 1.95 vs the 3.83 random-init mel-level scale)
    assert ev["mel_mae_free_audio"] < 3.0
