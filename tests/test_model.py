"""Model forward-pass tests: shapes, masking, training vs inference paths,
Residual Decoding gradient semantics, controllability contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styler_tpu.core.config import default_config
from styler_tpu.models import STYLER

cfg = default_config()

B, L, M = 2, 16, 64


def make_batch(rng, with_targets=True):
    src_len = np.array([16, 11], dtype=np.int32)
    mel_len = np.array([64, 40], dtype=np.int32)
    src_seq = rng.integers(1, 100, size=(B, L)).astype(np.int32)
    src_seq[1, 11:] = 0
    # durations summing exactly to mel_len (valid region)
    d = np.zeros((B, L), dtype=np.int32)
    for b in range(B):
        remaining = mel_len[b]
        for i in range(src_len[b]):
            take = remaining // (src_len[b] - i)
            d[b, i] = take
            remaining -= take
    mel_target = rng.standard_normal((B, M, cfg.n_mel_channels)).astype(np.float32)
    mel_aug = rng.standard_normal((B, M, cfg.n_mel_channels)).astype(np.float32)
    p_norm = rng.random((B, M)).astype(np.float32)
    e_input = rng.random((B, M)).astype(np.float32)
    f0 = (rng.random((B, M)) * 300 + 80).astype(np.float32)
    energy = (rng.random((B, M)) * 100).astype(np.float32)
    speaker_embed = rng.standard_normal((B, cfg.speaker_embed_dim)).astype(np.float32)
    batch = dict(
        src_seq=jnp.asarray(src_seq),
        mel_target=jnp.asarray(mel_target),
        mel_aug=jnp.asarray(mel_aug),
        p_norm=jnp.asarray(p_norm),
        e_input=jnp.asarray(e_input),
        src_len=jnp.asarray(src_len),
        mel_len=jnp.asarray(mel_len),
        max_src_len=L,
        max_mel_len=M,
        speaker_embed=jnp.asarray(speaker_embed),
    )
    if with_targets:
        batch.update(
            d_target=jnp.asarray(d),
            p_target=jnp.asarray(f0),
            e_target=jnp.asarray(energy),
        )
    return batch


@pytest.fixture(scope="module")
def model_and_params():
    model = STYLER(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), **batch)
    return model, variables, batch


def test_training_forward_shapes(model_and_params):
    model, variables, batch = model_and_params
    out = model.apply(variables, **batch)
    assert out.mel.shape == (B, M, 80)
    assert out.mel_noisy.shape == (B, M, 80)
    assert out.mel_postnet.shape == (B, M, 80)
    assert out.log_d_prediction.shape == (B, L)
    assert out.p_prediction.shape == (B, M)
    assert out.e_prediction.shape == (B, M)
    for post in out.dat_posteriors:
        assert post.shape == (B, 2)
        # time-mean of per-frame log-softmax: strictly negative log-probs
        # (not a normalized distribution — matches reference modules.py:44)
        p = np.asarray(post)
        assert np.isfinite(p).all() and (p < 0).all()
    # predictions masked at padding
    assert np.asarray(out.log_d_prediction)[1, 11:].max() == 0
    assert np.asarray(out.p_prediction)[1, 40:].max() == 0


def test_inference_forward_computes_mel_len(model_and_params):
    model, variables, batch = model_and_params
    infer_batch = {
        k: v
        for k, v in batch.items()
        if k not in ("d_target", "p_target", "e_target")
    }
    out = model.apply(variables, **infer_batch)
    mel_len = np.asarray(out.mel_len)
    assert (mel_len >= 0).all() and (mel_len <= M).all()
    mask = np.asarray(out.mel_mask)
    for b in range(B):
        assert (~mask[b, : mel_len[b]]).all()
        assert mask[b, mel_len[b]:].all()


def test_controllability_encodings_contract(model_and_params):
    model, variables, batch = model_and_params
    out = model.apply(variables, **batch)
    enc = out.encodings
    h = cfg.encoder_hidden
    assert enc["t"].shape == (B, L, h)
    assert enc["t_neck"].shape == (B, L, h)
    assert enc["p_down"].shape == (B, L, cfg.va_neck_hidden_p * 2)
    assert enc["s_down"].shape == (B, L, cfg.va_neck_hidden_p * 2)
    for k in ("d", "s", "e", "n"):
        assert enc[k].shape == (B, L, h)


def test_predict_inference_method(model_and_params):
    model, variables, batch = model_and_params
    out = model.apply(variables, **batch)
    enc = out.encodings
    src_mask = np.asarray(out.src_mask)

    # mix: everything from example 0's own encodings (inspection "T+D+P+E+S")
    pieces = model.apply(
        variables,
        enc["t"],
        enc["t_neck"] + model.apply(
            variables,
            enc["p_down"] + enc["s_down"],
            method=lambda m, x: m.style_modeling.pitch_linear(x),
        ),
        enc["t_neck"] + enc["e"],
        enc["t_neck"] + enc["d"],
        enc["s"],
        enc["n"],
        jnp.asarray(src_mask),
        M,
        False,
        method=lambda m, *a: m.style_modeling.predict_inference(*a),
    )
    text_f, pitch_emb, speaker_f, energy_emb, noise_f, log_d, p_pred, e_pred, mel_mask = pieces
    assert text_f.shape == (B, M, cfg.encoder_hidden)
    assert pitch_emb.shape == (B, M, cfg.encoder_hidden)
    # decode the mixed combination
    mel, mel_postnet = model.apply(
        variables,
        text_f + pitch_emb + speaker_f + energy_emb,
        mel_mask,
        method="decode",
    )
    assert mel.shape == (B, M, 80)


def test_residual_decoding_gradient_isolation(model_and_params):
    """The noisy decode must NOT backprop into the style-modeling output
    (stop_gradient), but MUST backprop into the noise encoding
    (reference styler.py:55)."""
    model, variables, batch = model_and_params

    def loss_noisy_only(params):
        out = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, **batch)
        return jnp.mean(out.mel_noisy**2)

    grads = jax.grad(loss_noisy_only)(variables["params"])
    g = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), grads)

    sm = g["style_modeling"]
    # noise branch (residual_linear + lstm_r) gets gradient
    assert max(jax.tree_util.tree_leaves(sm["residual_linear"])) > 0
    assert max(jax.tree_util.tree_leaves(sm["audio_encoder"]["lstm_r"])) > 0
    # pure style-side params (pitch/energy embeddings, text encoder) get none
    assert max(jax.tree_util.tree_leaves(sm["pitch_embedding"])) == 0
    assert max(jax.tree_util.tree_leaves(sm["energy_embedding"])) == 0
    assert max(jax.tree_util.tree_leaves(sm["text_encoder"])) == 0


def test_grl_reverses_dat_gradient_into_encoder(model_and_params):
    """DAT loss gradients flow through the GRL into the audio encoder with
    reversed sign — encoder ascends the classifier loss. Smoke: nonzero
    grads reach lstm_d from a classifier-only loss."""
    model, variables, batch = model_and_params

    def dat_loss(params):
        out = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, **batch)
        post_d = out.dat_posteriors[0]
        return -jnp.mean(post_d[:, 0])  # NLL label 0

    grads = jax.grad(dat_loss)(variables["params"])
    sm = grads["style_modeling"]
    assert max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), sm["audio_encoder"]["lstm_d"]))) > 0
    assert max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), sm["augmentation_classifier_d"]))) > 0


def test_residual_flag_skips_noisy_decode(model_and_params):
    """`residual=False` (static inference knob; BASELINE.md measurement
    config 3 "Residual Decoding off") must return clean outputs
    bit-identical to the default dual-decode path, with the noisy
    output slots aliasing the clean arrays."""
    model, variables, batch = model_and_params
    infer_batch = {
        k: v
        for k, v in batch.items()
        if k not in ("d_target", "p_target", "e_target")
    }
    on = model.apply(variables, **infer_batch)
    off = model.apply(variables, **infer_batch, residual=False)
    np.testing.assert_array_equal(np.asarray(off.mel), np.asarray(on.mel))
    np.testing.assert_array_equal(
        np.asarray(off.mel_postnet), np.asarray(on.mel_postnet)
    )
    # noisy slots alias clean (shape contract kept, no extra compute)
    np.testing.assert_array_equal(
        np.asarray(off.mel_postnet_noisy), np.asarray(off.mel_postnet)
    )
    # and the ON path's residual decode is genuinely different
    assert not np.array_equal(
        np.asarray(on.mel_postnet_noisy), np.asarray(on.mel_postnet)
    )
    np.testing.assert_array_equal(np.asarray(off.mel_len), np.asarray(on.mel_len))
