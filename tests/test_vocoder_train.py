"""Vocoder GAN training harness (train/vocoder.py, discriminators.py).

Beyond-reference capability — the reference loads pretrained vocoders
only; here tiny-config GAN steps must run, be finite, update both
param sets, and drive mel L1 down when overfitting one segment.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styler_tpu.core.config import default_config
from styler_tpu.train.vocoder import (
    GANState,
    create_gan_state,
    make_gan_train_step,
    make_mel_fn,
    make_optimizer,
    sample_segments,
)
from styler_tpu.vocoder.discriminators import HiFiGANDiscriminator
from styler_tpu.vocoder.hifigan import Generator, HiFiGANConfig

cfg = default_config()

# tiny generator: 2 upsample stages (total 64x), narrow channels — keep
# the CPU test fast; hop must match total upsampling for aligned segments
TINY_GEN = HiFiGANConfig(
    upsample_rates=(8, 8),
    upsample_kernel_sizes=(16, 16),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)
TINY_CFG = cfg.replace(hop_length=64, filter_length=256, win_length=256)
TINY_DISC = HiFiGANDiscriminator(periods=(2, 3), n_scales=2)


def _tiny_setup(segment_frames=16, batch=2):
    gen = Generator(TINY_GEN, compute_dtype=jnp.float32)
    opt = make_optimizer(2e-4)
    gen, disc, opt, state = create_gan_state(
        TINY_CFG, jax.random.PRNGKey(0), segment_frames,
        generator=gen, optimizer=opt,
    )
    # swap in the tiny discriminator (create_gan_state builds the full one)
    disc = TINY_DISC
    disc_params = jax.jit(disc.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, segment_frames * TINY_CFG.hop_length))
    )["params"]
    state = GANState(
        gen_params=state.gen_params,
        gen_opt=state.gen_opt,
        disc_params=disc_params,
        disc_opt=opt.init(disc_params),
        step=state.step,
    )
    return gen, disc, opt, state


def test_discriminator_shapes(rng):
    wav = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    disc = HiFiGANDiscriminator(periods=(2, 5), n_scales=2)
    v = jax.jit(disc.init)(jax.random.PRNGKey(0), wav)
    logits, feats = disc.apply(v, wav)
    assert len(logits) == 4  # 2 periods + 2 scales
    assert len(feats) == 4 and all(len(f) >= 5 for f in feats)
    for l in logits:
        assert l.shape[0] == 2 and np.isfinite(np.asarray(l)).all()


def test_gan_step_runs_and_updates_both(rng):
    gen, disc, opt, state = _tiny_setup()
    step_fn = make_gan_train_step(gen, disc, opt, TINY_CFG)
    F = 16
    mel = jnp.asarray(rng.standard_normal((2, F, 80)).astype(np.float32))
    wav = jnp.asarray(
        (0.3 * np.sin(np.arange(F * 64) * 0.05)).astype(np.float32)
    )[None].repeat(2, 0)
    old_g = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    old_d = jax.tree_util.tree_leaves(state.disc_params)[0].copy()
    state, metrics = step_fn(state, mel, wav)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1
    assert float(jnp.abs(jax.tree_util.tree_leaves(state.gen_params)[0] - old_g).max()) > 0
    assert float(jnp.abs(jax.tree_util.tree_leaves(state.disc_params)[0] - old_d).max()) > 0


def test_gan_overfit_one_segment_mel_l1_decreases(rng):
    gen, disc, opt, state = _tiny_setup()
    step_fn = make_gan_train_step(gen, disc, opt, TINY_CFG)
    F = 16
    t = np.arange(F * 64) / 22050.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mel_fn = make_mel_fn(TINY_CFG)
    mel = np.asarray(mel_fn(jnp.asarray(wav)))[:, :F]
    first = last = None
    for i in range(40):
        state, metrics = step_fn(state, jnp.asarray(mel), jnp.asarray(wav))
        if i == 0:
            first = float(metrics["g_mel_l1"])
        last = float(metrics["g_mel_l1"])
    assert last < first, (first, last)


def test_sample_segments_alignment(rng):
    hop, F = 64, 16
    wavs = [rng.standard_normal(5000).astype(np.float32)]
    mels = [rng.standard_normal((5000 // hop + 1, 80)).astype(np.float32)]
    mb, wb = sample_segments(np.random.default_rng(0), wavs, mels, 4, F, hop)
    assert mb.shape == (4, F, 80) and wb.shape == (4, F * hop)


def test_vocoder_ckpt_roundtrip(tmp_path, rng):
    from styler_tpu.core.checkpoint import load_vocoder_params, save_vocoder_params

    gen = Generator(TINY_GEN, compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    path = save_vocoder_params(str(tmp_path / "voc"), 123, jax.device_get(v["params"]))
    restored = load_vocoder_params(str(tmp_path / "voc"))  # latest-step resolution
    a = gen.apply(v, mel)
    b = gen.apply({"params": restored}, mel)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_wn_split_fold_roundtrip(rng):
    """wn_fold(wn_split(p)) reproduces the original kernels exactly
    (g is initialized to ||v||), incl. the per-IN-channel transposed-conv
    convention (torch weight_norm dim=0 on ConvTranspose1d weights)."""
    from styler_tpu.train.vocoder import wn_fold, wn_split

    gen = Generator(TINY_GEN, compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)["params"]
    wn = wn_split(params)
    # transposed conv g keeps the IN axis ([k, in, out] -> norm over k,out)
    k_ups = params["ups_0"]["kernel"]
    assert wn["ups_0"]["kernel_g"].shape == (1, k_ups.shape[1], 1)
    k_pre = params["conv_pre"]["kernel"]
    assert wn["conv_pre"]["kernel_g"].shape == (1, 1, k_pre.shape[2])
    folded = wn_fold(wn)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        ),
        params,
        folded,
    )
    # and the folded tree drives the generator identically
    np.testing.assert_allclose(
        np.asarray(gen.apply({"params": folded}, mel)),
        np.asarray(gen.apply({"params": params}, mel)),
        atol=1e-6,
    )


def test_wn_gan_step_trains_g_and_v(rng):
    """GAN step in the weight-norm parameterization: finite losses,
    BOTH the magnitude (g) and direction (v) leaves receive updates,
    and mel L1 decreases when overfitting one segment."""
    from styler_tpu.train.vocoder import wn_split

    gen = Generator(TINY_GEN, compute_dtype=jnp.float32)
    opt = make_optimizer(2e-4)
    gen, disc, opt, state = create_gan_state(
        TINY_CFG, jax.random.PRNGKey(0), 16,
        generator=gen, optimizer=opt, weight_norm=True,
    )
    disc = TINY_DISC
    disc_params = wn_split(
        jax.jit(disc.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 16 * TINY_CFG.hop_length))
        )["params"]
    )
    state = GANState(
        gen_params=state.gen_params,
        gen_opt=state.gen_opt,
        disc_params=disc_params,
        disc_opt=opt.init(disc_params),
        step=state.step,
    )
    assert "kernel_g" in state.gen_params["conv_pre"]
    step_fn = make_gan_train_step(gen, disc, opt, TINY_CFG, weight_norm=True)
    F = 16
    t = np.arange(F * 64) / 22050.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mel = np.asarray(make_mel_fn(TINY_CFG)(jnp.asarray(wav)))[:, :F]
    g0 = state.gen_params["conv_pre"]["kernel_g"].copy()
    v0 = state.gen_params["conv_pre"]["kernel_v"].copy()
    first = last = None
    for i in range(40):
        state, metrics = step_fn(state, jnp.asarray(mel), jnp.asarray(wav))
        if i == 0:
            first = float(metrics["g_mel_l1"])
        last = float(metrics["g_mel_l1"])
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(jnp.abs(state.gen_params["conv_pre"]["kernel_g"] - g0).max()) > 0
    assert float(jnp.abs(state.gen_params["conv_pre"]["kernel_v"] - v0).max()) > 0
    assert last < first, (first, last)


def test_mr_stft_loss_and_weighted_step(rng):
    """Multi-resolution STFT loss: zero at identity, positive otherwise,
    and the GAN step accepts mr_stft_weight > 0."""
    from styler_tpu.train.vocoder import make_mr_stft_loss_fn

    fn = make_mr_stft_loss_fn(fft_sizes=(256,))
    y = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.3)
    assert float(fn(y, y)) < 1e-5
    assert float(fn(y * 0.3, y)) > 0.05

    gen, disc, opt, state = _tiny_setup()
    step_fn = make_gan_train_step(gen, disc, opt, TINY_CFG, mr_stft_weight=1.0)
    F = 16
    mel = jnp.asarray(rng.standard_normal((1, F, 80)).astype(np.float32))
    wav = jnp.asarray(rng.standard_normal((1, F * 64)).astype(np.float32) * 0.3)
    state, metrics = step_fn(state, mel, wav)
    assert np.isfinite(float(metrics["g_loss"]))
