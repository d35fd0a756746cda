"""iSTFTNet-style fast vocoder (vocoder/istft_net.py): inverse-STFT
correctness, generator contract, and trainability via the GAN harness."""

import numpy as np

import jax
import jax.numpy as jnp

from styler_tpu.vocoder.istft_net import (
    ISTFTNetConfig,
    ISTFTNetGenerator,
    _hann_periodic,
    inverse_stft,
)


def test_inverse_stft_reconstructs_signal(rng):
    """analysis (same window/hop) -> inverse_stft == original interior."""
    n_fft, hop = 16, 4
    T = 64
    x = rng.standard_normal(T * hop + n_fft).astype(np.float32)
    window = _hann_periodic(n_fft)
    # frames centered like torch.stft(center=True): frame t starts at t*hop
    # in the n_fft//2-padded signal
    xp = np.pad(x, (n_fft // 2, n_fft // 2))
    frames = np.stack([xp[t * hop : t * hop + n_fft] * window for t in range(T)])
    spec = np.fft.rfft(frames, axis=-1)
    mag = jnp.asarray(np.abs(spec), jnp.float32)[None]
    phase = jnp.asarray(np.angle(spec), jnp.float32)[None]
    rec = np.asarray(inverse_stft(mag, phase, n_fft, hop))[0]
    # interior samples (edge frames lack full overlap coverage)
    np.testing.assert_allclose(
        rec[n_fft : T * hop - n_fft],
        x[n_fft : T * hop - n_fft],
        rtol=1e-4,
        atol=1e-4,
    )


def test_generator_contract(rng):
    """mel [B, T, 80] -> wav [B, T*256], same as hifigan.Generator."""
    cfg = ISTFTNetConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    assert cfg.total_upsampling == 256
    gen = ISTFTNetGenerator(cfg, compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((2, 8, 80)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    wav = np.asarray(jax.jit(gen.apply)(v, mel))
    assert wav.shape == (2, 8 * 256)
    assert np.isfinite(wav).all()


def test_istft_generator_trains_with_gan_harness(rng):
    """One GAN step with generator=ISTFTNetGenerator: finite metrics,
    both param sets update (the harness is generator-agnostic)."""
    from styler_tpu.core.config import default_config
    from styler_tpu.train.vocoder import (
        GANState,
        create_gan_state,
        make_gan_train_step,
        make_optimizer,
    )
    from styler_tpu.vocoder.discriminators import HiFiGANDiscriminator

    tiny_cfg = default_config().replace(
        hop_length=64, filter_length=256, win_length=256
    )
    gcfg = ISTFTNetConfig(
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    assert gcfg.total_upsampling == 64  # matches tiny hop
    gen = ISTFTNetGenerator(gcfg, compute_dtype=jnp.float32)
    opt = make_optimizer()
    gen, _, opt, state = create_gan_state(
        tiny_cfg, jax.random.PRNGKey(0), segment_frames=16,
        generator=gen, optimizer=opt,
    )
    disc = HiFiGANDiscriminator(periods=(2,), n_scales=1)
    dp = jax.jit(disc.init)(jax.random.PRNGKey(1), jnp.zeros((1, 1024)))["params"]
    state = GANState(state.gen_params, state.gen_opt, dp, opt.init(dp), state.step)
    step_fn = make_gan_train_step(gen, disc, opt, tiny_cfg)

    mel = jnp.asarray(rng.standard_normal((2, 16, 80)).astype(np.float32))
    wav = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
    old = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    state, metrics = step_fn(state, mel, wav)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert float(jnp.abs(jax.tree_util.tree_leaves(state.gen_params)[0] - old).max()) > 0


def test_istft_apply_fused_parity(rng):
    """istft_apply_fused == ISTFTNetGenerator.apply (interpret kernel)."""
    from styler_tpu.vocoder.istft_net import istft_apply_fused

    cfg = ISTFTNetConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
    )
    gen = ISTFTNetGenerator(cfg, compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    golden = np.asarray(gen.apply(v, mel))
    got = np.asarray(
        istft_apply_fused(v, mel, cfg, compute_dtype=jnp.float32, interpret=True)
    )
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


def test_istftnet_in_factory_contract(rng):
    """make_generator("iSTFTNet") slots into the vocoder seat: output
    length T*256 (iSTFT output is unbounded pre-training, unlike the
    tanh-headed generators — trained models learn the range)."""
    from styler_tpu.vocoder import make_generator

    gen = make_generator("iSTFTNet", compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    wav = np.asarray(gen.apply(v, mel))
    assert wav.shape == (1, 8 * 256)
    assert np.isfinite(wav).all()
