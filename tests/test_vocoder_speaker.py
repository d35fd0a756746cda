"""HiFi-GAN and DeepSpeaker ports: parity vs torch for the vocoder
(including weight-norm folding), structural checks for the embedder."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from styler_tpu.core.import_torch import import_hifigan_state
from styler_tpu.vocoder import Generator, HiFiGANConfig


def test_convtranspose1d_matches_torch(rng):
    from styler_tpu.vocoder.hifigan import ConvTranspose1dTorch

    in_ch, out_ch, k, u, T = 8, 4, 16, 8, 12
    tconv = tnn.ConvTranspose1d(in_ch, out_ch, k, u, padding=(k - u) // 2)
    x = rng.standard_normal((2, in_ch, T)).astype(np.float32)
    with torch.no_grad():
        golden = tconv(torch.from_numpy(x)).numpy()

    w = tconv.weight.detach().numpy()  # [in, out, k]
    kernel = w.transpose(2, 0, 1)[::-1].copy()  # [k, in, out] flipped
    mod = ConvTranspose1dTorch(out_ch, k, u)
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == golden.shape == (2, out_ch, T * u)
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


class _TorchResBlock(tnn.Module):
    """Reference hifigan ResBlock1 (models.py:28-75), rebuilt for golden values."""

    def __init__(self, ch, k, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            [
                tnn.utils.weight_norm(
                    tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=(k - 1) * d // 2)
                )
                for d in dilations
            ]
        )
        self.convs2 = tnn.ModuleList(
            [
                tnn.utils.weight_norm(tnn.Conv1d(ch, ch, k, 1, padding=(k - 1) // 2))
                for _ in dilations
            ]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = torch.nn.functional.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = torch.nn.functional.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class _TorchGenerator(tnn.Module):
    """Minimal torch twin of the reference Generator (models.py:112-165)
    with a small config, for end-to-end vocoder parity."""

    def __init__(self, cfg):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.conv_pre = wn(tnn.Conv1d(cfg.num_mels, cfg.upsample_initial_channel, 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch_in = cfg.upsample_initial_channel // (2**i)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(wn(tnn.ConvTranspose1d(ch_in, ch, k, u, padding=(k - u) // 2)))
            for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(_TorchResBlock(ch, rk, rd))
        self.conv_post = wn(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                b = self.resblocks[i * self.num_kernels + j](x)
                xs = b if xs is None else xs + b
            x = xs / self.num_kernels
        x = torch.nn.functional.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


def test_generator_parity_small_config(rng):
    cfg = HiFiGANConfig(
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=10,
    )
    torch.manual_seed(0)
    tg = _TorchGenerator(cfg)
    tg.eval()
    mel = rng.standard_normal((1, cfg.num_mels, 20)).astype(np.float32)
    with torch.no_grad():
        golden = tg(torch.from_numpy(mel)).numpy()[:, 0, :]

    params = import_hifigan_state(tg.state_dict(), cfg)
    gen = Generator(cfg, compute_dtype=jnp.float32)
    got = gen.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)))
    got = np.asarray(got)
    assert got.shape == golden.shape == (1, 20 * 16)
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=2e-4)


def test_generator_upsample_factor():
    cfg = HiFiGANConfig()
    # full config: 8*8*2*2 = 256 = hop_length
    assert int(np.prod(cfg.upsample_rates)) == 256


def test_rescnn_shapes_and_l2norm(rng):
    from styler_tpu.speaker import NUM_FBANKS, NUM_FRAMES, ResCNN

    model = ResCNN()
    x = jnp.asarray(rng.standard_normal((2, NUM_FRAMES, NUM_FBANKS, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)


def test_fbank_features(rng):
    from styler_tpu.speaker import fbank_features, speaker_features_from_audio

    sig = rng.standard_normal(22050).astype(np.float32)
    feat = fbank_features(sig, 22050, winlen=1024 / 22050)
    # frame count: 1 + ceil((T - 1024)/221)
    assert feat.shape == (1 + int(np.ceil((22050 - 1024) / 221)), 64)
    assert (feat > 0).all()  # power-spectrum energies

    img = speaker_features_from_audio(sig)
    assert img.shape == (160, 64, 1)
    # per-frame normalization applied before crop: near zero mean rows
    assert abs(img[:, :, 0].mean()) < 0.2


def test_generator_bf16_close_to_f32(rng):
    """Production bf16 compute mode stays perceptually faithful to f32
    (tanh-bounded waveform, small config)."""
    from styler_tpu.vocoder.hifigan import HiFiGANConfig

    cfg = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    import jax

    mel = jnp.asarray(rng.standard_normal((1, 20, 80)).astype(np.float32))
    g32 = Generator(cfg, compute_dtype=jnp.float32)
    v = g32.init(jax.random.PRNGKey(0), mel)
    w32 = np.asarray(g32.apply(v, mel))
    gbf = Generator(cfg, compute_dtype=jnp.bfloat16)
    wbf = np.asarray(gbf.apply(v, mel))
    assert w32.shape == wbf.shape
    assert np.abs(w32 - wbf).max() < 0.1, np.abs(w32 - wbf).max()
    corr = np.corrcoef(w32.ravel(), wbf.ravel())[0, 1]
    assert corr > 0.99, corr
