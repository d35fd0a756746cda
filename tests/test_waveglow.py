"""WaveGlow port: true-inverse parity vs a torch rebuild of the NVIDIA
glow.py *forward* flow (reference hp.vocoder == "WaveGlow" option,
reference utils.py:263-271,285-286).

The strongest available check without hub weights: run the torch twin's
forward direction audio -> z under the same weights, then feed that z
through our JAX reverse flow — it must reconstruct the original audio.
This exercises every imported tensor (upsample transposed conv, WN
stacks with fused conditioning, pre-inverted 1x1 convs) end to end.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from styler_tpu.core.import_torch import import_waveglow_state
from styler_tpu.vocoder import WaveGlow, WaveGlowConfig, make_generator


class _TorchWN(tnn.Module):
    """glow.py WN with the fused cond_layer."""

    def __init__(self, n_half, n_mel_group, cfg):
        super().__init__()
        wn = tnn.utils.weight_norm
        C, L, K = cfg.wn_channels, cfg.wn_layers, cfg.wn_kernel_size
        self.n_channels = C
        self.n_layers = L
        self.start = wn(tnn.Conv1d(n_half, C, 1))
        self.cond_layer = wn(tnn.Conv1d(n_mel_group, 2 * C * L, 1))
        self.in_layers = tnn.ModuleList()
        self.res_skip_layers = tnn.ModuleList()
        for i in range(L):
            d = 2**i
            self.in_layers.append(
                wn(tnn.Conv1d(C, 2 * C, K, dilation=d, padding=(K * d - d) // 2))
            )
            ch = 2 * C if i < L - 1 else C
            self.res_skip_layers.append(wn(tnn.Conv1d(C, ch, 1)))
        self.end = tnn.Conv1d(C, 2 * n_half, 1)
        self.end.weight.data.zero_()
        self.end.bias.data.zero_()

    def forward(self, audio, spect):
        audio = self.start(audio)
        output = torch.zeros_like(audio)
        cond = self.cond_layer(spect)
        C = self.n_channels
        for i in range(self.n_layers):
            acts_in = self.in_layers[i](audio) + cond[:, i * 2 * C: (i + 1) * 2 * C]
            acts = torch.tanh(acts_in[:, :C]) * torch.sigmoid(acts_in[:, C:])
            res_skip = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                audio = audio + res_skip[:, :C]
                output = output + res_skip[:, C:]
            else:
                output = output + res_skip
        return self.end(output)


class _TorchInvertible1x1(tnn.Module):
    """glow.py Invertible1x1Conv: wraps ``self.conv`` (key layout the
    importer decodes: convinv.{k}.conv.weight)."""

    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv1d(c, c, 1, bias=False)
        w = torch.linalg.qr(torch.randn(c, c))[0]
        self.conv.weight.data = w[:, :, None]

    def forward(self, x):
        return self.conv(x)


class _TorchWaveGlow(tnn.Module):
    """glow.py WaveGlow forward direction (training direction)."""

    def __init__(self, cfg: WaveGlowConfig):
        super().__init__()
        self.cfg = cfg
        self.upsample = tnn.ConvTranspose1d(
            cfg.num_mels, cfg.num_mels, cfg.upsample_kernel, cfg.upsample_stride
        )
        self.WN = tnn.ModuleList()
        self.convinv = tnn.ModuleList()
        n_mel_group = cfg.num_mels * cfg.n_group
        n_remaining = cfg.n_group
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                n_remaining -= cfg.n_early_size
            self.convinv.append(_TorchInvertible1x1(n_remaining))
            self.WN.append(_TorchWN(n_remaining // 2, n_mel_group, cfg))

    def forward(self, audio, spect):
        """audio [B, T]; spect [B, num_mels, T_mel] -> z [B, n_group, T']"""
        cfg = self.cfg
        G = cfg.n_group
        spect = self.upsample(spect)
        assert spect.size(2) >= audio.size(1)
        spect = spect[:, :, : audio.size(1)]
        spect = (
            spect.unfold(2, G, G)
            .permute(0, 2, 1, 3)
            .contiguous()
            .view(spect.size(0), -1, cfg.num_mels * G)
            .permute(0, 2, 1)
        )
        audio = audio.unfold(1, G, G).permute(0, 2, 1)

        output_audio = []
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                output_audio.append(audio[:, : cfg.n_early_size])
                audio = audio[:, cfg.n_early_size:]
            audio = self.convinv[k](audio)
            n_half = audio.size(1) // 2
            audio_0, audio_1 = audio[:, :n_half], audio[:, n_half:]
            wn_out = self.WN[k](audio_0, spect)
            b = wn_out[:, :n_half]
            log_s = wn_out[:, n_half:]
            audio_1 = torch.exp(log_s) * audio_1 + b
            audio = torch.cat([audio_0, audio_1], 1)
        output_audio.append(audio)
        return torch.cat(output_audio, 1)


def _small_cfg():
    return WaveGlowConfig(
        num_mels=8,
        n_flows=4,
        n_group=8,
        n_early_every=2,
        n_early_size=2,
        wn_layers=2,
        wn_channels=16,
        wn_kernel_size=3,
        upsample_kernel=16,
        upsample_stride=4,
    )


def test_waveglow_roundtrip_parity(rng):
    cfg = _small_cfg()
    assert cfg.n_remaining == 6
    torch.manual_seed(0)
    tw = _TorchWaveGlow(cfg)
    tw.eval()

    B, T_mel = 1, 6
    T = T_mel * cfg.upsample_stride
    mel = rng.standard_normal((B, cfg.num_mels, T_mel)).astype(np.float32)
    audio = rng.standard_normal((B, T)).astype(np.float32)
    with torch.no_grad():
        z = tw(torch.from_numpy(audio), torch.from_numpy(mel)).numpy()

    params = import_waveglow_state(tw.state_dict(), cfg)
    wg = WaveGlow(cfg, compute_dtype=jnp.float32)
    got = wg.apply(
        {"params": params},
        jnp.asarray(mel.transpose(0, 2, 1)),
        sigma=1.0,
        noise=jnp.asarray(z.transpose(0, 2, 1)),
    )
    got = np.asarray(got)
    assert got.shape == audio.shape
    np.testing.assert_allclose(got, audio, rtol=1e-3, atol=1e-4)


def test_waveglow_importer_per_layer_cond_variant():
    """Older checkpoints store per-layer cond convs; the importer fuses
    them into the cond_layer layout (layer i at channels [2Ci, 2C(i+1))).
    """
    cfg = _small_cfg()
    torch.manual_seed(1)
    tw = _TorchWaveGlow(cfg)
    sd = tw.state_dict()
    # split every fused cond_layer into per-layer convs
    import re

    split_sd = {}
    C = cfg.wn_channels
    for key, v in sd.items():
        m = re.match(r"(WN\.\d+)\.cond_layer\.(.*)", key)
        if not m:
            split_sd[key] = v
            continue
        base, leaf = m.groups()
        for i in range(cfg.wn_layers):
            split_sd[f"{base}.cond_layers.{i}.{leaf}"] = v[2 * C * i: 2 * C * (i + 1)]
    p_fused = import_waveglow_state(sd, cfg)
    p_split = import_waveglow_state(split_sd, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_fused), jax.tree_util.tree_leaves(p_split)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_waveglow_default_config_shapes():
    cfg = WaveGlowConfig()
    assert cfg.n_remaining == 4
    assert cfg.upsample_stride == 256  # hop length


def test_waveglow_generator_seat(rng):
    """WaveGlow slots into the Synthesizer vocoder seat: deterministic
    default rng, correct output length (T*256)."""
    gen = make_generator("WaveGlow")
    cfg = gen.config
    mel = jnp.asarray(rng.standard_normal((1, 4, cfg.num_mels)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    wav = np.asarray(gen.apply(v, mel))
    wav2 = np.asarray(gen.apply(v, mel))
    assert wav.shape == (1, 4 * 256)
    np.testing.assert_array_equal(wav, wav2)  # deterministic default
