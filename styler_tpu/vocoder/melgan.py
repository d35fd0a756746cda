"""MelGAN generator (descriptinc/melgan-neurips), JAX/Flax.

The reference selects its vocoder with ``hp.vocoder`` in
{"HiFi-GAN", "MelGAN", "WaveGlow"} (reference hparams.py:19) and loads
MelGAN from torch.hub (reference utils.py:239-248), feeding it
``mel / np.log(10)`` — i.e. the generator was trained on *log10* mels
while the acoustic model emits natural-log mels (utils.py:278). This
module keeps the framework-wide contract (natural-log mel in) and folds
the base conversion into the first op, so every vocoder here is a
drop-in ``apply(variables, mel[B,T,80]) -> wav[B,T*hop]``.

Architecture (multi_speaker / linda_johnson configs are identical in
topology): reflect-pad conv 80->512 k7, then per upsample ratio r in
(8,8,2,2): leaky_relu(0.2) + ConvTranspose1d(k=2r, stride=r, pad=r//2)
halving channels, followed by 3 residual blocks with dilations 3^j;
final leaky_relu + reflect-pad conv to 1 channel + tanh. All convs are
weight-normalized in torch; weights are folded at import
(core/import_torch.py:import_melgan_state).

TPU-first: channels-last NWC layout so every conv lands on the MXU;
reflect padding is explicit jnp.pad + VALID conv (torch
ReflectionPad1d semantics); transposed convs reuse the
input-dilation formulation from hifigan.ConvTranspose1dTorch (all
ratios are even, so torch padding r//2 == (k-u)//2 exactly).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from styler_tpu.vocoder.hifigan import ConvTranspose1dTorch

LRELU_SLOPE = 0.2


@dataclasses.dataclass(frozen=True)
class MelGANConfig:
    """descriptinc/melgan-neurips Generator(input_size=80, ngf=32,
    n_residual_layers=3) with ratios (8,8,2,2) — hop 256 at 22050 Hz,
    matching the reference audio spec (hparams.py:29-31)."""

    num_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Tuple[int, ...] = (8, 8, 2, 2)


def _reflect_pad_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch ReflectionPad1d on the time axis of [B, T, C]."""
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    """shortcut(x) + block(x): lrelu -> reflect(d) -> conv k3 dil d ->
    lrelu -> conv k1; shortcut = conv k1 (melgan-neurips modules.py)."""

    dim: int
    dilation: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.leaky_relu(x, LRELU_SLOPE)
        h = _reflect_pad_time(h, self.dilation)
        h = nn.Conv(
            self.dim,
            (3,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            dtype=self.dtype,
            name="conv_dilated",
        )(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        h = nn.Conv(self.dim, (1,), dtype=self.dtype, name="conv_1x1")(h)
        s = nn.Conv(self.dim, (1,), dtype=self.dtype, name="shortcut")(x)
        return s + h


class MelGANGenerator(nn.Module):
    """Natural-log mel [B, T, 80] -> waveform [B, T*prod(ratios)].

    compute_dtype=bfloat16 for production inference (params stay f32);
    pass float32 for torch-parity comparisons — same convention as
    hifigan.Generator.
    """

    config: MelGANConfig = MelGANConfig()
    compute_dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = self.compute_dtype
        # ConvTranspose1dTorch implements torch padding (k-u)//2, which
        # matches melgan-neurips's padding=r//2+r%2 / output_padding=r%2
        # only for even ratios — fail loudly rather than decode wrong.
        assert all(r % 2 == 0 for r in cfg.ratios), (
            f"MelGANGenerator supports even upsample ratios only, got {cfg.ratios}"
        )
        # reference feeds torch-MelGAN `mel / log(10)` (utils.py:278)
        x = (mel * np.float32(1.0 / np.log(10.0))).astype(dt)
        mult = 2 ** len(cfg.ratios)

        x = _reflect_pad_time(x, 3)
        x = nn.Conv(
            mult * cfg.ngf, (7,), padding="VALID", dtype=dt, name="conv_in"
        )(x)

        for i, r in enumerate(cfg.ratios):
            ch = (mult // 2) * cfg.ngf
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1dTorch(ch, 2 * r, r, dtype=dt, name=f"ups_{i}")(x)
            for j in range(cfg.n_residual_layers):
                x = ResnetBlock(ch, 3**j, dtype=dt, name=f"res_{i}_{j}")(x)
            mult //= 2

        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = _reflect_pad_time(x, 3)
        x = nn.Conv(1, (7,), padding="VALID", dtype=dt, name="conv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]
