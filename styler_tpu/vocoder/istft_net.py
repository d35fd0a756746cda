"""iSTFTNet-style fast vocoder (beyond-reference, trainable option).

The reference's vocoder set is {HiFi-GAN, MelGAN, WaveGlow}
(reference utils.py:235-271). This adds a faster trainable variant
following iSTFTNet (Kaneko et al., ICASSP 2022, C8C8I): keep HiFi-GAN's
first two upsample stages (8x8 = 64 of the 256x), then predict
magnitude + phase for a short-window inverse STFT that supplies the
remaining 4x — cutting the two long, low-channel conv stages where
HiFi-GAN spends a third of its FLOPs and most of its memory traffic.

TPU-first: the inverse STFT's overlap-add is expressed as n_fft/hop
shifted reshapes (no scatter), so the whole generator stays one fused
XLA graph; the window-square normalization is a precomputed constant
per static length. Train it with the native GAN harness
(train/vocoder.py: pass generator=ISTFTNetGenerator(...)).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from styler_tpu.vocoder.hifigan import (
    ConvTranspose1dTorch,
    LRELU_SLOPE,
    ResBlock1,
)


@dataclasses.dataclass(frozen=True)
class ISTFTNetConfig:
    """C8C8I topology: 8x8 conv upsampling + 4x via iSTFT (hop 4)."""

    upsample_rates: Tuple[int, ...] = (8, 8)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    istft_n_fft: int = 16
    istft_hop: int = 4
    num_mels: int = 80

    @property
    def total_upsampling(self) -> int:
        u = self.istft_hop
        for r in self.upsample_rates:
            u *= r
        return u  # 256 for the default config (the mel hop)


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def inverse_stft(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int):
    """[B, T, n_fft//2+1] magnitude/phase -> wav [B, T*hop].

    Windowed irfft per frame, overlap-add as n_fft/hop shifted reshapes,
    window-square (COLA) normalization, center-cropped by n_fft//2 like
    torch.istft(center=True). Requires hop | n_fft.
    """
    B, T, _ = mag.shape
    assert n_fft % hop == 0
    spec = mag * (jnp.cos(phase) + 1j * jnp.sin(phase))
    window = jnp.asarray(_hann_periodic(n_fft), jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # [B, T, n_fft]

    n_chunks = n_fft // hop
    L = (T - 1) * hop + n_fft
    out = jnp.zeros((B, L), jnp.float32)
    wsum = np.zeros(L, np.float64)
    w2 = _hann_periodic(n_fft) ** 2
    for c in range(n_chunks):
        seg = frames[:, :, c * hop : (c + 1) * hop].reshape(B, T * hop)
        out = out.at[:, c * hop : c * hop + T * hop].add(seg)
        wsum[c * hop : c * hop + T * hop] += np.tile(
            w2[c * hop : (c + 1) * hop], T
        )
    out = out / jnp.asarray(np.maximum(wsum, 1e-9), jnp.float32)
    return out[:, n_fft // 2 : n_fft // 2 + T * hop]


def istft_apply_fused(
    variables,
    mel: jnp.ndarray,
    config: ISTFTNetConfig = ISTFTNetConfig(),
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inference fast path: both upsample stages' resblock sets run as
    fused Pallas kernels (ops/pallas_resblock.py), like
    hifigan.generator_apply_fused. Same param tree as
    ISTFTNetGenerator.apply."""
    import jax

    from styler_tpu.ops.pallas_resblock import (
        branch_params_from_variables,
        fused_resblock_stage,
    )

    params = variables["params"] if "params" in variables else variables
    cfg = config
    dt = compute_dtype

    def conv(name, x):
        p = params[name]
        y = jax.lax.conv_general_dilated(
            x.astype(dt), p["kernel"].astype(dt), (1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + p["bias"].astype(dt)

    x = conv("conv_pre", mel)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = nn.leaky_relu(x, LRELU_SLOPE)
        p = params[f"ups_{i}"]
        x = jax.lax.conv_general_dilated(
            x.astype(dt), p["kernel"].astype(dt), (1,),
            padding=[(k - 1 - (k - u) // 2,) * 2],
            lhs_dilation=(u,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["bias"].astype(dt)
        x = fused_resblock_stage(
            x,
            branch_params_from_variables(
                params, i, len(cfg.resblock_kernel_sizes)
            ),
            kernel_sizes=tuple(cfg.resblock_kernel_sizes),
            dilations=tuple(cfg.resblock_dilation_sizes[0]),
            interpret=interpret,
        )
    x = nn.leaky_relu(x)
    x = conv("conv_post", x).astype(jnp.float32)
    n_bins = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(x[..., :n_bins], -12.0, 8.0))
    phase = x[..., n_bins:]
    return inverse_stft(mag, phase, cfg.istft_n_fft, cfg.istft_hop)


class ISTFTNetGenerator(nn.Module):
    """mel [B, T, 80] -> wav [B, T*256] (same contract as hifigan.Generator)."""

    config: ISTFTNetConfig = ISTFTNetConfig()
    compute_dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = self.compute_dtype
        x = nn.Conv(
            cfg.upsample_initial_channel, (7,), padding="SAME", dtype=dt,
            name="conv_pre",
        )(mel)
        num_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1dTorch(ch, k, u, dtype=dt, name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                block = ResBlock1(
                    ch, rk, tuple(rd), dtype=dt, name=f"resblocks_{i}_{j}"
                )(x)
                xs = block if xs is None else xs + block
            x = xs / num_kernels

        x = nn.leaky_relu(x)
        n_bins = cfg.istft_n_fft // 2 + 1
        x = nn.Conv(
            2 * n_bins, (7,), padding="SAME", dtype=dt, name="conv_post"
        )(x.astype(dt)).astype(jnp.float32)
        mag = jnp.exp(jnp.clip(x[..., :n_bins], -12.0, 8.0))
        phase = x[..., n_bins:]
        return inverse_stft(mag, phase, cfg.istft_n_fft, cfg.istft_hop)
