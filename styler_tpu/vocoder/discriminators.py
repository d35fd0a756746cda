"""HiFi-GAN discriminators (multi-period + multi-scale), JAX/Flax.

Beyond-reference capability: the reference consumes pretrained vocoders
only (reference utils.py:250-271 loads checkpoints; no vocoder training
exists there). These discriminators + train/vocoder.py let users train
or fine-tune the JAX vocoders (vocoder/hifigan.py Generator and
variants) natively on TPU — the structure follows the published
HiFi-GAN recipe (Kong et al. 2020): MPD periods 2/3/5/7/11 with 2D
convs over period-folded audio, MSD with 3 scales of grouped 1D convs.

TPU-first choices: channels-last layouts, no weight normalization (the
generator's parametrization is the folded inference one, so imported
checkpoints fine-tune directly; AdamW + lower LR compensates), static
segment lengths (the training harness crops fixed-size segments).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """One period discriminator: audio folded to [T/p, p] then 2D convs
    with (5, 1) kernels striding over the fold rows."""

    period: int

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """wav: [B, T] -> (logits [B, F], per-layer features)."""
        B, T = wav.shape
        p = self.period
        pad = (-T) % p
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if pad and T > 1 else "constant")
        x = x.reshape(B, (T + pad) // p, p, 1)  # NHWC

        feats = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(
                ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)), name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class DiscriminatorS(nn.Module):
    """One scale discriminator: grouped 1D convs with large kernels."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        B = wav.shape[0]
        x = wav[..., None]  # [B, T, 1]
        specs = (
            # (channels, kernel, stride, groups)
            (128, 15, 1, 1),
            (128, 41, 2, 4),
            (256, 41, 2, 16),
            (512, 41, 4, 16),
            (1024, 41, 4, 16),
            (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        )
        feats = []
        for i, (ch, k, s, g) in enumerate(specs):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="SAME",
                feature_group_count=g, name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1, (3,), padding="SAME", name="conv_post")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        logits, feats = [], []
        for p in self.periods:
            l, f = DiscriminatorP(p, name=f"p{p}")(wav)
            logits.append(l)
            feats.append(f)
        return logits, feats


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        logits, feats = [], []
        x = wav
        for s in range(self.n_scales):
            if s > 0:
                # avg-pool kernel 4 stride 2 (torch AvgPool1d(4, 2, padding=2))
                x = nn.avg_pool(
                    x[..., None], (4,), strides=(2,), padding=((2, 2),)
                )[..., 0]
            l, f = DiscriminatorS(name=f"s{s}")(x)
            logits.append(l)
            feats.append(f)
        return logits, feats


class HiFiGANDiscriminator(nn.Module):
    """MPD + MSD under one param tree (one optimizer state)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    n_scales: int = 3

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        lp, fp = MultiPeriodDiscriminator(self.periods, name="mpd")(wav)
        ls, fs = MultiScaleDiscriminator(self.n_scales, name="msd")(wav)
        return lp + ls, fp + fs
