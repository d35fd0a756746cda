"""HiFi-GAN V1 generator (inference vocoder), JAX/Flax.

Parity target: reference hifigan/models.py:112-174 (Generator with
ResBlock1) + hifigan/config.json (universal V1: upsample rates 8,8,2,2,
kernels 16,16,4,4, 512 initial channels, resblock kernels 3/7/11 with
dilations 1/3/5). Inference-only: weight norm is folded at import
(reference utils.py:261 removes it before use).

TPU-first: channels-last layout; transposed convs via lax.conv with
input dilation (bit-compatible with torch ConvTranspose1d so ported
weights reproduce the reference waveform); whole generator is one jitted
graph colocated with the acoustic model — no host round-trip between mel
and waveform (the north-star requirement).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    """Mirror of hifigan/config.json (universal V1)."""

    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    num_mels: int = 80
    sampling_rate: int = 22050


class ConvTranspose1dTorch(nn.Module):
    """ConvTranspose1d with torch semantics: stride u, padding (k-u)//2.

    Implemented as a regular conv over an input dilated by the stride
    (lhs_dilation), with the kernel flipped — numerically identical to
    torch, so imported weights need only a layout transpose.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        # kernel stored flipped+transposed at import: [k, in, out]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = k - 1 - p
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(u,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(self.dtype)


class ResBlock1(nn.Module):
    """Multi-dilation residual block (reference hifigan/models.py:28-75):
    x += c2(lrelu(c1(lrelu(x)))) for each dilation."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding="SAME",
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(1,),
                padding="SAME",
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = x + xt
        return x


class Generator(nn.Module):
    """compute_dtype=bfloat16 is the production inference mode (MXU-native,
    ~2x f32 conv throughput); float32 is used for torch-parity testing.
    Params are stored f32 either way."""

    config: HiFiGANConfig = HiFiGANConfig()
    compute_dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: [B, T, 80] (log-mel, channels-last) -> wav [B, T*256]."""
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
                block = ResBlock1(ch, rk, tuple(rd), dtype=dt, name=f"resblocks_{i}_{j}")(x)
                xs = block if xs is None else xs + block
            x = xs / num_kernels

        x = nn.leaky_relu(x)  # default slope 0.01 (reference models.py:161 F.leaky_relu)
        x = nn.Conv(1, (7,), padding="SAME", dtype=dt, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


def vocode(generator: Generator, variables, mel: jnp.ndarray) -> jnp.ndarray:
    """Jitted mel -> waveform. mel: [B, T, 80] channels-last."""
    return jax.jit(lambda v, m: generator.apply(v, m))(variables, mel)


def generator_fused_supported(
    mel_frames: int, config: HiFiGANConfig = HiFiGANConfig()
) -> bool:
    """Static check: can `generator_apply_fused` handle a mel of this
    length? Replays the per-stage fold/block math of
    ops/pallas_resblock.py:fused_resblock_stage — the fused kernel needs
    each stage's block length (largest power-of-two-reduced divisor of
    the folded length) to cover the receptive radius. True for every
    default mel bucket (all multiples of 128)."""
    from styler_tpu.ops.pallas_resblock import (
        TARGET_LANES,
        _block_rows_for,
        _halo_for,
    )

    # the fused kernels apply resblock_dilation_sizes[0] to EVERY
    # branch; heterogeneous per-branch dilations must use the XLA path
    if any(
        tuple(d) != tuple(config.resblock_dilation_sizes[0])
        for d in config.resblock_dilation_sizes
    ):
        return False
    halo_samples = _halo_for(
        config.resblock_kernel_sizes, config.resblock_dilation_sizes[0]
    )
    T = mel_frames
    ch = config.upsample_initial_channel
    for u in config.upsample_rates:
        T *= u
        ch //= 2
        f = max(1, TARGET_LANES // ch)
        while T % f:
            f //= 2
        Tf = T // f
        halo = -(-halo_samples // f)
        bt = _block_rows_for(f * ch)
        while Tf % bt:
            bt //= 2
        if halo > bt:
            return False
    return True


def generator_apply_fused(
    variables,
    mel: jnp.ndarray,
    config: HiFiGANConfig = HiFiGANConfig(),
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    quantize: bool = False,
) -> jnp.ndarray:
    """Production inference fast path: Generator.__call__ with each
    stage's 3-ResBlock set fused into one Pallas kernel
    (ops/pallas_resblock.py — activations stay in VMEM; one HBM read +
    write per stage instead of ~40). Numerically equivalent to
    ``Generator(config, compute_dtype).apply(variables, mel)`` on the
    same variables; pinned by tests/test_pallas_resblock.py.

    quantize=True additionally runs the resblock matmuls on the int8
    MXU path (approximate — see fused_resblock_stage); the upsample
    transposes and pre/post convs stay in compute_dtype.
    """
    from styler_tpu.ops.pallas_resblock import (
        branch_params_from_variables,
        fused_resblock_stage,
    )

    params = variables["params"] if "params" in variables else variables
    cfg = config
    dt = compute_dtype

    def conv(name, x, dilation=1):
        p = params[name]
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            p["kernel"].astype(dt),
            (1,),
            padding="SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + p["bias"].astype(dt)

    x = conv("conv_pre", mel)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = nn.leaky_relu(x, LRELU_SLOPE)
        p = params[f"ups_{i}"]
        x = jax.lax.conv_general_dilated(
            x.astype(dt),
            p["kernel"].astype(dt),
            (1,),
            padding=[(k - 1 - (k - u) // 2,) * 2],
            lhs_dilation=(u,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["bias"].astype(dt)
        x = fused_resblock_stage(
            x,
            branch_params_from_variables(
                params, i, n_branches=len(cfg.resblock_kernel_sizes)
            ),
            kernel_sizes=tuple(cfg.resblock_kernel_sizes),
            dilations=tuple(cfg.resblock_dilation_sizes[0]),
            interpret=interpret,
            quantize=quantize,
        )
    x = nn.leaky_relu(x)
    x = conv("conv_post", x)
    return jnp.tanh(x.astype(jnp.float32))[..., 0]
