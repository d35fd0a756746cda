"""WaveGlow vocoder (NVIDIA), JAX/Flax — inference (reverse flow) only.

Third member of the reference's ``hp.vocoder`` set (reference
hparams.py:19); the reference loads it from torch.hub and calls
``vocoder.infer(mel, sigma=1.0)`` after ``remove_weightnorm``
(reference utils.py:263-271,285-286). The torch.hub weights cannot be
downloaded offline, so parity is pinned against a torch rebuild of the
architecture in tests/test_waveglow.py and real checkpoints load through
core.import_torch.import_waveglow_state.

Architecture (nvidia/DeepLearningExamples glow.py): mel is upsampled
with a ConvTranspose1d(80, 80, k=1024, stride=256), grouped 8 audio
samples per flow step (-> 640 conditioning channels), then 12 coupling
flows each = invertible 1x1 conv + WN affine coupling (8-layer
dilated-conv gated-tanh stack with a single fused conditioning conv),
with 2 early-output channels every 4 flows. Inference runs the flows in
reverse from N(0, sigma) noise.

TPU-first: channels-last NWC everywhere; the WN stacks are
256->512-channel convs (MXU-friendly); the 1x1 convs become single
matmuls; the whole reverse flow is one jitted graph. The flow loop is a
Python loop over 12 per-flow parameter sets — static, unrolled by trace,
no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WaveGlowConfig:
    """nvidia_waveglow defaults (DeepLearningExamples torchhub)."""

    num_mels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    wn_layers: int = 8
    wn_channels: int = 256
    wn_kernel_size: int = 3
    upsample_kernel: int = 1024
    upsample_stride: int = 256

    @property
    def n_remaining(self) -> int:
        """Channels left after early outputs (4 for the defaults)."""
        n = self.n_group
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                n -= self.n_early_size
        return n


class WN(nn.Module):
    """Gated-tanh dilated conv stack (glow.py WN), channels-last.

    in: audio half [B, T, n_half], cond [B, T, n_mel*n_group];
    out: [B, T, 2*n_half], channel layout matching glow.py exactly:
    b = out[..., :n_half], log_s = out[..., n_half:].
    """

    config: WaveGlowConfig
    n_half: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        C = cfg.wn_channels
        dt = self.dtype
        x = nn.Conv(C, (1,), dtype=dt, name="start")(audio.astype(dt))
        # single fused conditioning conv (2*C per layer), glow.py cond_layer
        cond_all = nn.Conv(
            2 * C * cfg.wn_layers, (1,), dtype=dt, name="cond_layer"
        )(cond.astype(dt))
        output = jnp.zeros_like(x)
        for i in range(cfg.wn_layers):
            acts_in = nn.Conv(
                2 * C,
                (cfg.wn_kernel_size,),
                kernel_dilation=(2**i,),
                padding="SAME",
                dtype=dt,
                name=f"in_layer_{i}",
            )(x)
            acts_in = acts_in + cond_all[..., i * 2 * C: (i + 1) * 2 * C]
            acts = jnp.tanh(acts_in[..., :C]) * jax.nn.sigmoid(acts_in[..., C:])
            last = i == cfg.wn_layers - 1
            res_skip = nn.Conv(
                C if last else 2 * C, (1,), dtype=dt, name=f"res_skip_{i}"
            )(acts)
            if last:
                output = output + res_skip
            else:
                x = x + res_skip[..., :C]
                output = output + res_skip[..., C:]
        # zero-initialized end conv (glow.py: end.weight/bias zeroed)
        return nn.Conv(
            2 * self.n_half,
            (1,),
            dtype=dt,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="end",
        )(output)


class WaveGlow(nn.Module):
    """Reverse-flow inference: natural-log mel [B, T, 80] + PRNG key ->
    waveform [B, T*256].

    The inverse 1x1-conv weights are stored as parameters
    (``convinv_{k}``) holding the *already inverted* matrices — the
    importer inverts once at load (torch does it lazily at first infer,
    glow.py Invertible1x1Conv.forward(reverse=True)).
    """

    config: WaveGlowConfig = WaveGlowConfig()
    compute_dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        rng: jax.Array = None,
        sigma: float = 1.0,
        noise: jnp.ndarray = None,
    ) -> jnp.ndarray:
        """``noise`` (optional) [B, T', n_group] replaces the random
        draws, in torch z layout — the channel order glow.py's forward
        pass emits: early outputs first (earliest k first), remaining
        channels last. Lets tests round-trip torch-forward -> our
        inverse; production callers leave it None.
        """
        if rng is None:
            # deterministic default so WaveGlow is drop-in for the
            # Synthesizer's `apply(variables, mel)` vocoder seat (torch
            # draws fresh noise per call; pass rng explicitly for that)
            rng = jax.random.PRNGKey(0)
        cfg = self.config
        dt = self.compute_dtype
        B, T_mel, _ = mel.shape
        k_up, s_up = cfg.upsample_kernel, cfg.upsample_stride
        G = cfg.n_group

        # torch ConvTranspose1d(80, 80, 1024, stride=256, padding=0):
        # conv over the stride-dilated input with flipped kernel and full
        # (k-1) padding; out length (T-1)*s + k, then glow.py trims the
        # trailing k - s samples -> exactly T*s.
        up_kernel = self.param(
            "upsample_kernel",
            nn.initializers.normal(0.02),
            (k_up, cfg.num_mels, cfg.num_mels),
        )
        up_bias = self.param(
            "upsample_bias", nn.initializers.zeros, (cfg.num_mels,)
        )
        spect = jax.lax.conv_general_dilated(
            mel,
            up_kernel,
            window_strides=(1,),
            padding=[(k_up - 1, k_up - 1)],
            lhs_dilation=(s_up,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + up_bias
        spect = spect[:, : T_mel * s_up]

        # group 8 audio-rate frames per flow step: [B, T', 80*G]
        # (glow.py unfold(2, G, G).permute -> view; channels-last here)
        Tp = spect.shape[1] // G
        cond = spect[:, : Tp * G].reshape(B, Tp, G, cfg.num_mels)
        # torch layout after permute(0,2,1,3).view: channel index =
        # mel_channel * G + group_pos
        cond = cond.transpose(0, 1, 3, 2).reshape(B, Tp, cfg.num_mels * G)
        cond = cond.astype(dt)

        # start from N(0, sigma) on the remaining channels; torch z layout
        # puts them at the END of the noise tensor
        z_off = G - cfg.n_remaining
        if noise is not None:
            audio = sigma * noise[..., z_off:].astype(jnp.float32)
        else:
            audio = sigma * jax.random.normal(
                rng, (B, Tp, cfg.n_remaining), dtype=jnp.float32
            )

        for k in reversed(range(cfg.n_flows)):
            n_half = audio.shape[-1] // 2
            audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
            wn_out = WN(cfg, n_half, dtype=dt, name=f"wn_{k}")(audio_0, cond)
            wn_out = wn_out.astype(jnp.float32)
            b = wn_out[..., :n_half]
            log_s = wn_out[..., n_half:]
            audio_1 = (audio_1 - b) * jnp.exp(-log_s)
            audio = jnp.concatenate([audio_0, audio_1], axis=-1)

            # inverse 1x1 conv: stored pre-inverted [C, C]; y = x @ W_inv^T
            w_inv = self.param(
                f"convinv_{k}",
                _orthogonal_inverse_init,
                (audio.shape[-1], audio.shape[-1]),
            )
            audio = jnp.einsum(
                "btc,dc->btd", audio, w_inv,
                precision=jax.lax.Precision.HIGHEST,
            )

            if k % cfg.n_early_every == 0 and k > 0:
                if noise is not None:
                    z_off -= cfg.n_early_size
                    z = sigma * noise[
                        ..., z_off: z_off + cfg.n_early_size
                    ].astype(jnp.float32)
                else:
                    rng, sub = jax.random.split(rng)
                    z = sigma * jax.random.normal(
                        sub, (B, Tp, cfg.n_early_size), dtype=jnp.float32
                    )
                audio = jnp.concatenate([z, audio], axis=-1)

        # [B, T', G] -> interleave groups back to sample order
        return audio.reshape(B, Tp * G)


def _orthogonal_inverse_init(key, shape, dtype=jnp.float32):
    """Random orthogonal matrix (its own transpose-inverse family) so an
    untrained WaveGlow is still volume-preserving and finite."""
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def infer(waveglow: WaveGlow, variables, mel, rng, sigma: float = 1.0):
    """Jitted mel -> waveform, reference utils.py:285-286 contract."""
    return jax.jit(
        lambda v, m, r: waveglow.apply(v, m, r, sigma)
    )(variables, mel, rng)
