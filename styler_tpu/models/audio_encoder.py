"""Audio (style factor) encoder: 4 parallel conv stacks + bottleneck BiLSTMs.

Parity target: reference AudioEncoder (modules.py:84-201), SpeechSplit-style:
- input is the 674-channel concatenation [clean mel 80 | f0 one-hot 257 |
  energy one-hot 257 | aug mel 80] (reference StyleEncoder.encoder_input_cat,
  modules.py:218-223),
- per branch: 3x [Conv1d k5 → GroupNorm(C/16) → ReLU],
- all four branch outputs are calibrated frame→phoneme domain in ONE
  batched matmul (reference calls utils.mel_calibrator on the 1152-channel
  concat, modules.py:174-175),
- then 2-layer BiLSTMs with narrow necks: duration 80, pitch 64,
  energy 64, residual/noise 4 (hparams.py:63-67).

TPU-first: channels-last layout, the calibrator is an MXU matmul
(ops/regulate.py), the LSTM input projections are hoisted matmuls
(ops/recurrent.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from styler_tpu.ops.recurrent import bilstm, fused_bilstm_branches
from styler_tpu.ops.regulate import mel_calibrate


def _uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class BiLSTM(nn.Module):
    """Flax wrapper over ops.recurrent.bilstm with PyTorch-layout params.

    ``collect_params=True`` declares the parameters (same names/shapes,
    so checkpoints are unaffected) and returns them instead of running —
    used by AudioEncoder to execute all four branch recurrences in one
    merged scan (ops/recurrent.py:fused_bilstm_branches)."""

    hidden: int
    num_layers: int = 2

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray, collect_params: bool = False
    ):
        bound = 1.0 / float(self.hidden) ** 0.5
        params = []
        in_dim = x.shape[-1]
        for layer in range(self.num_layers):
            lp = {}
            for d in ("fwd", "bwd"):
                lp[d] = {
                    "w_ih": self.param(
                        f"l{layer}_{d}_w_ih", _uniform_init(bound), (4 * self.hidden, in_dim)
                    ),
                    "w_hh": self.param(
                        f"l{layer}_{d}_w_hh", _uniform_init(bound), (4 * self.hidden, self.hidden)
                    ),
                    "b_ih": self.param(
                        f"l{layer}_{d}_b_ih", _uniform_init(bound), (4 * self.hidden,)
                    ),
                    "b_hh": self.param(
                        f"l{layer}_{d}_b_hh", _uniform_init(bound), (4 * self.hidden,)
                    ),
                }
            params.append(lp)
            in_dim = 2 * self.hidden
        if collect_params:
            return params
        return bilstm(params, x, lengths)


class ConvBranch(nn.Module):
    """3x [Conv1d k5 SAME → GroupNorm → ReLU] (reference modules.py:103-160).

    Convs run in `dtype` (bf16 in mixed-precision mode); GroupNorm
    statistics promote back to f32 (flax default with f32 params)."""

    dim: int
    chs_grp: int = 16
    n_layers: int = 3
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_layers):
            x = nn.Conv(
                self.dim, (5,), padding="SAME", dtype=self.dtype, name=f"conv_{i}"
            )(x)
            x = nn.GroupNorm(num_groups=self.dim // self.chs_grp, name=f"gn_{i}")(x)
            x = nn.relu(x)
        return x


class AudioEncoder(nn.Module):
    n_mel_channels: int = 80
    dim_f0: int = 257
    dim_energy: int = 257
    enc_dim_d: int = 256
    enc_dim_p: int = 320
    enc_dim_e: int = 320
    enc_dim_r: int = 256
    neck_d: int = 80
    neck_p: int = 64
    neck_e: int = 64
    neck_r: int = 4
    chs_grp: int = 16
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        enc_cat: jnp.ndarray,
        mel_len: jnp.ndarray,
        seq_len: jnp.ndarray,
        max_src: int,
    ):
        """enc_cat: [B, M, 674]; mel_len, seq_len: [B].

        Returns (duration, pitch, energy, noise) encodings, each
        [B, max_src, 2*neck] in the phoneme domain.
        """
        d_in, f0_in, e_in, r_in = jnp.split(
            enc_cat,
            [
                self.n_mel_channels,
                self.n_mel_channels + self.dim_f0,
                self.n_mel_channels + self.dim_f0 + self.dim_energy,
            ],
            axis=-1,
        )

        d = ConvBranch(self.enc_dim_d, self.chs_grp, dtype=self.dtype, name="convs_d")(d_in)
        p = ConvBranch(self.enc_dim_p, self.chs_grp, dtype=self.dtype, name="convs_p")(f0_in)
        e = ConvBranch(self.enc_dim_e, self.chs_grp, dtype=self.dtype, name="convs_e")(e_in)
        r = ConvBranch(self.enc_dim_r, self.chs_grp, dtype=self.dtype, name="convs_r")(r_in)

        cat = jnp.concatenate([d, p, e, r], axis=-1)  # [B, M, 1152]
        cat = mel_calibrate(cat, mel_len, seq_len, max_src)  # [B, S, 1152]

        d, p, e, r = jnp.split(
            cat,
            [
                self.enc_dim_d,
                self.enc_dim_d + self.enc_dim_p,
                self.enc_dim_d + self.enc_dim_p + self.enc_dim_e,
            ],
            axis=-1,
        )

        # All 4 bottleneck recurrences run as ONE merged scan per layer
        # (block-diagonal combined cell + stacked directions): 2 serial
        # chains per pass instead of 16. Bit-identical math to running
        # the BiLSTMs apart. STYLER_TPU_PALLAS_LSTM=1 restores the
        # per-branch path (to exercise ops/pallas_lstm.py).
        from styler_tpu.ops.pallas_lstm import use_pallas_lstm

        if use_pallas_lstm():
            duration_encoding = BiLSTM(self.neck_d, name="lstm_d")(d, seq_len)
            pitch_encoding = BiLSTM(self.neck_p, name="lstm_p")(p, seq_len)
            energy_encoding = BiLSTM(self.neck_e, name="lstm_e")(e, seq_len)
            noise_encoding = BiLSTM(self.neck_r, name="lstm_r")(r, seq_len)
        else:
            branch_params = [
                BiLSTM(self.neck_d, name="lstm_d")(d, seq_len, collect_params=True),
                BiLSTM(self.neck_p, name="lstm_p")(p, seq_len, collect_params=True),
                BiLSTM(self.neck_e, name="lstm_e")(e, seq_len, collect_params=True),
                BiLSTM(self.neck_r, name="lstm_r")(r, seq_len, collect_params=True),
            ]
            (
                duration_encoding,
                pitch_encoding,
                energy_encoding,
                noise_encoding,
            ) = fused_bilstm_branches(branch_params, [d, p, e, r], seq_len)
        return duration_encoding, pitch_encoding, energy_encoding, noise_encoding
