"""STYLER top model: style modeling → shared decoder → dual decode.

Parity target: reference STYLER (styler.py:13-58). "Residual Decoding":
the clean mel is decoded from the style-modeling output; the noisy mel
from ``stop_gradient(style_output) + noise_encoding`` — the noise branch
learns the residual without polluting the style factors' gradients
(styler.py:51-55).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from styler_tpu.core.config import Config
from styler_tpu.models.style_modeling import StyleModeling, StyleModelingOutput
from styler_tpu.models.transformer import MelDecoder, PostNet
from styler_tpu.ops.masking import mask_from_lengths


class StylerOutput(NamedTuple):
    mel: jnp.ndarray  # [B, M, 80] clean decode
    mel_noisy: jnp.ndarray  # [B, M, 80] residual (noisy) decode
    mel_postnet: jnp.ndarray
    mel_postnet_noisy: jnp.ndarray
    log_d_prediction: jnp.ndarray  # [B, L]
    p_prediction: jnp.ndarray  # [B, M]
    e_prediction: jnp.ndarray  # [B, M]
    src_mask: jnp.ndarray  # [B, L] True at padding
    mel_mask: jnp.ndarray  # [B, M]
    mel_len: jnp.ndarray  # [B]
    dat_posteriors: tuple  # 3 x [B, 2]
    encodings: dict  # controllability contract


class STYLER(nn.Module):
    config: Config
    use_postnet: bool = True

    def setup(self):
        cfg = self.config
        self.style_modeling = StyleModeling(cfg)
        self.decoder = MelDecoder(
            max_seq_len=cfg.max_seq_len,
            d_model=cfg.decoder_hidden,
            n_layers=cfg.decoder_layer,
            n_head=cfg.decoder_head,
            d_inner=cfg.fft_conv1d_filter_size,
            kernel_sizes=tuple(cfg.fft_conv1d_kernel_size),
            dropout=cfg.decoder_dropout,
            dtype=cfg.model_dtype,
        )
        # mel projection and losses stay f32 in mixed-precision mode
        self.mel_linear = nn.Dense(cfg.n_mel_channels)
        if self.use_postnet:
            self.postnet = PostNet(
                n_mel_channels=cfg.n_mel_channels, dtype=cfg.model_dtype
            )

    def decode(
        self,
        style_output: jnp.ndarray,
        mel_mask: jnp.ndarray,
        deterministic: bool = True,
        train: bool = False,
    ):
        """Decoder → mel projection → postnet residual (styler.py:29-37)."""
        dec = self.decoder(style_output, mel_mask, deterministic)
        mel = self.mel_linear(dec)
        if self.use_postnet:
            mel_postnet = self.postnet(mel, deterministic=deterministic, train=train) + mel
        else:
            mel_postnet = mel
        return mel, mel_postnet

    def encode_style(
        self,
        src_seq: jnp.ndarray,
        mel_target: jnp.ndarray,
        mel_aug: jnp.ndarray,
        p_norm: jnp.ndarray,
        e_input: jnp.ndarray,
        src_len: jnp.ndarray,
        mel_len: jnp.ndarray,
        max_src_len: Optional[int] = None,
        max_mel_len: Optional[int] = None,
        speaker_embed: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> tuple:
        """Style-modeling forward only (predicted-durations path, no
        decode/postnet) — the encodings producer for the controllability
        APIs. The reference populates its encoding caches with a FULL
        forward whose decoded mels are discarded (synthesize.py:80-101);
        this skips the two decodes those callers throw away.

        Returns ``(encodings dict, src_mask, predicted mel_len)``."""
        max_src_len = max_src_len or src_seq.shape[1]
        max_mel_len = max_mel_len or mel_target.shape[1]
        src_mask = mask_from_lengths(src_len, max_src_len)
        sm: StyleModelingOutput = self.style_modeling(
            src_seq,
            speaker_embed,
            mel_target,
            mel_aug,
            p_norm,
            e_input,
            src_len,
            mel_len,
            src_mask,
            None,
            max_mel_len,
            None,
            None,
            None,
            d_control,
            p_control,
            e_control,
            True,
        )
        return sm.encodings, src_mask, sm.mel_len

    def forward_dat(
        self,
        mel_aug: jnp.ndarray,
        f0_norm_aug: jnp.ndarray,
        e_input_aug: jnp.ndarray,
        mel_len: jnp.ndarray,
        src_len: jnp.ndarray,
        src_mask: jnp.ndarray,
    ) -> tuple:
        """Second DAT pass on fully-augmented inputs (reference
        train.py:148-156): encoder_input_cat(aug, aug, aug, aug) →
        audio encoder → 3 augmentation classifiers, to be scored
        against label 1."""
        sm = self.style_modeling
        enc_cat = sm.encoder_input_cat(mel_aug, f0_norm_aug, e_input_aug, mel_aug)
        d_enc, p_enc, e_enc, _ = sm.encode_audio(
            enc_cat, mel_len, src_len, src_mask.shape[1]
        )
        return sm.classify_augmentation(d_enc, p_enc, e_enc, src_mask)

    def __call__(
        self,
        src_seq: jnp.ndarray,
        mel_target: jnp.ndarray,
        mel_aug: jnp.ndarray,
        p_norm: jnp.ndarray,
        e_input: jnp.ndarray,
        src_len: jnp.ndarray,
        mel_len: jnp.ndarray,
        d_target: Optional[jnp.ndarray] = None,
        p_target: Optional[jnp.ndarray] = None,
        e_target: Optional[jnp.ndarray] = None,
        max_src_len: Optional[int] = None,
        max_mel_len: Optional[int] = None,
        speaker_embed: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
        deterministic: bool = True,
        train: bool = False,
        residual: bool = True,
    ) -> StylerOutput:
        max_src_len = max_src_len or src_seq.shape[1]
        max_mel_len = max_mel_len or mel_target.shape[1]
        src_mask = mask_from_lengths(src_len, max_src_len)
        mel_mask = mask_from_lengths(mel_len, max_mel_len)

        sm: StyleModelingOutput = self.style_modeling(
            src_seq,
            speaker_embed,
            mel_target,
            mel_aug,
            p_norm,
            e_input,
            src_len,
            mel_len,
            src_mask,
            mel_mask if d_target is not None else None,
            max_mel_len,
            d_target,
            p_target,
            e_target,
            d_control,
            p_control,
            e_control,
            deterministic,
        )

        out_mel_mask = sm.mel_mask if d_target is None else mel_mask
        out_mel_len = sm.mel_len if d_target is None else mel_len

        # Clean decoding (styler.py:52) + Residual ("noisy") decoding
        # (styler.py:55). In eval mode the two decodes run as ONE batched
        # pass (2B) through the shared decoder — identical math since all
        # decoder ops are batch-independent with running-average BN; in
        # train mode they stay separate so the PostNet BatchNorm batch
        # statistics match the reference's two sequential forwards.
        # ``residual=False`` (static) skips the Residual decode entirely —
        # an inference knob for when only the denoised output is consumed
        # (e.g. noisy-reference style transfer that discards the
        # re-noised wav; BASELINE.md measurement config 3). The noisy
        # output slots then alias the clean arrays so the contract shape
        # is unchanged at zero extra compute.
        if not residual:
            mel, mel_postnet = self.decode(
                sm.encoder_output, out_mel_mask, deterministic, train
            )
            mel_noisy, mel_postnet_noisy = mel, mel_postnet
            return StylerOutput(
                mel=mel,
                mel_noisy=mel_noisy,
                mel_postnet=mel_postnet,
                mel_postnet_noisy=mel_postnet_noisy,
                log_d_prediction=sm.log_d_prediction,
                p_prediction=sm.p_prediction,
                e_prediction=sm.e_prediction,
                src_mask=src_mask,
                mel_mask=out_mel_mask,
                mel_len=out_mel_len,
                dat_posteriors=sm.dat_posteriors,
                encodings=sm.encodings,
            )
        noisy_in = jax.lax.stop_gradient(sm.encoder_output) + sm.noise_encoding
        if train:
            mel, mel_postnet = self.decode(
                sm.encoder_output, out_mel_mask, deterministic, train
            )
            mel_noisy, mel_postnet_noisy = self.decode(
                noisy_in, out_mel_mask, deterministic, train
            )
        else:
            stacked = jnp.concatenate([sm.encoder_output, noisy_in], axis=0)
            stacked_mask = jnp.concatenate([out_mel_mask, out_mel_mask], axis=0)
            mel2, mel_postnet2 = self.decode(
                stacked, stacked_mask, deterministic, train
            )
            B = sm.encoder_output.shape[0]
            mel, mel_noisy = mel2[:B], mel2[B:]
            mel_postnet, mel_postnet_noisy = mel_postnet2[:B], mel_postnet2[B:]

        return StylerOutput(
            mel=mel,
            mel_noisy=mel_noisy,
            mel_postnet=mel_postnet,
            mel_postnet_noisy=mel_postnet_noisy,
            log_d_prediction=sm.log_d_prediction,
            p_prediction=sm.p_prediction,
            e_prediction=sm.e_prediction,
            src_mask=src_mask,
            mel_mask=out_mel_mask,
            mel_len=out_mel_len,
            dat_posteriors=sm.dat_posteriors,
            encodings=sm.encodings,
        )
