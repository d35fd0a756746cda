"""Style modeling: encoders → DAT heads → length regulation → prediction.

Parity target: reference StyleModeling/StyleEncoder (modules.py:204-387).

The reference caches intermediate encodings on module attributes for the
inspection/controllability APIs (modules.py:327-348, synthesize.py:114-144).
Here they are *explicit outputs* (the ``encodings`` dict), preserving the
same 2^5 mix-and-match contract functionally:

    t       text encoding                      [B, L, 256]
    t_neck  channel-up text bottleneck         [B, L, 256]
    p_down  raw pitch encoding (pre channel-up)[B, L, 128]
    s_down  pitch-space speaker projection     [B, L, 128]
    d       channel-up duration encoding       [B, L, 256]
    s       speaker encoding                   [B, L, 256]
    e       channel-up energy encoding         [B, L, 256]
    n       channel-up noise encoding          [B, L, 256]

``predict_inference`` consumes externally mixed encodings exactly like
reference modules.py:285-309 (used by synthesize.py infer/infer_comb).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from styler_tpu.core.config import Config
from styler_tpu.dsp.features import (
    bucketize,
    energy_bin_edges,
    pitch_bin_edges,
    quantize_one_hot,
)
from styler_tpu.models.audio_encoder import AudioEncoder
from styler_tpu.models.predictors import AugmentationClassifier, StylePredictor
from styler_tpu.models.transformer import TextEncoder
from styler_tpu.ops.masking import mask_from_lengths
from styler_tpu.ops.regulate import length_regulate
from styler_tpu.textproc.symbols import VOCAB_SIZE


class ChannelUp(nn.Module):
    """Linear→ReLU→Linear→ReLU projection (reference modules.py:250-271)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.relu(nn.Dense(self.hidden, name="fc2")(x))


class StyleModelingOutput(NamedTuple):
    encoder_output: jnp.ndarray  # [B, M, 256] summed style/text encoding
    noise_encoding: jnp.ndarray  # [B, M, 256] frame-domain noise encoding
    log_d_prediction: jnp.ndarray  # [B, L]
    p_prediction: jnp.ndarray  # [B, M]
    e_prediction: jnp.ndarray  # [B, M]
    mel_len: jnp.ndarray  # [B]
    mel_mask: jnp.ndarray  # [B, M]
    dat_posteriors: tuple  # 3 x [B, 2]
    encodings: dict  # controllability contract (see module docstring)


class StyleModeling(nn.Module):
    config: Config

    def setup(self):
        cfg = self.config
        dt = cfg.model_dtype
        self.text_encoder = TextEncoder(
            vocab_size=VOCAB_SIZE,
            max_seq_len=cfg.max_seq_len,
            d_model=cfg.encoder_hidden,
            n_layers=cfg.encoder_layer,
            n_head=cfg.encoder_head,
            d_inner=cfg.fft_conv1d_filter_size,
            kernel_sizes=tuple(cfg.fft_conv1d_kernel_size),
            dropout=cfg.encoder_dropout,
            dtype=dt,
        )
        self.audio_encoder = AudioEncoder(
            n_mel_channels=cfg.n_mel_channels,
            dim_f0=cfg.va_dim_f0,
            dim_energy=cfg.va_dim_energy,
            enc_dim_d=cfg.va_enc_dim_d,
            enc_dim_p=cfg.va_enc_dim_p,
            enc_dim_e=cfg.va_enc_dim_e,
            enc_dim_r=cfg.va_enc_dim_r,
            neck_d=cfg.va_neck_hidden_d,
            neck_p=cfg.va_neck_hidden_p,
            neck_e=cfg.va_neck_hidden_e,
            neck_r=cfg.va_neck_hidden_r,
            chs_grp=cfg.va_chs_grp,
            dtype=dt,
        )
        self.text_linear_down = nn.Dense(cfg.va_neck_hidden_t)
        self.speaker_linear_p = nn.Dense(cfg.va_neck_hidden_p * 2)
        self.speaker_linear = nn.Dense(cfg.encoder_hidden)

        self.augmentation_classifier_d = AugmentationClassifier(cfg.encoder_hidden)
        self.augmentation_classifier_p = AugmentationClassifier(cfg.encoder_hidden)
        self.augmentation_classifier_e = AugmentationClassifier(cfg.encoder_hidden)

        self.duration_linear = ChannelUp(cfg.encoder_hidden)
        self.pitch_linear = ChannelUp(cfg.encoder_hidden)
        self.energy_linear = ChannelUp(cfg.encoder_hidden)
        self.residual_linear = ChannelUp(cfg.encoder_hidden)
        # single Linear+ReLU, unlike the 2-layer channel-ups
        # (reference modules.py:270-271)
        self.text_linear_up = nn.Dense(cfg.encoder_hidden)

        self.duration_predictor = StylePredictor(
            cfg.style_predictor_filter_size,
            cfg.style_predictor_kernel_size,
            cfg.style_predictor_dropout,
            dtype=dt,
        )
        self.pitch_predictor = StylePredictor(
            cfg.style_predictor_filter_size,
            cfg.style_predictor_kernel_size,
            cfg.style_predictor_dropout,
            dtype=dt,
        )
        self.energy_predictor = StylePredictor(
            cfg.style_predictor_filter_size,
            cfg.style_predictor_kernel_size,
            cfg.style_predictor_dropout,
            dtype=dt,
        )

        self.pitch_embedding = nn.Embed(cfg.n_bins, cfg.encoder_hidden)
        self.energy_embedding = nn.Embed(cfg.n_bins, cfg.encoder_hidden)
        self.pitch_bins = jnp.asarray(pitch_bin_edges(cfg.f0_min, cfg.f0_max, cfg.n_bins))
        self.energy_bins = jnp.asarray(
            energy_bin_edges(cfg.energy_min, cfg.energy_max, cfg.n_bins)
        )

    # ------------------------------------------------------------------
    # pieces reused by training forward, inference, and DAT second pass
    # ------------------------------------------------------------------

    def encoder_input_cat(self, mel_target, p_norm, e_input, mel_aug):
        """[clean mel | f0 one-hot | energy one-hot | aug mel] — 674 ch
        (reference modules.py:218-223), channels-last."""
        p_q = quantize_one_hot(p_norm, self.config.n_bins)
        e_q = quantize_one_hot(e_input, self.config.n_bins)
        return jnp.concatenate([mel_target, p_q, e_q, mel_aug], axis=-1)

    def encode_audio(self, enc_cat, mel_len, src_len, max_src):
        """Audio-branch encodings in the phoneme domain."""
        return self.audio_encoder(enc_cat, mel_len, src_len, max_src)

    def classify_augmentation(self, d_enc, p_enc, e_enc, src_mask):
        return (
            self.augmentation_classifier_d(d_enc, src_mask),
            self.augmentation_classifier_p(p_enc, src_mask),
            self.augmentation_classifier_e(e_enc, src_mask),
        )

    def _duration_rounded(self, log_d_prediction, d_control):
        cfg = self.config
        return jnp.clip(
            jnp.round(jnp.exp(log_d_prediction) - cfg.log_offset) * d_control,
            min=0.0,
        ).astype(jnp.int32)

    # ------------------------------------------------------------------

    def __call__(
        self,
        src_seq: jnp.ndarray,
        speaker_embed: jnp.ndarray,
        mel_target: jnp.ndarray,
        mel_aug: jnp.ndarray,
        p_norm: jnp.ndarray,
        e_input: jnp.ndarray,
        src_len: jnp.ndarray,
        mel_len: jnp.ndarray,
        src_mask: jnp.ndarray,
        mel_mask: Optional[jnp.ndarray],
        max_mel_len: int,
        d_target: Optional[jnp.ndarray] = None,
        p_target: Optional[jnp.ndarray] = None,
        e_target: Optional[jnp.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
        deterministic: bool = True,
    ) -> StyleModelingOutput:
        cfg = self.config
        L = src_seq.shape[1]

        # ---- Encoding (reference modules.py:313-315) ----
        text_encoding = self.text_encoder(src_seq, src_mask, deterministic)
        text_neck_down = nn.relu(self.text_linear_down(text_encoding))
        speaker_p = nn.relu(self.speaker_linear_p(speaker_embed))  # [B, 128]
        speaker = nn.relu(self.speaker_linear(speaker_embed))  # [B, 256]

        enc_cat = self.encoder_input_cat(mel_target, p_norm, e_input, mel_aug)
        d_enc, p_enc, e_enc, n_enc = self.encode_audio(enc_cat, mel_len, src_len, L)

        # ---- DAT (modules.py:319-321) ----
        dat_posteriors = self.classify_augmentation(d_enc, p_enc, e_enc, src_mask)

        # ---- Upsample along frames (modules.py:324-325) ----
        speaker_t = jnp.repeat(speaker[:, None, :], L, axis=1)
        speaker_p_t = jnp.repeat(speaker_p[:, None, :], L, axis=1)

        pitch_down = p_enc  # controllability: raw pitch encoding
        p_enc = p_enc + speaker_p_t

        # ---- Channel-up (modules.py:334-339) ----
        duration_up = self.duration_linear(d_enc)
        pitch_up = self.pitch_linear(p_enc)
        energy_up = self.energy_linear(e_enc)
        noise_up = self.residual_linear(n_enc)[:, :L]
        text_neck = nn.relu(self.text_linear_up(text_neck_down))

        encodings = {
            "t": text_encoding,
            "t_neck": text_neck,
            "p_down": pitch_down,
            "s_down": speaker_p_t,
            "d": duration_up,
            "s": speaker_t,
            "e": energy_up,
            "n": noise_up,
        }

        # ---- Concatenate the 5 style streams (modules.py:350) ----
        streams = jnp.concatenate(
            [
                text_encoding,
                text_neck + pitch_up,
                speaker_t,
                text_neck + energy_up,
                noise_up,
            ],
            axis=-1,
        )

        # ---- Duration + length regulation (modules.py:352-360) ----
        log_d_prediction = self.duration_predictor(
            text_neck + duration_up, src_mask, deterministic
        )
        if d_target is not None:
            streams, out_mel_len = length_regulate(streams, d_target, max_mel_len)
            out_mel_mask = mel_mask
        else:
            duration_rounded = self._duration_rounded(log_d_prediction, d_control)
            streams, out_mel_len = length_regulate(
                streams, duration_rounded, max_mel_len
            )
            out_mel_len = jnp.minimum(out_mel_len, max_mel_len)
            out_mel_mask = mask_from_lengths(out_mel_len, max_mel_len)

        h = cfg.encoder_hidden
        text_f, pitch_f, speaker_f, energy_f, noise_f = (
            streams[..., :h],
            streams[..., h : 2 * h],
            streams[..., 2 * h : 3 * h],
            streams[..., 3 * h : 4 * h],
            streams[..., 4 * h :],
        )

        # ---- Energy (modules.py:364-372) ----
        e_prediction = self.energy_predictor(energy_f, out_mel_mask, deterministic)
        if e_target is not None:
            energy_embedding = self.energy_embedding(bucketize(e_target, self.energy_bins))
        else:
            e_prediction = e_prediction * e_control
            energy_embedding = self.energy_embedding(
                bucketize(e_prediction, self.energy_bins)
            )

        # ---- Pitch (modules.py:374-382) ----
        p_prediction = self.pitch_predictor(
            pitch_f + speaker_f, out_mel_mask, deterministic
        )
        if p_target is not None:
            pitch_embedding = self.pitch_embedding(bucketize(p_target, self.pitch_bins))
        else:
            p_prediction = p_prediction * p_control
            pitch_embedding = self.pitch_embedding(
                bucketize(p_prediction, self.pitch_bins)
            )

        # ---- Summed output (modules.py:385) ----
        encoder_output = text_f + pitch_embedding + speaker_f + energy_embedding

        return StyleModelingOutput(
            encoder_output=encoder_output,
            noise_encoding=noise_f,
            log_d_prediction=log_d_prediction,
            p_prediction=p_prediction,
            e_prediction=e_prediction,
            mel_len=out_mel_len,
            mel_mask=out_mel_mask,
            dat_posteriors=dat_posteriors,
            encodings=encodings,
        )

    # ------------------------------------------------------------------

    def predict_inference(
        self,
        text_encoding: jnp.ndarray,
        pitch_encoding: jnp.ndarray,
        energy_encoding: jnp.ndarray,
        duration_encoding: jnp.ndarray,
        speaker_encoding: jnp.ndarray,
        noise_encoding: jnp.ndarray,
        src_mask: jnp.ndarray,
        max_mel_len: int,
        speaker_normalized=True,  # bool, or per-item float weights [B]
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
        deterministic: bool = True,
    ):
        """Inference over externally mixed encodings
        (reference modules.py:285-309). All encodings are [B, L, 256];
        returns frame-domain pieces + predictions + mel mask."""
        streams = jnp.concatenate(
            [
                text_encoding,
                pitch_encoding,
                speaker_encoding,
                energy_encoding,
                noise_encoding,
            ],
            axis=-1,
        )

        log_d_prediction = self.duration_predictor(
            duration_encoding, src_mask, deterministic
        )
        duration_rounded = self._duration_rounded(log_d_prediction, d_control)
        streams, mel_len = length_regulate(streams, duration_rounded, max_mel_len)
        mel_len = jnp.minimum(mel_len, max_mel_len)
        mel_mask = mask_from_lengths(mel_len, max_mel_len)

        h = self.config.encoder_hidden
        text_f, pitch_f, speaker_f, energy_f, noise_f = (
            streams[..., :h],
            streams[..., h : 2 * h],
            streams[..., 2 * h : 3 * h],
            streams[..., 3 * h : 4 * h],
            streams[..., 4 * h :],
        )

        e_prediction = self.energy_predictor(energy_f, mel_mask, deterministic) * e_control
        energy_embedding = self.energy_embedding(
            bucketize(e_prediction, self.energy_bins)
        )

        if isinstance(speaker_normalized, (bool, int)):
            pitch_in = pitch_f if speaker_normalized else pitch_f + speaker_f
        else:
            # per-item float weight [B]: 1.0 adds the speaker stream to
            # the pitch predictor input (= speaker_normalized=False),
            # 0.0 omits it. Lets the batched mix/inspect hot path run
            # combos with different flags in ONE program.
            w = jnp.asarray(speaker_normalized, pitch_f.dtype).reshape(-1, 1, 1)
            pitch_in = pitch_f + w * speaker_f
        p_prediction = self.pitch_predictor(pitch_in, mel_mask, deterministic) * p_control
        pitch_embedding = self.pitch_embedding(bucketize(p_prediction, self.pitch_bins))

        return (
            text_f,
            pitch_embedding,
            speaker_f,
            energy_embedding,
            noise_f,
            log_d_prediction,
            p_prediction,
            e_prediction,
            mel_mask,
        )
