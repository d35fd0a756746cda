"""Trainable speaker encoder — the learned, on-box alternative to both
the unavailable pretrained DeepSpeaker ``.h5`` and the hand-crafted
spectral-envelope fallback.

The reference freezes a TF-Keras DeepSpeaker ResCNN trained elsewhere
(reference deepspeaker/conv_models.py:22-135) and only ever runs it for
inference. Its published checkpoint is not available in this
environment, so this module provides a SMALL trainable member of the
same architecture family — stages of [Conv k5 s2 'same' → BatchNorm →
clipped-ReLU → identity blocks], temporal mean pool, Dense →
L2-normalize (conv_models.py:58-135 shape) — sized (~1.6 M params) to
train to high leave-one-out speaker-ID accuracy on the on-box synthetic
corpora in minutes (cli/train_speaker.py), consuming the exact
DeepSpeaker feature pipeline (features.py: fbank 64 → per-frame
normalize → 160-frame crops, reference audio_ds.py/batcher.py).

Training head: cosine softmax over L2-normalized class prototypes
(normalized-weight Dense, scaled) — the margin-free core of
AM-softmax, which directly optimizes the cosine geometry the
nearest-centroid speaker-ID eval measures.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from styler_tpu.speaker.rescnn import clipped_relu


class _IdentityBlock(nn.Module):
    filters: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    padding="SAME", name="conv_2a")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn_2a")(x)
        x = clipped_relu(x)
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    padding="SAME", name="conv_2b")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn_2b")(x)
        x = clipped_relu(x)
        return clipped_relu(x + inp)


class _ConvResStage(nn.Module):
    filters: int
    n_blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (5, 5), strides=(2, 2), padding="SAME",
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn")(x)
        x = clipped_relu(x)
        for i in range(self.n_blocks):
            x = _IdentityBlock(self.filters, name=f"res_{i}")(x, train=train)
        return x


class SpeakerEncoder(nn.Module):
    """[B, T, 64, 1] fbank crops → [B, embed_dim] L2-normalized."""

    filters: Tuple[int, ...] = (32, 64, 128)
    embed_dim: int = 512
    n_blocks: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for stage, filters in enumerate(self.filters, start=1):
            x = _ConvResStage(filters, self.n_blocks,
                              name=f"stage_{stage}")(x, train=train)
        B, T, Wd, C = x.shape
        x = x.reshape(B, T, Wd * C)
        x = x.mean(axis=1)
        x = nn.Dense(self.embed_dim, name="affine")(x)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )


class CosineClassifier(nn.Module):
    """Scaled cosine-similarity logits against L2-normalized class
    prototypes. Discarded after training; only the encoder ships."""

    n_classes: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "prototypes",
            nn.initializers.lecun_normal(),
            (emb.shape[-1], self.n_classes),
        )
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return self.scale * (emb @ w)
