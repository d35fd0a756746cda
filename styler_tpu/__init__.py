"""styler_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of STYLER.

STYLER (Interspeech 2021, arXiv:2103.09474) is a non-autoregressive,
style-factor-disentangling text-to-speech framework: text plus a reference
audio go in; the model decomposes the reference into duration, pitch,
energy, speaker, and noise style factors, recombines them with the text
encoding, and decodes a mel-spectrogram which a HiFi-GAN vocoder turns
into a waveform.

This package is a from-scratch TPU-first implementation with feature
parity against the reference repo (see /root/reference). Everything after
host audio I/O is functional, jitted, and statically shaped:

- ``core``      config (frozen dataclass mirroring reference hparams.py),
                shape buckets, mesh/sharding setup, checkpointing.
- ``dsp``       jitted signal kernels: STFT/mel/energy, Griffin-Lim,
                f0 normalization, one-hot quantization.
- ``textproc``  phoneme symbol set / cleaners / text_to_sequence.
- ``models``    Flax modules: FFT-block transformer, audio encoder with
                bottleneck BiLSTMs, vectorized mel calibrator and length
                regulator, style predictors, GRL/DAT heads, STYLER top
                model with Residual Decoding.
- ``ops``       low-level vectorized/Pallas ops shared by the models.
- ``parallel``  device mesh + sharded train/infer steps.
- ``vocoder``   HiFi-GAN generator (JAX) for on-device waveform synthesis.
- ``speaker``   DeepSpeaker ResCNN embedder (JAX).
- ``data``      offline preprocessing (VCTK/WHAM!) + bucketed host loader.
- ``train``     losses, Noam/optax optimizer, train/eval steps.
"""

__version__ = "0.1.0"

from styler_tpu.core.config import Config, default_config  # noqa: F401
