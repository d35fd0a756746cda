"""Neural vocoders (mel -> waveform), all jitted JAX colocated with the
acoustic model.

The reference selects a vocoder with ``hp.vocoder`` in
{"HiFi-GAN", "MelGAN", "WaveGlow"} (reference hparams.py:19,
utils.py:235-271). All three are full JAX ports with torch weight
importers (core/import_torch.py); Griffin-Lim (dsp/mel.py:mel_to_wav)
remains the checkpoint-free fallback.
"""

import jax.numpy as jnp

from styler_tpu.vocoder.hifigan import (  # noqa: F401
    Generator,
    HiFiGANConfig,
    vocode,
)
from styler_tpu.vocoder.melgan import (  # noqa: F401
    MelGANConfig,
    MelGANGenerator,
)
from styler_tpu.vocoder.waveglow import (  # noqa: F401
    WaveGlow,
    WaveGlowConfig,
)
from styler_tpu.vocoder.istft_net import (  # noqa: F401
    ISTFTNetConfig,
    ISTFTNetGenerator,
)

# iSTFTNet is a beyond-reference trainable fast vocoder (no
# reference hp.vocoder counterpart; train with cli/train_vocoder.py)
VOCODERS = ("HiFi-GAN", "MelGAN", "WaveGlow", "iSTFTNet")


def make_generator(name: str = "HiFi-GAN", compute_dtype=jnp.bfloat16):
    """Vocoder factory keyed on the reference's ``hp.vocoder`` names.

    Every generator shares one contract: ``apply(variables,
    natural-log mel [B, T, 80]) -> waveform [B, T*256]`` in [-1, 1].
    """
    if name == "HiFi-GAN":
        return Generator(compute_dtype=compute_dtype)
    if name == "MelGAN":
        return MelGANGenerator(compute_dtype=compute_dtype)
    if name == "WaveGlow":
        # flows invert in f32; bf16 there destroys the coupling inverses
        return WaveGlow(compute_dtype=jnp.float32)
    if name == "iSTFTNet":
        return ISTFTNetGenerator(compute_dtype=compute_dtype)
    raise ValueError(
        f"unknown vocoder {name!r}; supported: {VOCODERS} "
        "(Griffin-Lim via dsp.MelFrontend.mel_to_wav is the "
        "checkpoint-free fallback)"
    )
