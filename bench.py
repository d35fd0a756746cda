"""Benchmark: end-to-end text→waveform synthesis RTF on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the full flagship pipeline — STYLER acoustic forward (teacher
durations filling the 1024-frame bucket) + HiFi-GAN vocoder — as a single
jitted graph on the default device. RTF = seconds of audio synthesized
per wall-clock second; the driver target is >50x real time per chip
(BASELINE.md). vs_baseline = RTF / 50.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from styler_tpu.core.config import default_config
    from styler_tpu.models import STYLER
    from styler_tpu.vocoder import Generator

    cfg = default_config()
    B, L, M = 1, 128, 1024
    rng = np.random.default_rng(0)

    # Inference path: NO teacher-forced targets, so the full graph runs —
    # reference audio encoding (4 BiLSTM branches), predicted durations →
    # length regulation, pitch/energy prediction + embeddings, clean AND
    # noisy (Residual Decoding) decodes, and HiFi-GAN on both mels.
    batch = dict(
        src_seq=jnp.asarray(rng.integers(1, 100, size=(B, L)).astype(np.int32)),
        mel_target=jnp.asarray(rng.standard_normal((B, M, 80)).astype(np.float32)),
        mel_aug=jnp.asarray(rng.standard_normal((B, M, 80)).astype(np.float32)),
        p_norm=jnp.asarray(rng.random((B, M)).astype(np.float32)),
        e_input=jnp.asarray(rng.random((B, M)).astype(np.float32)),
        src_len=jnp.full((B,), L, dtype=jnp.int32),
        mel_len=jnp.full((B,), M, dtype=jnp.int32),
        speaker_embed=jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32)),
    )

    model = STYLER(cfg)
    variables = model.init(jax.random.PRNGKey(0), **batch)

    gen = Generator()
    gen_vars = gen.init(jax.random.PRNGKey(1), jnp.zeros((B, M, 80)))

    @jax.jit
    def synth(model_vars, voc_vars, batch):
        out = model.apply(model_vars, **batch, max_mel_len=M)
        wav_clean = gen.apply(voc_vars, out.mel_postnet)
        wav_noisy = gen.apply(voc_vars, out.mel_postnet_noisy)
        return wav_clean, wav_noisy

    # compile + warm
    wav, wav_n = synth(variables, gen_vars, batch)
    wav.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        wav, wav_n = synth(variables, gen_vars, batch)
    jax.block_until_ready((wav, wav_n))
    dt = (time.perf_counter() - t0) / iters

    audio_sec = B * M * cfg.hop_length / cfg.sampling_rate
    rtf = audio_sec / dt
    mel_frames_per_sec = B * M / dt

    print(
        json.dumps(
            {
                "metric": "e2e_text_to_waveform_rtf",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 50.0, 3),
                "detail": {
                    "mel_frames_per_sec": round(mel_frames_per_sec, 1),
                    "step_ms": round(dt * 1e3, 2),
                    "audio_sec_per_call": round(audio_sec, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
