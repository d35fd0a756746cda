"""Int8-MXU fused-vocoder experiment (TODO #3, the parked vocoder lever).

The single-sentence e2e path is ~88% HiFi-GAN, and the fused resblock
stages already run at 56-78% effective MXU in bf16 — the one remaining
per-stage lever is the int8 MXU path (2x bf16 MXU throughput on v5e).
`ops/pallas_resblock.py:fused_resblock_stage(quantize=True)` implements
it: per-output-channel symmetric int8 weights (quantized at trace time)
+ dynamic per-tile abs-max activation scales, int32 accumulation.

This script measures BOTH sides of the trade on the real chip:
  speed   — fenced wall time of the full fused generator, f32-weights
            bf16-matmul path vs int8 path (bench.py:_time recipe: carry
            chained through a fori_loop, fetch at the end);
  quality — waveform SNR + max abs error of int8 vs the bf16 fused
            reference on the same weights, and mel-domain L1 after
            re-analysis (the perceptually-weighted proxy).

Weights are random-init (no trained checkpoint in this checkout) — conv
weight magnitude distributions are init-dominated, so the SNR bound is
a proxy; re-run on a trained generator before shipping int8 by default.

Run (idle box): python tools/int8_vocoder_experiment.py [--batch 2]
[--frames 1024]. One JSON line per variant; record outcome in TODO.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bench import _time
    from styler_tpu.dsp.mel import MelFrontend
    from styler_tpu.core.config import default_config
    from styler_tpu.vocoder import Generator
    from styler_tpu.vocoder.hifigan import generator_apply_fused

    cfg = default_config()
    gen = Generator()
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    rng = np.random.default_rng(0)
    # log-mel-like input range: log(clamp(x, 1e-5)) lands in ~[-11.5, 2]
    mel = jnp.asarray(
        (rng.standard_normal((args.batch, args.frames, 80)) * 2.0 - 4.0).astype(
            np.float32
        )
    )

    def run(quantize):
        @jax.jit
        def f(carry):
            w = generator_apply_fused(
                gen_vars, mel + carry, gen.config, quantize=quantize
            )
            return jnp.sum(jnp.abs(w)) * 1e-12

        return f

    # ---- quality (same inputs, fetched outright) ----
    wav_ref = np.asarray(
        jax.jit(
            lambda m: generator_apply_fused(gen_vars, m, gen.config)
        )(mel),
        dtype=np.float64,
    )
    wav_q = np.asarray(
        jax.jit(
            lambda m: generator_apply_fused(
                gen_vars, m, gen.config, quantize=True
            )
        )(mel),
        dtype=np.float64,
    )
    err = wav_q - wav_ref
    snr_db = 10 * np.log10(np.sum(wav_ref**2) / max(np.sum(err**2), 1e-30))
    # mel-domain L1 of the two waveforms (what the ear-proxy sees)
    fe = MelFrontend(cfg)
    mr = fe.batch([w.astype(np.float32) for w in wav_ref])
    mq = fe.batch([w.astype(np.float32) for w in wav_q])
    mel_l1 = float(
        np.mean([np.abs(a[0] - b[0]).mean() for a, b in zip(mr, mq)])
    )

    # ---- speed ----
    audio_sec = args.batch * args.frames * cfg.hop_length / cfg.sampling_rate
    for name, quantize in (("bf16", False), ("int8", True)):
        dt = _time(run(quantize), iters=args.iters)
        line = {
            "variant": name,
            "vocoder_ms": round(dt * 1e3, 3),
            "rtf": round(audio_sec / dt, 1),
        }
        if quantize:
            line["snr_db_vs_bf16"] = round(float(snr_db), 2)
            line["max_abs_err"] = round(float(np.max(np.abs(err))), 5)
            line["mel_l1_vs_bf16"] = round(mel_l1, 5)
        line["device"] = str(jax.devices()[0])
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
