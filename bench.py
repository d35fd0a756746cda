"""Benchmarks for the BASELINE.md measurement configs.

Default (no args) prints ONE JSON line — the headline metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`--config` selects the other BASELINE.md configs (each also one line):
  single      headline: 1 sentence x 1 ref, clean+noisy decode (default)
  batched     batched synthesis: 16 sentences x refs in one jitted call
  mix         style mix-and-match: 2^5 recombination decodes
  preprocess  host+device preprocessing throughput (STFT/mel/energy + f0)

RTF = seconds of audio synthesized per wall-clock second; the driver
target is >50x real time per chip (BASELINE.md). vs_baseline = RTF / 50.
The full inference graph runs (no teacher forcing): audio encoding
(4 BiLSTM branches, Pallas recurrences on TPU), predicted durations →
length regulation, pitch/energy prediction, clean AND noisy (Residual
Decoding) decodes, HiFi-GAN on both mels.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _example_batch(cfg, B, L, M, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return dict(
        src_seq=jnp.asarray(rng.integers(1, 100, size=(B, L)).astype(np.int32)),
        mel_target=jnp.asarray(rng.standard_normal((B, M, 80)).astype(np.float32)),
        mel_aug=jnp.asarray(rng.standard_normal((B, M, 80)).astype(np.float32)),
        p_norm=jnp.asarray(rng.random((B, M)).astype(np.float32)),
        e_input=jnp.asarray(rng.random((B, M)).astype(np.float32)),
        src_len=jnp.full((B,), L, dtype=jnp.int32),
        mel_len=jnp.full((B,), M, dtype=jnp.int32),
        speaker_embed=jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32)),
    )


def _make_vocode(gen, mel_frames):
    """(vocode_fn, fused: bool) — gen.apply routed through the fused
    Pallas resblock path on TPU (same dispatch rule as
    synthesis.Synthesizer._vocode)."""
    import jax

    from styler_tpu.vocoder.hifigan import (
        generator_apply_fused,
        generator_fused_supported,
    )

    if jax.default_backend() == "tpu" and generator_fused_supported(
        mel_frames, gen.config
    ):
        return (
            lambda v, m: generator_apply_fused(
                v, m, gen.config, compute_dtype=gen.compute_dtype
            ),
            True,
        )
    return gen.apply, False


def _build(cfg, B, L, M):
    import jax
    import jax.numpy as jnp

    from styler_tpu.models import STYLER
    from styler_tpu.vocoder import Generator

    batch = _example_batch(cfg, B, L, M)
    model = STYLER(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **batch)
    gen = Generator()
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    vocode, fused = _make_vocode(gen, M)

    @jax.jit
    def synth(model_vars, voc_vars, batch, carry):
        # carry perturbs an input and the fence depends on all outputs
        # (see _time for why both are required on this platform)
        batch = dict(batch, mel_target=batch["mel_target"] + carry)
        out = model.apply(model_vars, **batch, max_mel_len=M)
        if fused:
            # clean+noisy as one 2B vocoder pass (synthesis.py:_forward);
            # the XLA conv path keeps two passes (2B HBM intermediates
            # would exceed v5e's 16 GB at batch 16)
            wavs = vocode(
                voc_vars,
                jnp.concatenate(
                    [out.mel_postnet, out.mel_postnet_noisy], axis=0
                ),
            )
            return jnp.sum(wavs)
        return jnp.sum(vocode(voc_vars, out.mel_postnet)) + jnp.sum(
            vocode(voc_vars, out.mel_postnet_noisy)
        )

    return synth, variables, gen_vars, batch


def _time(fn, iters=10):
    """Time fn(carry) -> scalar jax array, where the returned scalar must
    depend on every output of the computation AND the carry must perturb
    a program INPUT inside fn.

    Two quirks of the experimental axon platform make naive timing report
    impossible numbers (>1 PFLOP/s):
      1. ``block_until_ready`` returns before the computation finishes —
         only a host fetch of a produced value is a reliable fence;
      2. the runtime memoizes identical (program, inputs) calls and
         evaluates lazily, so repeated calls on the same inputs, fetched
         once at the end, can execute a single time (or zero times).
    Chaining the fence scalar through each iteration's inputs defeats
    both: every call has distinct inputs and the final fetch forces the
    whole chain.
    """
    import jax
    import jax.numpy as jnp

    # Repeat INSIDE one program: the axon tunnel adds a per-dispatch
    # overhead that scales with program size (~40 ms for the full model),
    # which a real TPU host does not pay (~100 us). lax.fori_loop chains
    # the carry through every inner iteration, so all of them execute.
    inner = 8

    @jax.jit
    def repeat(carry):
        return jax.lax.fori_loop(0, inner, lambda i, c: fn(c * 1e-30), carry)

    carry = repeat(jnp.float32(0.0))
    float(carry)  # compile + warm
    # Per-process timings on this platform are bimodal (CLAUDE.md):
    # transient contention can triple a measurement. Take the best of 3
    # measurement batches — honest (same program, same inputs chain) and
    # robust when the interference is transient.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = repeat(carry * 1e-30)
        float(carry)
        best = min(best, (time.perf_counter() - t0) / (iters * inner))
    return best


def _emit(metric, rtf, detail):
    import jax

    detail["device"] = str(jax.devices()[0])
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 50.0, 3),
                "detail": detail,
            }
        )
    )


def bench_synth(cfg, B, L, M, metric):
    synth, variables, gen_vars, batch = _build(cfg, B, L, M)
    dt = _time(lambda c: synth(variables, gen_vars, batch, c))
    audio_sec = B * M * cfg.hop_length / cfg.sampling_rate
    _emit(
        metric,
        audio_sec / dt,
        {
            "batch": B,
            "mel_frames_per_sec": round(B * M / dt, 1),
            "step_ms": round(dt * 1e3, 2),
            "audio_sec_per_call": round(audio_sec, 3),
        },
    )


def bench_mix(cfg):
    """Style mix-and-match: 32 recombination decodes (decoder+postnet+
    vocoder per combo), the hot loop of the --cont path."""
    import jax
    import jax.numpy as jnp

    from styler_tpu.models import STYLER
    from styler_tpu.vocoder import Generator

    B, L, M = 1, 128, 1024
    batch = _example_batch(cfg, B, L, M)
    model = STYLER(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **batch)
    gen = Generator()
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    vocode, fused = _make_vocode(gen, M)

    # With the fused Pallas vocoder (VMEM-resident stage activations) all
    # 32 combos fit in ONE jitted call; the XLA conv path would need
    # ~22 GB of HBM for the intermediates (v5e has 16 GB), so cap at 8
    # per call there.
    CHUNK = 32 if fused else 8
    style = jax.random.normal(jax.random.PRNGKey(2), (CHUNK, M, cfg.encoder_hidden))
    mel_mask = jnp.zeros((CHUNK, M), dtype=bool)

    @jax.jit
    def decode_chunk(model_vars, voc_vars, style, mel_mask, carry):
        _, mel_postnet = model.apply(
            model_vars, style + carry, mel_mask, method="decode"
        )
        return jnp.sum(vocode(voc_vars, mel_postnet))

    def decode_all(carry):
        for _ in range(32 // CHUNK):
            carry = decode_chunk(variables, gen_vars, style, mel_mask, carry * 1e-30)
        return carry

    dt = _time(decode_all)
    audio_sec = 32 * M * cfg.hop_length / cfg.sampling_rate
    _emit(
        "mix_and_match_32combo_rtf",
        audio_sec / dt,
        {"combos": 32, "step_ms": round(dt * 1e3, 2)},
    )


def bench_train(cfg):
    """Training throughput: full jitted optimizer step (teacher-forced
    forward + DAT second pass + backward + Noam Adam) at the reference
    batch size; metric of record = mel frames/sec/chip (SURVEY.md §6)."""
    import jax
    import jax.numpy as jnp

    from styler_tpu.train import create_train_state, make_jitted_train_step

    B, L, M = cfg.batch_size, 128, 1024
    rng = np.random.default_rng(0)
    batch = _example_batch(cfg, B, L, M)
    d = np.full((B, L), M // L, dtype=np.int32)
    batch.update(
        d_target=jnp.asarray(d),
        p_target=jnp.asarray((rng.random((B, M)) * 300 + 80).astype(np.float32)),
        e_target=jnp.asarray((rng.random((B, M)) * 100).astype(np.float32)),
        log_d_target=jnp.asarray(np.log(d + cfg.log_offset).astype(np.float32)),
        f0_norm_aug=jnp.asarray(rng.random((B, M)).astype(np.float32)),
        e_input_aug=jnp.asarray(rng.random((B, M)).astype(np.float32)),
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = make_jitted_train_step(model, cfg, donate=False)

    @jax.jit
    def run_step(state, batch, carry):
        batch = dict(batch, mel_target=batch["mel_target"] + carry)
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        # fence over loss AND a param leaf so the optimizer update is
        # included in the measured work
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        return metrics["total"] + jnp.sum(jnp.abs(leaf)) * 1e-30

    def run(carry):
        return run_step(state, batch, carry)

    import jax as _jax

    dt = _time(run, iters=5)
    frames_per_sec = B * M / dt
    print(
        json.dumps(
            {
                "metric": "train_mel_frames_per_sec",
                "value": round(frames_per_sec, 1),
                "unit": "mel_frames_per_sec_per_chip",
                # multiples of the 86.13 frames/s real-time mel rate
                "vs_baseline": round(frames_per_sec / cfg.n_frames_per_sec, 1),
                "detail": {
                    "steps_per_sec": round(1.0 / dt, 2),
                    "step_ms": round(dt * 1e3, 1),
                    "batch": B,
                    "device": str(_jax.devices()[0]),
                },
            }
        )
    )


def bench_preprocess(cfg):
    """Preprocessing throughput (BASELINE.md config 5).

    Metric: the BATCHED pipeline — 16 utterances, jitted vmapped
    STFT/mel/energy + the on-device batched f0 tracker
    (dsp/pitch_device.py) when an accelerator is up (native host
    tracker otherwise). Detail includes the serial per-utterance path
    (the original reference-shaped flow)."""
    import jax
    import jax.numpy as jnp

    from styler_tpu.dsp import MelFrontend
    from styler_tpu.dsp.pitch import track_f0, track_f0_batch

    fe = MelFrontend(cfg)
    seconds = 5.0
    n = int(cfg.sampling_rate * seconds)
    rng = np.random.default_rng(0)
    t = np.arange(n) / cfg.sampling_rate
    wav = (0.4 * np.sin(2 * np.pi * 160 * t) + 0.05 * rng.standard_normal(n)).astype(
        np.float32
    )

    # --- serial per-utterance path (original measurement) ---
    mel, en = fe(wav)  # compile
    np.asarray(mel)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        mel, en = fe(wav)
        np.asarray(en)
        track_f0(wav * 32768.0, cfg.sampling_rate, cfg.hop_length,
                 cfg.f0_min, cfg.f0_max)
    dt_serial = (time.perf_counter() - t0) / iters

    # --- batched path: vmapped mel front end + batched f0 ---
    B = 16
    wavs = [
        (np.roll(wav, 17 * i) + 0.001 * i).astype(np.float32) for i in range(B)
    ]  # distinct inputs (defeat memoization)
    f0_backend = "device" if jax.default_backend() != "cpu" else None
    fe.batch(wavs)  # compile
    track_f0_batch(
        [w * 32768.0 for w in wavs], cfg.sampling_rate, cfg.hop_length,
        cfg.f0_min, cfg.f0_max, backend=f0_backend,
    )  # compile
    iters = 4
    t0 = time.perf_counter()
    # i+1: i=0 would replay the warmup's exact inputs, which this
    # platform memoizes (CLAUDE.md) — the iteration would be free
    for i in range(1, iters + 1):
        fe.batch([w + i * 1e-6 for w in wavs])
        track_f0_batch(
            [w * 32768.0 + i for w in wavs], cfg.sampling_rate,
            cfg.hop_length, cfg.f0_min, cfg.f0_max, backend=f0_backend,
        )
    dt_batch = (time.perf_counter() - t0) / (iters * B)

    _emit(
        "preprocess_throughput_rtf",
        seconds / dt_batch,
        {
            "utt_sec": seconds,
            "batch": B,
            "per_utt_ms": round(dt_batch * 1e3, 1),
            "serial_rtf": round(seconds / dt_serial, 1),
            "f0_backend": f0_backend or "native",
        },
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        choices=["single", "batched", "mix", "preprocess", "train"],
        default="single",
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="mixed-precision model compute (cli/train.py --bf16)",
    )
    args = parser.parse_args()

    from styler_tpu.core.config import default_config

    cfg = default_config()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    if args.config == "single":
        bench_synth(cfg, 1, 128, 1024, "e2e_text_to_waveform_rtf")
    elif args.config == "batched":
        bench_synth(cfg, 16, 128, 1024, "batched_synthesis_rtf")
    elif args.config == "mix":
        bench_mix(cfg)
    elif args.config == "preprocess":
        bench_preprocess(cfg)
    elif args.config == "train":
        bench_train(cfg)


if __name__ == "__main__":
    main()
