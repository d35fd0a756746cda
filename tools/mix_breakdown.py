"""Decompose Synthesizer.mix_and_match wall time (VERDICT r2 next #2).

BENCH_r02 recorded mix at 463 ms/call (167x RTF) — the floor of the
bench matrix — without evidence of WHERE the time goes. This script
measures the three candidate terms separately on the real chip:

  encode   the 4-row base encode dispatch (style modeling only)
  comb     the 32-row mixed decode + vocode dispatch
  fetch    the host fetch of the 32 trimmed wavs + mels over the tunnel
  e2e      the full mix_and_match() (same refs/sentences as bench.py)

Timing recipe: the platform memoizes identical (program, inputs) and
block_until_ready does not block (CLAUDE.md), so every iteration
perturbs an input and the device terms are fenced by fetching a scalar
that depends on all outputs; the fetch term IS a host fetch, timed as
such. Per-process numbers are bimodal — run 2-3 processes, compare
minimums.

Run (idle box): python tools/mix_breakdown.py
One JSON line per term; record the breakdown in TODO.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from styler_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from styler_tpu.core.config import default_config
    from styler_tpu.synthesis import ReferenceFeatures, load_synthesizer
    from styler_tpu.core.config import bucket_for

    cfg = default_config()
    synth = load_synthesizer(cfg)
    # same duration-head bias as bench.py:bench_mix so mel_lens are
    # speech-realistic
    dp = synth.variables["params"]["style_modeling"]["duration_predictor"][
        "linear_layer"
    ]
    dp["bias"] = dp["bias"] + float(np.log(8.0 + cfg.log_offset))
    dp["kernel"] = dp["kernel"] * 0.02

    rng = np.random.default_rng(0)

    def make_ref(seed, ml):
        r = np.random.default_rng(seed)
        return ReferenceFeatures(
            mel=r.standard_normal((ml, cfg.n_mel_channels)).astype(np.float32),
            f0_norm=r.random(ml).astype(np.float32),
            energy01=r.random(ml).astype(np.float32),
            mel_len=ml,
        )

    sentences = (
        "The quick brown fox jumps over the lazy dog.",
        "She sells sea shells by the sea shore.",
    )
    spk = rng.standard_normal((2, 512)).astype(np.float32)
    spk /= np.linalg.norm(spk, axis=1, keepdims=True)
    Mmax = cfg.mel_buckets[-1]
    refs0 = (make_ref(1, Mmax * 7 // 16), make_ref(2, Mmax * 3 // 8))

    def perturbed(i):
        return tuple(
            ReferenceFeatures(
                mel=r.mel + i * 1e-6,
                f0_norm=r.f0_norm,
                energy01=r.energy01,
                mel_len=r.mel_len,
            )
            for r in refs0
        )

    def emit(term, ms, detail=None):
        print(
            json.dumps(
                {"term": term, "ms": round(ms * 1e3, 1), **(detail or {})}
            ),
            flush=True,
        )

    # ---- e2e (the bench number's shape) --------------------------------
    synth.mix_and_match(sentences, perturbed(0), (spk[0], spk[1]))  # warm
    best = float("inf")
    for i in range(1, 4):
        t0 = time.perf_counter()
        synth.mix_and_match(sentences, perturbed(i), (spk[0], spk[1]))
        best = min(best, time.perf_counter() - t0)
    emit("e2e_mix_and_match", best)

    # ---- encode dispatch -----------------------------------------------
    ids = [synth.text_to_ids(s) for s in sentences]
    pairs = ((0, 0), (0, 1), (1, 0), (1, 1))

    def pack(i):
        refs = perturbed(i)
        return synth._pack_rows(
            [ids[ti] for ti, _ in pairs],
            [refs[ri] for _, ri in pairs],
            [spk[ri] for _, ri in pairs],
        )

    arrays = pack(0)
    enc, src_mask, base_mel_len = synth._encode(
        *arrays, 1.0, 1.0, 1.0, cfg.mel_buckets[-1]
    )
    float(jnp.sum(base_mel_len))  # warm + fence
    best = float("inf")
    for i in range(1, 4):
        arrays_i = pack(i)
        t0 = time.perf_counter()
        enc_i, mask_i, ml_i = synth._encode(
            *arrays_i, 1.0, 1.0, 1.0, cfg.mel_buckets[-1]
        )
        # fence over every output group
        float(
            jnp.sum(ml_i)
            + jnp.sum(enc_i["t"][..., 0]) * 1e-20
            + jnp.sum(mask_i) * 1e-20
        )
        best = min(best, time.perf_counter() - t0)
    emit("encode_4row_dispatch", best, {"M_in": int(arrays[2].shape[1])})

    # ---- comb decode+vocode dispatch ------------------------------------
    M_comb = bucket_for(int(np.asarray(base_mel_len).max()), cfg.mel_buckets)

    def comb(i):
        e = {k: v + i * 1e-9 for k, v in enc.items()}
        return synth._comb_jit(
            e["t"], e["t_neck"], e["n"], e["d"], e["p_down"], e["e"],
            e["s"], e["s_down"], src_mask, M_comb,
        )

    outs = comb(0)
    float(jnp.sum(outs[1][..., 0]))  # warm
    best = float("inf")
    for i in range(1, 4):
        t0 = time.perf_counter()
        o = comb(i)
        # outputs are the fetch-compressed (mel f16, wav i16, p, e, lens)
        float(
            jnp.sum(o[1][..., 0].astype(jnp.float32))
            + jnp.sum(o[0][..., 0, 0].astype(jnp.float32)) * 1e-20
            + jnp.sum(o[4]) * 1e-20
        )
        best = min(best, time.perf_counter() - t0)
    emit(
        "comb32_decode_vocode_dispatch",
        best,
        {"M_comb": int(M_comb), "wav_samples": int(outs[1].shape[1])},
    )

    # ---- host fetch of the compressed results ----------------------------
    titles = [f"{c:05b}" for c in range(32)]
    res = synth._unpack_results(titles, *outs)  # warm
    best = float("inf")
    for i in range(1, 4):
        o = comb(i + 100)
        # fence the compute first so the fetch term is fetch-only
        float(jnp.sum(o[1][..., 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        synth._unpack_results(titles, *o)
        best = min(best, time.perf_counter() - t0)
    n = int(outs[0].shape[1])
    # int16 wav + f16 mel/f0/energy after the fetch-compression change
    bytes_fetched = 32 * n * (cfg.hop_length * 2 + 80 * 2 + 4)
    emit(
        "mix_results_trim_and_fetch",
        best,
        {"trim_bucket": int(n), "approx_mb": round(bytes_fetched / 1e6, 1)},
    )


if __name__ == "__main__":
    main()
