"""Int8 weight-quantization inference experiment (TODO #3 / VERDICT r1 #10).

Measures whether weight-only int8 (per-output-channel symmetric scales,
dequantized to the compute dtype inside the jitted program) speeds up
the synthesize path on this chip. Rationale: at batch 1 the decode +
vocode programs are weight-HBM-traffic heavy; int8 storage halves the
weight bytes IF XLA keeps the dequant fused into the consuming
matmul/conv rather than materializing a full-precision copy.

Also reports mel/wav error vs the f32 weights so quality cost is
quantified alongside speed (the model consumes quantized f0/energy and
the vocoder is robust, but postnet convs can be scale-sensitive).

Run (idle box): python tools/quant_experiment.py [--batch 1] [--frames 1024]
Prints one JSON line per variant; document the outcome in TODO.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def quantize_tree(params, min_size=1024):
    """Split a param tree into (int8 codes, f32 scales, passthrough).

    Per-tensor layout: symmetric per-output-channel (last axis) scales —
    matches how XLA tiles the contracting dims onto the MXU. Tensors
    smaller than min_size (biases, norms, embeddings' small tables) stay
    f32: no bandwidth to win, high relative error.
    """
    import jax.numpy as jnp

    import jax

    codes, scales, passthrough = {}, {}, {}

    def visit(path, x):
        key = "/".join(str(p.key) for p in path)
        if x.ndim >= 2 and x.size >= min_size:
            s = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)), keepdims=True)
            s = jnp.maximum(s, 1e-8) / 127.0
            codes[key] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            scales[key] = s.astype(jnp.float32)
        else:
            passthrough[key] = x
        return x

    jax.tree_util.tree_map_with_path(visit, params)
    return codes, scales, passthrough


def dequantize_tree(template, codes, scales, passthrough, dtype):
    """Rebuild the param tree inside jit: int8 * scale -> dtype."""
    import jax
    import jax.numpy as jnp

    def rebuild(path, x):
        key = "/".join(str(p.key) for p in path)
        if key in codes:
            return (codes[key].astype(dtype) * scales[key].astype(dtype))
        return passthrough[key].astype(x.dtype)

    return jax.tree_util.tree_map_with_path(rebuild, template)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--src", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _build, _time
    from styler_tpu import default_config

    cfg = default_config()
    B, L, M = args.batch, args.src, args.frames

    synth_f32, variables, gen_vars, batch = _build_synth(cfg, B, L, M)

    # --- baseline f32 weights ---------------------------------------
    dt = _time(lambda c: synth_f32(variables, gen_vars, batch, c))
    audio_sec = B * M * cfg.hop_length / cfg.sampling_rate
    print(json.dumps({"variant": "f32_weights", "step_ms": round(dt * 1e3, 2),
                      "rtf": round(audio_sec / dt, 1)}), flush=True)

    # --- int8 weights, dequant inside jit ---------------------------
    m_codes, m_scales, m_pass = quantize_tree(variables["params"])
    g_codes, g_scales, g_pass = quantize_tree(gen_vars["params"])

    model_rest = {k: v for k, v in variables.items() if k != "params"}
    gen_rest = {k: v for k, v in gen_vars.items() if k != "params"}

    @jax.jit
    def synth_q(m_codes, m_scales, g_codes, g_scales, batch, carry):
        mp = dequantize_tree(variables["params"], m_codes, m_scales, m_pass,
                             jnp.float32)
        gp = dequantize_tree(gen_vars["params"], g_codes, g_scales, g_pass,
                             jnp.float32)
        return synth_f32._fun(dict(model_rest, params=mp),
                              dict(gen_rest, params=gp), batch, carry)

    dt_q = _time(lambda c: synth_q(m_codes, m_scales, g_codes, g_scales,
                                   batch, c))
    print(json.dumps({"variant": "int8_weights_dequant",
                      "step_ms": round(dt_q * 1e3, 2),
                      "rtf": round(audio_sec / dt_q, 1),
                      "speedup_vs_f32": round(dt / dt_q, 3)}), flush=True)

    # --- quality delta ----------------------------------------------
    from styler_tpu.models import STYLER
    model = STYLER(cfg)
    mp = dequantize_tree(variables["params"], m_codes, m_scales, m_pass,
                         jnp.float32)
    out_f = jax.jit(lambda v: model.apply(v, **batch, max_mel_len=M))(variables)
    out_q = jax.jit(lambda v: model.apply(v, **batch, max_mel_len=M))(
        dict(model_rest, params=mp))
    mae = float(jnp.mean(jnp.abs(out_f.mel_postnet - out_q.mel_postnet)))
    ref_scale = float(jnp.mean(jnp.abs(out_f.mel_postnet)))
    print(json.dumps({"variant": "quality", "mel_postnet_mae": round(mae, 5),
                      "rel": round(mae / max(ref_scale, 1e-9), 4)}), flush=True)


def _build_synth(cfg, B, L, M):
    """bench._build, but keeping a handle on the un-jitted synth fn so
    the quantized variant can rewrap it."""
    import jax
    import jax.numpy as jnp

    from bench import _example_batch, _make_vocode
    from styler_tpu.models import STYLER
    from styler_tpu.vocoder import Generator

    batch = _example_batch(cfg, B, L, M)
    model = STYLER(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **batch)
    gen = Generator()
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    vocode, fused = _make_vocode(gen, M)

    def synth_fn(model_vars, voc_vars, batch_, carry):
        batch_ = dict(batch_, mel_target=batch_["mel_target"] + carry)
        out = model.apply(model_vars, **batch_, max_mel_len=M)
        if fused:
            wavs = vocode(
                voc_vars,
                jnp.concatenate([out.mel_postnet, out.mel_postnet_noisy], axis=0),
            )
            return jnp.sum(wavs)
        return jnp.sum(vocode(voc_vars, out.mel_postnet)) + jnp.sum(
            vocode(voc_vars, out.mel_postnet_noisy)
        )

    jitted = jax.jit(synth_fn)
    jitted._fun = synth_fn
    return jitted, variables, gen_vars, batch


if __name__ == "__main__":
    main()
