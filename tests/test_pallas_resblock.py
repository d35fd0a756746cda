"""Fused Pallas resblock-stage kernel vs the flax Generator reference
path (interpret mode on CPU; the real-TPU speed numbers live in the
kernel docstring / README)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styler_tpu.ops.pallas_resblock import (
    branch_params_from_variables,
    fused_resblock_stage,
)
from styler_tpu.vocoder.hifigan import (
    Generator,
    HiFiGANConfig,
    ResBlock1,
    generator_apply_fused,
)


def _resblock_set_reference(params, x, kernel_sizes, dilations):
    """mean_j ResBlock1_j(x) exactly as Generator composes it."""
    xs = None
    for j, rk in enumerate(kernel_sizes):
        blk = ResBlock1(x.shape[-1], rk, tuple(dilations), dtype=jnp.float32)
        out = blk.apply({"params": params[f"resblocks_0_{j}"]}, x)
        xs = out if xs is None else xs + out
    return xs / len(kernel_sizes)


def _make_params(rng, kernel_sizes, dilations, C):
    params = {}
    for j, rk in enumerate(kernel_sizes):
        blk = {}
        for c in range(len(dilations)):
            for group in ("convs1", "convs2"):
                blk[f"{group}_{c}"] = {
                    "kernel": jnp.asarray(
                        rng.standard_normal((rk, C, C)).astype(np.float32) * 0.05
                    ),
                    "bias": jnp.asarray(
                        rng.standard_normal(C).astype(np.float32) * 0.01
                    ),
                }
        params[f"resblocks_0_{j}"] = blk
    return params


def test_fused_stage_matches_reference(rng):
    kernel_sizes, dilations, C, T = (3, 5), (1, 2), 8, 64
    params = _make_params(rng, kernel_sizes, dilations, C)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))

    golden = _resblock_set_reference(params, x, kernel_sizes, dilations)
    got = fused_resblock_stage(
        x,
        branch_params_from_variables(params, 0, len(kernel_sizes)),
        kernel_sizes=kernel_sizes,
        dilations=dilations,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), rtol=1e-5, atol=1e-5)


def test_fused_stage_multi_block(rng):
    """Block boundaries (halo reconstruction) are seamless."""
    kernel_sizes, dilations, C, T = (3, 5), (1, 2), 8, 64
    params = _make_params(rng, kernel_sizes, dilations, C)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    bp = branch_params_from_variables(params, 0, len(kernel_sizes))

    one_block = fused_resblock_stage(
        x, bp, kernel_sizes=kernel_sizes, dilations=dilations,
        block_t=64, interpret=True,
    )
    four_blocks = fused_resblock_stage(
        x, bp, kernel_sizes=kernel_sizes, dilations=dilations,
        block_t=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(four_blocks), np.asarray(one_block), rtol=1e-5, atol=1e-6
    )


def test_fused_stage_rejects_short_sequences(rng):
    kernel_sizes, dilations, C = (3, 11), (1, 3, 5), 8
    params = _make_params(rng, kernel_sizes, dilations, C)
    x = jnp.zeros((1, 16, C), jnp.float32)
    with pytest.raises(ValueError, match="receptive radius"):
        fused_resblock_stage(
            x,
            branch_params_from_variables(params, 0, len(kernel_sizes)),
            kernel_sizes=kernel_sizes,
            dilations=dilations,
            interpret=True,
        )


def test_generator_fused_full_parity(rng):
    """generator_apply_fused == Generator.apply on the full default
    topology (small mel length, f32)."""
    cfg = HiFiGANConfig()
    gen = Generator(cfg, compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    golden = np.asarray(gen.apply(v, mel))
    got = np.asarray(
        generator_apply_fused(
            v, mel, cfg, compute_dtype=jnp.float32, interpret=True
        )
    )
    assert got.shape == golden.shape == (1, 8 * 256)
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


def test_fused_stage_quantized_close(rng):
    """int8-MXU path (quantize=True) tracks the exact stage within
    quantization-noise bounds: high SNR, zero outside-sequence leakage,
    same shapes. Tolerances are loose by construction (6 chained int8
    convs per branch); the hardware-measured SNR lives in
    tools/int8_vocoder_experiment.py."""
    kernel_sizes, dilations, C, T = (3, 5), (1, 2), 8, 64
    params = _make_params(rng, kernel_sizes, dilations, C)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    bp = branch_params_from_variables(params, 0, len(kernel_sizes))

    exact = np.asarray(
        fused_resblock_stage(
            x, bp, kernel_sizes=kernel_sizes, dilations=dilations,
            interpret=True,
        )
    )
    quant = np.asarray(
        fused_resblock_stage(
            x, bp, kernel_sizes=kernel_sizes, dilations=dilations,
            interpret=True, quantize=True,
        )
    )
    assert quant.shape == exact.shape
    err = quant - exact
    snr_db = 10 * np.log10((exact**2).sum() / max((err**2).sum(), 1e-30))
    assert snr_db > 30.0, f"int8 stage SNR too low: {snr_db:.1f} dB"


def test_generator_fused_quantized_close(rng):
    """Full generator through the int8 path stays close to the exact
    fused output (end-to-end accumulation across 4 stages)."""
    cfg = HiFiGANConfig()
    gen = Generator(cfg, compute_dtype=jnp.float32)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    exact = np.asarray(
        generator_apply_fused(v, mel, cfg, compute_dtype=jnp.float32, interpret=True)
    )
    quant = np.asarray(
        generator_apply_fused(
            v, mel, cfg, compute_dtype=jnp.float32, interpret=True, quantize=True
        )
    )
    err = quant - exact
    snr_db = 10 * np.log10((exact**2).sum() / max((err**2).sum(), 1e-30))
    assert snr_db > 25.0, f"int8 generator SNR too low: {snr_db:.1f} dB"


def test_generator_fused_custom_branch_count(rng):
    """generator_apply_fused must honor a non-default number of resblock
    kernels (regression: it used to hard-code n_branches=3 and KeyError
    on 1-branch topologies like the vocoder trainer's TINY_GEN)."""
    from styler_tpu.vocoder.hifigan import generator_fused_supported

    cfg = HiFiGANConfig(
        upsample_rates=(8, 8),
        upsample_kernel_sizes=(16, 16),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    gen = Generator(cfg, compute_dtype=jnp.float32)
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    assert generator_fused_supported(mel.shape[1], cfg)
    golden = np.asarray(gen.apply(v, mel))
    got = np.asarray(
        generator_apply_fused(v, mel, cfg, compute_dtype=jnp.float32, interpret=True)
    )
    assert got.shape == golden.shape == (1, 8 * 64)
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)
