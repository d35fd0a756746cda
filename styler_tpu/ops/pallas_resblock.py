"""Pallas TPU kernel: fused HiFi-GAN resblock set (inference).

One upsample stage of HiFi-GAN runs 3 parallel ResBlocks (kernel sizes
3/7/11, dilations 1/3/5) = 18 convolutions + 36 leaky_relus + residual
adds, then averages the branches (reference hifigan/models.py:139-147).
Under XLA each conv is a separate HBM round-trip and the late stages run
at 32-64 channels — a quarter of the 128-lane MXU.

Two ideas, one kernel:

1. **VMEM fusion.** The whole resblock set is computed per time-block in
   VMEM: the input tile (with halo) is read once, all 18 convs run as
   shifted matmuls over the tile, only the averaged result is written
   back. The caller pads x by one block on each side and the kernel
   receives three consecutive block views (prev/cur/next) via BlockSpec
   index maps — no manual DMA. Circular-shift wrap garbage stays inside
   the halo (= the receptive-field radius, 60 samples for k=11 d=1,3,5).

2. **Channel folding (block-Toeplitz).** For C < 128 the time axis is
   folded into channels (x [T, C] -> [T/f, f*C] with f = 128/C, a free
   reshape outside the kernel). A k-tap dilation-d conv becomes a small
   set of [f*C, f*C] matmuls whose block structure encodes the taps:
   out row m needs in rows m+q for q in a short window, with weight
   block (p, r) = W[j] wherever phase r + (j-h)*d lands on fold-row
   offset q, phase p. Every matmul then runs at full 128-lane width; for
   C=32 the folded tap count (~92) is even lower than the raw one (126).

Measured (v5e, bf16, per stage, vs the XLA lax-conv path inside the full
generator graph): C=128 T=65536: 2.5 ms vs ~9.7; see README perf notes.
Forward-only: the vocoder is frozen at inference (reference
utils.py:250-262); training never touches this path.

Per-stage ceiling analysis (2026-08-18, B=2, T0=1024, tools-level
breakdown): stages time 2.5/4.4/4.4/3.5 ms at C=256/128/64/32, i.e.
107/123/62/38 TFLOP/s on RAW conv FLOPs. The late-stage "drop" is NOT
schedule inefficiency: folding a dilation-d conv to f rows inflates
executed FLOPs by n_offsets*f/k (zero blocks inside the block-Toeplitz
wf — e.g. k=11 d=5 at f=4 runs ~2.9x the raw FLOPs), so effective MXU
utilization is 56-78% across ALL stages. Folding less wastes lanes
(C/128), folding more inflates dilated taps further: f = 128/C is the
algorithmic sweet spot. Restructuring each conv as one concat-K matmul
(offsets stacked on K so accumulation runs inside the MXU) measured
IDENTICAL per-stage times — Mosaic already emitted an equivalent
schedule for the per-offset form; the concat-K form is kept for
clarity. Remaining levers (int8 MXU, per-dilation time permutation)
are quality- or shuffle-cost-risky; parked.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
TARGET_LANES = 128


def _shift(tile: jnp.ndarray, s: int) -> jnp.ndarray:
    """Circular shift: result[m] = tile[m + s] (mod L); static s."""
    if s == 0:
        return tile
    return jnp.concatenate([tile[s:], tile[:s]], axis=0)


def _halo_for(kernel_sizes, dilations) -> int:
    """Receptive-field radius of the deepest branch: each (c1, c2) pair
    adds (d + 1) * (k-1)/2; = 60 for k=11, d=(1,3,5)."""
    return (max(kernel_sizes) - 1) // 2 * sum(d + 1 for d in dilations)


def _fold_conv_weights(w, b, dilation: int, fold: int):
    """Conv (w [k, C, C], b [C], dilation d) -> folded-tap form.

    Returns (wf [n_off, f*C, f*C], bf [f*C], offsets) such that on the
    folded signal xf[m, p*C+c] = x[m*f+p, c]:
        yf[m] = sum_i xf[m + offsets[i]] @ wf[i] + bf.

    Tap geometry is static Python; the scatter into wf uses static
    indices, so this traces cleanly under jit (weights are runtime
    values, e.g. freshly imported checkpoints).
    """
    k, C, _ = w.shape
    h = (k - 1) // 2
    taps = []  # (q, p, r, j)
    for r in range(fold):
        for j in range(k):
            q, p = divmod(r + (j - h) * dilation, fold)
            taps.append((q, p, r, j))
    # only OCCUPIED fold-row offsets get a matmul — a dense range would
    # materialize the dilation's zero gaps as zero matrices (f=1, k=11,
    # d=5 would emit 51 taps instead of 11)
    offsets = tuple(sorted({t[0] for t in taps}))
    Cf = fold * C
    wf = jnp.zeros((len(offsets), Cf, Cf), jnp.float32)
    for q, p, r, j in taps:
        wf = wf.at[
            offsets.index(q), p * C: (p + 1) * C, r * C: (r + 1) * C
        ].add(w[j].astype(jnp.float32))
    bf = jnp.tile(b, fold)
    return wf, bf, offsets


def _stage_kernel(
    xm, xc, xp, w_ref, b_ref, s_ref, out_ref,
    *,
    block_t: int,
    halo: int,
    seq_len: int,
    n_branches: int,
    conv_specs: Tuple,
    quantize: bool,
):
    """conv_specs: per branch, a tuple of per-conv (w_start, offsets,
    bias_idx) in chain order (c1_0, c2_0, c1_1, c2_1, ...).

    quantize=True runs each matmul on the int8 MXU path: weights arrive
    pre-quantized (w_ref int8, per-conv per-output-channel scales in
    s_ref); activations are quantized per tile with a dynamic abs-max
    scale. Accumulation is int32, rescaled to f32 before bias/residual.
    """
    dt = xc.dtype
    L = block_t + 2 * halo

    tile = jnp.concatenate(
        [xm[0, block_t - halo:], xc[0], xp[0, :halo]], axis=0
    ).astype(jnp.float32)
    # torch/flax SAME padding zeroes positions outside [0, T) at EVERY
    # conv; replicate by masking out-of-sequence rows after each conv
    # (bias would otherwise leak past the sequence edge). Exact at row
    # granularity because block/halo/T are multiples of the fold.
    g = pl.program_id(1) * block_t - halo + jax.lax.broadcasted_iota(
        jnp.int32, (L, 1), 0
    )
    in_seq = ((g >= 0) & (g < seq_len)).astype(jnp.float32)

    def conv(x, spec):
        w_start, offsets, b_idx = spec
        n = len(offsets)
        if quantize:
            # Dynamic per-tile activation scale; symmetric int8.
            s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) * (1.0 / 127.0)
            xq = jnp.clip(jnp.round(x * (1.0 / s_x)), -127, 127).astype(
                jnp.int8
            )
            a = jnp.concatenate([_shift(xq, q) for q in offsets], axis=1)
            w = w_ref[w_start: w_start + n]  # int8 [n, Cf, Cf]
            acc = jnp.dot(
                a,
                w.reshape(n * w.shape[1], w.shape[2]),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (s_x * s_ref[b_idx: b_idx + 1])
            return (y + b_ref[b_idx: b_idx + 1]) * in_seq
        # One matmul per conv: the shifted views concatenate on the lane
        # axis and the offsets' weight blocks stack on K, so the
        # per-offset accumulation happens inside the MXU instead of as
        # n-1 separate [L, Cf] f32 vector adds. Cast BEFORE shifting so
        # the copies move bf16, not f32.
        xc = x.astype(dt)
        a = jnp.concatenate([_shift(xc, q) for q in offsets], axis=1)
        w = w_ref[w_start: w_start + n].astype(dt)  # [n, Cf, Cf]
        acc = jnp.dot(
            a,
            w.reshape(n * w.shape[1], w.shape[2]),
            preferred_element_type=jnp.float32,
        )
        return (acc + b_ref[b_idx: b_idx + 1].astype(jnp.float32)) * in_seq

    total = None
    for br in range(n_branches):
        specs = conv_specs[br]
        xb = tile
        for ci in range(0, len(specs), 2):
            xt = jax.nn.leaky_relu(xb, LRELU_SLOPE)
            xt = conv(xt, specs[ci])
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = conv(xt, specs[ci + 1])
            xb = xb + xt
        total = xb if total is None else total + xb

    out = total * np.float32(1.0 / n_branches)
    out_ref[0] = out[halo: halo + block_t].astype(dt)


def _block_rows_for(folded_channels: int) -> int:
    """Folded-row block length tuned to Mosaic's scoped-VMEM stack (the
    unrolled tap loop keeps tens of shifted [L, Cf] f32 temporaries
    live). 1024 rows at Cf=128 measured fastest (2.5 ms for the
    T=65536 stage) and fits. Bigger budgets are NOT worth it: 1<<18
    measured only ~2% faster at B=2 and made the B=32 batched/mix
    programs fail TPU compilation (2026-08-17); 1<<19 fails to compile
    even at B=2 (scoped-VMEM exhaustion)."""
    return max(128, min(1024, (1 << 17) // folded_channels))


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilations", "fold", "block_t", "interpret", "quantize"
    ),
)
def fused_resblock_stage(
    x: jnp.ndarray,
    branch_params: Tuple,
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[int, ...] = (1, 3, 5),
    fold: int = 0,
    block_t: int = 0,
    interpret: bool = False,
    quantize: bool = False,
) -> jnp.ndarray:
    """Mean over ResBlocks of the residual conv chains, fused in VMEM.

    x: [B, T, C]. branch_params: one (w1, b1, w2, b2) tuple per kernel
    size, with w* [n_dil, k, C, C] (flax nn.Conv layout stacked over
    dilations) and b* [n_dil, C]. Matches hifigan.Generator's per-stage
    `mean(ResBlock1_j(x))` exactly (tests/test_pallas_resblock.py).

    quantize=True runs every conv matmul as int8 x int8 -> int32 on the
    MXU (2x bf16 MXU throughput on v5e): weights per-output-channel
    symmetric int8 computed here at trace time; activations quantized
    per VMEM tile with a dynamic abs-max scale inside the kernel.
    Approximate (quantization noise accumulates through 6 chained convs
    per branch) — opt-in for inference only; quality bounds measured in
    tools/int8_vocoder_experiment.py.
    """
    B, T, C = x.shape
    f = fold or max(1, TARGET_LANES // C)
    while T % f:
        f //= 2
    Cf = f * C
    Tf = T // f

    halo_samples = _halo_for(kernel_sizes, dilations)
    halo = -(-halo_samples // f)  # folded rows, rounded up

    bt = block_t or _block_rows_for(Cf)
    while Tf % bt:
        bt //= 2
    if halo > bt:
        raise ValueError(
            f"block of {bt} folded rows is smaller than the receptive "
            f"radius {halo}; T too short for the fused kernel — use the "
            "XLA path"
        )

    # Fold every conv's weights into block-Toeplitz taps.
    all_w, all_b, conv_specs = [], [], []
    for (w1, b1, w2, b2) in branch_params:
        specs = []
        for i, d in enumerate(dilations):
            for (w, b, dd) in ((w1[i], b1[i], d), (w2[i], b2[i], 1)):
                wf, bf, offsets = _fold_conv_weights(w, b, dd, f)
                specs.append((len(all_w), offsets, len(all_b)))
                all_w.extend(wf[i2] for i2 in range(wf.shape[0]))
                all_b.append(bf)
        conv_specs.append(tuple(specs))

    b_all = jnp.stack(all_b).astype(jnp.float32)
    if quantize:
        w_master = jnp.stack(all_w)  # f32 [n_taps, Cf, Cf]
        s_all = jnp.zeros((len(all_b), Cf), jnp.float32)
        w_all = jnp.zeros(w_master.shape, jnp.int8)
        for specs in conv_specs:
            for (w_start, offsets, b_idx) in specs:
                n = len(offsets)
                blk = w_master[w_start: w_start + n]
                # One scale per OUTPUT channel shared across the conv's
                # taps (they sum into the same int32 accumulator).
                s = jnp.maximum(
                    jnp.max(jnp.abs(blk), axis=(0, 1)), 1e-12
                ) * (1.0 / 127.0)
                q = jnp.clip(jnp.round(blk / s), -127, 127).astype(jnp.int8)
                s_all = s_all.at[b_idx].set(s)
                w_all = w_all.at[w_start: w_start + n].set(q)
    else:
        w_all = jnp.stack(all_w).astype(x.dtype)
        s_all = jnp.zeros((len(all_b), Cf), jnp.float32)  # unused

    xf = x.reshape(B, Tf, Cf)
    xpad = jnp.pad(xf, ((0, 0), (bt, bt), (0, 0)))
    n_blocks = Tf // bt

    in_specs = [
        pl.BlockSpec(
            (1, bt, Cf), lambda b, i, sh=sh: (b, i + sh, 0),
            memory_space=pltpu.VMEM,
        )
        for sh in range(3)
    ] + [
        pl.BlockSpec(w_all.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(b_all.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(s_all.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(
        _stage_kernel,
        block_t=bt,
        halo=halo,
        seq_len=Tf,
        n_branches=len(branch_params),
        conv_specs=tuple(conv_specs),
        quantize=quantize,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bt, Cf), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tf, Cf), x.dtype),
        # The unrolled tap loop's stack of [L, Cf] f32 temporaries can
        # exceed the default 16 MiB scoped-vmem budget when this kernel
        # is embedded in a larger program (observed: stage0 Cf=256
        # inside the full synthesize graph wants 23.5 MiB; the same
        # shapes standalone fit). Weights (~16.5 MiB at Cf=256) +
        # 3 input tiles + stack stay well under this explicit cap.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xpad, xpad, xpad, w_all, b_all, s_all)
    return out.reshape(B, T, C)


def branch_params_from_variables(params: dict, stage: int, n_branches: int = 3):
    """Stack a hifigan.Generator stage's resblock params into the
    kernel's (w1, b1, w2, b2) tuples (params['resblocks_{i}_{j}'] with
    children convs1_{c}/convs2_{c})."""
    out = []
    for j in range(n_branches):
        blk = params[f"resblocks_{stage}_{j}"]
        n_d = len([k for k in blk if k.startswith("convs1_")])
        w1 = jnp.stack([blk[f"convs1_{c}"]["kernel"] for c in range(n_d)])
        b1 = jnp.stack([blk[f"convs1_{c}"]["bias"] for c in range(n_d)])
        w2 = jnp.stack([blk[f"convs2_{c}"]["kernel"] for c in range(n_d)])
        b2 = jnp.stack([blk[f"convs2_{c}"]["bias"] for c in range(n_d)])
        out.append((w1, b1, w2, b2))
    return tuple(out)
