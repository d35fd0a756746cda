"""Pallas TPU kernels: fused LSTM recurrence with custom VJP.

The audio encoder runs 16 LSTM scans (4 branches x 2 layers x 2
directions, reference modules.py:117-162). Under `lax.scan` XLA compiles
each to a T-step while-loop whose per-step dispatch overhead dominates —
the matmuls are tiny ([B,H] @ [H,4H] with H<=128). These kernels run the
ENTIRE recurrence (forward and BPTT backward) inside single Pallas
programs: the sequential TPU grid iterates over time, the recurrent
weight matrix stays resident in VMEM, and the h/c carries live in VMEM
scratch that persists across grid steps.

Layout: PyTorch gate order (i, f, g, o), each gate padded to Hp=128
lanes so all in-kernel splits fall on hardware tile boundaries; batch
padded to the 8-sublane multiple. Zero padding is self-consistent: the
padded h/c entries stay exactly 0 through the recurrence.

The backward pass is the standard LSTM BPTT with activations (i,f,g,o)
and cell states saved by the forward kernel; it emits d(gates_x) per
step and accumulates d(w_hh) in a VMEM scratch written out once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(gates_ref, w_hh_ref, h_ref, c_ref, acts_ref, h_scr, c_scr):
    """One grid step = one timestep. Blocks: gates [1,Bp,4Hp];
    w_hh [Hp,4Hp] resident; outputs h/c [1,Bp,Hp], acts [1,Bp,4Hp]."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hp = h_scr.shape[1]
    # HIGHEST: recurrent-state error compounds over T steps and the necks
    # feed the mel-parity-critical path.
    gates = gates_ref[0] + jnp.dot(
        h_scr[:], w_hh_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    i = jax.nn.sigmoid(gates[:, 0 * hp: 1 * hp])
    f = jax.nn.sigmoid(gates[:, 1 * hp: 2 * hp])
    g = jnp.tanh(gates[:, 2 * hp: 3 * hp])
    o = jax.nn.sigmoid(gates[:, 3 * hp: 4 * hp])
    c = f * c_scr[:] + i * g
    h = o * jnp.tanh(c)
    c_scr[:] = c
    h_scr[:] = h
    h_ref[0] = h
    c_ref[0] = c
    acts_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)


def _run_forward(g, w, T, Bp, Hp, interpret):
    return pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, 4 * Hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 4 * Hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, Hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 4 * Hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * Hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
        ],
        interpret=interpret,
    )(g, w)


# ---------------------------------------------------------------------------
# backward (BPTT)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    dh_out_ref,  # [1,Bp,Hp] grad wrt h[t] from downstream
    acts_ref,    # [1,Bp,4Hp] saved (i,f,g,o)
    c_ref,       # [1,Bp,Hp] c[t]
    c_prev_ref,  # [1,Bp,Hp] c[t-1] (block clamped at t=0)
    h_prev_ref,  # [1,Bp,Hp] h[t-1] (block clamped at t=0)
    w_hh_ref,    # [Hp,4Hp] resident
    dgates_ref,  # out [1,Bp,4Hp]
    dw_ref,      # out [Hp,4Hp] accumulated
    dh_scr, dc_scr,
):
    idx = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - idx  # reverse time

    @pl.when(idx == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    hp = dh_scr.shape[1]
    acts = acts_ref[0]
    i = acts[:, 0 * hp: 1 * hp]
    f = acts[:, 1 * hp: 2 * hp]
    g = acts[:, 2 * hp: 3 * hp]
    o = acts[:, 3 * hp: 4 * hp]
    zero_if_first = (t > 0).astype(jnp.float32)
    c_prev = c_prev_ref[0] * zero_if_first
    h_prev = h_prev_ref[0] * zero_if_first

    tanh_c = jnp.tanh(c_ref[0])
    dh = dh_out_ref[0] + dh_scr[:]
    dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_scr[:]

    di = dc * g * i * (1.0 - i)
    df = dc * c_prev * f * (1.0 - f)
    dg = dc * i * (1.0 - g * g)
    do = dh * tanh_c * o * (1.0 - o)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # [Bp, 4Hp]
    dgates_ref[0] = dgates

    # propagate carries: dh_prev = dgates @ W^T ; dc_prev = dc * f
    dh_scr[:] = jax.lax.dot_general(
        dgates, w_hh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dc_scr[:] = dc * f

    # accumulate dW += h_prev^T @ dgates
    dw_ref[:] += jax.lax.dot_general(
        h_prev, dgates,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _run_backward(dh_out, acts, c, h, w, T, Bp, Hp, interpret):
    rev = lambda i: (T - 1 - i, 0, 0)  # noqa: E731
    prev = lambda i: (jnp.maximum(T - 2 - i, 0), 0, 0)  # noqa: E731
    return pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, Hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 4 * Hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Hp), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Hp), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 4 * Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, 4 * Hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 4 * Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, 4 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 4 * Hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
        ],
        interpret=interpret,
    )(dh_out, acts, c, c, h, w)


# ---------------------------------------------------------------------------
# padding helpers + custom-vjp wrapper
# ---------------------------------------------------------------------------


def _pad_gates(gates_x, B, T, H, Bp, Hp):
    """[B,T,4H] -> time-major padded [T,Bp,4Hp] (per-gate lane padding)."""
    g = gates_x.astype(jnp.float32).reshape(B, T, 4, H)
    g = jnp.pad(g, ((0, Bp - B), (0, 0), (0, 0), (0, Hp - H)))
    return g.transpose(1, 0, 2, 3).reshape(T, Bp, 4 * Hp)


def _pad_w(w_hh, H, Hp):
    """PyTorch [4H,H] -> [Hp,4Hp] (gates = h @ W layout)."""
    w = w_hh.astype(jnp.float32).reshape(4, H, H).transpose(2, 0, 1)  # [H,4,H]
    return jnp.pad(w, ((0, Hp - H), (0, 0), (0, Hp - H))).reshape(Hp, 4 * Hp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_recurrence_pallas(gates_x, w_hh, interpret=False):
    """Fused LSTM recurrence over precomputed input gates.

    gates_x: [B, T, 4H] (= x @ w_ih.T + b_ih + b_hh, PyTorch gate order)
    w_hh:    [4H, H]    (PyTorch layout)
    returns h: [B, T, H], float32. Differentiable (custom BPTT kernel).
    """
    h, _ = _fwd_impl(gates_x, w_hh, interpret)
    return h


def _fwd_impl(gates_x, w_hh, interpret):
    B, T, four_h = gates_x.shape
    H = four_h // 4
    Hp, Bp = _round_up(H, LANE), _round_up(B, SUBLANE)
    g = _pad_gates(gates_x, B, T, H, Bp, Hp)
    w = _pad_w(w_hh, H, Hp)
    h_pad, c_pad, acts = _run_forward(g, w, T, Bp, Hp, interpret)
    h = h_pad.transpose(1, 0, 2)[:B, :, :H]
    return h, (h_pad, c_pad, acts, w, (B, T, H, Bp, Hp))


def _vjp_fwd(gates_x, w_hh, interpret):
    h, res = _fwd_impl(gates_x, w_hh, interpret)
    return h, res


def _vjp_bwd(interpret, res, dh):
    h_pad, c_pad, acts, w, (B, T, H, Bp, Hp) = res
    dh_pad = jnp.pad(
        dh.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, Hp - H))
    ).transpose(1, 0, 2)  # [T,Bp,Hp]
    dgates_pad, dw_pad = _run_backward(
        dh_pad, acts, c_pad, h_pad, w, T, Bp, Hp, interpret
    )
    # unpad dgates [T,Bp,4Hp] -> [B,T,4H]
    dgates = (
        dgates_pad.reshape(T, Bp, 4, Hp)[:, :B, :, :H]
        .transpose(1, 0, 2, 3)
        .reshape(B, T, 4 * H)
    )
    # unpad dW [Hp,4Hp] -> PyTorch [4H,H]
    dw = dw_pad.reshape(Hp, 4, Hp)[:H, :, :H].transpose(1, 2, 0).reshape(4 * H, H)
    return dgates, dw


lstm_recurrence_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def use_pallas_lstm() -> bool:
    """Opt-in (STYLER_TPU_PALLAS_LSTM=1) and TPU-only.

    Measured on TPU v5e with honest (data-chained) timing: at this model's
    recurrence sizes (T<=256 after the Mel Calibrator, H<=80, B<=16) the
    fused kernel is NOT faster than XLA's lax.scan inside the full jitted
    program (48.6 ms vs 46.1 ms model forward) — the per-grid-step
    overhead outweighs the dispatch savings at tiny [B,H]x[H,4H] matmul
    sizes. The kernel + custom BPTT backward stay available (and tested
    for exact forward/gradient equivalence) for larger configurations
    where the trade flips.
    """
    import os

    return (
        os.environ.get("STYLER_TPU_PALLAS_LSTM") == "1"
        and jax.default_backend() == "tpu"
    )
