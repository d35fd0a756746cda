"""Bidirectional multi-layer LSTM via lax.scan.

TPU-native replacement for the reference's nn.LSTM bottleneck encoders
(reference modules.py:117-162). Design notes:

- The input projection for ALL timesteps is hoisted out of the scan as
  one big [B*T, In] @ [In, 4H] matmul (MXU); the scan body only does the
  small [B, H] @ [H, 4H] recurrent matmul.
- Weights use the PyTorch layout (w_ih [4H, In], w_hh [4H, H], gate
  order i, f, g, o) so checkpoint import is a straight copy.
- The backward direction flips only the VALID region of each sequence
  (padding stays zero). For an unpadded batch this is bit-equivalent to
  the reference; for padded batches the reference lets the backward pass
  consume padding zeros first (a batch-composition-dependent quirk we do
  not reproduce).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def scan_unroll() -> int:
    """lax.scan unroll factor for the LSTM recurrences
    (STYLER_TPU_SCAN_UNROLL, default 1).

    The recurrent step is a tiny [2B, Ht] x [Ht, 4Ht] matmul; at T=1024
    the scan could plausibly be loop-iteration-latency bound, so
    `unroll=k` folds k steps per loop iteration (same math, fewer
    loop-control round trips). MEASURED NEGATIVE on the real v5e
    (tools/unroll_experiment.py, 2026-08-18, all variants one process):
    train step 89.2/88.1/88.1/89.3 ms and B=1 forward 1.80/1.70/1.71/
    1.74 ms at unroll 1/4/8/16 — ~1%, within platform noise. XLA:TPU's
    while-loop overhead is already negligible next to the step's real
    work. Default stays 1 (fastest compiles); the knob remains for
    other hardware."""
    return int(os.environ.get("STYLER_TPU_SCAN_UNROLL", "1"))


def flip_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its valid length; padding -> 0.

    x: [B, T, C]; lengths: [B]. out[b, t] = x[b, len_b-1-t] for t < len_b.
    """
    t = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]  # [1, T]
    src = lengths[:, None].astype(jnp.int32) - 1 - t  # [B, T]
    valid = src >= 0
    src = jnp.clip(src, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, src[..., None], axis=1)
    return jnp.where(valid[..., None], out, 0.0)


def _lstm_scan(x: jnp.ndarray, w_hh: jnp.ndarray, gates_x: jnp.ndarray) -> jnp.ndarray:
    """Run a unidirectional LSTM over precomputed input gates.

    gates_x: [B, T, 4H] = x @ w_ih.T + b_ih + b_hh. Returns h: [B, T, H].
    """
    hidden = w_hh.shape[1]
    batch = gates_x.shape[0]

    def step(carry, gx):
        h, c = carry
        # HIGHEST: f32 accumulation — recurrent state error compounds over
        # T steps and the necks feed the mel-parity-critical path.
        gates = gx + jnp.dot(h, w_hh.T, precision=jax.lax.Precision.HIGHEST)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((batch, hidden), gates_x.dtype),
        jnp.zeros((batch, hidden), gates_x.dtype),
    )
    _, hs = jax.lax.scan(
        step, init, gates_x.transpose(1, 0, 2), unroll=scan_unroll()
    )
    return hs.transpose(1, 0, 2)


def lstm_direction(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """One direction, one layer. params: w_ih [4H, In], w_hh [4H, H],
    b_ih [4H], b_hh [4H] (PyTorch layout/gate order).

    On TPU the recurrence runs as a fused Pallas kernel (one program for
    all T steps, weights resident in VMEM); elsewhere as lax.scan.
    """
    gates_x = (
        jnp.dot(x, params["w_ih"].T, precision=jax.lax.Precision.HIGHEST)
        + params["b_ih"]
        + params["b_hh"]
    )
    from styler_tpu.ops.pallas_lstm import lstm_recurrence_pallas, use_pallas_lstm

    if use_pallas_lstm():
        return lstm_recurrence_pallas(gates_x, params["w_hh"]).astype(gates_x.dtype)
    return _lstm_scan(x, params["w_hh"], gates_x)


def bilstm(
    layer_params: List[Dict[str, Dict[str, Any]]],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-layer bidirectional LSTM.

    layer_params: [{'fwd': {...}, 'bwd': {...}}, ...]
    x: [B, T, In]; lengths: [B]. Returns [B, T, 2H] with the layer-2
    input being concat(fwd, bwd) as in PyTorch's stacked BiLSTM.
    """
    out = x
    for lp in layer_params:
        h_fwd = lstm_direction(lp["fwd"], out)
        x_rev = flip_padded(out, lengths)
        h_bwd_rev = lstm_direction(lp["bwd"], x_rev)
        h_bwd = flip_padded(h_bwd_rev, lengths)
        out = jnp.concatenate([h_fwd, h_bwd], axis=-1)
    return out


def fused_bilstm_branches(
    branch_params: List[List[Dict[str, Dict[str, Any]]]],
    xs: List[jnp.ndarray],
    lengths: jnp.ndarray,
) -> List[jnp.ndarray]:
    """Run several independent multi-layer BiLSTMs (same T, same lengths,
    different widths) as ONE lax.scan per layer.

    The reference runs its 4 audio-encoder bottleneck LSTMs
    (modules.py:117-162) as separate nn.LSTM modules; under XLA each
    direction is its own serial scan — 16 dependency chains of T steps
    per audio-encoder pass. Here the branch recurrences are merged into
    a block-diagonal combined cell (gate-major state layout
    [i_all|f_all|g_all|o_all]) and the two directions are stacked on a
    leading axis, so each layer is a single scan whose step does one
    [2, B, Ht] x [2, Ht, 4Ht] einsum. Off-block weights are exactly
    zero, so the math is bit-identical to running the branches apart
    (same f32 HIGHEST accumulation; pinned by test_ops).

    branch_params: per branch, the `bilstm` layer_params list.
    xs: per branch input [B, T, In_b]. Returns per branch [B, T, 2H_b].
    """
    n_branches = len(branch_params)
    n_layers = len(branch_params[0])
    hiddens = [p[0]["fwd"]["w_hh"].shape[1] for p in branch_params]
    Ht = sum(hiddens)
    offs = np.cumsum([0] + hiddens)
    B, T = xs[0].shape[0], xs[0].shape[1]

    def gate_major(per_branch_gates):
        """[B, T, 4H_b] per branch (torch gate order) -> [B, T, 4Ht]
        with all branches' i gates first, then f, g, o."""
        split = [jnp.split(g, 4, axis=-1) for g in per_branch_gates]
        return jnp.concatenate(
            [split[b][k] for k in range(4) for b in range(n_branches)], axis=-1
        )

    def combined_w_hh(per_branch):
        """Per-branch w_hh [4H_b, H_b] -> block-diagonal [Ht, 4Ht]."""
        W = jnp.zeros((Ht, 4 * Ht), jnp.float32)
        for b, w in enumerate(per_branch):
            H = hiddens[b]
            for k in range(4):
                W = W.at[
                    offs[b] : offs[b] + H,
                    k * Ht + offs[b] : k * Ht + offs[b] + H,
                ].set(w[k * H : (k + 1) * H, :].T.astype(jnp.float32))
        return W

    outs = list(xs)
    for layer in range(n_layers):
        gx, whh = [], []
        for d in ("fwd", "bwd"):
            per_gates = []
            for b in range(n_branches):
                p = branch_params[b][layer][d]
                x_b = outs[b] if d == "fwd" else flip_padded(outs[b], lengths)
                per_gates.append(
                    jnp.dot(
                        x_b, p["w_ih"].T, precision=jax.lax.Precision.HIGHEST
                    )
                    + p["b_ih"]
                    + p["b_hh"]
                )
            gx.append(gate_major(per_gates))
            whh.append(
                combined_w_hh(
                    [branch_params[b][layer][d]["w_hh"] for b in range(n_branches)]
                )
            )
        gx = jnp.stack(gx, axis=0)  # [2, B, T, 4Ht]
        whh = jnp.stack(whh, axis=0)  # [2, Ht, 4Ht]

        def step(carry, gx_t, whh=whh):
            h, c = carry  # [2, B, Ht]
            gates = gx_t + jnp.einsum(
                "dbh,dhg->dbg", h, whh, precision=jax.lax.Precision.HIGHEST
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (
            jnp.zeros((2, B, Ht), gx.dtype),
            jnp.zeros((2, B, Ht), gx.dtype),
        )
        _, hs = jax.lax.scan(
            step, init, gx.transpose(2, 0, 1, 3), unroll=scan_unroll()
        )
        hs = hs.transpose(1, 2, 0, 3)  # [2, B, T, Ht]
        h_bwd = flip_padded(hs[1], lengths)
        outs = [
            jnp.concatenate(
                [
                    hs[0][..., offs[b] : offs[b + 1]],
                    h_bwd[..., offs[b] : offs[b + 1]],
                ],
                axis=-1,
            )
            for b in range(n_branches)
        ]
    return outs


def init_bilstm_params(
    key: jax.Array, input_dim: int, hidden: int, num_layers: int
) -> List[Dict[str, Dict[str, jnp.ndarray]]]:
    """PyTorch-style uniform(-1/sqrt(H), 1/sqrt(H)) initialization."""
    bound = 1.0 / jnp.sqrt(hidden)
    layers = []
    in_dim = input_dim
    for _ in range(num_layers):
        layer = {}
        for direction in ("fwd", "bwd"):
            key, *ks = jax.random.split(key, 5)
            layer[direction] = {
                "w_ih": jax.random.uniform(ks[0], (4 * hidden, in_dim), minval=-bound, maxval=bound),
                "w_hh": jax.random.uniform(ks[1], (4 * hidden, hidden), minval=-bound, maxval=bound),
                "b_ih": jax.random.uniform(ks[2], (4 * hidden,), minval=-bound, maxval=bound),
                "b_hh": jax.random.uniform(ks[3], (4 * hidden,), minval=-bound, maxval=bound),
            }
        layers.append(layer)
        in_dim = 2 * hidden
    return layers
