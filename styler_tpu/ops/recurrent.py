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

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


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
    _, hs = jax.lax.scan(step, init, gates_x.transpose(1, 0, 2))
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
