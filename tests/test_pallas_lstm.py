"""Pallas fused LSTM recurrence (+custom BPTT VJP) vs the lax.scan path.

Runs the kernels in interpret mode (tests execute on the virtual CPU
mesh); on real TPU the same kernels compile via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styler_tpu.ops.pallas_lstm import lstm_recurrence_pallas
from styler_tpu.ops.recurrent import _lstm_scan, init_bilstm_params, lstm_direction


def _setup(B, T, H, In, seed=0):
    params = init_bilstm_params(jax.random.PRNGKey(seed), In, H, 1)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, In), dtype=jnp.float32)
    gates_x = (
        jnp.dot(x, params["w_ih"].T, precision=jax.lax.Precision.HIGHEST)
        + params["b_ih"]
        + params["b_hh"]
    )
    return params, x, gates_x


@pytest.mark.parametrize("B,T,H,In", [(2, 16, 8, 12), (3, 33, 80, 96), (1, 7, 64, 64)])
def test_pallas_matches_scan(B, T, H, In):
    params, x, gates_x = _setup(B, T, H, In)
    ref = _lstm_scan(x, params["w_hh"], gates_x)
    got = lstm_recurrence_pallas(gates_x, params["w_hh"], True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("B,T,H,In", [(2, 12, 8, 8), (2, 9, 16, 24)])
def test_pallas_bptt_gradients_match_scan(B, T, H, In):
    """Custom backward kernel vs autodiff through the scan implementation,
    for both d(gates_x) and d(w_hh)."""
    params, x, gates_x = _setup(B, T, H, In, seed=7)
    w_hh = params["w_hh"]
    cotangent = jax.random.normal(jax.random.PRNGKey(99), (B, T, H), dtype=jnp.float32)

    def loss_scan(g, w):
        return jnp.sum(_lstm_scan(x, w, g) * cotangent)

    def loss_pallas(g, w):
        return jnp.sum(lstm_recurrence_pallas(g, w, True) * cotangent)

    dg_ref, dw_ref = jax.grad(loss_scan, argnums=(0, 1))(gates_x, w_hh)
    dg_got, dw_got = jax.grad(loss_pallas, argnums=(0, 1))(gates_x, w_hh)
    np.testing.assert_allclose(np.asarray(dg_got), np.asarray(dg_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref), atol=1e-4, rtol=1e-4)


def test_padding_rows_stay_finite():
    B, T, H, In = 5, 11, 16, 16
    params, x, gates_x = _setup(B, T, H, In, seed=2)
    out = lstm_recurrence_pallas(gates_x, params["w_hh"], True)
    assert np.isfinite(np.asarray(out)).all()


def test_lstm_direction_dispatch_cpu():
    """On CPU lstm_direction uses the scan path and stays correct."""
    B, T, H, In = 2, 9, 8, 8
    params, x, _ = _setup(B, T, H, In, seed=4)
    out = lstm_direction(params, x)
    assert out.shape == (B, T, H)
    assert np.isfinite(np.asarray(out)).all()
