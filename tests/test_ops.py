"""Vectorized op parity tests vs the reference's loop-based algorithms
(length regulator modules.py:396-419, mel calibrator utils.py:351-384,
BiLSTM vs torch.nn.LSTM, GRL gradient sign)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from styler_tpu.ops import (
    bilstm,
    duration_to_alignment,
    flip_padded,
    gradient_reversal,
    length_regulate,
    mask_from_lengths,
    mel_calibrate,
    sinusoid_table,
)


# -------------------- reference loop implementations (numpy) ------------


def ref_get_scale(src, tgt):
    return [src // tgt + (1 if x < src % tgt else 0) for x in range(tgt)]


def ref_length_regulate(x, durations):
    """Reference LengthRegulator.expand semantics (modules.py:411-419)."""
    out = []
    for vec, d in zip(x, durations):
        out.extend([vec] * int(d))
    return np.array(out) if out else np.zeros((0, x.shape[1]))


def ref_mel_calibrate(m, ml, sl):
    """Reference mel_calibrator per-example semantics (utils.py:355-384)."""
    m = m[:ml]
    if sl == ml:
        return m
    if ml > sl:
        sizes = ref_get_scale(ml, sl)
        out, pos = [], 0
        for s in sizes:
            out.append(m[pos : pos + s].sum(0) / s)
            pos += s
        return np.stack(out)
    sizes = ref_get_scale(sl, ml)
    return np.repeat(m, sizes, axis=0)


# ------------------------------- tests ----------------------------------


def test_mask_from_lengths():
    m = np.asarray(mask_from_lengths(jnp.array([3, 5, 0]), 5))
    assert m.shape == (3, 5)
    assert (~m[0][:3]).all() and m[0][3:].all()
    assert (~m[1]).all()
    assert m[2].all()


def test_length_regulate_matches_reference(rng):
    B, L, C, M = 3, 12, 8, 64
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    d = rng.integers(0, 8, size=(B, L)).astype(np.int32)
    d[1, 3] = 0  # zero-duration phoneme
    out, mel_len = length_regulate(jnp.asarray(x), jnp.asarray(d), M)
    out = np.asarray(out)
    for b in range(B):
        golden = ref_length_regulate(x[b], d[b])
        assert mel_len[b] == golden.shape[0] == d[b].sum()
        np.testing.assert_allclose(out[b, : golden.shape[0]], golden, rtol=1e-6)
        assert (out[b, golden.shape[0]:] == 0).all()


def test_length_regulate_overflow_truncates(rng):
    # durations summing past max_mel_len: frames beyond M are dropped
    x = rng.standard_normal((1, 4, 2)).astype(np.float32)
    d = jnp.array([[5, 5, 5, 5]], dtype=jnp.int32)
    out, mel_len = length_regulate(jnp.asarray(x), d, 8)
    assert out.shape == (1, 8, 2)
    assert int(mel_len[0]) == 20  # true length reported even if clipped
    golden = ref_length_regulate(x[0], np.array([5, 5, 5, 5]))
    np.testing.assert_allclose(np.asarray(out[0]), golden[:8], rtol=1e-6)


@pytest.mark.parametrize(
    "ml,sl", [(100, 30), (30, 100), (64, 64), (7, 3), (3, 7), (1, 5), (5, 1), (1000, 37)]
)
def test_mel_calibrate_matches_reference(rng, ml, sl):
    C = 6
    M, S = 1024, 128 if sl <= 128 else 256
    m = rng.standard_normal((M, C)).astype(np.float32)
    out = mel_calibrate(
        jnp.asarray(m[None]),
        jnp.array([ml], dtype=jnp.int32),
        jnp.array([sl], dtype=jnp.int32),
        S,
    )
    out = np.asarray(out)[0]
    golden = ref_mel_calibrate(m, ml, sl)
    np.testing.assert_allclose(out[: golden.shape[0]], golden, rtol=1e-4, atol=1e-5)
    assert np.abs(out[golden.shape[0]:]).max() == 0


def test_mel_calibrate_batch_mixed(rng):
    B, M, S, C = 4, 256, 64, 5
    m = rng.standard_normal((B, M, C)).astype(np.float32)
    mls = np.array([200, 30, 64, 1], dtype=np.int32)
    sls = np.array([50, 60, 64, 1], dtype=np.int32)
    out = np.asarray(mel_calibrate(jnp.asarray(m), jnp.asarray(mls), jnp.asarray(sls), S))
    for b in range(B):
        golden = ref_mel_calibrate(m[b], int(mls[b]), int(sls[b]))
        np.testing.assert_allclose(out[b, : golden.shape[0]], golden, rtol=1e-4, atol=1e-5)


def test_duration_to_alignment(rng):
    d = jnp.array([[2, 0, 3]], dtype=jnp.int32)
    a = np.asarray(duration_to_alignment(d, 8))
    assert a.shape == (1, 8, 3)
    np.testing.assert_array_equal(a[0, :2, 0], 1)
    np.testing.assert_array_equal(a[0, 2:5, 2], 1)
    assert a[0, 5:].sum() == 0 and a[0, :, 1].sum() == 0


def test_flip_padded():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3).repeat(2, axis=0)
    out = np.asarray(flip_padded(x, jnp.array([2, 4])))
    np.testing.assert_allclose(out[0, 0], np.asarray(x[0, 1]))
    np.testing.assert_allclose(out[0, 1], np.asarray(x[0, 0]))
    assert (out[0, 2:] == 0).all()
    np.testing.assert_allclose(out[1], np.asarray(x[1, ::-1]))


def test_bilstm_matches_torch(rng):
    B, T, In, H, L = 2, 17, 10, 6, 2
    x = rng.standard_normal((B, T, In)).astype(np.float32)

    tl = torch.nn.LSTM(In, H, L, batch_first=True, bidirectional=True)
    with torch.no_grad():
        golden = tl(torch.from_numpy(x))[0].numpy()

    params = []
    for layer in range(L):
        lp = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            lp[direction] = {
                "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l{layer}{suffix}").detach().numpy()),
                "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l{layer}{suffix}").detach().numpy()),
                "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l{layer}{suffix}").detach().numpy()),
                "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l{layer}{suffix}").detach().numpy()),
            }
        params.append(lp)

    got = np.asarray(bilstm(params, jnp.asarray(x), jnp.array([T, T])))
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


def test_bilstm_padded_matches_torch_packed(rng):
    """With per-example lengths, our flip-valid-region backward must match
    torch's packed-sequence behavior (the semantically correct one)."""
    B, T, In, H = 2, 12, 5, 4
    lengths = [12, 7]
    x = rng.standard_normal((B, T, In)).astype(np.float32)
    x[1, 7:] = 0.0

    tl = torch.nn.LSTM(In, H, 1, batch_first=True, bidirectional=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths, batch_first=True
    )
    with torch.no_grad():
        out, _ = tl(packed)
    golden, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=T)
    golden = golden.numpy()

    lp = {
        d: {
            "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l0{s}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l0{s}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l0{s}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l0{s}").detach().numpy()),
        }
        for d, s in (("fwd", ""), ("bwd", "_reverse"))
    }
    got = np.asarray(bilstm([lp], jnp.asarray(x), jnp.array(lengths)))
    for b, ln in enumerate(lengths):
        np.testing.assert_allclose(got[b, :ln], golden[b, :ln], rtol=1e-4, atol=1e-5)


def test_fused_bilstm_branches_matches_separate(rng):
    """The merged block-diagonal scan == per-branch bilstm, with padded
    lengths and the audio encoder's uneven neck widths."""
    from styler_tpu.ops.recurrent import fused_bilstm_branches, init_bilstm_params

    B, T = 3, 19
    lengths = jnp.array([19, 11, 1])
    widths = [(7, 5), (9, 3), (7, 2)]  # (input_dim, hidden) per branch
    key = jax.random.PRNGKey(0)
    branch_params, xs = [], []
    for i, (in_dim, hidden) in enumerate(widths):
        key, sub = jax.random.split(key)
        branch_params.append(init_bilstm_params(sub, in_dim, hidden, num_layers=2))
        xs.append(jnp.asarray(rng.standard_normal((B, T, in_dim)).astype(np.float32)))

    fused = fused_bilstm_branches(branch_params, xs, lengths)
    for bp, x, got in zip(branch_params, xs, fused):
        golden = bilstm(bp, x, lengths)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), rtol=1e-5, atol=1e-6
        )


def test_gradient_reversal():
    def f(x):
        return jnp.sum(gradient_reversal(x, 1.0) ** 2)

    x = jnp.array([1.0, -2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [-2.0, 4.0])
    # forward is identity
    np.testing.assert_allclose(np.asarray(gradient_reversal(x, 1.0)), np.asarray(x))


def test_sinusoid_table_matches_reference_formula():
    table = sinusoid_table(1001, 256)
    assert table.shape == (1001, 256)
    # golden: reference formula (transformer/Models.py:11-30)
    pos, d = 17, 256
    angles = np.array([pos / np.power(10000, 2 * (j // 2) / d) for j in range(d)])
    golden = np.where(np.arange(d) % 2 == 0, np.sin(angles), np.cos(angles))
    np.testing.assert_allclose(table[pos], golden, rtol=1e-5, atol=1e-6)
    assert (table[0, 0::2] == 0).all() and (table[0, 1::2] == 1).all()
