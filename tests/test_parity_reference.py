"""End-to-end numerical parity vs the ACTUAL reference implementation.

Builds the reference PyTorch STYLER (from /root/reference, used as a
read-only golden oracle — none of its code ships in this package), runs a
teacher-forced forward on CPU, imports its randomly initialized weights
through ``import_styler_state``, runs this package's model on the same
batch, and compares every output head. This catches any wiring,
transpose, or semantic mismatch across the whole acoustic model.

Skipped when the reference checkout is not present.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def reference_forward():
    import types

    # The reference's text package imports unidecode/inflect (not installed
    # here); only the model graph is needed, so stub them.
    if "unidecode" not in sys.modules:
        fake = types.ModuleType("unidecode")
        fake.unidecode = lambda s: s
        sys.modules["unidecode"] = fake
    if "inflect" not in sys.modules:
        fake = types.ModuleType("inflect")
        fake.engine = lambda: types.SimpleNamespace(
            number_to_words=lambda *a, **k: ""
        )
        sys.modules["inflect"] = fake

    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(0)
    from styler import STYLER as TorchSTYLER  # reference model

    B, L, M = 2, 12, 48
    rng = np.random.default_rng(7)
    src_len = np.array([L, 9], dtype=np.int64)
    mel_len = np.array([M, 30], dtype=np.int64)
    src_seq = rng.integers(1, 100, size=(B, L)).astype(np.int64)
    src_seq[1, 9:] = 0
    d = np.zeros((B, L), dtype=np.int64)
    for b in range(B):
        remaining = mel_len[b]
        for i in range(src_len[b]):
            take = remaining // (src_len[b] - i)
            d[b, i] = take
            remaining -= take
    mel_target = rng.standard_normal((B, M, 80)).astype(np.float32)
    mel_aug = rng.standard_normal((B, M, 80)).astype(np.float32)
    p_norm = rng.random((B, M)).astype(np.float32)
    e_input = rng.random((B, M)).astype(np.float32)
    f0 = (rng.random((B, M)) * 300 + 80).astype(np.float32)
    energy = (rng.random((B, M)) * 100).astype(np.float32)
    speaker = rng.standard_normal((B, 512)).astype(np.float32)
    # zero out padding regions like the reference collate (dataset.py:157-166)
    for b in range(B):
        mel_target[b, mel_len[b]:] = 0
        mel_aug[b, mel_len[b]:] = 0
        p_norm[b, mel_len[b]:] = 0
        e_input[b, mel_len[b]:] = 0
        f0[b, mel_len[b]:] = 0
        energy[b, mel_len[b]:] = 0

    model = TorchSTYLER()
    model.eval()
    with torch.no_grad():
        out = model(
            torch.from_numpy(src_seq),
            torch.from_numpy(mel_target),
            torch.from_numpy(mel_aug),
            torch.from_numpy(p_norm),
            torch.from_numpy(e_input),
            torch.from_numpy(src_len),
            torch.from_numpy(mel_len),
            torch.from_numpy(d),
            torch.from_numpy(f0),
            torch.from_numpy(energy),
            L,
            M,
            speaker_embed=torch.from_numpy(speaker),
        )
    (
        mels,
        postnets,
        log_d,
        p_pred,
        e_pred,
        src_mask_t,
        mel_mask_t,
        _,
        posteriors,
    ) = out

    batch = dict(
        src_seq=src_seq,
        mel_target=mel_target,
        mel_aug=mel_aug,
        p_norm=p_norm,
        e_input=e_input,
        src_len=src_len,
        mel_len=mel_len,
        d_target=d,
        p_target=f0,
        e_target=energy,
        speaker_embed=speaker,
    )
    golden = dict(
        mel=mels[0].numpy(),
        mel_noisy=mels[1].numpy(),
        mel_postnet=postnets[0].numpy(),
        mel_postnet_noisy=postnets[1].numpy(),
        log_d=log_d.numpy(),
        p_pred=p_pred.numpy(),
        e_pred=e_pred.numpy(),
        posteriors=[p.numpy() for p in posteriors],
    )
    state_dict = model.state_dict()
    return batch, golden, state_dict, (B, L, M)


def test_full_model_parity(reference_forward):
    import jax.numpy as jnp

    from styler_tpu.core.config import default_config
    from styler_tpu.core.import_torch import import_styler_state
    from styler_tpu.models import STYLER

    batch, golden, state_dict, (B, L, M) = reference_forward
    cfg = default_config()
    params, batch_stats = import_styler_state(state_dict, cfg)

    model = STYLER(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        src_seq=jnp.asarray(batch["src_seq"].astype(np.int32)),
        mel_target=jnp.asarray(batch["mel_target"]),
        mel_aug=jnp.asarray(batch["mel_aug"]),
        p_norm=jnp.asarray(batch["p_norm"]),
        e_input=jnp.asarray(batch["e_input"]),
        src_len=jnp.asarray(batch["src_len"].astype(np.int32)),
        mel_len=jnp.asarray(batch["mel_len"].astype(np.int32)),
        d_target=jnp.asarray(batch["d_target"].astype(np.int32)),
        p_target=jnp.asarray(batch["p_target"]),
        e_target=jnp.asarray(batch["e_target"]),
        max_src_len=L,
        max_mel_len=M,
        speaker_embed=jnp.asarray(batch["speaker_embed"]),
    )

    mel_valid = ~np.asarray(out.mel_mask)  # [B, M]

    def mae(a, b, valid=None):
        a, b = np.asarray(a), np.asarray(b)
        if valid is not None:
            a = a[valid]
            b = b[valid]
        return np.abs(a - b).mean()

    # mel heads: the parity budget is MAE < 1e-2 (BASELINE.md); random
    # weights on CPU f32 should be far tighter.
    assert mae(out.mel, golden["mel"], mel_valid) < 1e-3
    assert mae(out.mel_noisy, golden["mel_noisy"], mel_valid) < 1e-3
    assert mae(out.mel_postnet, golden["mel_postnet"], mel_valid) < 1e-3
    assert mae(out.mel_postnet_noisy, golden["mel_postnet_noisy"], mel_valid) < 1e-3

    # Example 0 has no padding: every head must match tightly. Example 1 is
    # padded; the reference's backward LSTM consumes padding zeros before
    # the valid frames (a batch-composition-dependent quirk — see
    # styler_tpu/ops/recurrent.py docstring), so the audio-encoder-derived
    # heads (log_d/p/e, noise encoding) legitimately differ there. They
    # must still sit well inside the global mel-MAE parity budget (1e-2).
    sl0, ml0 = batch["src_len"][0], batch["mel_len"][0]
    assert mae(out.log_d_prediction[0, :sl0], golden["log_d"][0, :sl0]) < 1e-4
    assert mae(out.p_prediction[0, :ml0], golden["p_pred"][0, :ml0]) < 1e-4
    assert mae(out.e_prediction[0, :ml0], golden["e_pred"][0, :ml0]) < 1e-4

    src_valid = ~np.asarray(out.src_mask)
    assert mae(out.log_d_prediction, golden["log_d"], src_valid) < 5e-3
    assert mae(out.p_prediction, golden["p_pred"], mel_valid) < 5e-3
    assert mae(out.e_prediction, golden["e_pred"], mel_valid) < 5e-3


def test_inference_path_parity_batch0(reference_forward):
    """Predicted-duration (no-target) path: the reference computes
    durations = clamp(round(exp(log_d)-1)), length-regulates, predicts
    pitch/energy from its own encodings (modules.py:353-382). Compare on
    a batch of one unpadded example (the padded-example LSTM quirk does
    not apply)."""
    import torch

    import jax.numpy as jnp

    from styler_tpu.core.config import default_config
    from styler_tpu.core.import_torch import import_styler_state
    from styler_tpu.models import STYLER

    batch, golden, state_dict, (B, L, M) = reference_forward

    sys.path.insert(0, REFERENCE)
    from styler import STYLER as TorchSTYLER

    # Random weights predict ~zero durations (round(exp(0)-1)=0), which
    # collapses the frame axis below the k=3 predictor convs. Bias the
    # duration head so durations ≈ 4 frames/phoneme — both models get the
    # identical modified weights, so parity still holds.
    state_dict = {k: v.clone() for k, v in state_dict.items()}
    state_dict["style_modeling.duration_predictor.linear_layer.bias"] += np.log(5.0)

    torch.manual_seed(0)
    tmodel = TorchSTYLER()
    tmodel.load_state_dict(state_dict)
    tmodel.eval()

    one = {k: v[:1] for k, v in batch.items()}
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(one["src_seq"]),
            torch.from_numpy(one["mel_target"]),
            torch.from_numpy(one["mel_aug"]),
            torch.from_numpy(one["p_norm"]),
            torch.from_numpy(one["e_input"]),
            torch.from_numpy(one["src_len"]),
            torch.from_numpy(one["mel_len"]),
            speaker_embed=torch.from_numpy(one["speaker_embed"]),
        )
    mels_t, postnets_t, log_d_t, p_t, e_t, _, mel_mask_t, mel_len_t = tout[:8]
    ref_mel_len = int(mel_len_t[0])

    cfg = default_config()
    params, batch_stats = import_styler_state(state_dict, cfg)
    model = STYLER(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        src_seq=jnp.asarray(one["src_seq"].astype(np.int32)),
        mel_target=jnp.asarray(one["mel_target"]),
        mel_aug=jnp.asarray(one["mel_aug"]),
        p_norm=jnp.asarray(one["p_norm"]),
        e_input=jnp.asarray(one["e_input"]),
        src_len=jnp.asarray(one["src_len"].astype(np.int32)),
        mel_len=jnp.asarray(one["mel_len"].astype(np.int32)),
        max_src_len=L,
        max_mel_len=max(M, ref_mel_len),
        speaker_embed=jnp.asarray(one["speaker_embed"]),
    )

    # duration head must agree tightly, and so must the rounded durations
    log_d = np.asarray(out.log_d_prediction)[0]
    np.testing.assert_allclose(log_d, log_d_t[0].numpy(), rtol=1e-4, atol=1e-4)
    assert int(out.mel_len[0]) == ref_mel_len

    n = ref_mel_len
    np.testing.assert_allclose(
        np.asarray(out.p_prediction)[0, :n], p_t[0, :n].numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.e_prediction)[0, :n], e_t[0, :n].numpy(), rtol=1e-3, atol=1e-3
    )
    assert np.abs(
        np.asarray(out.mel_postnet)[0, :n] - postnets_t[0][0, :n].numpy()
    ).mean() < 1e-3


def test_dat_posterior_parity_batch0(reference_forward):
    """DAT posteriors match on example 0, which has no padding (the
    reference pools over padded positions; we pool over valid ones —
    identical when there is no padding)."""
    import jax.numpy as jnp

    from styler_tpu.core.config import default_config
    from styler_tpu.core.import_torch import import_styler_state
    from styler_tpu.models import STYLER

    batch, golden, state_dict, (B, L, M) = reference_forward
    cfg = default_config()
    params, batch_stats = import_styler_state(state_dict, cfg)
    model = STYLER(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        src_seq=jnp.asarray(batch["src_seq"].astype(np.int32)),
        mel_target=jnp.asarray(batch["mel_target"]),
        mel_aug=jnp.asarray(batch["mel_aug"]),
        p_norm=jnp.asarray(batch["p_norm"]),
        e_input=jnp.asarray(batch["e_input"]),
        src_len=jnp.asarray(batch["src_len"].astype(np.int32)),
        mel_len=jnp.asarray(batch["mel_len"].astype(np.int32)),
        d_target=jnp.asarray(batch["d_target"].astype(np.int32)),
        p_target=jnp.asarray(batch["p_target"]),
        e_target=jnp.asarray(batch["e_target"]),
        max_src_len=L,
        max_mel_len=M,
        speaker_embed=jnp.asarray(batch["speaker_embed"]),
    )
    for mine, ref in zip(out.dat_posteriors, golden["posteriors"]):
        np.testing.assert_allclose(
            np.asarray(mine)[0], ref[0], rtol=1e-3, atol=1e-4
        )
