"""HiFi-GAN and DeepSpeaker ports: parity vs torch for the vocoder
(including weight-norm folding), structural checks for the embedder."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from styler_tpu.core.import_torch import import_hifigan_state
from styler_tpu.vocoder import Generator, HiFiGANConfig


def test_convtranspose1d_matches_torch(rng):
    from styler_tpu.vocoder.hifigan import ConvTranspose1dTorch

    in_ch, out_ch, k, u, T = 8, 4, 16, 8, 12
    tconv = tnn.ConvTranspose1d(in_ch, out_ch, k, u, padding=(k - u) // 2)
    x = rng.standard_normal((2, in_ch, T)).astype(np.float32)
    with torch.no_grad():
        golden = tconv(torch.from_numpy(x)).numpy()

    w = tconv.weight.detach().numpy()  # [in, out, k]
    kernel = w.transpose(2, 0, 1)[::-1].copy()  # [k, in, out] flipped
    mod = ConvTranspose1dTorch(out_ch, k, u)
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == golden.shape == (2, out_ch, T * u)
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


class _TorchResBlock(tnn.Module):
    """Reference hifigan ResBlock1 (models.py:28-75), rebuilt for golden values."""

    def __init__(self, ch, k, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            [
                tnn.utils.weight_norm(
                    tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=(k - 1) * d // 2)
                )
                for d in dilations
            ]
        )
        self.convs2 = tnn.ModuleList(
            [
                tnn.utils.weight_norm(tnn.Conv1d(ch, ch, k, 1, padding=(k - 1) // 2))
                for _ in dilations
            ]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = torch.nn.functional.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = torch.nn.functional.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class _TorchGenerator(tnn.Module):
    """Minimal torch twin of the reference Generator (models.py:112-165)
    with a small config, for end-to-end vocoder parity."""

    def __init__(self, cfg):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.conv_pre = wn(tnn.Conv1d(cfg.num_mels, cfg.upsample_initial_channel, 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch_in = cfg.upsample_initial_channel // (2**i)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(wn(tnn.ConvTranspose1d(ch_in, ch, k, u, padding=(k - u) // 2)))
            for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(_TorchResBlock(ch, rk, rd))
        self.conv_post = wn(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                b = self.resblocks[i * self.num_kernels + j](x)
                xs = b if xs is None else xs + b
            x = xs / self.num_kernels
        x = torch.nn.functional.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


def test_generator_parity_small_config(rng):
    cfg = HiFiGANConfig(
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=10,
    )
    torch.manual_seed(0)
    tg = _TorchGenerator(cfg)
    tg.eval()
    mel = rng.standard_normal((1, cfg.num_mels, 20)).astype(np.float32)
    with torch.no_grad():
        golden = tg(torch.from_numpy(mel)).numpy()[:, 0, :]

    params = import_hifigan_state(tg.state_dict(), cfg)
    gen = Generator(cfg, compute_dtype=jnp.float32)
    got = gen.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)))
    got = np.asarray(got)
    assert got.shape == golden.shape == (1, 20 * 16)
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=2e-4)


def test_generator_upsample_factor():
    cfg = HiFiGANConfig()
    # full config: 8*8*2*2 = 256 = hop_length
    assert int(np.prod(cfg.upsample_rates)) == 256


def test_rescnn_shapes_and_l2norm(rng):
    from styler_tpu.speaker import NUM_FBANKS, NUM_FRAMES, ResCNN

    model = ResCNN()
    x = jnp.asarray(rng.standard_normal((2, NUM_FRAMES, NUM_FBANKS, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)


def test_fbank_features(rng):
    from styler_tpu.speaker import fbank_features, speaker_features_from_audio

    sig = rng.standard_normal(22050).astype(np.float32)
    feat = fbank_features(sig, 22050, winlen=1024 / 22050)
    # frame count: 1 + ceil((T - 1024)/221)
    assert feat.shape == (1 + int(np.ceil((22050 - 1024) / 221)), 64)
    assert (feat > 0).all()  # power-spectrum energies

    img = speaker_features_from_audio(sig)
    assert img.shape == (160, 64, 1)
    # per-frame normalization applied before crop: near zero mean rows
    assert abs(img[:, :, 0].mean()) < 0.2


def test_generator_bf16_close_to_f32(rng):
    """Production bf16 compute mode stays perceptually faithful to f32
    (tanh-bounded waveform, small config)."""
    from styler_tpu.vocoder.hifigan import HiFiGANConfig

    cfg = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    import jax

    mel = jnp.asarray(rng.standard_normal((1, 20, 80)).astype(np.float32))
    g32 = Generator(cfg, compute_dtype=jnp.float32)
    v = g32.init(jax.random.PRNGKey(0), mel)
    w32 = np.asarray(g32.apply(v, mel))
    gbf = Generator(cfg, compute_dtype=jnp.bfloat16)
    wbf = np.asarray(gbf.apply(v, mel))
    assert w32.shape == wbf.shape
    assert np.abs(w32 - wbf).max() < 0.1, np.abs(w32 - wbf).max()
    corr = np.corrcoef(w32.ravel(), wbf.ravel())[0, 1]
    assert corr > 0.99, corr


# ----------------------------------------------------------------------
# DeepSpeaker numerical goldens vs Keras semantics (reference
# deepspeaker/conv_models.py:22-135), rebuilt in torch/numpy with
# explicit TF-'same' asymmetric padding — the classic porting slip this
# guards against: stride-2 k5 'same' on an EVEN input pads (1, 2) in
# TF/flax, while a naive symmetric torch pad=2 shifts every activation.
# ----------------------------------------------------------------------


def _tf_same_pad(x, k, s):
    """TF/Keras 'same' padding on an NCHW torch tensor: per spatial dim,
    pad_total = max((ceil(n/s)-1)*s + k - n, 0), low half = total//2
    (the extra unit goes on the high side)."""
    import torch.nn.functional as F

    pads = []
    for n in (x.shape[3], x.shape[2]):  # F.pad order: (w_lo, w_hi, h_lo, h_hi)
        out = -(-n // s)
        total = max((out - 1) * s + k - n, 0)
        pads += [total // 2, total - total // 2]
    return F.pad(x, pads)


def _keras_conv(x, w, s):
    """w: {"kernel" [kh, kw, in, out] (Keras == flax layout), "bias"}."""
    import torch.nn.functional as F

    kernel = torch.from_numpy(np.transpose(w["kernel"], (3, 2, 0, 1)).copy())
    x = _tf_same_pad(x, w["kernel"].shape[0], s)
    return F.conv2d(x, kernel, torch.from_numpy(w["bias"]), stride=s)


def _keras_bn(x, bn, eps=1e-3):
    """Keras BatchNormalization inference, default epsilon 1e-3 (NOT
    torch's 1e-5); bn: {"scale", "bias", "mean", "var"}."""

    def t(name):
        return torch.from_numpy(bn[name]).view(1, -1, 1, 1)

    return (x - t("mean")) / torch.sqrt(t("var") + eps) * t("scale") + t("bias")


def _crelu_t(x):
    return torch.clamp(x, 0.0, 20.0)


def _rand_ds_weights(rng, stages=(64, 128, 256, 512), in_ch=1, embed_in=2048):
    """Random DeepSpeaker weight set, one flat dict per layer keyed like
    the flax module tree; every layer carries conv {kernel, bias} or bn
    {scale, bias, mean, var} numpy arrays."""

    def conv(k, cin, cout):
        return {
            "kernel": (rng.standard_normal((k, k, cin, cout)) * 0.2
                       / np.sqrt(k * k * cin)).astype(np.float32),
            "bias": (0.05 * rng.standard_normal(cout)).astype(np.float32),
        }

    def bn(c):
        return {
            "scale": (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32),
            "bias": (0.1 * rng.standard_normal(c)).astype(np.float32),
            "mean": (0.2 * rng.standard_normal(c)).astype(np.float32),
            "var": (1.0 + 0.3 * rng.random(c)).astype(np.float32),
        }

    w = {}
    prev = in_ch
    for si, f in enumerate(stages, start=1):
        stage = {"conv": conv(5, prev, f), "bn": bn(f)}
        for b in range(3):
            stage[f"res_{b}"] = {
                "conv_2a": conv(3, f, f), "bn_2a": bn(f),
                "conv_2b": conv(3, f, f), "bn_2b": bn(f),
            }
        w[f"stage_{si}"] = stage
        prev = f
    w["affine"] = {
        "kernel": (rng.standard_normal((embed_in, 512)) * 0.02).astype(np.float32),
        "bias": (0.01 * rng.standard_normal(512)).astype(np.float32),
    }
    return w


def _torch_stage(x, sw):
    """One conv_and_res_block (conv_models.py:113-128), NCHW torch."""
    x = _crelu_t(_keras_bn(_keras_conv(x, sw["conv"], 2), sw["bn"]))
    for b in range(3):
        bw = sw[f"res_{b}"]
        inp = x
        h = _crelu_t(_keras_bn(_keras_conv(x, bw["conv_2a"], 1), bw["bn_2a"]))
        h = _crelu_t(_keras_bn(_keras_conv(h, bw["conv_2b"], 1), bw["bn_2b"]))
        x = _crelu_t(h + inp)
    return x


def _torch_rescnn(x_nchw, w):
    """Full reference forward (conv_models.py:49-66): 4 stages, reshape
    [B, T', 4*512] row-major over (width, channels), temporal mean,
    Dense(512), L2-normalize."""
    x = x_nchw
    for si in range(1, 5):
        x = _torch_stage(x, w[f"stage_{si}"])
    x = x.permute(0, 2, 3, 1)  # NCHW -> NHWC to flatten (W, C) like Keras
    B, T, Wd, C = x.shape
    x = x.reshape(B, T, Wd * C).mean(dim=1)
    x = x @ torch.from_numpy(w["affine"]["kernel"]) + torch.from_numpy(w["affine"]["bias"])
    return x / torch.clamp(torch.linalg.norm(x, dim=1, keepdim=True), min=1e-12)


def _flax_tree_from(w, stages=4):
    """Split the flat per-layer dict into flax (params, batch_stats)."""
    params, stats = {}, {}
    for si in range(1, stages + 1):
        sw = w[f"stage_{si}"]
        sp = {"conv": dict(sw["conv"]),
              "bn": {"scale": sw["bn"]["scale"], "bias": sw["bn"]["bias"]}}
        ss = {"bn": {"mean": sw["bn"]["mean"], "var": sw["bn"]["var"]}}
        for b in range(3):
            bw = sw[f"res_{b}"]
            sp[f"res_{b}"] = {
                "conv_2a": dict(bw["conv_2a"]),
                "bn_2a": {"scale": bw["bn_2a"]["scale"], "bias": bw["bn_2a"]["bias"]},
                "conv_2b": dict(bw["conv_2b"]),
                "bn_2b": {"scale": bw["bn_2b"]["scale"], "bias": bw["bn_2b"]["bias"]},
            }
            ss[f"res_{b}"] = {
                "bn_2a": {"mean": bw["bn_2a"]["mean"], "var": bw["bn_2a"]["var"]},
                "bn_2b": {"mean": bw["bn_2b"]["mean"], "var": bw["bn_2b"]["var"]},
            }
        params[f"stage_{si}"] = sp
        stats[f"stage_{si}"] = ss
    params["affine"] = dict(w["affine"])
    return params, stats


def test_rescnn_stage_matches_keras_semantics(rng):
    """Stage-level golden (VERDICT r3 #3b): stride-2 'same' conv + BN
    eps 1e-3 + clipped-ReLU + 3 identity blocks vs the torch/TF-semantics
    rebuild, on an EVEN input size (asymmetric padding) and an odd one."""
    from styler_tpu.speaker.rescnn import ConvResStage

    w = _rand_ds_weights(rng, stages=(16,), in_ch=1)["stage_1"]
    params, stats = _flax_tree_from({"stage_1": w, "affine": w}, stages=1)
    stage = ConvResStage(16)
    variables = {"params": params["stage_1"], "batch_stats": stats["stage_1"]}

    for T, Wd in ((20, 64), (21, 33)):  # even (pads 1,2) and odd (2,2)
        x = rng.standard_normal((2, T, Wd, 1)).astype(np.float32)
        golden = _torch_stage(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), w
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(stage.apply(variables, jnp.asarray(x)))
        assert got.shape == golden.shape
        np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-4)


def test_import_deepspeaker_h5_full_golden(rng, tmp_path):
    """End-to-end importer + full-model golden (VERDICT r3 #3a): write a
    synthetic Keras-layout .h5 (layer names from conv_models.py:85-120),
    import via import_deepspeaker_h5, and assert the full flax ResCNN
    matches the torch/TF-semantics rebuild on the same weights."""
    h5py = pytest.importorskip("h5py")
    from styler_tpu.speaker import ResCNN
    from styler_tpu.speaker.rescnn import import_deepspeaker_h5

    stages = (64, 128, 256, 512)
    w = _rand_ds_weights(rng, stages=stages)

    path = tmp_path / "rescnn.h5"
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")

        def put(layer, names_arrays):
            g = root.create_group(layer).create_group(layer)
            for n, a in names_arrays:
                g.create_dataset(n, data=a)

        def put_conv(layer, cw):
            put(layer, [("kernel:0", cw["kernel"]), ("bias:0", cw["bias"])])

        def put_bn(layer, bn):
            put(layer, [("gamma:0", bn["scale"]), ("beta:0", bn["bias"]),
                        ("moving_mean:0", bn["mean"]),
                        ("moving_variance:0", bn["var"])])

        for si, fch in enumerate(stages, start=1):
            sw = w[f"stage_{si}"]
            put_conv(f"conv{fch}-s", sw["conv"])
            put_bn(f"conv{fch}-s_bn", sw["bn"])
            for b in range(3):
                bw = sw[f"res_{b}"]
                put_conv(f"res{si}_{b}_branch_2a", bw["conv_2a"])
                put_bn(f"res{si}_{b}_branch_2a_bn", bw["bn_2a"])
                put_conv(f"res{si}_{b}_branch_2b", bw["conv_2b"])
                put_bn(f"res{si}_{b}_branch_2b_bn", bw["bn_2b"])
        put_conv("affine", w["affine"])

    variables = import_deepspeaker_h5(str(path))

    T = 32  # divisible by 16; even at every stage -> asymmetric pads
    x = (0.5 * rng.standard_normal((2, T, 64, 1))).astype(np.float32)
    golden = _torch_rescnn(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), w).numpy()
    got = np.asarray(jax.jit(ResCNN().apply)(variables, jnp.asarray(x)))
    assert got.shape == golden.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-4)
