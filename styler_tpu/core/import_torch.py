"""PyTorch → Flax weight importers.

Converts the reference's checkpoints into this package's parameter trees:

- STYLER acoustic model: ``checkpoint_<step>.pth.tar`` with ``['model']``
  carrying a DataParallel ``module.`` prefix (reference train.py:221-224,
  synthesize.py:61-66).
- HiFi-GAN generator: ``generator_universal.pth.tar`` ``['generator']``
  with weight-norm ``weight_g``/``weight_v`` pairs that are folded here
  (the reference calls remove_weight_norm at load, utils.py:261).

Layout transforms:
  Linear  [out, in]      -> kernel [in, out]
  Conv1d  [out, in, k]   -> kernel [k, in, out]
  ConvT1d [in, out, k]   -> kernel [k, in, out], k-axis flipped
  Embedding, LSTM, LayerNorm/GroupNorm/BatchNorm: direct copies
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def strip_module_prefix(state: Dict) -> Dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }


def linear(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def conv1d(sd, key):
    return {
        "kernel": _np(sd[f"{key}.weight"]).transpose(2, 1, 0),
        "bias": _np(sd[f"{key}.bias"]),
    }


def norm(sd, key):
    """LayerNorm / GroupNorm / BatchNorm affine params."""
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def lstm_params(sd, key, num_layers=2):
    layers = {}
    for layer in range(num_layers):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            for ours, theirs in (
                ("w_ih", "weight_ih"),
                ("w_hh", "weight_hh"),
                ("b_ih", "bias_ih"),
                ("b_hh", "bias_hh"),
            ):
                layers[f"l{layer}_{direction}_{ours}"] = _np(
                    sd[f"{key}.{theirs}_l{layer}{suffix}"]
                )
    return layers


def channel_up(sd, key):
    """Sequential(Linear, ReLU, Linear, ReLU) -> ChannelUp fc1/fc2."""
    return {"fc1": linear(sd, f"{key}.0"), "fc2": linear(sd, f"{key}.2")}


def fft_block(sd, key):
    return {
        "slf_attn": {
            "w_qs": linear(sd, f"{key}.slf_attn.w_qs"),
            "w_ks": linear(sd, f"{key}.slf_attn.w_ks"),
            "w_vs": linear(sd, f"{key}.slf_attn.w_vs"),
            "fc": linear(sd, f"{key}.slf_attn.fc"),
            "layer_norm": norm(sd, f"{key}.slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": conv1d(sd, f"{key}.pos_ffn.w_1"),
            "w_2": conv1d(sd, f"{key}.pos_ffn.w_2"),
            "layer_norm": norm(sd, f"{key}.pos_ffn.layer_norm"),
        },
    }


def style_predictor(sd, key):
    return {
        "conv1d_1": conv1d(sd, f"{key}.conv_layer.conv1d_1.conv"),
        "layer_norm_1": norm(sd, f"{key}.conv_layer.layer_norm_1"),
        "conv1d_2": conv1d(sd, f"{key}.conv_layer.conv1d_2.conv"),
        "layer_norm_2": norm(sd, f"{key}.conv_layer.layer_norm_2"),
        "linear_layer": linear(sd, f"{key}.linear_layer"),
    }


def aug_classifier(sd, key):
    return {
        "d_fc1": linear(sd, f"{key}.classifier.d_fc1"),
        "d_bn1": norm(sd, f"{key}.classifier.d_bn1"),
        "d_fc2": linear(sd, f"{key}.classifier.d_fc2"),
    }


def conv_branch(sd, key, n_layers=3):
    out = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = conv1d(sd, f"{key}.{i}.0.conv")
        out[f"gn_{i}"] = norm(sd, f"{key}.{i}.1")
    return out


def import_styler_state(torch_state: Dict, config) -> Tuple[Dict, Dict]:
    """torch state dict (STYLER) -> (params, batch_stats) flax trees."""
    sd = strip_module_prefix(torch_state)

    sm = "style_modeling"
    se = f"{sm}.style_encoder"
    ae = f"{se}.audio_encoder"

    text_encoder = {"src_word_emb": _np(sd[f"{se}.text_encoder.src_word_emb.weight"])}
    for i in range(config.encoder_layer):
        text_encoder[f"layer_{i}"] = fft_block(sd, f"{se}.text_encoder.layer_stack.{i}")

    audio_encoder = {
        "convs_d": conv_branch(sd, f"{ae}.convolutions_1"),
        "convs_p": conv_branch(sd, f"{ae}.convolutions_2"),
        "convs_e": conv_branch(sd, f"{ae}.convolutions_3"),
        "convs_r": conv_branch(sd, f"{ae}.convolutions_4"),
        "lstm_d": lstm_params(sd, f"{ae}.lstm_1"),
        "lstm_p": lstm_params(sd, f"{ae}.lstm_2"),
        "lstm_e": lstm_params(sd, f"{ae}.lstm_3"),
        "lstm_r": lstm_params(sd, f"{ae}.lstm_4"),
    }

    style_modeling = {
        "text_encoder": text_encoder,
        "audio_encoder": audio_encoder,
        "text_linear_down": linear(sd, f"{se}.text_linear_down.0"),
        "speaker_linear_p": linear(sd, f"{se}.speaker_linear_p.0"),
        "speaker_linear": linear(sd, f"{se}.speaker_linear.0"),
        "augmentation_classifier_d": aug_classifier(sd, f"{sm}.augmentation_classifier_d"),
        "augmentation_classifier_p": aug_classifier(sd, f"{sm}.augmentation_classifier_p"),
        "augmentation_classifier_e": aug_classifier(sd, f"{sm}.augmentation_classifier_e"),
        "duration_linear": channel_up(sd, f"{sm}.duration_linear"),
        "pitch_linear": channel_up(sd, f"{sm}.pitch_linear"),
        "energy_linear": channel_up(sd, f"{sm}.energy_linear"),
        "residual_linear": channel_up(sd, f"{sm}.residual_linear"),
        "text_linear_up": linear(sd, f"{sm}.text_linear_up.0"),
        "duration_predictor": style_predictor(sd, f"{sm}.duration_predictor"),
        "pitch_predictor": style_predictor(sd, f"{sm}.pitch_predictor"),
        "energy_predictor": style_predictor(sd, f"{sm}.energy_predictor"),
        "pitch_embedding": {"embedding": _np(sd[f"{sm}.pitch_embedding.weight"])},
        "energy_embedding": {"embedding": _np(sd[f"{sm}.energy_embedding.weight"])},
        # pitch_norm_linear (reference modules.py:254-257) is dead weight —
        # never called in any forward path; intentionally not imported.
    }

    decoder = {}
    for i in range(config.decoder_layer):
        decoder[f"layer_{i}"] = fft_block(sd, f"decoder.layer_stack.{i}")

    postnet_params, postnet_stats = {}, {}
    for i in range(5):
        postnet_params[f"conv_{i}"] = conv1d(sd, f"postnet.convolutions.{i}.0.conv")
        postnet_params[f"bn_{i}"] = norm(sd, f"postnet.convolutions.{i}.1")
        postnet_stats[f"bn_{i}"] = {
            "mean": _np(sd[f"postnet.convolutions.{i}.1.running_mean"]),
            "var": _np(sd[f"postnet.convolutions.{i}.1.running_var"]),
        }

    params = {
        "style_modeling": style_modeling,
        "decoder": decoder,
        "mel_linear": linear(sd, "mel_linear"),
        "postnet": postnet_params,
    }
    batch_stats = {"postnet": postnet_stats}
    return params, batch_stats


# ----------------------------------------------------------------------
# HiFi-GAN
# ----------------------------------------------------------------------


def _fold_weight_norm(sd: Dict, key: str) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except 0."""
    if f"{key}.weight" in sd:
        return _np(sd[f"{key}.weight"])
    g = _np(sd[f"{key}.weight_g"])
    v = _np(sd[f"{key}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm_v = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / norm_v


def _wn_conv1d(sd, key):
    return {
        "kernel": _fold_weight_norm(sd, key).transpose(2, 1, 0),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _wn_convtranspose1d(sd, key):
    # torch [in, out, k] -> ours [k, in, out] with the kernel axis flipped
    # (transposed conv == conv over dilated input with flipped kernel)
    w = _fold_weight_norm(sd, key)
    return {
        "kernel": w.transpose(2, 0, 1)[::-1].copy(),
        "bias": _np(sd[f"{key}.bias"]),
    }


def import_hifigan_state(torch_state: Dict, config=None) -> Dict:
    """torch 'generator' state dict -> flax params for vocoder.Generator."""
    from styler_tpu.vocoder.hifigan import HiFiGANConfig

    cfg = config or HiFiGANConfig()
    sd = strip_module_prefix(torch_state)
    params = {"conv_pre": _wn_conv1d(sd, "conv_pre"), "conv_post": _wn_conv1d(sd, "conv_post")}
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = _wn_convtranspose1d(sd, f"ups.{i}")
        for j in range(num_kernels):
            flat = i * num_kernels + j
            block = {}
            for c in range(len(cfg.resblock_dilation_sizes[j])):
                block[f"convs1_{c}"] = _wn_conv1d(sd, f"resblocks.{flat}.convs1.{c}")
                block[f"convs2_{c}"] = _wn_conv1d(sd, f"resblocks.{flat}.convs2.{c}")
            params[f"resblocks_{i}_{j}"] = block
    return params


# ----------------------------------------------------------------------
# MelGAN (descriptinc/melgan-neurips)
# ----------------------------------------------------------------------


def import_melgan_state(torch_state: Dict, config=None) -> Dict:
    """torch.hub melgan-neurips state dict -> flax params for
    vocoder.MelGANGenerator.

    The hub checkpoint is an nn.Sequential named ``model`` (optionally
    nested under the MelVocoder wrapper's ``mel2wav.`` prefix). Layout
    per stage i with n_residual_layers R: conv-transpose at index
    3 + i*(2+R), residual blocks right after; head conv at index 1,
    tail conv at 2 + len(ratios)*(2+R) + 2. All convs weight-normalized
    (folded here, like the reference's remove_weight_norm at load).
    """
    from styler_tpu.vocoder.melgan import MelGANConfig

    cfg = config or MelGANConfig()
    sd = {
        (k[len("mel2wav."):] if k.startswith("mel2wav.") else k): v
        for k, v in strip_module_prefix(torch_state).items()
    }
    R = cfg.n_residual_layers
    params = {"conv_in": _wn_conv1d(sd, "model.1")}
    for i in range(len(cfg.ratios)):
        base = 3 + i * (2 + R)
        params[f"ups_{i}"] = _wn_convtranspose1d(sd, f"model.{base}")
        for j in range(R):
            blk = f"model.{base + 1 + j}"
            params[f"res_{i}_{j}"] = {
                "conv_dilated": _wn_conv1d(sd, f"{blk}.block.2"),
                "conv_1x1": _wn_conv1d(sd, f"{blk}.block.4"),
                "shortcut": _wn_conv1d(sd, f"{blk}.shortcut"),
            }
    tail = 2 + len(cfg.ratios) * (2 + R) + 2
    params["conv_out"] = _wn_conv1d(sd, f"model.{tail}")
    return params


# ----------------------------------------------------------------------
# WaveGlow (nvidia/DeepLearningExamples torchhub)
# ----------------------------------------------------------------------


def import_waveglow_state(torch_state: Dict, config=None) -> Dict:
    """torch WaveGlow state dict -> flax params for vocoder.WaveGlow.

    Handles both WN conditioning variants (fused ``cond_layer`` and the
    older per-layer ``cond_layers.{i}``, concatenated into the fused
    layout), folds weight norm everywhere, and stores each invertible
    1x1 conv *pre-inverted* (torch inverts lazily at first infer,
    glow.py Invertible1x1Conv.forward(reverse=True)).
    """
    from styler_tpu.vocoder.waveglow import WaveGlowConfig

    cfg = config or WaveGlowConfig()
    sd = strip_module_prefix(torch_state)
    params = {
        "upsample_kernel": _wn_convtranspose1d(sd, "upsample")["kernel"],
        "upsample_bias": _np(sd["upsample.bias"]),
    }
    for k in range(cfg.n_flows):
        w = _fold_weight_norm(sd, f"convinv.{k}.conv")[:, :, 0]
        params[f"convinv_{k}"] = np.linalg.inv(w).astype(np.float32)

        wn_key = f"WN.{k}"
        wn = {
            "start": _wn_conv1d(sd, f"{wn_key}.start"),
            "end": _wn_conv1d(sd, f"{wn_key}.end"),
        }
        if f"{wn_key}.cond_layer.bias" in sd or f"{wn_key}.cond_layer.weight_v" in sd:
            wn["cond_layer"] = _wn_conv1d(sd, f"{wn_key}.cond_layer")
        else:  # per-layer conditioning: concat on the output-channel axis
            kernels, biases = [], []
            for i in range(cfg.wn_layers):
                c = _wn_conv1d(sd, f"{wn_key}.cond_layers.{i}")
                kernels.append(c["kernel"])
                biases.append(c["bias"])
            wn["cond_layer"] = {
                "kernel": np.concatenate(kernels, axis=-1),
                "bias": np.concatenate(biases, axis=-1),
            }
        for i in range(cfg.wn_layers):
            wn[f"in_layer_{i}"] = _wn_conv1d(sd, f"{wn_key}.in_layers.{i}")
            wn[f"res_skip_{i}"] = _wn_conv1d(sd, f"{wn_key}.res_skip_layers.{i}")
        params[f"wn_{k}"] = wn
    return params
