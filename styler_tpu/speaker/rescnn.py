"""DeepSpeaker ResCNN speaker embedder, JAX/Flax (inference).

Parity target: reference deepspeaker/conv_models.py:22-135 (TF-Keras):
4 stages of [Conv2D k5 s2 'same' → BN → clipped-ReLU(0,20) → 3 identity
blocks], reshape [B, T/16, 4*512], temporal mean pool, Dense(512),
L2-normalize. Weights import from the Keras ``.h5`` checkpoint via
``import_deepspeaker_h5``.

Runs as jitted JAX on the same device as the acoustic model — the
reference executes it in a separate TensorFlow session/device
(embedding.py:16-23), a host boundary this rebuild eliminates.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def clipped_relu(x):
    return jnp.clip(x, 0.0, 20.0)


class IdentityBlock(nn.Module):
    filters: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.filters, (self.kernel, self.kernel), padding="SAME", name="conv_2a")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn_2a")(x)
        x = clipped_relu(x)
        x = nn.Conv(self.filters, (self.kernel, self.kernel), padding="SAME", name="conv_2b")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn_2b")(x)
        x = clipped_relu(x)
        return clipped_relu(x + inp)


class ConvResStage(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x):
        # Keras 'same' with stride 2: pad so out = ceil(in/2); flax SAME matches.
        x = nn.Conv(self.filters, (5, 5), strides=(2, 2), padding="SAME", name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        x = clipped_relu(x)
        for i in range(3):
            x = IdentityBlock(self.filters, name=f"res_{i}")(x)
        return x


class ResCNN(nn.Module):
    """[B, T, 64, 1] fbank images -> [B, 512] L2-normalized embeddings."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for stage, filters in enumerate((64, 128, 256, 512), start=1):
            x = ConvResStage(filters, name=f"stage_{stage}")(x)
        B, T, Wd, C = x.shape
        x = x.reshape(B, T, Wd * C)  # [B, T/16, 2048]
        x = x.mean(axis=1)
        x = nn.Dense(512, name="affine")(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


# ----------------------------------------------------------------------
# Keras .h5 importer
# ----------------------------------------------------------------------


def _h5_weights(h5group):
    """Extract {name: array} from a keras layer group."""
    out = {}

    def visit(name, obj):
        if hasattr(obj, "shape"):
            out[name] = np.asarray(obj)

    h5group.visititems(visit)
    return out


def import_deepspeaker_h5(h5_path: str) -> Dict:
    """Convert the Keras ResCNN checkpoint to flax (params, batch_stats).

    Keras layer names (conv_models.py): conv{f}-s / conv{f}-s_bn,
    res{stage}_{block}_branch_2a / _2a_bn / _2b / _2b_bn, affine.
    Keras Conv2D kernels are already [kh, kw, in, out] = flax layout.
    """
    import h5py

    params: Dict = {}
    stats: Dict = {}
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def layer_arrays(name):
            grp = root[name]
            return _h5_weights(grp)

        def conv(name):
            w = layer_arrays(name)
            kernel = next(v for k, v in w.items() if k.endswith("kernel:0"))
            bias = next(v for k, v in w.items() if k.endswith("bias:0"))
            return {"kernel": kernel, "bias": bias}

        def bn(name):
            w = layer_arrays(name)
            pick = lambda suffix: next(v for k, v in w.items() if k.endswith(suffix))
            return (
                {"scale": pick("gamma:0"), "bias": pick("beta:0")},
                {"mean": pick("moving_mean:0"), "var": pick("moving_variance:0")},
            )

        for stage, filters in enumerate((64, 128, 256, 512), start=1):
            sp, ss = {}, {}
            sp["conv"] = conv(f"conv{filters}-s")
            sp["bn"], ss["bn"] = bn(f"conv{filters}-s_bn")
            for block in range(3):
                bp, bs = {}, {}
                base = f"res{stage}_{block}_branch"
                bp["conv_2a"] = conv(f"{base}_2a")
                bp["bn_2a"], bs["bn_2a"] = bn(f"{base}_2a_bn")
                bp["conv_2b"] = conv(f"{base}_2b")
                bp["bn_2b"], bs["bn_2b"] = bn(f"{base}_2b_bn")
                sp[f"res_{block}"] = bp
                ss[f"res_{block}"] = bs
            params[f"stage_{stage}"] = sp
            stats[f"stage_{stage}"] = ss

        aff = layer_arrays("affine")
        params["affine"] = {
            "kernel": next(v for k, v in aff.items() if k.endswith("kernel:0")),
            "bias": next(v for k, v in aff.items() if k.endswith("bias:0")),
        }
    return {"params": params, "batch_stats": stats}
