"""Checkpoint save/restore (Orbax) + reference-checkpoint loading.

Replaces the reference's ``torch.save({'model','optimizer'})`` every 10k
steps (reference train.py:221-224, hparams.py:109). Layout:

    <ckpt_dir>/<step>/   — orbax composite: params, batch_stats, opt_state

``load_reference_checkpoint`` ingests the reference's
``checkpoint_<step>.pth.tar`` (DataParallel ``module.`` prefix) through
the torch importer for parity work.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state) -> None:
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        },
        force=True,
    )
    ckptr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Largest numeric checkpoint subdirectory, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: int, state):
    """Restore into an existing (abstract or concrete) train state.
    step=-1 restores the latest checkpoint in the directory."""
    if step == -1:
        found = latest_step(ckpt_dir)
        if found is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        step = found
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = ckptr.restore(path, target=jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, target
    ))
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def save_vocoder_params(out_dir: str, step: int, params) -> str:
    """Save natively-trained vocoder generator params (cli/train_vocoder.py)
    as an orbax directory <out_dir>/<step>."""
    path = os.path.abspath(os.path.join(out_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()
    return path


def load_vocoder_params(path: str):
    """Load params saved by save_vocoder_params. A parent directory of
    numbered steps resolves to the latest step; a committed ``.npz``
    asset (save_vocoder_npz) loads directly."""
    if path.endswith(".npz"):
        return load_vocoder_npz(path)
    if os.path.isdir(path) and not os.path.basename(path).isdigit():
        step = latest_step(path)
        if step is not None:
            path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))["params"]


def _flatten_tree(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = v
    return out


def _unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def save_vocoder_npz(path: str, params) -> None:
    """Export generator params as ONE compressed .npz of float16 leaves —
    a committable repo asset (≈4x smaller than the orbax f32 dir),
    loadable with numpy alone (tools/export_vocoder_asset.py CLI)."""
    import numpy as np

    flat = {
        k: np.asarray(v).astype(np.float16)
        for k, v in _flatten_tree(params).items()
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def load_vocoder_npz(path: str):
    """Inverse of :func:`save_vocoder_npz`: .npz -> f32 flax param tree."""
    import numpy as np

    with np.load(path) as z:
        return _unflatten_tree({k: z[k].astype(np.float32) for k in z.files})


def save_acoustic_npz(path: str, params, batch_stats) -> None:
    """Export trained STYLER acoustic weights (params + PostNet
    batch_stats) as ONE compressed f16 .npz — a committable repo asset
    like the vocoder generators (the reference ships its 560k-step
    checkpoint out-of-band, README.md:14-15; we commit ours in-repo).
    Batch-stats leaves are prefixed ``__stats__/`` to keep the two
    collections separable on load."""
    import numpy as np

    flat = {
        k: np.asarray(v).astype(np.float16)
        for k, v in _flatten_tree(params).items()
    }
    flat.update({
        f"__stats__/{k}": np.asarray(v).astype(np.float16)
        for k, v in _flatten_tree(batch_stats or {}).items()
    })
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def load_acoustic_npz(path: str) -> Tuple[Any, Any]:
    """Inverse of :func:`save_acoustic_npz`: -> (params, batch_stats)
    f32 flax trees."""
    import numpy as np

    with np.load(path) as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    stats = {
        k[len("__stats__/"):]: v
        for k, v in flat.items() if k.startswith("__stats__/")
    }
    params = {
        k: v for k, v in flat.items() if not k.startswith("__stats__/")
    }
    return _unflatten_tree(params), _unflatten_tree(stats)


def load_reference_checkpoint(path: str, config) -> Tuple[Any, Any]:
    """Load a reference ``checkpoint_<step>.pth.tar`` -> (params, batch_stats)."""
    import torch

    from styler_tpu.core.import_torch import import_styler_state

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if "model" in ckpt else ckpt
    return import_styler_state(state, config)


def load_reference_hifigan(path: str):
    """Load the reference HiFi-GAN ``generator_universal.pth.tar`` -> params."""
    import torch

    from styler_tpu.core.import_torch import import_hifigan_state

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["generator"] if "generator" in ckpt else ckpt
    return import_hifigan_state(state)


def load_reference_vocoder(path: str, name: str = "HiFi-GAN"):
    """Load a torch vocoder checkpoint -> flax params, keyed on the
    reference's ``hp.vocoder`` names (reference utils.py:235-271)."""
    if name == "HiFi-GAN":
        return load_reference_hifigan(path)
    if name == "MelGAN":
        import torch

        from styler_tpu.core.import_torch import import_melgan_state

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        return import_melgan_state(state)
    if name == "WaveGlow":
        import torch

        from styler_tpu.core.import_torch import import_waveglow_state

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if not isinstance(ckpt, dict):  # torch.hub ships the module itself
            ckpt = ckpt.state_dict()
        state = ckpt.get("state_dict", ckpt)
        return import_waveglow_state(state)
    raise ValueError(f"no importer for vocoder {name!r}")
