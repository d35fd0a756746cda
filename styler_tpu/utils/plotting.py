"""Plotting / monitoring utilities.

Functional re-expression of the reference's matplotlib monitoring surface
(reference utils.py:73-220): mel+f0+energy overlay panels, single
spectrogram plots, duration-alignment heatmaps, and figure->numpy
conversion for TensorBoard image channels.

All functions take plain numpy arrays (host-side; call `np.asarray` on JAX
arrays first) and use the Agg backend so they are safe in headless jobs.
"""

from __future__ import annotations

import io
from typing import Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def alignment_2d_from_durations(durations: np.ndarray, mel_len: int | None = None) -> np.ndarray:
    """Binary (mel_len, src_len) alignment matrix from integer phoneme
    durations (reference utils.py:73-84 semantics): frame t aligns to the
    phoneme whose cumulative-duration span contains t."""
    durations = np.asarray(durations, dtype=np.int64)
    total = int(durations.sum())
    n = total if mel_len is None else int(mel_len)
    # frame -> phoneme index via cumsum searchsorted
    ends = np.cumsum(durations)
    frames = np.arange(n)
    idx = np.searchsorted(ends, frames, side="right")
    idx = np.clip(idx, 0, len(durations) - 1)
    out = np.zeros((n, len(durations)), dtype=np.float32)
    out[frames, idx] = 1.0
    return out


def plot_mel_f0_energy(
    data: Sequence[tuple[np.ndarray, np.ndarray, np.ndarray]],
    titles: Sequence[str] | None = None,
):
    """Stacked panels, one per (mel[T,80], f0[T], energy[T]) triple, with
    f0 (Hz) on a left twin axis and energy on a right twin axis overlaid
    on the mel image (reference utils.py:103-149 surface)."""
    n = len(data)
    if titles is None:
        titles = [f"panel {i}" for i in range(n)]
    fig, axes = plt.subplots(n, 1, squeeze=False, figsize=(8, 2.4 * n))
    for i, (mel, f0, energy) in enumerate(data):
        mel = np.asarray(mel)
        if mel.shape[0] < mel.shape[-1]:  # accept (80,T) too
            mel = mel.T
        ax = axes[i][0]
        ax.imshow(mel.T, origin="lower", aspect="auto", interpolation="none")
        ax.set_title(titles[i], fontsize=8)
        ax.set_xlim(0, mel.shape[0])
        ax.tick_params(labelsize=6)
        if f0 is not None:
            ax1 = ax.twinx()
            ax1.plot(np.asarray(f0), color="tomato", linewidth=0.7)
            ax1.set_ylabel("F0 (Hz)", color="tomato", fontsize=6)
            ax1.tick_params(labelsize=5, colors="tomato")
        if energy is not None:
            ax2 = ax.twinx()
            ax2.plot(np.asarray(energy), color="darkviolet", linewidth=0.7)
            ax2.spines["right"].set_position(("axes", 1.08))
            ax2.set_ylabel("Energy", color="darkviolet", fontsize=6)
            ax2.tick_params(labelsize=5, colors="darkviolet")
    fig.tight_layout()
    return fig


def plot_spectrogram(mel: np.ndarray, title: str = ""):
    """Single mel-spectrogram image (reference utils.py:159-178 surface)."""
    mel = np.asarray(mel)
    if mel.shape[0] > mel.shape[-1]:  # accept (T,80)
        mel = mel.T
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(mel, origin="lower", aspect="auto", interpolation="none")
    if title:
        ax.set_title(title, fontsize=8)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig


def plot_alignment(alignment: np.ndarray, title: str = ""):
    """Duration-alignment heatmap, mel frames x phonemes (reference
    utils.py:181-220 surface)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(np.asarray(alignment).T, origin="lower", aspect="auto", interpolation="none")
    ax.set_xlabel("mel frames")
    ax.set_ylabel("phonemes")
    if title:
        ax.set_title(title, fontsize=8)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig


def figure_to_array(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to an (H, W, 3) uint8 array for
    TensorBoard image logging (reference utils.py:152-156 surface)."""
    buf = io.BytesIO()
    fig.savefig(buf, format="raw", dpi=fig.dpi)
    buf.seek(0)
    w, h = fig.canvas.get_width_height()
    img = np.frombuffer(buf.getvalue(), dtype=np.uint8).reshape(h, w, 4)[..., :3]
    plt.close(fig)
    return img


def save_figure(fig, path: str) -> None:
    fig.savefig(path)
    plt.close(fig)
