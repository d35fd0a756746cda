"""Training observability: TensorBoard writers + profiler hooks.

The reference logs 10 scalar loss channels, alignment/mel image panels and
6 audio channels to paired train/validation TensorBoard writers every 1k
steps (reference train.py:75-82,189-219,297-332). This module provides the
same surface on top of `torch.utils.tensorboard` (CPU-only torch is in the
image) with a no-op fallback, plus `jax.profiler` trace helpers — the
TPU-era replacement for the reference's wall-clock-only timing
(reference train.py:90-101).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import deque

import numpy as np

try:  # gated: keep the trainer importable without tensorboard
    from torch.utils.tensorboard import SummaryWriter as _TorchSummaryWriter
except Exception:  # pragma: no cover
    _TorchSummaryWriter = None


class SummaryLogger:
    """Scalar/image/audio logger writing TensorBoard event files under
    `<log_path>/{train,validation}` like the reference, falling back to
    JSONL-only when tensorboard is unavailable."""

    def __init__(self, log_path: str, split: str = "train"):
        self.dir = os.path.join(log_path, split)
        os.makedirs(self.dir, exist_ok=True)
        self._writer = _TorchSummaryWriter(self.dir) if _TorchSummaryWriter else None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer:
            self._writer.add_scalar(tag, float(value), step)

    def scalars(self, values: dict, step: int, prefix: str = "loss") -> None:
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", float(v), step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self._writer:
            self._writer.add_image(tag, np.asarray(img_hwc), step, dataformats="HWC")

    def audio(self, tag: str, wav: np.ndarray, step: int, sample_rate: int = 22050) -> None:
        if self._writer:
            wav = np.asarray(wav, dtype=np.float32).reshape(-1)
            peak = np.max(np.abs(wav)) or 1.0
            self._writer.add_audio(tag, wav / max(peak, 1.0), step, sample_rate=sample_rate)

    def flush(self) -> None:
        if self._writer:
            self._writer.flush()

    def close(self) -> None:
        if self._writer:
            self._writer.close()


class StepTimer:
    """Moving-average step timer for throughput/ETA reporting (replaces the
    reference's self-resetting 20-step mean, train.py:90-101,365-371)."""

    def __init__(self, window: int = 20):
        self.times: deque[float] = deque(maxlen=window)
        self._t0 = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    def eta(self, remaining_steps: int) -> float:
        return self.mean * remaining_steps


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """`jax.profiler` trace context; no-op when log_dir is falsy. View the
    result with TensorBoard's profile plugin or xprof."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler timelines (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
