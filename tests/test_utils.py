"""Tests for plotting/monitoring utilities (SURVEY.md §2 row 26)."""

import numpy as np

from styler_tpu.utils import (
    StepTimer,
    SummaryLogger,
    alignment_2d_from_durations,
    figure_to_array,
    plot_alignment,
    plot_mel_f0_energy,
    plot_spectrogram,
)


def test_alignment_2d_from_durations():
    d = np.array([2, 0, 3, 1])
    a = alignment_2d_from_durations(d)
    assert a.shape == (6, 4)
    # each frame aligns to exactly one phoneme
    assert np.all(a.sum(axis=1) == 1)
    # column sums reproduce durations
    assert np.array_equal(a.sum(axis=0), d.astype(np.float32))
    # frames 0-1 -> phone 0, frames 2-4 -> phone 2 (phone 1 has zero dur)
    assert np.argmax(a[0]) == 0 and np.argmax(a[2]) == 2 and np.argmax(a[5]) == 3


def test_alignment_2d_padded_mel_len():
    a = alignment_2d_from_durations(np.array([1, 2]), mel_len=5)
    assert a.shape == (5, 2)
    # padded frames clamp to the last phoneme
    assert np.argmax(a[4]) == 1


def test_plots_rasterize():
    T = 32
    mel = np.random.default_rng(0).standard_normal((T, 80)).astype(np.float32)
    f0 = np.random.default_rng(1).random(T) * 300
    e = np.random.default_rng(2).random(T) * 100
    img = figure_to_array(plot_mel_f0_energy([(mel, f0, e), (mel, None, None)], ["a", "b"]))
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    img2 = figure_to_array(plot_spectrogram(mel, "spec"))
    assert img2.ndim == 3
    img3 = figure_to_array(plot_alignment(alignment_2d_from_durations(np.array([4, 4]))))
    assert img3.ndim == 3


def test_summary_logger_writes_events(tmp_path):
    lg = SummaryLogger(str(tmp_path), "train")
    lg.scalars({"mel": 1.0, "total": 2.0}, step=1)
    lg.image("align", np.zeros((4, 4, 3), dtype=np.uint8), step=1)
    lg.audio("wav", np.zeros(220), step=1)
    lg.flush()
    lg.close()
    files = list((tmp_path / "train").iterdir())
    assert files, "no event files written"


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        t.tick()
    assert len(t.times) == 3
    assert t.mean >= 0
    assert t.eta(10) == t.mean * 10
