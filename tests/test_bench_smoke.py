"""The bench matrix is a driver deliverable (BENCH_r*.json records one
JSON line per BASELINE.md config): if a refactor breaks a config, the
round's artifact silently loses rows. `bench.py --smoke` executes every
config end-to-end at tiny shapes — this pins that the full matrix still
runs and emits well-formed lines (numbers are NOT meaningful: smoke
lines carry detail.smoke=true)."""

import json
import sys

EXPECTED_METRICS = {
    "e2e_text_to_waveform_rtf",
    "batched_synthesis_rtf",
    "noisy_ref_style_transfer_rtf",
    "mix_and_match_32combo_rtf",
    "train_mel_frames_per_sec",
    "preprocess_throughput_rtf",
    "istft_single_rtf",
    "int8_vocoder_single_rtf",
    # compact full-matrix recap emitted as the FINAL line so the
    # driver's 4 KB output tail always carries every number
    "summary",
}


def test_bench_smoke_emits_full_matrix(monkeypatch, capsys):
    monkeypatch.setenv("STYLER_TPU_NO_COMPILE_CACHE", "1")
    monkeypatch.setattr(sys, "argv", ["bench.py", "--smoke"])
    import bench

    monkeypatch.setattr(bench, "_SMOKE", False)  # main() must set it
    bench.main()
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    by_metric = {l["metric"]: l for l in lines}
    assert set(by_metric) == EXPECTED_METRICS
    for line in lines:
        assert line["value"] > 0
        assert line["unit"]
        assert "vs_baseline" in line
        if line["metric"] != "summary":
            # smoke numbers must be unmistakable as non-measurements
            assert line["detail"]["smoke"] is True
    # the summary must be the LAST line and recap every other metric
    assert lines[-1]["metric"] == "summary"
    assert lines[-1]["smoke"] is True
    assert set(lines[-1]["all"]) == EXPECTED_METRICS - {"summary"}
