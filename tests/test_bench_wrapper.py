"""bench.py wrapper logic (no TPU, no subprocess benches): probe-failure
emission, early headline line, variants map, budget exhaustion, retry."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (light import: no jax at module top)


def _lines(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]


def test_probe_failure_emits_parseable_error_line(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_INNER", raising=False)
    monkeypatch.setattr(bench, "_probe_backend", lambda t: False)
    bench.main()
    (out,) = _lines(capsys)
    assert out["metric"] == "hour_long_tr_video_throughput"
    assert out["value"] == 0.0 and "error" in out


def test_headline_plus_variants_combined_line(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_INNER", raising=False)
    monkeypatch.setenv("BENCH_VARIANTS", "int8,train")
    monkeypatch.setattr(bench, "_probe_backend", lambda t: True)

    def fake_variant(name, env, timeout):
        return {"metric": "m", "value": {"headline": 742.0, "int8": 800.0,
                                         "train": 113.0}[name], "unit": "u",
                "vs_baseline": 1.0}

    monkeypatch.setattr(bench, "_run_variant", fake_variant)
    bench.main()
    lines = _lines(capsys)
    # early headline line first (outer-timeout protection), then one combined
    # line per COMPLETED variant: a kill mid-variant-N still leaves variants
    # 1..N-1 on stdout (round-3 rc=124 lesson)
    assert len(lines) == 3
    assert "variants" not in lines[0] and lines[0]["value"] == 742.0
    assert list(lines[1]["variants"]) == ["int8"]
    assert lines[1]["variants"]["int8"]["value"] == 800.0
    assert "wall_s" in lines[1]["variants"]["int8"]
    combined = lines[-1]
    assert combined["value"] == 742.0
    assert combined["variants"]["int8"]["value"] == 800.0
    assert combined["variants"]["train"]["value"] == 113.0


def test_headline_retry_after_midrun_outage(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_INNER", raising=False)
    monkeypatch.setenv("BENCH_VARIANTS", "")
    monkeypatch.setattr(bench, "_probe_backend", lambda t: True)
    calls = []

    def fake_variant(name, env, timeout):
        calls.append(name)
        if len(calls) == 1:
            return {"error": "rc=1: backend died"}
        return {"metric": "m", "value": 700.0, "unit": "u", "vs_baseline": 1.0}

    monkeypatch.setattr(bench, "_run_variant", fake_variant)
    bench.main()
    assert calls == ["headline", "headline"]
    assert _lines(capsys)[-1]["value"] == 700.0


def test_budget_exhaustion_skips_variants(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_INNER", raising=False)
    monkeypatch.setenv("BENCH_VARIANTS", "int8")
    monkeypatch.setenv("BENCH_TOTAL_BUDGET_S", "0")
    monkeypatch.setattr(bench, "_probe_backend", lambda t: True)
    monkeypatch.setattr(
        bench, "_run_variant",
        lambda n, e, t: {"metric": "m", "value": 1.0, "unit": "u",
                         "vs_baseline": 1.0})
    bench.main()
    combined = _lines(capsys)[-1]
    assert "skipped" in combined["variants"]["int8"]["error"]


def test_run_variant_parses_last_json_line(tmp_path, monkeypatch):
    fake = tmp_path / "bench.py"
    fake.write_text("print('noise')\nprint('{\"value\": 7}')\n")
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(fake))
    out = bench._run_variant("x", {}, 30)
    assert out == {"value": 7}


def test_unknown_variant_reported(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_INNER", raising=False)
    monkeypatch.setenv("BENCH_VARIANTS", "nope")
    monkeypatch.setattr(bench, "_probe_backend", lambda t: True)
    monkeypatch.setattr(
        bench, "_run_variant",
        lambda n, e, t: {"metric": "m", "value": 1.0, "unit": "u",
                         "vs_baseline": 1.0})
    bench.main()
    assert _lines(capsys)[-1]["variants"]["nope"]["error"] == "unknown variant"
