"""bench.py outage hardening (VERDICT r3 #1): an unreachable TPU must
degrade the artifact to a stale-marked copy of the last steady state, never
erase it. These tests drive emit_stale/probe_device directly (no TPU)."""

import importlib
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def _capture_stdout(fn, capsys):
    fn()
    return capsys.readouterr().out.strip().splitlines()


def test_emit_stale_uses_last_steady(tmp_path, monkeypatch, capsys):
    rec = {"metric": "train_samples_per_sec", "value": 1.4e6, "unit": "samples/s",
           "vs_baseline": 0.014, "commit": "abc1234"}
    p = tmp_path / "last_steady.json"
    p.write_text(json.dumps(rec))
    monkeypatch.setattr(bench, "_STEADY_PATHS", (p,))
    lines = _capture_stdout(lambda: bench.emit_stale("test outage"), capsys)
    doc = json.loads(lines[-1])
    assert doc["value"] == 1.4e6
    assert doc["stale"] is True
    assert doc["stale_reason"] == "test outage"
    assert doc["stale_source"] == "last_steady.json"
    assert doc["commit"] == "abc1234"  # provenance of the ORIGINAL capture


def test_emit_stale_falls_through_to_committed_copy(tmp_path, monkeypatch, capsys):
    missing = tmp_path / "nope.json"
    committed = tmp_path / "bench_steady.json"
    committed.write_text(json.dumps({"metric": "train_samples_per_sec", "value": 7.0e5}))
    monkeypatch.setattr(bench, "_STEADY_PATHS", (missing, committed))
    doc = json.loads(_capture_stdout(lambda: bench.emit_stale("x"), capsys)[-1])
    assert doc["value"] == 7.0e5
    assert doc["stale_source"] == "bench_steady.json"


def test_emit_stale_without_any_record_still_emits_json(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_STEADY_PATHS", (tmp_path / "a.json", tmp_path / "b.json"))
    doc = json.loads(_capture_stdout(lambda: bench.emit_stale("no record"), capsys)[-1])
    assert doc["value"] is None
    assert doc["stale"] is True


def test_probe_exhaustion_exits_zero_with_stale_artifact(tmp_path, monkeypatch, capsys):
    """Probe failure path: patience exhausted -> stale artifact + exit 0
    (the r3 failure mode was exit 3 with NO artifact)."""
    rec = tmp_path / "last_steady.json"
    rec.write_text(json.dumps({"metric": "train_samples_per_sec", "value": 1.0e6}))
    monkeypatch.setattr(bench, "_STEADY_PATHS", (rec,))
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    monkeypatch.setenv("NGP_BENCH_PATIENCE", "0")

    import subprocess

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=120)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as e:
        bench.probe_device()
    assert e.value.code == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["value"] == 1.0e6 and doc["stale"] is True


def test_repo_has_committed_steady_record():
    """The committed fallback exists and is a plausible steady record, so a
    fresh machine with an empty .evidence can still degrade gracefully."""
    p = Path(bench.__file__).resolve().parent / "bench_steady.json"
    doc = json.loads(p.read_text())
    assert doc["metric"] == "train_samples_per_sec"
    assert doc["value"] and doc["value"] > 0
    assert "commit" in doc and "captured_at" in doc
