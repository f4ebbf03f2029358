"""Supervisor-side logic of bench.py (no TPU, no subprocesses).

bench.py's measurement children need the chip, but the supervisor's
batch-point sweep (VERDICT r3 #3: report best-batch serving throughput in
detail) has selection/skip logic that must hold regardless of backend:
one child process per batch size, best point picked by scenes/sec, and the
sweep suppressed on A/B variant runs (kernel-route env overrides active)
so the A/B matrix stays one-variable-at-a-time.
"""

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


class _FakeProc:
    def __init__(self, stdout):
        self.stdout = stdout


def _fake_run_factory(records, calls):
    def fake_run(argv, **kwargs):
        calls.append(argv)
        b = int(argv[-1])
        if b not in records:
            raise subprocess.TimeoutExpired(argv, kwargs.get("timeout", 0))
        return _FakeProc("noise line\n" + json.dumps(records[b]) + "\n")
    return fake_run


def test_batch_sweep_picks_best_point(monkeypatch):
    records = {
        1: {"e2e_ms_per_scene": 6.0, "scenes_per_sec": 166.0},
        8: {"e2e_ms_per_scene": 3.2, "scenes_per_sec": 312.5},
    }
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run_factory(records, calls))
    monkeypatch.setenv("S4G_BENCH_BATCH_POINTS", "1,8")
    result = {"detail": {"backend": "tpu"}}
    bench._measure_batch_points(result, deadline_each=10)
    assert [c[-1] for c in calls] == ["1", "8"]
    assert result["detail"]["best_batch"] == 8
    assert result["detail"]["best_batch_scenes_per_sec"] == 312.5
    assert result["detail"]["batch_points"][1]["e2e_ms_per_scene"] == 6.0


def test_batch_sweep_survives_failed_point(monkeypatch):
    # A hung/failed batch child (TimeoutExpired) drops that point only.
    records = {4: {"e2e_ms_per_scene": 4.0, "scenes_per_sec": 250.0}}
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run_factory(records, calls))
    monkeypatch.setenv("S4G_BENCH_BATCH_POINTS", "4,8")
    result = {"detail": {}}
    bench._measure_batch_points(result, deadline_each=10)
    assert result["detail"]["best_batch"] == 4
    assert set(result["detail"]["batch_points"]) == {4}


def test_batch_sweep_skipped_on_ab_variant_runs(monkeypatch):
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run_factory({}, calls))
    monkeypatch.setenv("S4G_BENCH_BATCH_POINTS", "8")
    monkeypatch.setenv("S4G_MLP_IMPL", "xla")   # an A/B override
    result = {"detail": {}}
    bench._measure_batch_points(result, deadline_each=10)
    assert calls == [] and "batch_points" not in result["detail"]


def test_batch_sweep_disabled_by_empty_points(monkeypatch):
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run_factory({}, calls))
    monkeypatch.setenv("S4G_BENCH_BATCH_POINTS", "")
    result = {}
    bench._measure_batch_points(result, deadline_each=10)
    assert calls == [] and "detail" not in result
