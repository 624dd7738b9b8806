"""The bench supervisor must always emit the one-JSON-line round artifact.

Guards ``bench.py``'s child-process retry logic: transient axon-tunnel
outages retry in fresh processes; a permanent outage falls back to a
flagged host-CPU run; real (non-outage) failures propagate immediately.
"""

import importlib.util
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tpu_unavailable_signatures(bench):
    assert bench._tpu_unavailable("jaxlib ... UNAVAILABLE: connection reset")
    assert bench._tpu_unavailable("RuntimeError: Unable to initialize backend")
    assert bench._tpu_unavailable("TPU backend setup/compile error")
    assert bench._tpu_unavailable("DEADLINE_EXCEEDED while awaiting")
    assert not bench._tpu_unavailable("AssertionError: moments off")


def _fake_run_factory(calls, outage_text, cpu_ok=True):
    def fake_run(argv, env=None, **kwargs):
        calls.append(dict(env))
        if env.get("ERYN_TPU_BENCH_FORCE_CPU"):
            if not cpu_ok:
                return subprocess.CompletedProcess(argv, 1, "", "cpu broke")
            line = json.dumps(
                {"metric": "m", "value": 1.0, "unit": "steps/s",
                 "vs_baseline": 0.1,
                 "extra": {"degraded": "tpu_unavailable_cpu_fallback"}}
            )
            return subprocess.CompletedProcess(argv, 0, line + "\n", "")
        return subprocess.CompletedProcess(argv, 1, "", outage_text)

    return fake_run


def test_permanent_outage_falls_back_to_flagged_cpu(bench, monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(
        subprocess, "run",
        _fake_run_factory(calls, "UNAVAILABLE: TPU backend setup/compile error"),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda *_: None)

    assert bench._supervise() == 0

    # every scheduled TPU attempt ran, then exactly one CPU fallback
    tpu_attempts = [c for c in calls if not c.get("ERYN_TPU_BENCH_FORCE_CPU")]
    cpu_attempts = [c for c in calls if c.get("ERYN_TPU_BENCH_FORCE_CPU")]
    assert len(tpu_attempts) == 6 and len(cpu_attempts) == 1
    assert all(c.get("ERYN_TPU_BENCH_CHILD") for c in calls)

    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["extra"]["degraded"] == "tpu_unavailable_cpu_fallback"


def test_real_failure_propagates_without_fallback(bench, monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(
        subprocess, "run",
        _fake_run_factory(calls, "AssertionError: posterior moments off"),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda *_: None)

    assert bench._supervise() != 0
    # broke on the FIRST non-outage failure; never tried the CPU fallback
    assert len(calls) == 1
    assert not any(c.get("ERYN_TPU_BENCH_FORCE_CPU") for c in calls)
    assert capsys.readouterr().out.strip() == ""


def test_failed_cpu_fallback_still_fails_loudly(bench, monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(
        subprocess, "run",
        _fake_run_factory(calls, "UNAVAILABLE", cpu_ok=False),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda *_: None)

    assert bench._supervise() != 0
    assert capsys.readouterr().out.strip() == ""


def test_wedged_tunnel_budget_still_reaches_cpu_fallback(
    bench, monkeypatch, capsys
):
    """Every TPU attempt hangs (TimeoutExpired) and the retry budget runs
    out — the CPU fallback must still produce the artifact."""
    calls = []

    def fake_run(argv, env=None, timeout=None, **kwargs):
        calls.append(dict(env))
        if env.get("ERYN_TPU_BENCH_FORCE_CPU"):
            line = json.dumps(
                {"metric": "m", "value": 1.0, "unit": "steps/s",
                 "vs_baseline": 0.1,
                 "extra": {"degraded": "tpu_unavailable_cpu_fallback"}}
            )
            return subprocess.CompletedProcess(argv, 0, line + "\n", "")
        raise subprocess.TimeoutExpired(argv, timeout)

    clock = {"t": 0.0}

    def fake_monotonic():
        clock["t"] += 4000.0  # every step eats more than an hour
        return clock["t"]

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda *_: None)
    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)

    assert bench._supervise() == 0
    cpu_attempts = [c for c in calls if c.get("ERYN_TPU_BENCH_FORCE_CPU")]
    assert len(cpu_attempts) == 1
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["extra"]["degraded"] == "tpu_unavailable_cpu_fallback"
