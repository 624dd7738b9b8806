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


def test_relay_puts_json_line_last_within_driver_tail_window(
    bench, monkeypatch, capsys
):
    """Round-4 regression (BENCH_r04.json parsed: null): the child's stderr
    (jax platform warnings, move advisories) was relayed AFTER the JSON
    summary, pushing its head out of the driver's 2,000-char tail window.

    Contract: on a successful child run the summary JSON must be the LAST
    bytes of combined output — stderr noise flushed first — and short
    enough that ``tail -c 2000`` of the merged stream still contains the
    whole line."""
    summary = json.dumps(
        {
            "metric": "m",
            "value": 22442.8,
            "unit": "steps/s",
            "vs_baseline": 219.79,
            "extra": {"stored_steps_per_sec": 20017.2, "mfu": 0.61},
        }
    )
    noisy_stdout = "some progress line\n" + summary + "\n"
    noisy_stderr = (
        "WARNING: Platform 'axon' is experimental\n"
        + "UserWarning: StretchMove under RJ is not advised\n" * 40
    )

    def fake_run(argv, env=None, **kwargs):
        return subprocess.CompletedProcess(
            argv, 0, noisy_stdout, noisy_stderr
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda *_: None)
    assert bench._supervise() == 0

    captured = capsys.readouterr()
    # stdout carries ONLY the summary line
    assert captured.out.strip() == summary
    # progress lines + child stderr were rerouted to stderr (before stdout)
    assert "some progress line" in captured.err
    # driver simulation: stderr is written and flushed before the stdout
    # print, so a merged capture sees err-then-out; the summary must
    # survive a 2,000-char tail of that merged stream
    merged = captured.err + captured.out
    tail = merged[-2000:]
    assert json.loads(tail.strip().splitlines()[-1])["value"] == 22442.8


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
