"""Backend-probe resilience (VERDICT r3 item 6).

Simulates a relay outage that recovers: the probe command fails N times
then succeeds, and wait_for_backend must keep retrying with backoff and
return True — the round-3 failure mode (one probe, then give up) is the
regression these tests pin.  bench.py's stale-fallback emission is
exercised end-to-end through a subprocess with the probe mocked dead.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rnnt_inference_tpu.utils.backend import probe_backend, wait_for_backend


def _counter_probe_cmd(tmp_path, succeed_after: int) -> str:
    cnt = tmp_path / "cnt"
    cnt.write_text("0")
    # POSIX sh: bump the counter, succeed once it reaches the threshold
    return (
        f"n=$(cat {cnt}); n=$((n+1)); echo $n > {cnt}; "
        f"[ $n -ge {succeed_after} ]"
    )


def test_probe_recovers_after_outage(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "RNNT_PROBE_CMD", _counter_probe_cmd(tmp_path, succeed_after=3)
    )
    msgs = []
    ok = wait_for_backend(
        deadline_s=30.0, probe_timeout_s=5.0,
        initial_backoff_s=0.01, max_backoff_s=0.05, log=msgs.append,
    )
    assert ok
    assert int((tmp_path / "cnt").read_text()) == 3
    assert any("retrying" in m for m in msgs)


def test_probe_gives_up_at_deadline(tmp_path, monkeypatch):
    monkeypatch.setenv("RNNT_PROBE_CMD", "false")
    msgs = []
    ok = wait_for_backend(
        deadline_s=0.2, probe_timeout_s=5.0,
        initial_backoff_s=0.05, max_backoff_s=0.05, log=msgs.append,
    )
    assert not ok
    assert any("gave up" in m for m in msgs)


def test_probe_timeout_kills_wedged_child(monkeypatch):
    # a probe that blocks forever (the relay-outage signature) must cost
    # exactly the timeout, not hang
    monkeypatch.setenv("RNNT_PROBE_CMD", "sleep 3600")
    ok, detail = probe_backend(timeout_s=0.3)
    assert not ok
    assert "blocked" in detail


@pytest.mark.parametrize("with_last_good", [False, True])
def test_bench_stale_fallback(tmp_path, with_last_good):
    """bench.py under a dead backend: one JSON line on stdout — the explicit
    zero/error record, or the last-known-good re-emitted with stale=true."""
    last_good = tmp_path / "last_good.json"
    if with_last_good:
        last_good.write_text(json.dumps({
            "metric": "offline_audio_seconds_per_second",
            "value": 70347.0, "unit": "audio-s/s", "vs_baseline": 1.513,
            "measured_at": "2026-08-17T12:00:00",
        }))
    env = dict(
        os.environ,
        RNNT_PROBE_CMD="false",
        BENCH_DEADLINE_S="0.2",
        BENCH_LAST_GOOD_PATH=str(last_good),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, timeout=120,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "offline_audio_seconds_per_second"
    if with_last_good:
        assert r.returncode == 0
        assert payload["stale"] is True
        assert payload["value"] == 70347.0
        assert "unavailable" in payload["error"]
    else:
        assert r.returncode == 1
        assert payload["value"] == 0
        assert "unavailable" in payload["error"]
