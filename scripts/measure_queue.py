"""Serial TPU measurement queue with outage resilience (VERDICT r3 item 1).

Round 3 lost its entire measurement program to a relay outage: each job was
a one-shot that died when ``jax.devices()`` wedged.  This queue is the fix:

  - ONE process owns the serial job list (the chip serves one job at a time;
    parallel jobs would contend and corrupt each other's timings).
  - Before every job it waits for the backend with subprocess probes +
    exponential backoff (utils/backend.py) up to a global deadline.
  - Every job runs under a hard ``timeout`` so a mid-job relay wedge costs
    the job's budget, not the queue.
  - A job that fails on backend-unavailability is retried (up to 2x) after
    the backend answers probes again; a job that fails for a real reason is
    recorded and skipped.
  - Results land in ``measurements/<name>.json`` (one record per job:
    rc, elapsed, parsed stdout JSON, stderr tail) and the queue appends a
    one-line summary per job to ``measurements/QUEUE_LOG.txt``.

The blank-bias delta calibrated by the first successful headline run is
re-played (BENCH_BLANK_DELTA=amp:delta) into every subsequent bench.py leg,
so A/B legs share the exact emission statistics of the headline run AND
skip the ~30-eval on-device bisection.

Usage: python scripts/measure_queue.py [--deadline-h H] [--only job1,job2]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rnnt_inference_tpu.utils.backend import wait_for_backend  # noqa: E402

MEAS_DIR = os.path.join(REPO, "measurements")
PY = sys.executable


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, file=sys.stderr, flush=True)
    with open(os.path.join(MEAS_DIR, "QUEUE_LOG.txt"), "a") as f:
        f.write(line + "\n")


def jobs(blank_delta):
    """The standing measurement program: headline first (calibrates the
    shared blank delta for the A/B legs), then the A/Bs."""
    bench = [PY, os.path.join(REPO, "bench.py")]
    delta_env = {"BENCH_BLANK_DELTA": blank_delta} if blank_delta else {}

    def bench_env(**kw):
        e = dict(delta_env)
        e.update(kw)
        return e

    # Round-5 program (the round-4 program completed 2026-08-19; its records
    # live in measurements/*.json and verdicts in docs/PERFORMANCE.md).
    # Legs map to VERDICT r4 items: 2 (cap-30 defense), 3 (packed skew/
    # efficiency sweep), 4 (dispatch-free Server cadence), 5 (frontend
    # phase attribution), 8 (int8 VPU probe).  The 'bucketed' leg pins
    # BENCH_PACKED=0 so the packed-vs-bucketed A/B is preserved (ADVICE r4:
    # the old 'packed' leg duplicated the now-packed-by-default headline).
    return [
        # name, argv, env overrides, timeout_s
        ("headline", bench, {}, 7200),
        ("bucketed", bench, bench_env(BENCH_PACKED="0"), 7200),
        # packed plan sweep (VERDICT r5 item 3): chunk grain 8 (the round-4
        # leg died pre-gather-fix) + decode-chunk grain ladder
        ("packed_chunk8", bench, bench_env(BENCH_PACK_CHUNK="8"), 5400),
        ("packed_dc64", bench, bench_env(BENCH_PACK_DECODE_CHUNK="64"), 5400),
        ("packed_dc256", bench, bench_env(BENCH_PACK_DECODE_CHUNK="256"), 5400),
        # cap-30 rows: protocol replay (storming) + calibrated burst model
        ("symcap30", bench, bench_env(BENCH_SYM_CAP="30", BENCH_PACKED="1"),
         5400),
        # the cap-30 burst rows: BUCKETED is the product-relevant one (the
        # auto default at the product cap); the packed variant tracks the
        # budgeted-buffer path.  Burst calibrates its own (amp, delta,
        # kappa) triple on the first leg; no blank replay.
        ("symcap30_burst", bench,
         {"BENCH_SYM_CAP": "30", "BENCH_EMISSION": "burst",
          "BENCH_PACKED": "0"}, 9000),
        ("symcap30_burst_packed", bench,
         {"BENCH_SYM_CAP": "30", "BENCH_EMISSION": "burst",
          "BENCH_PACKED": "1"}, 9000),
        # int8 encoder: plain control + bf16-transcendental VPU probe
        ("int8_plain", [PY, os.path.join(REPO, "scripts/bench_int8_bn.py"),
                        "1024", "500"], {}, 3600),
        ("int8_gate_bf16", [PY, os.path.join(REPO, "scripts/bench_int8_bn.py"),
                            "1024", "500"], {"RNNT_INT8_GATE_BF16": "1"}, 3600),
        # dispatch-free Server step cadence (replaces the dispatch-chain
        # row) + the product-cap burst variant
        ("server_cadence", [PY, os.path.join(REPO, "scripts/server_cadence.py")],
         dict(delta_env), 5400),
        ("server_cadence_burst",
         [PY, os.path.join(REPO, "scripts/server_cadence.py")],
         {"CAD_EMISSION": "burst", "CAD_SYM_CAP": "30"}, 5400),
        # frontend stage attribution (before/instead of a fused kernel)
        ("features_phases", [PY,
                             os.path.join(REPO, "scripts/bench_features_phases.py"),
                             "1024", "15"], {}, 5400),
    ]


BLANK_RE = re.compile(r"blank-bias: using amp=([0-9.]+) delta=(-?[0-9.]+)")


def run_job(name, argv, env_over, timeout_s, global_deadline):
    """Run one job under `timeout`; return (status, record)."""
    env = dict(os.environ)
    env.update(env_over)
    # the queue owns backend waiting; jobs themselves should fail fast
    env.setdefault("BENCH_DEADLINE_S", "600")
    t0 = time.time()
    try:
        r = subprocess.run(
            argv, env=env, cwd=REPO, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        rc, out, err = r.returncode, r.stdout, r.stderr
    except subprocess.TimeoutExpired as e:
        rc = -9
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        err += f"\n[queue] job killed at {timeout_s}s timeout"
    elapsed = time.time() - t0

    parsed = None
    for line in reversed([l for l in out.splitlines() if l.strip()]):
        try:
            parsed = json.loads(line)
            break
        except ValueError:
            continue
    record = {
        "name": name,
        "argv": argv,
        "env": env_over,
        "rc": rc,
        "elapsed_s": round(elapsed, 1),
        "result": parsed,
        "stdout_tail": out[-2000:],
        "stderr_tail": err[-4000:],
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    unavailable = (
        "backend unavailable" in err
        or "never came up" in err
        or (parsed is not None and "unavailable" in str(parsed.get("error", "")))
        or rc == -9  # a hard-timeout mid-outage is indistinguishable; retry
    )
    status = "ok" if rc == 0 and parsed is not None and not parsed.get("stale") \
        else ("outage" if unavailable else "failed")
    return status, record, err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-h", type=float, default=10.0)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    os.makedirs(MEAS_DIR, exist_ok=True)
    t_end = time.monotonic() + args.deadline_h * 3600
    blank_delta = os.environ.get("BENCH_BLANK_DELTA")
    only = set(args.only.split(",")) if args.only else None

    done = set()
    attempts = {}
    log(f"queue start: deadline {args.deadline_h:.1f}h, "
        f"{len(jobs(blank_delta))} jobs")
    while True:
        pending = [j for j in jobs(blank_delta)
                   if j[0] not in done and attempts.get(j[0], 0) < 3
                   and (only is None or j[0] in only)]
        if not pending:
            break
        remaining = t_end - time.monotonic()
        if remaining <= 0:
            log(f"queue deadline reached; pending: {[j[0] for j in pending]}")
            break
        name, argv, env_over, timeout_s = pending[0]
        log(f"waiting for backend (job={name}, "
            f"{remaining / 3600:.1f}h left)...")
        if not wait_for_backend(min(remaining, 3600 * 3), log=log):
            continue  # deadline loop re-checks; probes again
        attempts[name] = attempts.get(name, 0) + 1
        log(f"run {name} (attempt {attempts[name]}, timeout {timeout_s}s)")
        status, record, full_err = run_job(
            name, argv, env_over, min(timeout_s, max(60, t_end - time.monotonic())),
            t_end)
        with open(os.path.join(MEAS_DIR, f"{name}.json"), "w") as f:
            json.dump(record, f, indent=1)
        val = (record["result"] or {}).get("value")
        log(f"{name}: {status} rc={record['rc']} {record['elapsed_s']}s "
            f"value={val}")
        if status == "ok":
            done.add(name)
            if name == "headline" and blank_delta is None:
                # last match wins: the calibration logs one line per amp
                # candidate, then a final "using amp=A delta=D"
                m = None
                for m in BLANK_RE.finditer(full_err):
                    pass
                if m:
                    blank_delta = f"{m.group(1)}:{m.group(2)}"
                    log(f"captured blank delta {blank_delta} for A/B legs")
        elif status == "failed":
            done.add(name)  # real failure: record it, don't burn retries
            log(f"{name}: recorded failure (see measurements/{name}.json)")
        # status == "outage": loop back, wait for backend, retry

    log(f"queue finished: {len(done)} jobs recorded")


if __name__ == "__main__":
    main()
