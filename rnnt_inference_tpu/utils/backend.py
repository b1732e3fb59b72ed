"""Backend availability probing for the relayed TPU.

The relayed PJRT backend on this machine has multi-hour outages during
which ``jax.devices()`` blocks FOREVER inside the client (no error, no
timeout).  Probing must therefore happen in a THROWAWAY SUBPROCESS killed
on deadline: a blocked probe *thread* inside the caller's process holds
the backend-init lock and wedges that process's own later init, and a
wedged probe can never be retried in-process.

This is an environment-resilience layer with no reference analog (the
reference assumes a local accelerator); it exists so a transient relay
outage degrades a measurement run into a delayed one instead of a lost
one (round-3 lesson: BENCH_r03.json was an error record because the
bench gave up after one 900 s probe).

Override the probe with env ``RNNT_PROBE_CMD`` (a shell command whose
exit status 0 means "backend available") — used by tests to simulate an
outage-then-recovery without touching real hardware.
"""

import os
import subprocess
import sys
import time

# The probe child must see the real backend: neutralize CPU-forcing env
# (sitecustomize overrides JAX_PLATFORMS anyway, but be explicit) and skip
# the compilation cache (device enumeration compiles nothing).
_PROBE_SRC = (
    "import jax; ds = jax.devices(); "
    "print(jax.default_backend(), len(ds), flush=True)"
)


def probe_backend(timeout_s: float = 120.0):
    """Return (ok, detail).  Never blocks longer than timeout_s.

    ok=True means a throwaway subprocess enumerated devices within the
    deadline; detail is its stdout (backend name + device count) or the
    failure reason.  The subprocess is killed on timeout, so a wedged
    relay costs exactly timeout_s, not forever.
    """
    cmd = os.environ.get("RNNT_PROBE_CMD")
    if cmd:
        argv, shell = cmd, True
    else:
        argv, shell = [sys.executable, "-c", _PROBE_SRC], False
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    try:
        r = subprocess.run(
            argv, shell=shell, env=env, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe still blocked after {timeout_s:.0f}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()
        return False, f"probe rc={r.returncode}: {tail[-1] if tail else ''}"
    return True, (r.stdout or "").strip()


def wait_for_backend(
    deadline_s: float,
    probe_timeout_s: float = 120.0,
    initial_backoff_s: float = 20.0,
    max_backoff_s: float = 600.0,
    log=lambda m: print(m, file=sys.stderr, flush=True),
):
    """Probe with exponential backoff until the backend answers or the
    deadline passes.  Returns True iff the backend became available."""
    t_end = time.monotonic() + deadline_s
    backoff = initial_backoff_s
    attempt = 0
    while True:
        attempt += 1
        remaining = t_end - time.monotonic()
        if remaining <= 0:
            log(f"backend probe: gave up after {attempt - 1} attempts "
                f"({deadline_s:.0f}s deadline)")
            return False
        ok, detail = probe_backend(min(probe_timeout_s, max(5.0, remaining)))
        if ok:
            log(f"backend probe: available on attempt {attempt} ({detail})")
            return True
        remaining = t_end - time.monotonic()
        if remaining <= 0:
            log(f"backend probe: gave up after {attempt} attempts "
                f"({deadline_s:.0f}s deadline); last: {detail}")
            return False
        sleep = min(backoff, remaining)
        log(f"backend probe attempt {attempt}: unavailable ({detail}); "
            f"retrying in {sleep:.0f}s "
            f"({remaining:.0f}s left of {deadline_s:.0f}s deadline)")
        time.sleep(sleep)
        backoff = min(backoff * 2.0, max_backoff_s)
