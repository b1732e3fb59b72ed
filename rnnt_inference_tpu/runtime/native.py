"""ctypes bindings for the native mini-loadgen (csrc/rnnt_loadgen.cpp).

Builds the shared library on first use (g++ -O2 -shared); falls back
gracefully if a compiler is unavailable.  No pybind11 — plain C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "csrc", "rnnt_loadgen.cpp")
# built artifact lives under csrc/build/ (gitignored; never commit the .so)
_SO = os.path.join(_REPO_ROOT, "csrc", "build", "librnnt_loadgen.so")

_lib = None
_lock = threading.Lock()
_build_error_reported = False


def _build() -> str:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    proc = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"native loadgen build failed (g++ exit {proc.returncode}):\n"
            f"{proc.stderr.strip()}"
        )
    return _SO


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_error_reported
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as exc:
            # a broken compile must be loud, not a silent feature downgrade;
            # report the compiler stderr once per process
            if not _build_error_reported:
                _build_error_reported = True
                import sys

                print(
                    f"[rnnt_inference_tpu] native loadgen unavailable: {exc}",
                    file=sys.stderr,
                    flush=True,
                )
            return None
        lib.lg_create.restype = ctypes.c_void_p
        lib.lg_create.argtypes = [
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_int64,
            ctypes.c_double,
        ]
        lib.lg_destroy.argtypes = [ctypes.c_void_p]
        lib.lg_poll.restype = ctypes.c_int
        lib.lg_poll.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int64,
        ]
        lib.lg_complete.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.lg_mark_deferred.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        for name in ("lg_completed", "lg_issued", "lg_pending", "lg_done_issuing",
                     "lg_n_samples"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.lg_report.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


class NativeLoadGen:
    """Native issue thread + latency recorder.

    mode: "Server" (Poisson at target_qps), "Offline" (all at t=0), or
    "SingleStream" (issue-after-complete).  Queries loop over the sample set:
    query q refers to sample q % n_samples (`sample_of`).  The issuer honors
    min_query_count AND min_duration together, like loadgen's rules.
    """

    MODES = {"Server": 0, "Offline": 1, "SingleStream": 2}

    def __init__(
        self,
        n_samples: int,
        target_qps: float,
        mode: str = "Server",
        seed: int = 0,
        min_query_count: int = 0,
        min_duration_s: float = 0.0,
    ):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loadgen unavailable (no g++?)")
        self._lib = lib
        self._h = lib.lg_create(
            n_samples, target_qps, self.MODES[mode], seed,
            min_query_count, min_duration_s,
        )
        self.n = n_samples

    def sample_of(self, query_id: int) -> int:
        return query_id % self.n

    def poll(self, max_n: int = 64, timeout_us: int = 1000) -> List[int]:
        """Pull up to max_n pending QUERY ids."""
        buf = (ctypes.c_int64 * max_n)()
        k = self._lib.lg_poll(self._h, buf, max_n, timeout_us)
        return [int(buf[i]) for i in range(k)]

    def complete(self, query_id: int) -> None:
        self._lib.lg_complete(self._h, query_id)

    def mark_deferred(self, query_id: int) -> None:
        """Flag a QoS-deferred query: its completion is excluded from the
        live latency percentiles and reported separately (the reference
        drains its QoS queue only after FlushQueries — outside the measured
        window, csrc/torch_sut.cpp:384-417)."""
        self._lib.lg_mark_deferred(self._h, query_id)

    @property
    def completed(self) -> int:
        return int(self._lib.lg_completed(self._h))

    @property
    def issued(self) -> int:
        return int(self._lib.lg_issued(self._h))

    @property
    def pending(self) -> int:
        return int(self._lib.lg_pending(self._h))

    @property
    def done_issuing(self) -> bool:
        return bool(self._lib.lg_done_issuing(self._h))

    @property
    def drained(self) -> bool:
        """All issued queries completed and the issuer has finished."""
        return self.done_issuing and self.completed >= self.issued

    def report(self) -> dict:
        """Latency summary.  Percentiles cover LIVE completions only;
        QoS-deferred completions (mark_deferred) are reported separately."""
        out = (ctypes.c_double * 12)()
        self._lib.lg_report(self._h, out)
        return dict(
            completed=int(out[0]) + int(out[9]),
            completed_live=int(out[0]),
            latency_ms_mean=round(out[1], 2),
            latency_ms_p50=round(out[2], 2),
            latency_ms_p90=round(out[3], 2),
            latency_ms_p99=round(out[4], 2),
            latency_ms_max=round(out[5], 2),
            wall_seconds=round(out[6], 3),
            qps=round(out[7], 2),
            issued=int(out[8]),
            deferred_completed=int(out[9]),
            deferred_ms_mean=round(out[10], 2),
            deferred_ms_max=round(out[11], 2),
        )

    def close(self) -> None:
        if self._h:
            self._lib.lg_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
