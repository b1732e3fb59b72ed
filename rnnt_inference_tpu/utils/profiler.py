"""Tracing / profiling utilities.

Replaces the reference's ProfileRecord RAII chrome-trace wrapper
(reference: csrc/utils.hpp:24-40, armed for the first --profiler_iter
iterations) with jax.profiler traces plus a lightweight host-side batch
timeline that never reaches into harness internals (the reference pokes
loadgen's private SampleMetadata, csrc/utils.cpp:9-19 — explicitly avoided).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None or the
    backend doesn't support profiling (relayed TPU tunnels may not)."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@dataclass
class BatchTimeline:
    """Host-side per-batch event log -> chrome-trace JSON."""

    events: List[dict] = field(default_factory=list)
    _t0: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def span(self, name: str, **meta):
        start = time.time()
        yield
        end = time.time()
        self.events.append(
            dict(
                name=name,
                ph="X",
                ts=(start - self._t0) * 1e6,
                dur=(end - start) * 1e6,
                pid=0,
                tid=0,
                args=meta,
            )
        )

    def mark(self, name: str, **meta):
        self.events.append(
            dict(
                name=name,
                ph="i",
                ts=(time.time() - self._t0) * 1e6,
                pid=0,
                tid=0,
                s="g",
                args=meta,
            )
        )

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events}, f)
