"""Structured tracing, per-stage timing, and metrics.

The reference's observability is manual ``std::chrono`` spans in the example
drivers plus ``cout`` prints at state transitions (SURVEY.md §5.1/§5.5 —
System.cc:165-179, mono_tum.cc:192-234, LocalMapping.cc:569). This module is
the real tracing layer the new framework uses instead:

* ``Tracer`` — hierarchical span timing (``with tracer.span("track")``),
  per-stage aggregate statistics (count/total/median/p90), a bounded
  structured event log (the analog of the reference's state-transition
  prints), and counters/gauges (the FrameDrawer HUD numbers).
* Chrome-trace export (``save_chrome_trace``) loadable in Perfetto /
  ``chrome://tracing``.
* Optional JAX device profiling (``jax_profile``) wrapping
  ``jax.profiler.trace`` for XLA-level inspection of the jitted stages.

A process-wide default tracer (``get_tracer()``) is used by the driver and
session layers; it is cheap when disabled (one branch per span).
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

import numpy as np


@dataclass
class SpanStats:
    count: int = 0
    total_s: float = 0.0
    samples: deque = field(default_factory=lambda: deque(maxlen=2048))

    def add(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.samples.append(dt)

    def summary(self) -> dict:
        arr = np.asarray(self.samples) if self.samples else np.zeros(1)
        return {
            "count": self.count,
            "total_s": round(self.total_s, 6),
            "mean_ms": round(float(arr.mean()) * 1e3, 3),
            "median_ms": round(float(np.median(arr)) * 1e3, 3),
            "p90_ms": round(float(np.percentile(arr, 90)) * 1e3, 3),
            "p99_ms": round(float(np.percentile(arr, 99)) * 1e3, 3),
            "max_ms": round(float(arr.max()) * 1e3, 3),
        }


class Tracer:
    """Span timing + structured events + counters. Thread-safe."""

    def __init__(self, enabled: bool = True, max_events: int = 10000):
        self.enabled = enabled
        self._lock = threading.Lock()
        self._stats: dict[str, SpanStats] = defaultdict(SpanStats)
        self._events: deque = deque(maxlen=max_events)
        self._counters: dict[str, float] = defaultdict(float)
        self._gauges: dict[str, float] = {}
        self._trace_events: list[dict] = []  # chrome trace format
        self._t0 = time.perf_counter()
        self.keep_chrome_trace = False

    # -- spans ------------------------------------------------------------
    @contextlib.contextmanager
    def span(self, name: str, **attrs) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            t1 = time.perf_counter()
            with self._lock:
                self._stats[name].add(t1 - t0)
                if self.keep_chrome_trace:
                    self._trace_events.append({
                        "name": name, "ph": "X", "pid": 0,
                        "tid": threading.get_ident() % 1000,
                        "ts": (t0 - self._t0) * 1e6,
                        "dur": (t1 - t0) * 1e6,
                        "args": attrs,
                    })

    # -- events (state-transition log, the reference's couts) -------------
    def event(self, kind: str, **fields) -> None:
        if not self.enabled:
            return
        rec = {"t": time.perf_counter() - self._t0, "kind": kind, **fields}
        with self._lock:
            self._events.append(rec)

    # -- counters / gauges (HUD numbers) -----------------------------------
    def incr(self, name: str, by: float = 1.0) -> None:
        if self.enabled:
            with self._lock:
                self._counters[name] += by

    def gauge(self, name: str, value: float) -> None:
        if self.enabled:
            with self._lock:
                self._gauges[name] = float(value)

    # -- reporting ---------------------------------------------------------
    def stage_summary(self) -> dict:
        with self._lock:
            return {k: v.summary() for k, v in sorted(self._stats.items())}

    def metrics(self) -> dict:
        with self._lock:
            return {"counters": dict(self._counters), "gauges": dict(self._gauges)}

    def events(self, kind: str | None = None) -> list[dict]:
        with self._lock:
            evs = list(self._events)
        return [e for e in evs if kind is None or e["kind"] == kind]

    def report(self) -> dict:
        return {"stages": self.stage_summary(), **self.metrics()}

    def save_report(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.report(), indent=1))

    def save_chrome_trace(self, path: str | Path) -> None:
        """Write accumulated spans in Chrome trace-event JSON (Perfetto)."""
        with self._lock:
            evs = list(self._trace_events)
        Path(path).write_text(json.dumps({"traceEvents": evs}))

    def save_events(self, path: str | Path) -> None:
        Path(path).write_text(
            "\n".join(json.dumps(e) for e in self.events()) + "\n"
        )

    def reset(self) -> None:
        with self._lock:
            self._stats.clear()
            self._events.clear()
            self._counters.clear()
            self._gauges.clear()
            self._trace_events.clear()
            self._t0 = time.perf_counter()


_default = Tracer(enabled=True)


def get_tracer() -> Tracer:
    return _default


@contextlib.contextmanager
def jax_profile(logdir: str | Path) -> Iterator[None]:
    """Device-level XLA profiling around a region (TensorBoard-loadable).
    Wraps ``jax.profiler.trace``; the in-process ``Tracer`` covers host-side
    stage timing, this covers what runs on the chip."""
    import jax

    with jax.profiler.trace(str(logdir)):
        yield
