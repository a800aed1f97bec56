"""Per-stage metrics middleware — the ServiceMiddleware / counters analog.

The reference wires logging + request/response counter middlewares around
its services (``/root/reference/parse/logging.mw.go:12-44``,
``parse/metrics.mw.go:12-40``; counters reported in the run summary,
``scrape/scrape.go:257-263``).  The engine's version: a named
:class:`MetricsActor` accumulating per-stage ``{rows_in, rows_out,
batches, cpu_s}``, fed by :func:`instrument` — a transparent wrapper
around any ``map_batches`` fn.

The actor is a detached-free named singleton per run; tasks push deltas
fire-and-forget (no backpressure on the hot path).  ``report()`` returns
the table for the run summary.
"""

from __future__ import annotations

import time

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.stages: dict[str, dict[str, float]] = {}

    def push(self, stage: str, rows_in: int, rows_out: int, cpu_s: float) -> None:
        s = self.stages.setdefault(
            stage, {"rows_in": 0, "rows_out": 0, "batches": 0, "cpu_s": 0.0}
        )
        s["rows_in"] += rows_in
        s["rows_out"] += rows_out
        s["batches"] += 1
        s["cpu_s"] += cpu_s

    def report(self) -> dict:
        return {
            k: {**v, "rows_per_cpu_s": round(v["rows_out"] / v["cpu_s"], 1) if v["cpu_s"] else None}
            for k, v in self.stages.items()
        }


def instrument(fn, stage: str, actor):
    """Wrap a map_batches fn so every call reports to the metrics actor.

    Fire-and-forget push — instrumentation never blocks the data path
    (the reference's middleware updates counters without synchronizing
    the request, ``parse/metrics.mw.go:28-38``)."""

    def wrapped(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        out = fn(batch)
        actor.push.remote(stage, len(batch), len(out), time.perf_counter() - t0)
        return out

    wrapped.__name__ = f"instrumented_{stage}"
    return wrapped
