"""Per-stage metrics middleware (ServiceMiddleware analog)."""

import pyarrow as pa
import ray


def test_instrumented_stage_reports(ray_session):
    import ray.data

    from dataflowkit_ray.metrics import MetricsActor, instrument

    actor = MetricsActor.remote()

    def double(t: pa.Table) -> pa.Table:
        return pa.concat_tables([t, t])

    ds = ray.data.range(1000).map_batches(
        instrument(double, "double", actor), batch_format="pyarrow"
    )
    n = ds.count()
    assert n == 2000
    import time

    # fire-and-forget pushes drain asynchronously; a fixed 0.5 s sleep
    # flaked when the box was loaded from earlier tests — poll instead
    deadline = time.monotonic() + 15
    while True:
        rep = ray.get(actor.report.remote())
        if rep.get("double", {}).get("rows_in", 0) >= 1000 or (
            time.monotonic() > deadline
        ):
            break
        time.sleep(0.2)
    assert rep["double"]["rows_in"] == 1000
    assert rep["double"]["rows_out"] == 2000
    assert rep["double"]["batches"] >= 1
