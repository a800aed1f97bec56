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

    time.sleep(0.5)  # fire-and-forget pushes drain
    rep = ray.get(actor.report.remote())
    assert rep["double"]["rows_in"] == 1000
    assert rep["double"]["rows_out"] == 2000
    assert rep["double"]["batches"] >= 1
