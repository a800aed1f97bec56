"""Long-run soak: 50+ micro-batch epochs at sf0.1 through each
streaming runner, asserting flat per-epoch wall time (no
state-accumulation slowdown) and bounded shard-actor state.

Marked ``slow`` — a few tens of seconds each on the 4-CPU test session;
deselect with ``-m 'not slow'``.  BASELINE.md records a full run's
numbers."""

import statistics
import time

import pytest
import ray

from dataflowkit_ray.state.store import _POOLS

SF = "/root/testdata/sf0.1"


def _epoch_timer(times: list):
    last = [time.perf_counter()]

    def hook(epoch, info):
        now = time.perf_counter()
        times.append(now - last[0])
        last[0] = now

    return hook


def _flatness(times: list) -> float:
    """Late-half / early-half median per-epoch wall time (1.0 = flat).
    Epochs 1.. only (epoch 0 pays worker spawn); medians resist the
    box's multi-second stall noise."""
    body = times[1:]
    half = len(body) // 2
    return statistics.median(body[half:]) / statistics.median(body[:half])


@pytest.mark.slow
def test_streaming_runner_soak(ray_session, tmp_path):
    from dataflowkit_ray.runner import StreamingRunner

    times: list[float] = []
    r = StreamingRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "wd"),
        chunks_per_epoch=1, target_rows=25,  # 5000 rows -> 200 chunks
    )
    summary = r.run(on_epoch=_epoch_timer(times))
    assert len(times) >= 25  # genuinely a long run
    assert summary["late_rows"] == 0
    assert summary["open_windows"] == 0  # window state fully drained
    # incremental emission: windows closed DURING the run, not all at
    # the final flush (state stays bounded by the watermark)
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    sink = ExactlyOnceSink(f"{tmp_path}/wd/out")
    rows_per_epoch = [sink.manifest(e)["rows"] for e in sink.committed_epochs()]
    assert sum(1 for n in rows_per_epoch[:-1] if n > 0) >= 10
    assert rows_per_epoch[-1] < sum(rows_per_epoch) / 2
    assert _flatness(times) < 3.0  # flat modulo box noise


@pytest.mark.slow
def test_event_runner_soak(ray_session, tmp_path):
    from dataflowkit_ray.event_runner import EventStreamRunner

    times: list[float] = []
    r = EventStreamRunner(
        [f"{SF}/events.parquet"], str(tmp_path / "wd"),
        chunks_per_epoch=1, target_rows=500,  # 100k rows -> 200 chunks
    )
    summary = r.run(on_epoch=_epoch_timer(times))
    assert len(times) >= 25
    assert summary["open_sessions"] == 0  # session state fully drained
    assert summary["sessions_out"] > 0 and summary["matches_out"] > 0
    # bounded shard state mid-run is what flat timing evidences: per-epoch
    # work would grow if sessions/NFA runs accumulated
    assert _flatness(times) < 3.0


@pytest.mark.slow
def test_dedup_runner_soak_retention_bounds_state(ray_session, tmp_path):
    """The retention knob in action over 50 epochs: seen-hash state
    stays bounded (sampled mid-run from the live shard pool), evicted
    rows are emitted incrementally, and total copies are conserved."""
    import pyarrow.parquet as pq

    from dataflowkit_ray.dedup_runner import DedupStreamRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
    from dataflowkit_ray.state.dedup_store import DedupStateShard

    n_shards, retention = 4, 5
    times: list[float] = []
    peaks: list[int] = []

    def hook(epoch, info):
        _epoch_timer_hook(epoch, info)
        cached = _POOLS.get((DedupStateShard, "dedup", n_shards))
        if cached is not None and epoch % 5 == 0:
            _session, pool = cached
            stats = ray.get([s.stats.remote() for s in pool])
            peaks.append(sum(s["distinct"] for s in stats))

    _epoch_timer_hook = _epoch_timer(times)

    r = DedupStreamRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "wd"),
        n_shards=n_shards, target_rows=25,  # 5000 rows -> 200 chunks, 50 epochs
        retention_epochs=retention,
    )
    summary = r.run(on_epoch=hook)
    assert len(times) >= 25 and len(peaks) >= 5
    # state bound: at most (retention + 1) epochs' worth of fresh keys
    epoch_rows = 4 * 1 * 25 * 4  # partitions x chunks x rows... upper bound
    assert max(peaks) <= (retention + 2) * epoch_rows
    # conservation: every input row is in exactly one emitted row's count
    sink = ExactlyOnceSink(f"{tmp_path}/wd/dedup")
    out = sink.read_committed_table().to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert out.n_copies.sum() == n_docs
    # evictions really happened mid-run (not one final dump)
    non_final = [
        sink.manifest(e)["rows"] for e in sink.committed_epochs()[:-1]
    ]
    assert sum(1 for n in non_final if n > 0) >= 10
    assert _flatness(times) < 3.0
