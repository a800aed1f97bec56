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
def test_streaming_runner_tailing_soak(ray_session, tmp_path):
    """Continuous ingest: a new file lands in the inbox on (almost)
    every epoch for ~30 epochs — the 100 TB tail-a-directory shape.
    Committed output must equal the batch run over the union, per-epoch
    time must stay flat, and the watermark must never regress."""
    import pandas as pd
    import pyarrow.parquet as pq

    from dataflowkit_ray.runner import StreamingRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
    from tests.test_runner import _expected, _read_out

    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    n_files = 30
    per = len(t) // n_files
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    slices = [
        t.slice(i * per, per if i < n_files - 1 else len(t) - (n_files - 1) * per)
        for i in range(n_files)
    ]
    pq.write_table(slices[0], str(inbox / "f0000.parquet"))

    times: list[float] = []
    timer = _epoch_timer(times)
    dropped = [1]

    def hook(epoch, info):
        timer(epoch, info)
        if dropped[0] < n_files:
            i = dropped[0]
            pq.write_table(slices[i], str(inbox / f"f{i:04d}.parquet"))
            dropped[0] += 1

    wd = str(tmp_path / "run")
    r = StreamingRunner(
        [str(inbox / "f0000.parquet")], wd,
        chunks_per_epoch=1, target_rows=25,
        discover=f"{inbox}/*.parquet",
    )
    summary = r.run(on_epoch=hook)
    assert dropped[0] == n_files  # every file really landed mid-run
    assert len(times) >= 25
    assert summary["late_rows"] == 0
    assert summary["open_windows"] == 0
    # watermark monotone across every committed epoch
    sink = ExactlyOnceSink(f"{wd}/out")
    wms = [
        sink.manifest(e)["watermark_event"] for e in sink.committed_epochs()
    ]
    assert len(wms) >= 25 and wms == sorted(wms)
    got = _read_out(wd)
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    assert _flatness(times) < 3.0


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
