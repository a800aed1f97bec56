"""Event-stream runner: sessions spanning epochs + cross-batch CEP,
checked against single-pass batch oracles; crash-resume identity."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from dataflowkit_ray.event_runner import (
    DEFAULT_EVENT_PATTERN,
    EVENT_TOKENS,
    EventStreamRunner,
)
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

SF = "/root/testdata/sf0.001"
GAP = 30 * 60 * 1_000_000


def _events_df():
    t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id", "event_type"])
    df = t.to_pandas()
    df["clock"] = df.ts.astype("int64")
    return df.sort_values(["user_id", "clock"]).reset_index(drop=True)


def _batch_sessions():
    df = _events_df()
    out = []
    for uid, g in df.groupby("user_id"):
        start = last = None
        n = 0
        for c in g.clock:
            if start is None:
                start, last, n = c, c, 1
            elif c - last > GAP:
                out.append((uid, start, last, n))
                start, last, n = c, c, 1
            else:
                last, n = c, n + 1
        if start is not None:
            out.append((uid, start, last, n))
    return sorted(out)


def _batch_matches():
    from dataflowkit_ray.stages.cep import Pattern, Step, StreamingMatcher

    steps, mode = DEFAULT_EVENT_PATTERN
    pat = Pattern(
        steps=tuple(Step(literal=s["literal"], max_gap=s.get("max_gap", 0)) for s in steps),
        mode=mode,
    )
    df = _events_df()
    out = []
    for uid, g in df.groupby("user_id"):
        m = StreamingMatcher(pat)
        for c, et in zip(g.clock, g.event_type):
            for s, e in m.feed(EVENT_TOKENS[et], int(c)):
                out.append((uid, s, e))
    return sorted(out)


def _read_sessions(wd):
    t = ExactlyOnceSink(f"{wd}/sessions").read_committed_table()
    return sorted(
        zip(t["key"].to_pylist(), t["session_id"].to_pylist(),
            t["session_end"].to_pylist(), t["n_events"].to_pylist())
    )


def _read_matches(wd):
    t = ExactlyOnceSink(f"{wd}/matches").read_committed_table()
    return sorted(
        zip(t["key"].to_pylist(), t["start_seq"].to_pylist(), t["end_seq"].to_pylist())
    )


def test_streaming_sessions_and_cep_equal_batch(ray_session, tmp_path):
    r = EventStreamRunner([f"{SF}/events.parquet"], str(tmp_path / "run"))
    summary = r.run()
    assert summary["open_sessions"] == 0  # final flush drained everything
    assert _read_sessions(tmp_path / "run") == _batch_sessions()
    matches = _read_matches(tmp_path / "run")
    assert matches == _batch_matches()
    assert len(matches) > 0  # the funnel pattern does fire on this stream


def test_event_runner_crash_resume(ray_session, tmp_path):
    full = EventStreamRunner([f"{SF}/events.parquet"], str(tmp_path / "full"))
    full.run()

    crashed = EventStreamRunner([f"{SF}/events.parquet"], str(tmp_path / "crash"))
    partial = crashed.run(max_epochs=1)  # genuinely mid-stream: source not done
    assert partial["sessions_out"] < 946  # stream not fully emitted yet
    resumed = EventStreamRunner([f"{SF}/events.parquet"], str(tmp_path / "crash"))
    resumed.run()

    assert _read_sessions(tmp_path / "full") == _read_sessions(tmp_path / "crash")
    assert _read_matches(tmp_path / "full") == _read_matches(tmp_path / "crash")


def test_sessions_actually_span_epochs(ray_session, tmp_path):
    """With 1 chunk/partition/epoch and tiny chunks, most user sessions
    span multiple epochs — the carry-over path is genuinely exercised."""
    r = EventStreamRunner(
        [f"{SF}/events.parquet"], str(tmp_path / "tiny"),
        target_rows=64, chunks_per_epoch=1,
    )
    summary = r.run()
    assert summary["epochs"] >= 4
    assert _read_sessions(tmp_path / "tiny") == _batch_sessions()


def test_multi_file_clock_watermark(ray_session, tmp_path):
    """clock_column watermark across several files (per-file base offsets)."""
    t = pq.read_table(f"{SF}/events.parquet")
    paths = []
    for i, (lo, n) in enumerate([(0, 400), (400, 350), (750, 250)]):
        p = str(tmp_path / f"ev{i}.parquet")
        pq.write_table(t.slice(lo, n), p)
        paths.append(p)
    r = EventStreamRunner(paths, str(tmp_path / "multi"))
    r.run()
    assert _read_sessions(tmp_path / "multi") == _batch_sessions()
    assert _read_matches(tmp_path / "multi") == _batch_matches()
