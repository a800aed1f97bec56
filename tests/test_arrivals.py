"""Runtime file discovery: files that land MID-RUN are ingested and the
committed stream output equals the batch result over the union.

The reference's core streaming behavior is discovering new work while it
runs — ``paginate`` enqueues pages found mid-crawl
(``/root/reference/scrape/scrape.go:378-445``).  The engine analog is
``MicroBatchSource.rescan()`` between epochs over a ``discover`` glob.
"""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq

from dataflowkit_ray.runner import StreamingRunner
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.sources.microbatch import MicroBatchSource
from tests.test_runner import SF, _expected, _read_out


def _split_docs(tmp_path, name_a="part-000.parquet", name_b="part-001.parquet"):
    """documents.parquet split at the midpoint (doc order preserved, so
    the second half is a clock-consistent tail arrival)."""
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    half = len(t) // 2
    pq.write_table(t.slice(0, half), str(inbox / name_a))
    return str(inbox), str(inbox / name_a), (str(inbox / name_b), t.slice(half))


def test_rescan_appends_stable_tail(tmp_path):
    """rescan() must append new files' chunks WITHOUT renumbering existing
    chunks (seq routes partitions; global_row_start is the event clock)."""
    inbox, first, (late_path, late_tbl) = _split_docs(tmp_path)
    src = MicroBatchSource(
        [first], n_partitions=4, target_rows=64, discover=f"{inbox}/*.parquet"
    )
    before = list(src.chunks)
    assert src.rescan() == []  # nothing new yet
    pq.write_table(late_tbl, late_path)
    assert src.rescan() == [late_path]
    assert src.rescan() == []  # idempotent
    assert src.chunks[: len(before)] == before  # stable prefix
    new = src.chunks[len(before) :]
    assert {c.file for c in new} == {late_path}
    assert new[0].seq == len(before)
    assert new[0].global_row_start == sum(c.n_rows for c in before)
    assert src.total_rows() == 500
    # watermark stays monotone across an append: with the first half
    # fully consumed, the frontier before the arrival is total_rows(A);
    # after the arrival it must not regress below that
    before_chunks = len(before)
    offsets = [
        sum(1 for c in p if c.seq < before_chunks) for p in src.by_partition
    ]
    wm_after = src.watermark(offsets)
    assert wm_after == 250  # == total_rows of the first half, not less


def test_arrivals_mid_run_equal_batch(ray_session, tmp_path):
    """A file landing after epoch 0 is discovered, ingested, and the
    committed output is row-identical to the batch run over the union."""
    inbox, first, (late_path, late_tbl) = _split_docs(tmp_path)
    wd = str(tmp_path / "run")
    dropped = []

    def drop_late(epoch, info):
        if not dropped:
            pq.write_table(late_tbl, late_path)
            dropped.append(epoch)

    r = StreamingRunner(
        [first], wd, chunks_per_epoch=1, target_rows=64,
        discover=f"{inbox}/*.parquet",
    )
    summary = r.run(on_epoch=drop_late)
    assert dropped == [0]  # the file really landed mid-run
    assert summary["late_rows"] == 0
    assert summary["open_windows"] == 0
    got = _read_out(wd)
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_arrival_crash_resume_preserves_arrival_order(ray_session, tmp_path):
    """A late-arriving file whose NAME sorts before the first file: the
    checkpoint records arrival order, and a resumed run must rebuild the
    source in that order (a sorted rebuild would renumber every chunk —
    different partition routing and a regressed event clock)."""
    inbox, first, _ = _split_docs(tmp_path, name_a="zzz-first.parquet")
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    late_path = os.path.join(inbox, "aaa-late.parquet")
    late_tbl = t.slice(len(t) // 2)
    wd = str(tmp_path / "run")
    dropped = []

    def drop_then_crash(epoch, info):
        if not dropped:
            pq.write_table(late_tbl, late_path)
            dropped.append(epoch)

    r = StreamingRunner(
        [first], wd, chunks_per_epoch=1, target_rows=64,
        discover=f"{inbox}/*.parquet",
    )
    # "crash" two epochs after the arrival (max_epochs bounds ingest)
    r.run(max_epochs=3, on_epoch=drop_then_crash)
    assert dropped == [0]

    resumed = StreamingRunner(
        [first], wd, chunks_per_epoch=1, target_rows=64,
        discover=f"{inbox}/*.parquet",
    )
    summary = resumed.run()
    # the resumed source kept ARRIVAL order (zzz before aaa), not sort order
    assert resumed.source.files == [first, late_path]
    assert summary["late_rows"] == 0
    got = _read_out(wd)
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_event_runner_arrivals_equal_single_run(ray_session, tmp_path):
    """EventStreamRunner: the ts-ordered tail of events.parquet arriving
    mid-run yields the same sessions + matches as a no-arrival run."""
    from dataflowkit_ray.event_runner import EventStreamRunner

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "user_id", "event_type"]
    )
    half = len(ev) // 2

    # baseline: both halves known up front
    base_dir = tmp_path / "base_in"
    base_dir.mkdir()
    pq.write_table(ev.slice(0, half), str(base_dir / "a.parquet"))
    pq.write_table(ev.slice(half), str(base_dir / "b.parquet"))
    base_wd = str(tmp_path / "base")
    EventStreamRunner(
        [str(base_dir / "a.parquet"), str(base_dir / "b.parquet")],
        base_wd, chunks_per_epoch=1, target_rows=128,
    ).run()

    # arrival: b lands after the first committed epoch
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    pq.write_table(ev.slice(0, half), str(inbox / "a.parquet"))
    arr_wd = str(tmp_path / "arr")
    dropped = []

    def drop_late(epoch, info):
        if not dropped:
            pq.write_table(ev.slice(half), str(inbox / "b.parquet"))
            dropped.append(epoch)

    EventStreamRunner(
        [str(inbox / "a.parquet")], arr_wd, chunks_per_epoch=1,
        target_rows=128, discover=f"{inbox}/*.parquet",
    ).run(on_epoch=drop_late)
    assert dropped == [0]

    for sub in ("sessions", "matches"):
        a = ExactlyOnceSink(f"{base_wd}/{sub}").read_committed_table().to_pandas()
        b = ExactlyOnceSink(f"{arr_wd}/{sub}").read_committed_table().to_pandas()
        key = list(a.columns)
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
