"""Streaming runner: exactly-once, checkpoint/resume, watermark semantics.

Modeled on the reference's golden end-to-end tests plus the crash-resume
strategy SURVEY.md §5 mandates: run to completion, re-run with a mid-
stream kill + resume, and require row-identical committed output."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from dataflowkit_ray.runner import StreamingRunner
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.sources.microbatch import MicroBatchSource

SF = "/root/testdata/sf0.001"


def _read_out(work_dir) -> pd.DataFrame:
    sink = ExactlyOnceSink(f"{work_dir}/out")
    t = sink.read_committed_table()
    return (
        t.to_pandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )


def _expected(sf_dir) -> pd.DataFrame:
    """Brute-force batch oracle for the runner's windowed metrics."""
    import numpy as np

    from dataflowkit_ray.pipelines.flagship import default_pattern
    from dataflowkit_ray.stages.cep import match_pattern_batch
    from dataflowkit_ray.tokenize import tokenize_documents

    raw = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    tok = tokenize_documents(raw)
    df = tok.to_pandas()
    df["window_id"] = df.event_seq // 32
    df["n_details"] = np.maximum(1, -(-df.n_tok // 16))
    base = df.groupby(["source", "window_id"]).agg(
        sum_n_tok=("n_tok", "sum"),
        n_rows=("n_tok", "count"),
        n_details=("n_details", "sum"),
    )
    m = match_pattern_batch(default_pattern())(tok).to_pandas()
    m["window_id"] = m.event_seq // 32
    mc = m.groupby(["source", "window_id"]).size().rename("n_matches")
    out = base.join(mc, how="left").fillna(0).astype("int64").reset_index()
    return out.sort_values(["source", "window_id"]).reset_index(drop=True)


def test_source_offsets_cover_everything():
    src = MicroBatchSource(
        [f"{SF}/documents.parquet"], n_partitions=4, chunks_per_epoch=1, target_rows=64
    )
    offsets = src.initial_offsets()
    seen = 0
    wm_prev = -1
    while not src.done(offsets):
        specs, offsets = src.next_slice(offsets)
        seen += sum(s["n_rows"] for s in specs)
        wm = src.watermark(offsets)
        assert wm >= wm_prev  # monotonic
        wm_prev = wm
    assert seen == src.total_rows() == 500


def test_streaming_equals_batch(ray_session, tmp_path):
    r = StreamingRunner(
        [f"{SF}/documents.parquet"],
        str(tmp_path / "run"),
        chunks_per_epoch=1,
        target_rows=64,
    )
    summary = r.run()
    assert summary["late_rows"] == 0
    assert summary["open_windows"] == 0
    got = _read_out(tmp_path / "run")
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_crash_resume_row_identical(ray_session, tmp_path):
    full = StreamingRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "full"),
        chunks_per_epoch=1, target_rows=64,
    )
    full.run()

    crashed = StreamingRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "crash"),
        chunks_per_epoch=1, target_rows=64,
    )
    crashed.run(max_epochs=2)  # "crash" after 2 epochs
    mid = ExactlyOnceSink(f"{tmp_path}/crash/out").committed_epochs()
    assert mid == [0, 1]

    resumed = StreamingRunner(  # fresh runner over the same work_dir
        [f"{SF}/documents.parquet"], str(tmp_path / "crash"),
        chunks_per_epoch=1, target_rows=64,
    )
    resumed.run()

    a = _read_out(tmp_path / "full")
    b = _read_out(tmp_path / "crash")
    pd.testing.assert_frame_equal(a, b)
    # part files beyond the sink: byte-compare manifest row counts per epoch
    sa = ExactlyOnceSink(f"{tmp_path}/full/out")
    sb = ExactlyOnceSink(f"{tmp_path}/crash/out")
    assert sa.committed_epochs() == sb.committed_epochs()
    for e in sa.committed_epochs():
        assert sa.manifest(e)["rows"] == sb.manifest(e)["rows"]


def test_replay_epoch_rewrites_not_appends(ray_session, tmp_path):
    """Re-running a committed epoch (crash between commit and checkpoint)
    must rewrite the same parts — never duplicate rows."""
    wd = str(tmp_path / "replay")
    r1 = StreamingRunner([f"{SF}/documents.parquet"], wd, chunks_per_epoch=1, target_rows=64)
    r1.run(max_epochs=3)
    # simulate crash-after-commit-before-checkpoint: delete the LAST checkpoint
    ck = sorted(glob.glob(f"{wd}/checkpoint/epoch=*"))
    last = ck[-1]
    os.remove(os.path.join(last, "meta.json"))

    r2 = StreamingRunner([f"{SF}/documents.parquet"], wd, chunks_per_epoch=1, target_rows=64)
    r2.run()

    got = _read_out(wd)
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_ordered_readback(ray_session, tmp_path):
    from dataflowkit_ray.sinks.exactly_once import read_committed_ordered

    r = StreamingRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "ord"),
        chunks_per_epoch=1, target_rows=64,
    )
    r.run()
    sink = ExactlyOnceSink(f"{tmp_path}/ord/out")
    df = read_committed_ordered(sink, ["source", "window_id"]).to_pandas()
    assert df[["source", "window_id"]].equals(
        df[["source", "window_id"]].sort_values(["source", "window_id"]).reset_index(drop=True)
    )


def test_streaming_sliding_equals_batch(ray_session, tmp_path):
    """Sliding windows through the streaming runner == batch expansion."""
    import numpy as np

    from dataflowkit_ray.stages.windows import assign_sliding
    from dataflowkit_ray.tokenize import tokenize_documents

    size, slide = 64, 32
    r = StreamingRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "slide"),
        chunks_per_epoch=1, target_rows=64, window_size=size, slide=slide,
    )
    summary = r.run()
    assert summary["open_windows"] == 0
    got = _read_out(tmp_path / "slide")

    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    tok = assign_sliding(tokenize_documents(raw), size, slide)
    df = tok.to_pandas()
    df["n_details"] = np.maximum(1, -(-df.n_tok // 16))
    exp = (
        df.groupby(["source", "window_id"])
        .agg(sum_n_tok=("n_tok", "sum"), n_rows=("n_tok", "count"), n_details=("n_details", "sum"))
        .reset_index()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    cols = ["source", "window_id", "sum_n_tok", "n_rows", "n_details"]
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)


def test_multi_file_source_equals_batch(ray_session, tmp_path):
    """The source's cross-file chunk index (global_row_start / file bases)
    must behave exactly like one concatenated file."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    paths = []
    for i, (lo, n) in enumerate([(0, 180), (180, 200), (380, 120)]):
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t.slice(lo, n), p)
        paths.append(p)

    r = StreamingRunner(paths, str(tmp_path / "multi"), chunks_per_epoch=1, target_rows=64)
    summary = r.run()
    assert summary["open_windows"] == 0
    got = _read_out(tmp_path / "multi")
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_late_data_dropped_and_counted(ray_session, tmp_path):
    """An input file NOT sorted by the event clock produces genuinely late
    rows (event_seq below the watermark of an already-closed window).
    They must be dropped AND counted — never silently double-applied
    (SURVEY.md §2.8 late-data metric)."""
    import numpy as np

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    # deterministic interleave: reverse halves so late rows are guaranteed
    idx = np.concatenate([np.arange(250, 500), np.arange(0, 250)])
    shuffled = t.take(idx)
    p = str(tmp_path / "unsorted.parquet")
    pq.write_table(shuffled, p)

    r = StreamingRunner([p], str(tmp_path / "late"), chunks_per_epoch=1, target_rows=16)
    summary = r.run()
    assert summary["late_rows"] > 0
    got = _read_out(tmp_path / "late")
    # accounting: every input row is either in a window or counted late
    assert got.n_rows.sum() + summary["late_rows"] == 500


def test_sink_compaction_preserves_rows(ray_session, tmp_path):
    """Compaction rewrites many per-epoch parts into few files with
    identical content; later epochs commit on top and reads merge both."""
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.sinks.exactly_once import compact

    wd = str(tmp_path / "cmp")
    r = StreamingRunner([f"{SF}/documents.parquet"], wd, chunks_per_epoch=1, target_rows=64)
    r.run()
    sink = ExactlyOnceSink(f"{wd}/out")
    before = sink.read_committed_table().to_pandas().sort_values(
        ["source", "window_id"]).reset_index(drop=True)
    n_files_before = len(sink.committed_files())

    m = compact(sink)
    assert m["rows"] == len(before)
    after = sink.read_committed_table().to_pandas().sort_values(
        ["source", "window_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert len(sink.committed_files()) < n_files_before

    # a new epoch lands after compaction; reads merge compacted + new
    extra = pa.table({"source": ["zz"], "window_id": pa.array([999], pa.int64()),
                      "sum_n_tok": pa.array([1], pa.int64()), "n_rows": pa.array([1], pa.int64()),
                      "n_details": pa.array([1], pa.int64()), "n_matches": pa.array([0], pa.int64())})
    sink.commit_epoch(ray.data.from_arrow(extra), m["compacted_through"] + 1)
    assert len(sink.read_committed_table()) == len(before) + 1


def test_resume_after_compaction_keeps_absorbed_data(ray_session, tmp_path):
    """Regression: the compaction manifest must live outside the epoch
    namespace — a resumed runner's next commit previously overwrote it
    and orphaned all absorbed rows."""
    from dataflowkit_ray.sinks.exactly_once import compact

    wd = str(tmp_path / "rc")
    r = StreamingRunner([f"{SF}/documents.parquet"], wd, chunks_per_epoch=1, target_rows=16)
    r.run(max_epochs=2)
    sink = ExactlyOnceSink(f"{wd}/out")
    mid_rows = len(sink.read_committed_table())
    compact(sink)
    assert len(sink.read_committed_table()) == mid_rows

    resumed = StreamingRunner([f"{SF}/documents.parquet"], wd, chunks_per_epoch=1, target_rows=16)
    resumed.run()
    got = _read_out(tmp_path / "rc")
    exp = _expected(SF)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_shard_actor_killed_midrun_then_resume_identical(ray_session, tmp_path):
    """Worker/actor failure, not just driver crash: a state shard is
    ray.kill'ed mid-run.  State in that actor is gone, so the RUN must
    fail loudly (never commit a partial epoch); a fresh runner over the
    same work_dir then resumes from the last committed checkpoint
    (shard_pool respawns the dead pool, restore() reloads snapshots) and
    the final output is row-identical to an undisturbed run."""
    import ray

    from dataflowkit_ray.state.store import _POOLS, WindowStateShard

    full = StreamingRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "full"),
        chunks_per_epoch=1, target_rows=16,
    )
    full.run()

    victim_wd = str(tmp_path / "victim")
    r = StreamingRunner(
        [f"{SF}/documents.parquet"], victim_wd,
        chunks_per_epoch=1, target_rows=16,
    )

    # the pool persists from full.run() in this session — bind it BEFORE
    # the victim run so a hook bug (e.g. missing pool) cannot fake the
    # "run fails loudly" assertion via its own StopIteration
    cached = next(
        v for (cls, name, n), v in _POOLS.items() if cls is WindowStateShard
    )
    _session, pool = cached

    def kill_one(epoch, info):
        if epoch == 0:
            ray.kill(pool[0])

    with pytest.raises(ray.exceptions.RayActorError):
        r.run(on_epoch=kill_one)

    committed = ExactlyOnceSink(f"{victim_wd}/out").committed_epochs()
    assert committed  # something landed before the kill...
    assert len(committed) < len(
        ExactlyOnceSink(f"{tmp_path}/full/out").committed_epochs()
    )  # ...but the run really died early, nothing partial after it

    resumed = StreamingRunner(
        [f"{SF}/documents.parquet"], victim_wd,
        chunks_per_epoch=1, target_rows=16,
    )
    summary = resumed.run()
    assert summary["open_windows"] == 0

    a = _read_out(tmp_path / "full")
    b = _read_out(tmp_path / "victim")
    pd.testing.assert_frame_equal(a, b)
