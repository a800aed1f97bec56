"""Streaming exact-dedup runner: final state equals the batch operator;
crash-resume is bit-identical; duplicates actually span epochs."""

import pandas as pd
import pyarrow.parquet as pq

from dataflowkit_ray.dedup_runner import DedupStreamRunner
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

SF = "/root/testdata/sf0.001"


def _batch_dedup():
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    g = df.groupby("text").doc_id.agg(["min", "count"])
    return sorted(zip(g["min"].astype(int), g["count"].astype(int)))


def _read_out(wd):
    t = ExactlyOnceSink(f"{wd}/dedup").read_committed_table()
    return sorted(zip(t["doc_id"].to_pylist(), t["n_copies"].to_pylist()))


def test_streaming_dedup_equals_batch(ray_session, tmp_path):
    r = DedupStreamRunner([f"{SF}/documents.parquet"], str(tmp_path / "full"),
                          target_rows=32)
    summary = r.run()
    assert summary["epochs"] >= 4  # duplicates genuinely span epochs
    assert _read_out(tmp_path / "full") == _batch_dedup()


def test_streaming_dedup_crash_resume(ray_session, tmp_path):
    crashed = DedupStreamRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "crash"), target_rows=32
    )
    partial = crashed.run(max_epochs=2)  # mid-stream: nothing emitted yet
    assert partial["rows_out"] == 0  # dedup emits only at stream end
    assert partial["distinct"] > 0  # but state has accumulated
    resumed = DedupStreamRunner(
        [f"{SF}/documents.parquet"], str(tmp_path / "crash"), target_rows=32
    )
    resumed.run()
    assert _read_out(tmp_path / "crash") == _batch_dedup()


def test_streaming_dedup_rerun_is_idempotent(ray_session, tmp_path):
    """A re-run over a FINALIZED work dir must not re-ingest or duplicate
    output (the finalized flag short-circuits; manifests unchanged)."""
    import os

    wd = str(tmp_path / "idem")
    DedupStreamRunner([f"{SF}/documents.parquet"], wd, target_rows=32).run()
    before = _read_out(wd)
    mt = {
        f: os.stat(os.path.join(wd, "dedup", "parts", f)).st_mtime_ns
        for f in os.listdir(os.path.join(wd, "dedup", "parts"))
    }
    DedupStreamRunner([f"{SF}/documents.parquet"], wd, target_rows=32).run()
    assert _read_out(wd) == before
    for f, old in mt.items():
        assert os.stat(os.path.join(wd, "dedup", "parts", f)).st_mtime_ns == old
