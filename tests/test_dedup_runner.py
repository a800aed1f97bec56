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


def test_retention_burst_semantics(ray_session, tmp_path):
    """Windowed-dedup semantics are STATED, not fuzzy: duplicates closer
    than the retention window fold into one row; re-occurrences farther
    apart start a new row (emit-on-evict).  retention=None stays exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflowkit_ray.dedup_runner import DedupStreamRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    # 160 rows, 10 per epoch (4 partitions x 1 chunk x ~2-3 rows... use
    # target_rows=10 with n_partitions=4): "dup" appears at rows 0, 1
    # (same burst) and again at row 150 (>> retention epochs later)
    texts = [f"filler row {i}" for i in range(160)]
    texts[0] = texts[1] = "dup text"
    texts[150] = "dup text"
    t = pa.table(
        {
            "doc_id": pa.array(range(160), pa.int64()),
            "text": pa.array(texts),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    wd = str(tmp_path / "ret")
    DedupStreamRunner(
        [p], wd, n_shards=2, target_rows=10, retention_epochs=2
    ).run()
    out = (
        ExactlyOnceSink(f"{wd}/dedup")
        .read_committed_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_copies.sum() == 160
    dups = out[out.doc_id.isin([0, 150])]
    assert dups.doc_id.tolist() == [0, 150]  # two bursts -> two rows
    assert dups.n_copies.tolist() == [2, 1]
    assert len(out) == 159  # 157 fillers + 2 dup bursts ... = 159

    # exact mode (retention=None): one row, all three copies folded
    wd2 = str(tmp_path / "exact")
    DedupStreamRunner([p], wd2, n_shards=2, target_rows=10).run()
    out2 = (
        ExactlyOnceSink(f"{wd2}/dedup")
        .read_committed_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out2) == 158  # 157 fillers + 1 dup row
    assert out2[out2.doc_id == 0].n_copies.tolist() == [3]
