"""Resumable partitioned output: re-runs skip committed shards, replace
interrupted ones, and the read-back equals the one-shot transform."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from dataflowkit_ray.sinks.resumable import (
    finished_shards,
    list_input_shards,
    read_committed,
    resumable_shard_map,
    write_partitioned,
)


def _make_input(tmp_path, n_rows=120, row_group_size=25):
    t = pa.table(
        {
            "doc_id": pa.array(range(n_rows), pa.int64()),
            "text": [f"doc number {i} body" for i in range(n_rows)],
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p, row_group_size=row_group_size)
    return p, t


def _double_id_fn():
    # returned as a closure: cloudpickle ships it by value, since the
    # tests module isn't importable on Ray workers
    def _double_id(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "twice": pc.multiply(t["doc_id"], 2),
            }
        )

    return _double_id


def _mtimes(out_dir):
    return {
        f: os.stat(os.path.join(out_dir, f)).st_mtime_ns
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    }


def test_shard_map_end_to_end_and_noop_rerun(ray_session, tmp_path):
    p, t = _make_input(tmp_path)
    out = str(tmp_path / "out")
    assert len(list_input_shards(p)) == 5  # 120 rows / 25 per group

    r1 = resumable_shard_map(p, out, _double_id_fn())
    assert r1 == {"processed": 5, "skipped": 0, "rows": 120}

    back = read_committed(out).to_pandas().sort_values("doc_id")
    assert back.twice.tolist() == [2 * i for i in range(120)]

    m1 = _mtimes(out)
    r2 = resumable_shard_map(p, out, _double_id_fn())
    assert r2 == {"processed": 0, "skipped": 5, "rows": 120}
    assert _mtimes(out) == m1  # untouched: no read, no write


def test_shard_map_resumes_only_pending(ray_session, tmp_path):
    p, _ = _make_input(tmp_path)
    out = str(tmp_path / "out")
    resumable_shard_map(p, out, _double_id_fn())
    m1 = _mtimes(out)

    # shard 1: clean loss (part+marker gone); shard 3: interrupted write
    # (part exists, marker missing) — must be REWRITTEN, not trusted
    os.remove(os.path.join(out, "done-00001.json"))
    os.remove(os.path.join(out, "part-00001.parquet"))
    os.remove(os.path.join(out, "done-00003.json"))

    r = resumable_shard_map(p, out, _double_id_fn())
    assert r == {"processed": 2, "skipped": 3, "rows": 120}
    m2 = _mtimes(out)
    assert m2["part-00003.parquet"] > m1["part-00003.parquet"]
    for f in ("part-00000.parquet", "part-00002.parquet", "part-00004.parquet"):
        assert m2[f] == m1[f]
    back = read_committed(out).to_pandas().sort_values("doc_id")
    assert back.twice.tolist() == [2 * i for i in range(120)]
    assert sorted(finished_shards(out)) == [0, 1, 2, 3, 4]


def test_write_partitioned_resume_skips_committed(ray_session, tmp_path):
    t = pa.table(
        {
            "k": pa.array([i % 37 for i in range(500)], pa.int64()),
            "v": pa.array(range(500), pa.int64()),
        }
    )
    out = str(tmp_path / "out")
    r1 = write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=8)
    assert r1["rows"] == 500 and r1["skipped"] == 0
    m1 = _mtimes(out)
    n_parts_written = r1["processed"]

    victim = sorted(finished_shards(out))[0]
    os.remove(os.path.join(out, f"done-{victim:05d}.json"))
    r2 = write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=8)
    assert r2["processed"] == 1
    assert r2["skipped"] == n_parts_written - 1
    assert r2["rows"] == 500
    m2 = _mtimes(out)
    for f, old in m1.items():
        if f != f"part-{victim:05d}.parquet":
            assert m2[f] == old

    back = read_committed(out).to_pandas()
    assert sorted(back.v.tolist()) == list(range(500))


def test_shard_map_refuses_changed_input(ray_session, tmp_path):
    """Markers pin (path, row_group); resuming over a different input
    list must raise, not silently skip wrong shards."""
    import pytest

    p, _ = _make_input(tmp_path)
    out = str(tmp_path / "out")
    resumable_shard_map(p, out, _double_id_fn())
    # sorts BEFORE p, shifting every shard index (a file appended AFTER
    # p in sort order is a legitimate incremental extension and resumes)
    other = tmp_path / "aaa"
    other.mkdir()
    p2, _ = _make_input(other, n_rows=50)
    with pytest.raises(ValueError, match="input set changed"):
        resumable_shard_map([p2, p], out, _double_id_fn())


def test_write_partitioned_refuses_changed_layout(ray_session, tmp_path):
    """Markers are only reusable under the same (n_parts, key_cols)
    hash modulus; resuming with a different layout must raise instead
    of silently dropping rows mapped to old-layout committed ids."""
    import pytest

    t = pa.table(
        {
            "k": pa.array([i % 37 for i in range(200)], pa.int64()),
            "v": pa.array(range(200), pa.int64()),
        }
    )
    out = str(tmp_path / "out")
    write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=8)
    with pytest.raises(ValueError, match="hash layout"):
        write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=16)
    with pytest.raises(ValueError, match="hash layout"):
        write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=4)
    with pytest.raises(ValueError, match="hash layout"):
        write_partitioned(ray.data.from_arrow(t), out, ["v"], n_parts=8)
    # resume=False recomputes under the new layout and clears stale markers
    r = write_partitioned(
        ray.data.from_arrow(t), out, ["k"], n_parts=4, resume=False
    )
    assert r["rows"] == 200 and r["skipped"] == 0
    assert max(finished_shards(out)) < 4
    # and a subsequent SAME-layout resume is a clean no-op
    r2 = write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=4)
    assert r2 == {"processed": 0, "skipped": r["processed"], "rows": 200}
