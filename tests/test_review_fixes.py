"""Regression tests for the round-5 review findings: stale shard-pool
handles across Ray sessions, event-time watermark regression under
``discover=``, spec heavy_hitters ignoring declared row stages, bench
multi-file cache staleness, and two write_partitioned layout-guard
holes."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from dataflowkit_ray.errors import StateError
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.sinks.resumable import write_partitioned
from dataflowkit_ray.state.store import _POOLS, shard_pool

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------- shard_pool


def test_shard_pool_drops_pool_from_previous_ray_session(ray_session):
    """A pool cached under a different Ray session must be dropped and
    respawned WITHOUT calling into its handles — calling a stale handle
    after a shutdown/init cycle raises a plain Exception that no
    RayActorError catch can see."""
    from dataflowkit_ray.state.session_store import SessionStateShard

    pool = shard_pool(SessionStateShard, "review_fix_pool", 2, 1000)
    key = (SessionStateShard, "review_fix_pool", 2)
    session, cached = _POOLS[key]
    assert cached is pool
    # simulate a shutdown/init cycle: same handles, different session tag
    _POOLS[key] = ("stale-previous-session", pool)
    fresh = shard_pool(SessionStateShard, "review_fix_pool", 2, 1000)
    assert all(f is not o for f, o in zip(fresh, pool))
    new_session, _ = _POOLS[key]
    assert new_session == session  # re-tagged to the live session


def test_shard_pool_survives_real_shutdown_init_cycle():
    """The REAL failure mode: job ids restart from '01000000' every
    cluster, so the session tag must change across an actual
    ray.shutdown()/ray.init() cycle (gcs address does; job id does not).
    Runs in a subprocess to avoid touching the session fixture's
    cluster."""
    import subprocess
    import sys

    code = """
import ray
from dataflowkit_ray.state.session_store import SessionStateShard
from dataflowkit_ray.state.store import shard_pool

ray.init(address="local", num_cpus=2, include_dashboard=False)
p1 = shard_pool(SessionStateShard, "cycle_pool", 2, 1000)
ray.get([a.stats.remote() for a in p1])
ray.shutdown()

ray.init(address="local", num_cpus=2, include_dashboard=False)
p2 = shard_pool(SessionStateShard, "cycle_pool", 2, 1000)  # must respawn
ray.get([a.stats.remote() for a in p2])
assert all(a is not b for a, b in zip(p1, p2))
print("CYCLE_OK")
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert "CYCLE_OK" in out.stdout, out.stderr[-2000:]


# ------------------------------------------- event-time watermark lateness


def _mk_events(ts_start: int, n: int, n_users: int = 4) -> pa.Table:
    step = 60_000_000  # 1 min in micros << the 30-min session gap
    return pa.table(
        {
            "ts": pa.array(
                [ts_start + i * step for i in range(n)], pa.int64()
            ),
            "user_id": pa.array([i % n_users for i in range(n)], pa.int64()),
            "event_type": pa.array(["view"] * n),
        }
    )


def test_event_runner_old_clock_arrival_dropped_late_wm_monotone(
    ray_session, tmp_path
):
    """A discovered file whose clocks sit BEHIND the committed watermark
    must not regress the watermark or mint spurious sessions: its rows
    are dropped as late (counted in ``late_events``) and the committed
    output equals the run without the stale file."""
    from dataflowkit_ray.event_runner import EventStreamRunner

    # current stream: 512 rows well ABOVE the old file's clocks
    cur = _mk_events(ts_start=10**12, n=512)
    old = _mk_events(ts_start=0, n=128)  # strictly behind cur's min ts

    base_wd = str(tmp_path / "base")
    base_in = tmp_path / "base_in"
    base_in.mkdir()
    pq.write_table(cur, str(base_in / "cur.parquet"))
    base = EventStreamRunner(
        [str(base_in / "cur.parquet")], base_wd,
        chunks_per_epoch=1, target_rows=128,
    ).run()
    assert base["late_events"] == 0

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    pq.write_table(cur, str(inbox / "cur.parquet"))
    arr_wd = str(tmp_path / "arr")
    dropped = []

    def drop_old(epoch, info):
        # 512 rows / (4 partitions x 128 target_rows) = epoch 0 ingests
        # everything; the old file lands after that commit
        if not dropped:
            pq.write_table(old, str(inbox / "old.parquet"))
            dropped.append(epoch)

    summary = EventStreamRunner(
        [str(inbox / "cur.parquet")], arr_wd, chunks_per_epoch=1,
        target_rows=128, discover=f"{inbox}/*.parquet",
    ).run(on_epoch=drop_old)
    assert dropped == [0]
    assert summary["late_events"] == len(old)  # every stale row counted
    assert summary["open_sessions"] == 0

    # committed watermarks never regress across epochs
    sink = ExactlyOnceSink(f"{arr_wd}/sessions")
    wms = [sink.manifest(e)["watermark"] for e in sink.committed_epochs()]
    assert wms == sorted(wms)

    # sessions identical to the no-stale-file run (no spurious sessions)
    a = ExactlyOnceSink(f"{base_wd}/sessions").read_committed_table().to_pandas()
    b = sink.read_committed_table().to_pandas()
    key = list(a.columns)
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


# --------------------------------------------- spec heavy_hitters ordering


def test_spec_heavy_hitters_applies_filters(ray_session):
    """Declared filters must reach the heavy_hitters terminal (both CMS
    passes), not be silently skipped."""
    from dataflowkit_ray.spec import PipelineSpec, build_pipeline

    d = {
        "name": "hh_with_filters",
        "source": {
            "paths": [f"{SF}/documents.parquet"],
            "columns": ["doc_id", "text", "source"],
            "tokenize": False,
        },
        "filters": [
            {"column": "text", "chain": [["uppercase", None]], "out": "text"}
        ],
        "heavy_hitters": {"k": 10},
    }
    got = build_pipeline(PipelineSpec.from_json(json.dumps(d))).to_pandas()
    assert len(got) == 10
    # uppercase words prove the filter ran before the terminal
    assert all(w == w.upper() for w in got["word"])

    # equivalence vs the direct composition over pre-uppercased text
    from dataflowkit_ray.stages.sketch import cms_heavy_hitters

    def read_upper():
        import pyarrow.compute as pc

        def up(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.column_names.index("text"), "text", pc.utf8_upper(t["text"])
            )

        return ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
        ).map_batches(up, batch_format="pyarrow")

    exp = cms_heavy_hitters(read_upper(), read_upper(), k=10).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


# ------------------------------------------------- bench multi-file cache


def test_ensure_multifile_rebuilds_when_source_changes(ray_session, tmp_path):
    import bench

    sf = tmp_path / "sfx"
    sf.mkdir()
    t1 = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(40)],
            "text": ["alpha beta"] * 40,
            "source": ["s0"] * 40,
        }
    )
    pq.write_table(t1, str(sf / "documents.parquet"))
    dst = bench._ensure_multifile(str(sf), n_parts=4)
    n1 = sum(
        pq.read_metadata(os.path.join(dst, "documents", f)).num_rows
        for f in os.listdir(f"{dst}/documents")
        if f.endswith(".parquet")
    )
    assert n1 == 40

    # regenerate the corpus with different contents: the cache must
    # rebuild, not resume over committed markers of the old corpus
    t2 = t1.slice(0, 25)
    pq.write_table(t2, str(sf / "documents.parquet"))
    dst2 = bench._ensure_multifile(str(sf), n_parts=4)
    n2 = sum(
        pq.read_metadata(os.path.join(dst2, "documents", f)).num_rows
        for f in os.listdir(f"{dst2}/documents")
        if f.endswith(".parquet")
    )
    assert n2 == 25


# ------------------------------------------ write_partitioned layout holes


def test_write_partitioned_refuses_markers_without_meta(ray_session, tmp_path):
    """Markers with no layout pin (a pre-guard directory) are
    unverifiable — resume must refuse instead of stamping the new layout
    over them."""
    out = str(tmp_path / "o")
    t = pa.table({"k": list(range(64)), "v": list(range(64))})
    write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=4)
    os.remove(os.path.join(out, "_partition_meta.json"))
    with pytest.raises(StateError, match="no .?_partition_meta"):
        write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=8)


def test_write_partitioned_fresh_run_clears_orphan_parts(ray_session, tmp_path):
    """resume=False with a smaller n_parts must delete old-layout part
    files too — glob-based readers union everything in the directory."""
    out = str(tmp_path / "o")
    t = pa.table({"k": list(range(64)), "v": list(range(64))})
    write_partitioned(ray.data.from_arrow(t), out, ["k"], n_parts=8)
    write_partitioned(
        ray.data.from_arrow(t), out, ["k"], n_parts=2, resume=False
    )
    parts = sorted(
        f for f in os.listdir(out)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    assert parts == ["part-00000.parquet", "part-00001.parquet"]
    rows = sum(pq.read_metadata(os.path.join(out, p)).num_rows for p in parts)
    assert rows == 64
