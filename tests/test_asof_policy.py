"""As-of join (J4 latest-value-wins), LatestValueShard, per-source policy
broadcast, and the retry-with-fallback codec."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_asof_join_matches_bruteforce(ray_session):
    import ray.data

    from dataflowkit_ray.stages.asof import asof_join

    rng = np.random.RandomState(7)
    n_l, n_r = 400, 150
    lt = pa.table(
        {
            "k": pa.array(rng.randint(0, 25, n_l), pa.int64()),
            "lts": pa.array(rng.randint(0, 1000, n_l), pa.int64()),
            "payload": pa.array(np.arange(n_l), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.randint(0, 25, n_r), pa.int64()),
            "rts": pa.array(rng.randint(0, 1000, n_r), pa.int64()),
            "rv": pa.array(np.arange(n_r) * 10, pa.int64()),
        }
    )
    got = (
        asof_join(
            ray.data.from_arrow(lt).repartition(4),
            ray.data.from_arrow(rt).repartition(4),
            key="k",
            left_on="lts",
            right_on="rts",
        )
        .to_pandas()
        .sort_values(["k", "lts", "payload"])
        .reset_index(drop=True)
    )
    # brute force: per left row, right row with max rts <= lts (ties ->
    # the engine picks the lexsort-last; make rts unique per key to avoid
    # tie ambiguity in the oracle)
    ldf, rdf = lt.to_pandas(), rt.to_pandas()
    rdf = rdf.sort_values(["k", "rts"]).drop_duplicates(["k", "rts"], keep="last")
    rows = []
    for _, lrow in ldf.iterrows():
        cand = rdf[(rdf.k == lrow.k) & (rdf.rts <= lrow.lts)]
        if len(cand):
            best = cand.iloc[-1]
            rows.append((lrow.k, lrow.lts, lrow.payload, best.rts, best.rv))
    exp = (
        pd.DataFrame(rows, columns=["k", "lts", "payload", "rts", "rv"])
        .sort_values(["k", "lts", "payload"])
        .reset_index(drop=True)
    )
    # engine may keep duplicate (k, rts) rights; compare on the joined
    # rts value only (rv ambiguous under exact duplicates)
    assert len(got) == len(exp)
    for col in ["k", "lts", "payload", "rts"]:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_latest_value_shard(ray_session):
    import ray

    from dataflowkit_ray.state.store import (
        LatestValueShard,
        bytes_to_table,
        table_to_bytes,
    )

    s = LatestValueShard.remote()
    t1 = pa.table(
        {
            "key": pa.array([1, 2], pa.int64()),
            "clock": pa.array([10, 20], pa.int64()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    ray.get(s.put_batch.remote(table_to_bytes(t1)))
    # older clock must NOT overwrite; newer must
    t2 = pa.table(
        {
            "key": pa.array([1, 2], pa.int64()),
            "clock": pa.array([5, 30], pa.int64()),
            "value": pa.array([99.0, 3.0], pa.float64()),
        }
    )
    ray.get(s.put_batch.remote(table_to_bytes(t2)))
    q = pa.table({"key": pa.array([1, 2, 3], pa.int64())})
    out = bytes_to_table(ray.get(s.lookup.remote(table_to_bytes(q))))
    assert out["key"].to_pylist() == [1, 2]
    assert out["value"].to_pylist() == [1.0, 3.0]
    # snapshot/restore round trip
    snap = ray.get(s.snapshot.remote())
    s2 = LatestValueShard.remote()
    ray.get(s2.restore.remote(snap))
    out2 = bytes_to_table(ray.get(s2.lookup.remote(table_to_bytes(q))))
    assert out2.equals(out)


def test_source_policy_filter(ray_session):
    from dataflowkit_ray.stages.policy import policy_for_source, source_policy_filter
    from dataflowkit_ray.tokenize import load_token_stream

    ds = load_token_stream(SF)
    df_all = ds.to_pandas()
    got = source_policy_filter(load_token_stream(SF)).to_pandas()
    exp = df_all[
        df_all.apply(lambda r: r.n_tok >= policy_for_source(r.source), axis=1)
    ]
    assert len(got) == len(exp)
    assert set(got.doc_id) == set(exp.doc_id)


def test_fallback_reader(ray_session, tmp_path):
    """A chunk whose primary codec raises is re-read through the fallback
    (the base->chrome retry, scrape.go:231-239)."""
    import pyarrow.parquet as pq

    from dataflowkit_ray.sources.microbatch import (
        MicroBatchSource,
        _parquet_chunk_reader,
    )

    f = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(100), pa.int64())}), f
    )

    def flaky(spec, columns):
        if spec["seq"] == 1:
            raise IOError("simulated codec failure")
        return _parquet_chunk_reader(spec, columns)

    # without fallback: the epoch read raises
    src = MicroBatchSource([f], n_partitions=2, target_rows=25, reader=flaky)
    specs, _ = src.next_slice(src.initial_offsets())
    with pytest.raises(Exception):
        src.read_epoch(specs).count()

    # with fallback: full row coverage
    src2 = MicroBatchSource(
        [f],
        n_partitions=2,
        target_rows=25,
        reader=flaky,
        fallback_reader=_parquet_chunk_reader,
    )
    specs2, off2 = src2.next_slice(src2.initial_offsets())
    got = src2.read_epoch(specs2).to_pandas()
    assert sorted(got.doc_id) == list(range(100))


def test_throttle_stage_caps_rate(ray_session):
    """ST6: the throttle is identity on data and enforces the rate cap."""
    import time

    import ray.data

    from dataflowkit_ray.stages.policy import throttle

    t = pa.table({"x": pa.array(range(200), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(2)
    t0 = time.time()
    out = throttle(ds, rows_per_sec=400.0, concurrency=1).to_pandas()
    elapsed = time.time() - t0
    assert sorted(out.x) == list(range(200))
    assert elapsed >= 0.45  # 200 rows at 400 rows/s via one actor
