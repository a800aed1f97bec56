"""Skew handling: a single hot source key must not break correctness of
the salted/bucketed aggregates (SURVEY.md §4: `source` is the skewed key;
salting + bucket shuffles are the mitigation)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def hot_stream(ray_session):
    """5k-row stream where 95% of rows share ONE source key."""
    import ray.data

    n = 5000
    rng_free = np.arange(n)
    src = np.where(
        rng_free % 20 == 0,
        np.char.add("cold", (rng_free % 7).astype(str)),
        "HOT",
    )
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(n)]),
            "event_seq": pa.array(np.arange(n, dtype=np.int64)),
            "n_tok": pa.array(((rng_free % 97) + 1).astype(np.int32)),
            "source": pa.array(src.tolist()),
        }
    )
    return ray.data.from_arrow(t).repartition(16), t


def test_windowed_sum_under_skew(hot_stream):
    from dataflowkit_ray.stages.windows import assign_tumbling, windowed_sum

    ds, t = hot_stream
    ds = ds.map_batches(lambda b: assign_tumbling(b, 32), batch_format="pyarrow")
    got = (
        windowed_sum(ds)
        .to_pandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["window_id"] = df.event_seq // 32
    exp = (
        df.groupby(["source", "window_id"])
        .agg(sum_n_tok=("n_tok", "sum"), n_rows=("n_tok", "count"))
        .reset_index()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_salted_distinct_under_skew(hot_stream):
    from dataflowkit_ray.stages.windows import assign_tumbling, salted_distinct_docs

    ds, t = hot_stream
    ds = ds.map_batches(lambda b: assign_tumbling(b, 32), batch_format="pyarrow")
    got = salted_distinct_docs(ds, n_salts=8, batch_size=256).to_pandas()
    # every doc unique -> distinct == rows per (source, window)
    df = t.to_pandas()
    df["window_id"] = df.event_seq // 32
    exp = df.groupby(["source", "window_id"]).doc_id.nunique()
    merged = got.set_index(["source", "window_id"]).n_distinct_docs
    assert merged.sort_index().tolist() == exp.sort_index().tolist()
    # the hot key's docs spread across salts (no single-reducer hotspot)
    assert got[got.source == "HOT"].n_distinct_docs.sum() == (df.source == "HOT").sum()


def test_salt_spreads_hot_key():
    """The salt really partitions a hot key's docs across n_salts groups."""
    from dataflowkit_ray.tokenize import fnv1a64_numpy

    h = np.arange(10_000, dtype=np.int64)
    salts = (fnv1a64_numpy(h) % np.uint64(16)).astype(np.int64)
    counts = np.bincount(salts, minlength=16)
    assert counts.min() > 0.7 * counts.mean()  # near-uniform spread
