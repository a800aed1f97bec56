"""Window assignment + two-phase aggregates, checked against brute-force
pandas on the same data (golden-invariant style, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dataflowkit_ray.stages.windows import (
    assign_sessions,
    assign_sliding,
    assign_tumbling,
    salted_distinct_docs,
    sessionize_table,
    topk_sources,
    windowed_sum,
)
from dataflowkit_ray.tokenize import load_token_stream


def _tbl(seqs, n_toks=None, sources=None):
    n = len(seqs)
    return pa.table(
        {
            "doc_id": pa.array([str(s) for s in seqs]),
            "event_seq": pa.array(seqs, type=pa.int64()),
            "n_tok": pa.array(n_toks or [1] * n, type=pa.int32()),
            "source": pa.array(sources or ["s"] * n),
        }
    )


def test_tumbling_assignment():
    t = assign_tumbling(_tbl([0, 31, 32, 63, 64]), size=32)
    assert t["window_id"].to_pylist() == [0, 0, 1, 1, 2]


def test_sliding_cover_property():
    # every (row, window) pair where the window range covers the seq — and
    # nothing else
    seqs = list(range(0, 130, 7))
    size, slide = 64, 32
    t = assign_sliding(_tbl(seqs), size=size, slide=slide)
    got = set(zip(t["event_seq"].to_pylist(), t["window_id"].to_pylist()))
    exp = {
        (s, w)
        for s in seqs
        for w in range(0, s // slide + 1)
        if w * slide <= s < w * slide + size
    }
    assert got == exp


def test_sliding_tumbling_equivalence():
    seqs = list(range(100))
    slid = assign_sliding(_tbl(seqs), size=32, slide=32)
    tumb = assign_tumbling(_tbl(seqs), size=32)
    assert sorted(zip(slid["event_seq"].to_pylist(), slid["window_id"].to_pylist())) == sorted(
        zip(tumb["event_seq"].to_pylist(), tumb["window_id"].to_pylist())
    )


def test_session_gap_merge():
    # multi-key, shuffled input: sessionize_table is order-independent
    t = pa.table(
        {
            "event_seq": [16, 0, 30, 3, 4, 15, 2, 50],
            "source": ["s", "s", "s", "s", "s", "s", "z", "z"],
        }
    )
    out = sessionize_table(t, gap=5, key_col="source", clock_col="event_seq")
    got = sorted(
        zip(out["source"].to_pylist(), out["event_seq"].to_pylist(), out["session_id"].to_pylist())
    )
    assert got == [
        ("s", 0, 0),
        ("s", 3, 0),
        ("s", 4, 0),
        ("s", 15, 15),
        ("s", 16, 15),
        ("s", 30, 30),
        ("z", 2, 2),
        ("z", 50, 50),
    ]


def test_session_single_and_empty():
    one = pa.table({"event_seq": [42], "source": ["s"]})
    assert sessionize_table(one, 5, "source", "event_seq")["session_id"].to_pylist() == [42]
    empty = pa.table({"event_seq": pa.array([], pa.int64()), "source": pa.array([], pa.string())})
    assert len(sessionize_table(empty, 5, "source", "event_seq")) == 0


def test_windowed_sum_matches_pandas(sf_dir):
    import ray.data

    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_tumbling(b, 32), batch_format="pyarrow"
    )
    got = windowed_sum(ds).to_pandas().sort_values(["source", "window_id"]).reset_index(drop=True)

    raw = load_token_stream(sf_dir).to_pandas()
    raw["window_id"] = raw.event_seq // 32
    exp = (
        raw.groupby(["source", "window_id"])
        .agg(sum_n_tok=("n_tok", "sum"), n_rows=("n_tok", "count"))
        .reset_index()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"sum_n_tok": "int64", "n_rows": "int64"}),
        exp.astype({"sum_n_tok": "int64", "n_rows": "int64"}),
        check_dtype=False,
    )


def test_salted_distinct_counts_each_doc_once(sf_dir):
    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_tumbling(b, 32), batch_format="pyarrow"
    )
    # small batches force cross-batch duplicates of (key, salt) partials
    out = salted_distinct_docs(ds, n_salts=4, batch_size=64).to_pandas()
    assert out.n_distinct_docs.sum() == 500  # every doc in exactly one window


def test_topk_sources(sf_dir):
    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_tumbling(b, 32), batch_format="pyarrow"
    )
    agg = windowed_sum(ds)
    top = topk_sources(agg, k=3).to_pandas()
    assert len(top) == 3
    assert top.total_n_tok.is_monotonic_decreasing
    raw = load_token_stream(sf_dir).to_pandas()
    exp = raw.groupby("source").n_tok.sum().sort_values(ascending=False)
    assert top.total_n_tok.tolist() == exp.head(3).tolist()


def test_hash_agg_mean(ray_session):
    """mean rides the shuffle as (sum, count) partials; division happens
    once per key in phase 2."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.agg import hash_agg

    rng = np.random.RandomState(5)
    t = pa.table(
        {
            "k": pa.array([f"g{int(x)}" for x in rng.randint(0, 9, 2000)]),
            "v": pa.array(rng.randint(0, 100, 2000).astype(np.int64)),
        }
    )
    got = (
        hash_agg(
            ray.data.from_arrow(t).repartition(6),
            ("k",),
            [("v", "mean", "avg_v"), ("v", "sum", "sum_v")],
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    exp = t.to_pandas().groupby("k").v.agg(["mean", "sum"])
    assert np.allclose(got.avg_v, exp["mean"])
    assert (got.sum_v == exp["sum"]).all()
