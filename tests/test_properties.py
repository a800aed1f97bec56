"""Property-based tests (hypothesis) for window assignment and session
gap-merge — the optional randomized layer SURVEY.md §5 suggests."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflowkit_ray.stages.windows import (
    assign_sliding,
    assign_tumbling,
    sessionize_table,
)

seqs_strategy = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200
)


def _tbl(seqs):
    return pa.table(
        {
            "event_seq": pa.array(seqs, pa.int64()),
            "source": pa.array(["s"] * len(seqs)),
        }
    )


@given(seqs=seqs_strategy, size=st.integers(1, 100), slide=st.integers(1, 100))
@settings(max_examples=60, deadline=None)
def test_sliding_cover_exact(seqs, size, slide):
    """(row, window) pairs == exactly the windows whose range covers the seq."""
    t = assign_sliding(_tbl(seqs), size=size, slide=slide)
    got = set(zip(t["event_seq"].to_pylist(), t["window_id"].to_pylist()))
    exp = {
        (s, w)
        for s in seqs
        for w in range(0, s // slide + 1)
        if w * slide <= s < w * slide + size
    }
    assert got == exp


@given(seqs=seqs_strategy, size=st.integers(1, 100))
@settings(max_examples=40, deadline=None)
def test_tumbling_is_sliding_with_slide_eq_size(seqs, size):
    slid = assign_sliding(_tbl(seqs), size=size, slide=size)
    tumb = assign_tumbling(_tbl(seqs), size=size)
    assert sorted(zip(slid["event_seq"].to_pylist(), slid["window_id"].to_pylist())) == sorted(
        zip(tumb["event_seq"].to_pylist(), tumb["window_id"].to_pylist())
    )


@given(
    clocks=st.lists(st.integers(0, 1000), min_size=1, max_size=100),
    keys=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=100),
    gap=st.integers(1, 50),
)
@settings(max_examples=60, deadline=None)
def test_session_invariants(clocks, keys, gap):
    n = min(len(clocks), len(keys))
    t = pa.table(
        {
            "event_seq": pa.array(clocks[:n], pa.int64()),
            "source": pa.array(keys[:n]),
        }
    )
    out = sessionize_table(t, gap=gap, key_col="source", clock_col="event_seq")
    df = out.to_pandas().sort_values(["source", "event_seq"]).reset_index(drop=True)
    for (_, g) in df.groupby("source"):
        # 1. session_id == min clock of its session
        for sid, s in g.groupby("session_id"):
            assert sid == s.event_seq.min()
        # 2. consecutive events in one session gap <= G; across sessions > G
        rows = list(g.itertuples())
        for a, b in zip(rows, rows[1:]):
            if a.session_id == b.session_id:
                assert b.event_seq - a.event_seq <= gap
            else:
                assert b.event_seq - a.event_seq > gap


@given(
    clocks=st.lists(st.integers(0, 1000), min_size=2, max_size=80),
    gap=st.integers(1, 50),
)
@settings(max_examples=40, deadline=None)
def test_session_assignment_order_independent(clocks, gap):
    """Shuffled input -> identical sessionization (idempotent gap-merge)."""
    t1 = pa.table(
        {"event_seq": pa.array(clocks, pa.int64()), "source": pa.array(["k"] * len(clocks))}
    )
    rev = list(reversed(clocks))
    t2 = pa.table(
        {"event_seq": pa.array(rev, pa.int64()), "source": pa.array(["k"] * len(rev))}
    )
    a = sessionize_table(t1, gap, "source", "event_seq").to_pandas()
    b = sessionize_table(t2, gap, "source", "event_seq").to_pandas()
    key = ["event_seq", "session_id"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )
