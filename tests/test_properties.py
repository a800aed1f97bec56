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


# ---------------------------------------------------- round-3 operators


@given(
    vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=300),
    k=st.integers(4, 64),
)
@settings(max_examples=40, deadline=None)
def test_bottomk_fold_is_blocking_invariant(vals, k):
    """Splitting the input arbitrarily and folding twice equals one fold
    (the merge-insensitivity the quantile sketch's correctness rests on)."""
    from dataflowkit_ray.stages.sketch import _bottomk_fold
    from dataflowkit_ray.tokenize import fnv1a64_numpy

    v = np.asarray(vals, dtype=np.float64)
    h = fnv1a64_numpy(np.arange(len(vals), dtype=np.uint64))
    gid = np.zeros(len(vals), dtype=np.uint64)

    _, off1, h1, v1 = _bottomk_fold(gid, h, v, k)

    cut = len(vals) // 2
    _, offa, ha, va = _bottomk_fold(gid[:cut], h[:cut], v[:cut], k)
    _, offb, hb, vb = _bottomk_fold(gid[cut:], h[cut:], v[cut:], k)
    gid2 = np.zeros(len(ha) + len(hb), dtype=np.uint64)
    _, off2, h2, v2 = _bottomk_fold(
        gid2, np.concatenate([ha, hb]), np.concatenate([va, vb]), k
    )
    assert np.array_equal(h1, h2) and np.array_equal(v1, v2)


@given(texts=st.lists(st.text(max_size=60), min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_pii_redaction_idempotent(texts):
    """redact(redact(x)) == redact(x): placeholders contain no
    redactable substrings, so a second pass is a no-op."""
    import pyarrow as pa

    from dataflowkit_ray.stages.textstats import redact_pii_batch

    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(texts))]),
            "text": pa.array(texts, pa.string()),
        }
    )
    once = redact_pii_batch(t)
    twice = redact_pii_batch(
        pa.table({"doc_id": once["doc_id"], "text": once["clean_text"]})
    )
    assert once["clean_text"].to_pylist() == twice["clean_text"].to_pylist()
    assert all(n == 0 for n in twice["n_pii"].to_pylist())


@given(
    n_left=st.integers(0, 60),
    n_right=st.integers(0, 60),
    key_space=st.integers(1, 25),
)
@settings(max_examples=30, deadline=None)
def test_bucket_equi_join_matches_pandas(ray_session, n_left, n_right, key_space):
    import pandas as pd
    import ray.data

    from dataflowkit_ray.stages.join import bucket_equi_join

    rng = np.random.default_rng(n_left * 1000 + n_right * 31 + key_space)
    lt = pa.table(
        {
            "k": pa.array(rng.integers(0, key_space, n_left, dtype=np.int64)),
            "lv": pa.array(np.arange(n_left, dtype=np.int64)),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.integers(0, key_space, n_right, dtype=np.int64)),
            "rv": pa.array(np.arange(n_right, dtype=np.int64)),
        }
    )
    got = bucket_equi_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt), on="k", n_buckets=4
    ).to_pandas()
    want = (
        lt.to_pandas()
        .merge(rt.to_pandas(), on="k", how="inner")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    if len(want):
        got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "lv", "rv"]], want[["k", "lv", "rv"]], check_dtype=False
        )
