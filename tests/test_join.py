"""Details join: chunk explode, aggregate embed, nested-struct embed —
including the reference's 1-vs-many embed rule
(/root/reference/scrape/encoders.go:233-239)."""

import numpy as np
import pyarrow as pa

from dataflowkit_ray.stages.join import (
    cogroup_join_structs,
    explode_chunks,
    join_details,
    semi_join_route,
)
from dataflowkit_ray.tokenize import load_token_stream


def _tok_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array(["s"] * len(rows)),
            "event_seq": pa.array(range(len(rows)), type=pa.int64()),
        }
    )


def test_explode_chunks_exact():
    t = _tok_tbl([("a", list(range(5))), ("b", list(range(7))), ("c", [])])
    out = explode_chunks(chunk_size=3)(t)
    assert out["doc_id"].to_pylist() == ["a", "a", "b", "b", "b", "c"]
    assert out["chunk_idx"].to_pylist() == [0, 1, 0, 1, 2, 0]
    assert out["chunk_n_tok"].to_pylist() == [3, 2, 3, 3, 1, 0]
    assert out["chunk_tokens"].to_pylist() == [
        [0, 1, 2],
        [3, 4],
        [0, 1, 2],
        [3, 4, 5],
        [6],
        [],
    ]


def test_join_details_invariants(sf_dir):
    import ray.data

    ds = load_token_stream(sf_dir)
    child = ds.map_batches(explode_chunks(16), batch_format="pyarrow")
    df = join_details(ds, child, num_partitions=4).to_pandas()
    assert len(df) == 500
    assert (df.n_details == np.maximum(1, -(-df.n_tok // 16))).all()
    assert (df.sum_detail_tok == df.n_tok).all()


def test_struct_embed_rule():
    """1 child -> one-element list; N children -> ordered list (the
    scalar-vs-list collapse of the reference)."""
    import ray.data

    t = _tok_tbl([("a", list(range(5))), ("b", list(range(40)))])
    parent = ray.data.from_arrow(t)
    child = parent.map_batches(explode_chunks(16), batch_format="pyarrow")
    out = {r["doc_id"]: r for r in cogroup_join_structs(parent, child).take_all()}
    assert out["a"]["n_details"] == 1
    assert [d["chunk_idx"] for d in out["a"]["details"]] == [0]
    assert out["b"]["n_details"] == 3
    assert [d["chunk_idx"] for d in out["b"]["details"]] == [0, 1, 2]
    assert [d["chunk_n_tok"] for d in out["b"]["details"]] == [16, 16, 8]


def test_semi_join_route(sf_dir):
    ds = load_token_stream(sf_dir).limit(10)
    routed = semi_join_route(ds)
    assert routed.schema().names == ["doc_id"]
    assert routed.count() == 10


def test_nested_join_scales_to_many_keys(ray_session):
    """120k unique parent keys through the nested-embed join in seconds —
    the bucket-fold path; a per-key python groupby takes minutes here."""
    import time

    import pyarrow as pa
    import ray.data

    n = 120_000
    ids = [str(i) for i in range(n)]
    parent_t = pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "n_tok": pa.array([20] * n, pa.int32()),
        }
    )
    child_t = pa.table(
        {
            "doc_id": pa.array(ids * 2, pa.string()),
            "chunk_idx": pa.array([0] * n + [1] * n, pa.int32()),
            "chunk_n_tok": pa.array([16] * n + [4] * n, pa.int32()),
        }
    )
    parent = ray.data.from_arrow(parent_t).repartition(8)
    child = ray.data.from_arrow(child_t).repartition(8)
    t0 = time.time()
    out = cogroup_join_structs(parent, child)
    cnt = out.count()
    elapsed = time.time() - t0
    assert cnt == n
    assert elapsed < 60, f"nested join too slow: {elapsed:.1f}s"
    row = out.take(1)[0]
    assert row["n_details"] == 2
    assert [d["chunk_idx"] for d in row["details"]] == [0, 1]


def test_bucket_equi_join_equals_dataset_join(ray_session):
    """The bucket-pattern join must produce exactly Dataset.join's rows
    (inner + left outer) on overlapping/disjoint key sets."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.join import bucket_equi_join

    rng = np.random.default_rng(3)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 200, 500, dtype=np.int64)),
            "lv": pa.array(np.arange(500, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rng.integers(100, 300, 400, dtype=np.int64)),
            "rv": pa.array(np.arange(400, dtype=np.int64) * 7),
        }
    )
    lds = ray.data.from_arrow(left).repartition(5)
    rds = ray.data.from_arrow(right).repartition(3)

    for jt_bucket, jt_ray in (("inner", "inner"), ("left outer", "left_outer")):
        got = (
            bucket_equi_join(lds, rds, on="k", n_buckets=8, join_type=jt_bucket)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            lds.join(rds, join_type=jt_ray, num_partitions=4, on=("k",))
            .to_pandas()[got.columns.tolist()]
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_matches_brute_force(ray_session):
    """IntervalIndex over OVERLAPPING/touching/gapped closed intervals
    must equal the all-pairs BETWEEN check, including multi-match rows,
    boundary values and values outside every interval."""
    import numpy as np
    import ray

    from dataflowkit_ray.stages.join import IntervalIndex, range_join

    rng = np.random.default_rng(11)
    lo = rng.integers(0, 900, size=40).astype(np.int64)
    hi = lo + rng.integers(0, 120, size=40).astype(np.int64)
    vals = rng.integers(-50, 1100, size=500).astype(np.int64)

    idx = IntervalIndex(lo, hi)
    rows, ivs = idx.probe(vals)
    got = sorted(zip(rows.tolist(), ivs.tolist()))
    exp = sorted(
        (r, i)
        for r, v in enumerate(vals)
        for i in range(40)
        if lo[i] <= v <= hi[i]
    )
    assert got == exp and len(exp) > 500  # multi-matches exercised

    # the Dataset operator: payload columns gathered per match
    ivs_t = pa.table(
        {
            "tag": pa.array([f"w{i}" for i in range(40)], pa.string()),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
        }
    )
    ds = ray.data.from_arrow(
        pa.table({"rid": pa.array(range(500), pa.int64()), "v": pa.array(vals)})
    )
    out = range_join(ds, ivs_t, "v").to_pandas()
    got2 = sorted(zip(out.rid, out.tag))
    assert got2 == sorted((r, f"w{i}") for r, i in exp)


def test_bucket_join_agg_equals_agg_then_join(ray_session):
    """The fused single-exchange aggregate+join must equal
    hash_agg -> bucket_equi_join (including int32 partial-type promotion
    and keys present on only one side)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.agg import hash_agg
    from dataflowkit_ray.stages.join import bucket_equi_join, bucket_join_agg

    rng = np.random.default_rng(11)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 200, 300, dtype=np.int64)),
            "lv": pa.array(np.arange(300, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            # int32 value column: Arrow promotes sum(int32) -> int64, the
            # null-padding type probe must follow
            "k": pa.array(rng.integers(100, 300, 2000, dtype=np.int64)),
            "v": pa.array(rng.integers(0, 50, 2000).astype(np.int32)),
        }
    )
    lds = ray.data.from_arrow(left).repartition(5)

    def rds():
        return ray.data.from_arrow(right).repartition(7)

    specs = [("v", "sum", "v_sum"), ("v", "max", "v_max"), ("v", "count", "n")]
    for jt in ("inner", "left outer"):
        got = (
            bucket_join_agg(lds, rds(), on="k", specs=specs, n_buckets=8, join_type=jt)
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        agg = hash_agg(rds(), ("k",), specs, n_buckets=8)
        want = (
            bucket_equi_join(lds, agg, on="k", n_buckets=8, join_type=jt)
            .to_pandas()[got.columns.tolist()]
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
