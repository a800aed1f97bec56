"""Flagship fused pipeline: end-to-end value check + the co-partitioned
join-elimination equivalence.

The fused flagship executes the details join batch-locally because the
child stream is derived row-locally from the parent (containment by
construction — see ``pipelines/flagship.py`` module docstring).  These
tests pin down that (a) the whole pipeline equals a brute-force pandas
oracle and (b) the batch-local Acero join produces exactly the rows a
shuffle ``Dataset.join`` produces on the same two streams."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute(sf_dir: str) -> pd.DataFrame:
    from dataflowkit_ray.pipelines.flagship import default_pattern
    from dataflowkit_ray.stages.cep import match_pattern_batch
    from dataflowkit_ray.tokenize import tokenize_documents

    raw = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    tok = tokenize_documents(raw)
    df = tok.to_pandas()
    df["window_id"] = df.event_seq // 32
    df["n_details"] = np.maximum(1, -(-df.n_tok // 16))
    base = df.groupby(["source", "window_id"]).agg(
        sum_n_tok=("n_tok", "sum"),
        n_rows=("n_tok", "count"),
        n_details=("n_details", "sum"),
    )
    m = match_pattern_batch(default_pattern())(tok).to_pandas()
    m["window_id"] = m.event_seq // 32
    mc = m.groupby(["source", "window_id"]).size().rename("n_matches")
    out = base.join(mc, how="left").fillna(0).astype("int64").reset_index()
    return out.sort_values(["source", "window_id"]).reset_index(drop=True)


def test_flagship_matches_bruteforce(ray_session):
    from dataflowkit_ray.pipelines.flagship import flagship_pipeline

    got = (
        flagship_pipeline(SF)
        .to_pandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    want = _brute(SF)
    pd.testing.assert_frame_equal(
        got[["source", "window_id", "sum_n_tok", "n_rows", "n_details", "n_matches"]],
        want[["source", "window_id", "sum_n_tok", "n_rows", "n_details", "n_matches"]],
        check_dtype=False,
    )


def test_copartitioned_join_equals_shuffle_join(ray_session):
    """Batch-local Acero join (no exchange) == Ray hash-shuffle join on
    the same parent/child streams — the optimizer-pass equivalence that
    justifies eliminating the exchange for co-partitioned sides."""
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.pipelines.flagship import _child_agg
    from dataflowkit_ray.tokenize import load_token_stream

    ds = load_token_stream(SF, repeat=4, num_blocks=8)

    def local_join(b: pa.Table) -> pa.Table:
        parent = b.select(["event_seq", "source"])
        return parent.join(_child_agg(b), keys=["event_seq"], join_type="inner")

    local = (
        ds.map_batches(local_join, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_seq")
        .reset_index(drop=True)
    )

    parent = ds.map_batches(
        lambda t: t.select(["event_seq", "source"]), batch_format="pyarrow"
    )
    child = ds.map_batches(_child_agg, batch_format="pyarrow")
    shuffled = (
        parent.join(child, join_type="inner", num_partitions=4, on=("event_seq",))
        .to_pandas()
        .sort_values("event_seq")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        local[sorted(local.columns)], shuffled[sorted(shuffled.columns)]
    )
