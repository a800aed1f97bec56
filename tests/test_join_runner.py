"""Cross-epoch stream-stream join: right stream lags, parents buffer in
JoinStateShard, output equals the batch inner join; crash-resume holds."""

import pandas as pd
import pyarrow.parquet as pq

from dataflowkit_ray.join_runner import StreamJoinRunner
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

SF = "/root/testdata/sf0.001"


def _batch_join() -> pd.DataFrame:
    from dataflowkit_ray.tokenize import tokenize_documents

    d = tokenize_documents(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    ).to_pandas()[["doc_id", "n_tok", "source"]]
    e = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "label"]).to_pandas()
    e["doc_id"] = e.vec_id.astype(str)
    out = d.merge(e[["doc_id", "label"]], on="doc_id", how="inner")
    return out.sort_values("doc_id").reset_index(drop=True)


def _read(wd) -> pd.DataFrame:
    t = ExactlyOnceSink(f"{wd}/out").read_committed_table()
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_lagged_join_equals_batch(ray_session, tmp_path):
    r = StreamJoinRunner(
        [f"{SF}/documents.parquet"],
        [f"{SF}/embeddings.parquet"],
        str(tmp_path / "lag"),
        right_lag=2,  # children arrive 2 epochs after their parents
    )
    summary = r.run()
    got = _read(tmp_path / "lag")
    exp = _batch_join()
    assert summary["rows_out"] == len(exp) == 500
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_same_epoch_join_equals_batch(ray_session, tmp_path):
    r = StreamJoinRunner(
        [f"{SF}/documents.parquet"],
        [f"{SF}/embeddings.parquet"],
        str(tmp_path / "sync"),
        right_lag=0,
    )
    r.run()
    got = _read(tmp_path / "sync")
    exp = _batch_join()
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_join_crash_resume(ray_session, tmp_path):
    full = StreamJoinRunner(
        [f"{SF}/documents.parquet"], [f"{SF}/embeddings.parquet"],
        str(tmp_path / "full"), right_lag=1,
    )
    full.run()
    crashed = StreamJoinRunner(
        [f"{SF}/documents.parquet"], [f"{SF}/embeddings.parquet"],
        str(tmp_path / "crash"), right_lag=1,
    )
    crashed.run(max_epochs=2)
    resumed = StreamJoinRunner(
        [f"{SF}/documents.parquet"], [f"{SF}/embeddings.parquet"],
        str(tmp_path / "crash"), right_lag=1,
    )
    resumed.run()
    pd.testing.assert_frame_equal(_read(tmp_path / "full"), _read(tmp_path / "crash"))


def test_rights_join_regardless_of_arrival_order(ray_session, tmp_path):
    """Regression: rights for a key arriving in epochs BEFORE and AFTER
    the left must all join (the left is the retained build side)."""
    import pyarrow as pa

    left = pa.table(
        {"doc_id": pa.array([7], pa.int64()),
         "text": ["hello world tokens here"], "source": ["s"]}
    )
    right = pa.table(
        {"vec_id": pa.array([7, 7], pa.int64()), "label": pa.array([1, 2], pa.int32())}
    )
    import pyarrow.parquet as pq

    pq.write_table(left, str(tmp_path / "l.parquet"))
    pq.write_table(right, str(tmp_path / "r.parquet"))
    r = StreamJoinRunner(
        [str(tmp_path / "l.parquet")], [str(tmp_path / "r.parquet")],
        str(tmp_path / "wd"), n_partitions=1, chunks_per_epoch=1, target_rows=1,
    )
    s = r.run()
    assert s["rows_out"] == 2
    t = ExactlyOnceSink(f"{tmp_path}/wd/out").read_committed_table()
    assert sorted(t["label"].to_pylist()) == [1, 2]
