"""State-store actors: cross-epoch stream-stream join buffers + window
state snapshot/restore round-trips."""

import pyarrow as pa
import ray

from dataflowkit_ray.state.store import (
    JoinStateShard,
    WindowStateShard,
    bytes_to_table,
    table_to_bytes,
)


def _t(**cols):
    return pa.table(cols)


def test_join_across_epochs(ray_session):
    shard = JoinStateShard.remote()
    # epoch 0: parent (left) arrives, no child yet
    left = _t(doc_id=["a", "b"], n_tok=[10, 20])
    out0 = ray.get(shard.probe_and_buffer.remote(0, "left", table_to_bytes(left)))
    assert out0 == b""
    # epoch 1: child for "a" arrives -> joins with the buffered parent
    right = _t(doc_id=["a"], chunk_idx=[0], chunk_n_tok=[10])
    out1 = bytes_to_table(
        ray.get(shard.probe_and_buffer.remote(1, "right", table_to_bytes(right)))
    )
    assert out1.to_pylist() == [
        {"doc_id": "a", "n_tok": 10, "chunk_idx": 0, "chunk_n_tok": 10}
    ]
    # epoch 2: child for unseen doc "z" buffers; late parent "z" joins next epoch
    rz = _t(doc_id=["z"], chunk_idx=[1], chunk_n_tok=[5])
    assert ray.get(shard.probe_and_buffer.remote(2, "right", table_to_bytes(rz))) == b""
    lz = _t(doc_id=["z"], n_tok=[5])
    out3 = bytes_to_table(
        ray.get(shard.probe_and_buffer.remote(3, "left", table_to_bytes(lz)))
    )
    assert out3["doc_id"].to_pylist() == ["z"]


def test_join_ttl_expiry(ray_session):
    shard = JoinStateShard.remote()
    ray.get(
        shard.probe_and_buffer.remote(
            0, "left", table_to_bytes(_t(doc_id=["old"], n_tok=[1]))
        )
    )
    ray.get(shard.expire.remote(5, 3))  # epoch 5, ttl 3 -> "old" (born 0) dies
    # a right arriving now finds nothing
    out = ray.get(
        shard.probe_and_buffer.remote(
            5, "right", table_to_bytes(_t(doc_id=["old"], chunk_idx=[0], chunk_n_tok=[1]))
        )
    )
    assert out == b""


def test_window_state_snapshot_roundtrip(ray_session):
    a = WindowStateShard.remote(["m1", "m2"])
    t = _t(source=["s", "s"], window_id=[1, 2], m1=[10, 20], m2=[1, 2])
    ray.get(a.merge.remote(0, table_to_bytes(t)))
    snap = ray.get(a.snapshot.remote())

    b = WindowStateShard.remote(["m1", "m2"])
    ray.get(b.restore.remote(snap))
    # merging the same epoch again is a no-op (idempotent replay)
    ray.get(b.merge.remote(0, table_to_bytes(t)))
    popped = bytes_to_table(ray.get(b.pop_closed.remote(10)))
    assert popped.to_pylist() == [
        {"source": "s", "window_id": 1, "m1": 10, "m2": 1},
        {"source": "s", "window_id": 2, "m1": 20, "m2": 2},
    ]


def test_window_late_rows_counted(ray_session):
    a = WindowStateShard.remote(["m"])
    ray.get(a.merge.remote(0, table_to_bytes(_t(source=["s"], window_id=[0], m=[1]))))
    ray.get(a.pop_closed.remote(5))  # closes windows < 5
    # a late row for window 2 (already closed) is dropped and counted
    ray.get(a.merge.remote(1, table_to_bytes(_t(source=["s"], window_id=[2], m=[7]))))
    stats = ray.get(a.stats.remote())
    assert stats == {"open_windows": 0, "late_rows": 1}


def test_staging_buffer_split_chunk_and_retry():
    """A chunk arriving as two pieces (Ray block split) keeps BOTH under
    distinct (chunk, first_row) keys; a retried task re-sending the same
    keys does not duplicate; drain concatenates in key order once."""
    import pyarrow as pa

    from dataflowkit_ray.state.store import StagingBuffer, table_to_bytes

    sb = StagingBuffer()
    p1 = pa.table({"v": pa.array([1, 2], pa.int64())})
    p2 = pa.table({"v": pa.array([3], pa.int64())})
    sb.stage(5, (7, 0), table_to_bytes(p1), last_applied=4)
    sb.stage(5, (7, 2), table_to_bytes(p2), last_applied=4)
    # retry: same keys, same bytes — idempotent
    sb.stage(5, (7, 0), table_to_bytes(p1), last_applied=4)
    # stale epoch ignored
    sb.stage(4, (1, 0), table_to_bytes(p1), last_applied=4)
    out = sb.drain(5)
    assert out["v"].to_pylist() == [1, 2, 3]
    assert sb.drain(5) is None  # drained exactly once
