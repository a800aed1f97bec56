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


def test_shard_ipc_compression_roundtrip_and_shrink():
    """table_to_bytes codecs: self-describing streams roundtrip under
    every codec, and zstd/lz4 genuinely shrink the int-only payloads."""
    import numpy as np
    import pyarrow as pa

    from dataflowkit_ray.state.store import bytes_to_table, table_to_bytes

    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "key": pa.array(rng.integers(0, 20, 50_000)),
            "window_id": pa.array(rng.integers(0, 300, 50_000)),
            "sum_n_tok": pa.array(rng.integers(100, 4000, 50_000)),
        }
    )
    sizes = {}
    for codec in (None, "zstd", "lz4"):
        b = table_to_bytes(t, compression=codec)
        assert bytes_to_table(b).equals(t)
        sizes[codec] = len(b)
    assert sizes["zstd"] < sizes["lz4"] < sizes[None]


def test_streaming_output_identical_under_zstd_exchange(tmp_path):
    """GRAFT_SHARD_IPC_COMPRESSION=zstd must not change a single
    committed row (a transport codec, not semantics).  Runs in a
    subprocess with the env var set BEFORE ray.init so the chunk TASKS
    (separate worker processes with their own config import) really
    encode zstd — a driver-side config mutation would never reach them."""
    import os
    import subprocess
    import sys

    code = f"""
import os, pandas as pd
import ray
from dataflowkit_ray.runner import StreamingRunner
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

SF = "/root/testdata/sf0.001"
ray.init(address="local", num_cpus=2, include_dashboard=False)

def run(wd):
    StreamingRunner([f"{{SF}}/documents.parquet"], wd,
                    chunks_per_epoch=2, target_rows=64).run()
    t = ExactlyOnceSink(f"{{wd}}/out").read_committed_table().to_pandas()
    return t.sort_values(["source", "window_id"]).reset_index(drop=True)

os.environ.pop("GRAFT_SHARD_IPC_COMPRESSION", None)
plain = run({str(tmp_path)!r} + "/plain")
# workers spawned AFTER this see the var; force a fresh pool via a new cluster
ray.shutdown()
os.environ["GRAFT_SHARD_IPC_COMPRESSION"] = "zstd"
ray.init(address="local", num_cpus=2, include_dashboard=False)
zstd = run({str(tmp_path)!r} + "/zstd")
pd.testing.assert_frame_equal(plain, zstd)
print("ZSTD_OK")
ray.shutdown()
"""
    env = {k: v for k, v in os.environ.items()}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "ZSTD_OK" in out.stdout, out.stderr[-2000:]
