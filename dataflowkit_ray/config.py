"""Engine-wide configuration.

All constants that affect data values are fixed here so every run is
bit-identical (the reference violates this with wall-clock filenames,
``scrape/encoders.go:45``, and random fetch delays, ``utils/utils.go:56-66``;
we deliberately do not — see SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Deterministic tokenizer: token = (len(word)*256 + first_codepoint) % VOCAB_MOD.
# Chosen so the identical expression is writable in ANSI SQL (DuckDB oracle).
VOCAB_MOD = 32000

# 64-bit FNV-1a is used for all row/content keys: it is trivially
# re-implementable in any runtime (exact dedup oracle, lineage keys).
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
MASK64 = 0xFFFFFFFFFFFFFFFF


@dataclass
class EngineConfig:
    """Knobs for one engine instance.

    ``n_partitions`` is the *logical* stream-partition count (the analog of
    Kafka partitions / the reference's payload-worker fan-out,
    ``scrape/scrape.go:219-221``).  ``partition_id = event_seq % n_partitions``
    is fully data-derived so replays land on the same partition.
    At 100 TB this becomes one partition per input shard; the modulo scheme
    is the single-file test stand-in with identical semantics.
    """

    n_partitions: int = 8
    # rows per partition per micro-batch epoch
    epoch_rows_per_partition: int = 64

    # windows (in event_seq units for the doc-order clock)
    tumbling_size: int = 32
    sliding_size: int = 64
    sliding_slide: int = 32
    session_gap: int = 8

    # aggregation skew handling
    n_salts: int = 16

    # map_batches tuning: token rows are wide (~2k int32 ≈ 8 KB/row);
    # 8192 rows ≈ 64 MB/batch keeps batch x concurrency inside worker heaps.
    batch_size: int = 8192

    # stateful actor pools
    state_shards: int = 8

    # join
    join_num_partitions: int = 16

    # Arrow-IPC codec for task->shard-actor exchange messages
    # (state.store.table_to_bytes): None | "zstd" | "lz4".  Measured on
    # the engine's payload shapes (int-only window partials / event
    # rows, 100k rows): zstd shrinks bytes 5.1-6.7x for ~0.25 us/row of
    # encode+decode CPU; lz4 2.1-2.6x for ~0.1 us/row.  On ONE box the
    # exchange is a memcpy, so compression only burns CPU — default
    # None.  On a multi-node cluster the same messages cross the NIC:
    # set "zstd" when inter-node bandwidth, not CPU, bounds the
    # streaming runners (readers auto-detect; mixed senders are fine).
    # Cluster-facing switch: the GRAFT_SHARD_IPC_COMPRESSION env var
    # (set before ray.init / via runtime_env env_vars) — it reaches
    # every worker process, where this driver-side field does not.
    shard_ipc_compression: str | None = None

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = EngineConfig()


def np_col(col, dtype="int64"):
    """Numpy view of an integer Arrow column WITHOUT the pandas path.

    ``to_numpy(zero_copy_only=False)`` lazily imports pandas on first
    use — measured ~0.3 s per fresh worker/actor process, which
    dominated the streaming queries' fixed cost.  Null-free int columns
    (every internal table of this engine) take the zero-copy buffer
    view; the dtype change is a numpy ``astype`` (no pyarrow.compute
    kernel, whose first dispatch also pays an init cost)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:  # rare fallback; still avoids pandas
        import pyarrow.compute as pc

        col = pc.fill_null(col, 0)
    return col.to_numpy(zero_copy_only=True).astype(dtype, copy=False)


def fnv1a64(data: bytes) -> int:
    """Pure-python 64-bit FNV-1a. Used only for tiny driver-side keys;
    batch paths use the vectorized numpy variant in tokenize.py."""
    h = FNV_OFFSET
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & MASK64
    return h
