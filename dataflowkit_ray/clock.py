"""Event clock, stream partitioning and watermarks.

The reference processes pages strictly in link order and keys every record
``uid-page-block`` (``/root/reference/scrape/scrape.go:384-400,604``); the
final reader walks keys sequentially.  The engine formalizes that as a
**doc-order event clock**: ``event_seq`` (int64, monotone in input order)
is the time domain; a stream partition's watermark is the highest
``event_seq`` it has committed; the global watermark is the min over
partitions (SURVEY.md §2.8).

Partitioning is data-derived: ``partition_id = event_seq % n_partitions``
(round-robin, like Kafka's default) and ``offset = event_seq //
n_partitions`` is monotone *within* each partition.  Replays of the same
rows therefore always land on the same partition with the same offset —
the bedrock of idempotent commits.  On a real multi-node deployment each
input shard is a partition; the modulo scheme is the single-file stand-in
with identical semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def assign_clock(batch: pa.Table, n_partitions: int, seq_col: str = "event_seq") -> pa.Table:
    """map_batches fn: add (partition_id:int32, offset:int64) lineage columns.

    Together with a per-operator ``seq`` these replace the reference's
    ``uid-page-block`` record key (``scrape/scrape.go:604``) — deterministic
    lineage that makes replays overwrite rather than duplicate.
    """
    seq = batch[seq_col]
    if isinstance(seq, pa.ChunkedArray):
        seq = seq.combine_chunks()
    s = seq.to_numpy(zero_copy_only=False).astype(np.int64)
    out = batch
    for name, arr in (
        ("partition_id", pa.array((s % n_partitions).astype(np.int32))),
        ("offset", pa.array(s // n_partitions)),
    ):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def watermark_of(per_partition_max_seq: dict[int, int]) -> int:
    """Global watermark = min over partitions of (max committed seq).

    A partition that has committed nothing holds the watermark at -1; the
    reference's analog is the sequential reader stopping at the first
    missing key (``/root/reference/scrape/encoders.go:192-205``).
    """
    if not per_partition_max_seq:
        return -1
    return min(per_partition_max_seq.values())


def late_rows_mask(batch: pa.Table, watermark: int, seq_col: str = "event_seq") -> np.ndarray:
    """Boolean mask of rows at-or-before the watermark (late arrivals).

    The reference logs-and-drops failed pages without aborting
    (``scrape/scrape.go:643-652``); the engine drops late rows and counts
    them in the run metrics instead of silently losing them.
    """
    seq = batch[seq_col]
    if isinstance(seq, pa.ChunkedArray):
        seq = seq.combine_chunks()
    return seq.to_numpy(zero_copy_only=False) <= watermark
