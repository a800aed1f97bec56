"""Micro-batch Parquet source with per-partition offset tracking.

The reference's source is a bounded channel of work items consumed by a
worker pool (``/root/reference/scrape/scrape.go:211-229,306-333``); its
"offset" is the deterministic record key ``uid-page-block``
(``scrape/scrape.go:604``).  The engine formalizes this: the input is a
set of Parquet files, split into **chunks** — ``(file, row_group,
row_start, n_rows)`` — enumerated once from footer metadata and assigned
round-robin to ``n_partitions`` logical stream partitions.  A partition's
offset is the number of chunks it has committed; an epoch reads the next
``chunks_per_partition`` chunks of every partition.

Everything is derived from (files, spec) — no wall clock, no RNG — so a
resumed run re-reads byte-identical slices (SURVEY.md §7 "bit-identical
resume").  Reading happens inside ``map_batches`` over a tiny chunk-spec
dataset: one task per chunk, each opening only its own row group — the
pattern scales to any number of files/nodes and never materializes the
file list's data on the driver.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class Chunk:
    """One read unit: a row slice of one row group of one file."""

    file: str
    row_group: int
    row_start: int  # offset within the row group
    n_rows: int
    seq: int  # global chunk index (enumeration order)
    global_row_start: int  # rows before this chunk across all files — the
    # event-clock frontier base (event_seq is monotone in file row order)


def _clock_to_int(v) -> int:
    """Row-group statistic -> int64 clock (micros for timestamps)."""
    import datetime

    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return int((v - epoch) // datetime.timedelta(microseconds=1))
    return int(v)


def _parquet_chunk_reader(spec: dict, columns: list[str] | None) -> pa.Table:
    """Default codec: open only the chunk's own row group."""
    pf = pq.ParquetFile(spec["file"])
    t = pf.read_row_group(spec["row_group"], columns=columns)
    return t.slice(spec["row_start"], spec["n_rows"])


def read_chunk_table(
    spec: dict, columns: list[str] | None, primary=None, fallback=None
) -> pa.Table:
    """One chunk spec -> its rows (+ partition_id, chunk_seq, _chunk_row).

    The primary/fallback codec retry mirrors the reference's
    base-then-chrome re-fetch of a failed work item
    (``/root/reference/scrape/scrape.go:231-239``)."""
    import numpy as np

    primary = primary or _parquet_chunk_reader
    try:
        t = primary(spec, columns)
    except Exception:
        if fallback is None:
            raise
        try:
            t = fallback(spec, columns)
        except Exception as ex2:
            from dataflowkit_ray.errors import RetryableIOError

            # both codecs failed: typed as RETRYABLE — re-running the
            # same chunk may succeed (transient I/O), unlike a bad spec
            raise RetryableIOError(
                f"chunk {spec['file']}#rg{spec['row_group']}: primary and "
                f"fallback codecs both failed ({type(ex2).__name__}: {ex2})"
            ) from ex2
    n = len(t)
    t = t.append_column(
        "partition_id", pa.array([spec["partition_id"]] * n, pa.int32())
    )
    t = t.append_column("chunk_seq", pa.array([spec["seq"]] * n, pa.int64()))
    # deterministic global row id: lets shard staging layers key (and
    # dedupe) re-sent pieces of a chunk
    t = t.append_column(
        "_chunk_row",
        pa.array(spec["global_row_start"] + np.arange(n, dtype=np.int64)),
    )
    return t


def process_chunk_task_fn(spec, columns, primary, fallback, process):
    """Body of the per-chunk epoch task (module-level so Ray pickles a
    reference, not a closure)."""
    t = read_chunk_table(spec, columns, primary, fallback)
    return process(spec, t)


_CHUNK_TASK = None  # cached remote fn: exporting one per epoch cost ~50 ms


def _chunk_task():
    global _CHUNK_TASK
    if _CHUNK_TASK is None:
        import ray

        _CHUNK_TASK = ray.remote(num_cpus=1)(process_chunk_task_fn)
    return _CHUNK_TASK


def run_epoch_tasks(specs: list[dict], columns, primary, fallback, process) -> list:
    """Run one epoch as PLAIN RAY TASKS — one per chunk: read the chunk,
    then ``process(spec, table)`` (which typically routes rows/partials
    straight to state-shard actors and blocks on their acks).

    This is the one place the engine drops below the Dataset API, and
    deliberately: an epoch is a small bounded slice, and building a full
    Dataset pipeline (from_items -> repartition -> map_batches x3 ->
    iter_batches) per epoch costs ~100-300 ms of plan/executor startup —
    measured as the dominant term of every streaming gate query (~2 s of
    fixed cost per run at ANY scale).  Raw tasks keep the identical
    data plane (tasks -> shard actors, driver sees only ack dicts) at
    ~1 ms/task.  At 100 TB an epoch is thousands of chunk tasks — the
    same fan-out a Dataset read would schedule, minus the per-epoch
    planning tax."""
    import ray

    if not specs:
        return []
    task = _chunk_task()
    process_ref = ray.put(process)  # ship the closure once per epoch
    return ray.get(
        [
            task.remote(spec, columns, primary, fallback, process_ref)
            for spec in specs
        ]
    )


class MicroBatchSource:
    """Offset-tracked micro-batch reader.

    ``offsets[p]`` = chunks already consumed by partition ``p``.  Chunks
    are assigned to partitions round-robin by ``chunk.seq % n_partitions``
    — data-derived, so replays land on the same partition (the analog of
    the reference's content-hash UID keying, ``scrape/scrape.go:134-155``).

    **Runtime discovery** (``discover=`` + :meth:`rescan`): the reference's
    core streaming behavior is finding new work AS IT RUNS — ``paginate``
    enqueues pages it discovers mid-crawl (``scrape/scrape.go:378-445``).
    The engine analog: ``discover`` is a glob pattern (or a callable
    returning file paths); ``rescan()`` between epochs appends chunks for
    files that arrived since the last scan.  Appends are STRICTLY at the
    tail — existing chunks keep their ``seq`` and ``global_row_start``
    (partition routing and the event clock never move under a replay),
    and new chunks extend each partition's tail, so the per-partition
    frontier (and therefore the watermark) stays monotone.  The file
    ARRIVAL order is part of stream identity: runners checkpoint
    ``files`` and rebuild a resumed source with ``preserve_file_order=True``
    so a resume re-derives byte-identical chunk seqs even when a
    late-arriving file sorts before an earlier one.
    """

    def __init__(
        self,
        files: list[str],
        n_partitions: int = 8,
        chunks_per_epoch: int = 2,
        target_rows: int = 4096,
        columns: list[str] | None = None,
        clock_column: str | None = None,
        reader=None,
        fallback_reader=None,
        discover: str | None = None,
        preserve_file_order: bool = False,
    ):
        self.files: list[str] = []
        self.n_partitions = n_partitions
        self.chunks_per_epoch = chunks_per_epoch
        self.target_rows = target_rows
        self.columns = columns
        self.clock_column = clock_column
        # retry-with-fallback codec (``scrape/scrape.go:231-239``: base
        # fetch fails -> chrome fetch retries the same work item): both
        # are ``(spec: dict, columns) -> pa.Table``; ``reader=None`` uses
        # the parquet row-group reader; a chunk whose primary read RAISES
        # is re-read through ``fallback_reader`` (no fallback -> re-raise)
        self.reader = reader
        self.fallback_reader = fallback_reader
        self.discover = discover
        self.chunks: list[Chunk] = []
        self.by_partition: list[list[Chunk]] = [[] for _ in range(n_partitions)]
        self._grs_end = 0  # rows enumerated so far == next global_row_start
        # optional explicit clock (e.g. a sorted ts column): per-chunk
        # clock lower bound for clock-unit watermarks, from parquet
        # ROW-GROUP STATISTICS only (metadata pass, no data read).  For a
        # chunk starting mid-row-group the row-group min is a conservative
        # lower bound — a lower watermark only DELAYS closes (never
        # wrongly closes early), and all emission is content-identical by
        # the final flush.  Falls back to reading the column if a writer
        # produced no statistics.
        self.chunk_first_clock: dict[int, int] | None = (
            {} if clock_column is not None else None
        )
        self.max_clock: int = 0
        for f in list(files) if preserve_file_order else sorted(files):
            self._append_file(f)

    def _append_file(self, f: str) -> None:
        """Enumerate one file's chunks at the tail (seq / global_row_start
        continue; existing chunks are never renumbered)."""
        md = pq.read_metadata(f)
        new_chunks: list[Chunk] = []
        seq = len(self.chunks)
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            start = 0
            while start < n:
                take = min(self.target_rows, n - start)
                new_chunks.append(Chunk(f, rg, start, take, seq, self._grs_end))
                seq += 1
                start += take
                self._grs_end += take
        self.files.append(f)
        self.chunks.extend(new_chunks)
        for c in new_chunks:
            self.by_partition[c.seq % self.n_partitions].append(c)
        if self.clock_column is not None:
            self._register_clock(f, md, new_chunks)

    def _register_clock(self, f: str, md, new_chunks: list[Chunk]) -> None:
        clock_column = self.clock_column
        col_idx = next(
            (
                i
                for i in range(md.schema.to_arrow_schema().__len__())
                if md.schema.column(i).name == clock_column
            ),
            None,
        )
        rg_min: dict[int, int] = {}
        stats_ok = col_idx is not None
        if stats_ok:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                if st is None or not st.has_min_max:
                    stats_ok = False
                    break
                rg_min[rg] = _clock_to_int(st.min)
                self.max_clock = max(self.max_clock, _clock_to_int(st.max))
        if stats_ok:
            for c in new_chunks:
                self.chunk_first_clock[c.seq] = rg_min[c.row_group]
        else:
            # fallback: one column read for this file
            col = pq.read_table(f, columns=[clock_column])[clock_column]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            row_of: dict[int, int] = {}
            off = 0
            for rg in range(md.num_row_groups):
                row_of[rg] = off
                off += md.row_group(rg).num_rows
            for c in new_chunks:
                self.chunk_first_clock[c.seq] = int(
                    vals[row_of[c.row_group] + c.row_start]
                )
            self.max_clock = max(self.max_clock, int(vals[-1]) if len(vals) else 0)

    def rescan(self) -> list[str]:
        """Discover files that arrived since construction / the last
        rescan and append their chunks.  Returns the new files (in the
        order they were appended).  No-op without ``discover``.

        Cost: one ``glob`` + set difference per call; parquet footers are
        read only for NEW files — safe to call every epoch."""
        if self.discover is None:
            return []
        import glob as _glob

        found = (
            self.discover()
            if callable(self.discover)
            else _glob.glob(self.discover)
        )
        known = set(self.files)
        new = sorted(f for f in found if f not in known)
        for f in new:
            self._append_file(f)
        return new

    def initial_offsets(self) -> list[int]:
        return [0] * self.n_partitions

    def done(self, offsets: list[int]) -> bool:
        return all(off >= len(self.by_partition[p]) for p, off in enumerate(offsets))

    def next_slice(self, offsets: list[int]) -> tuple[list[dict], list[int]]:
        """Chunk specs for the next epoch + the advanced offsets."""
        specs: list[dict] = []
        new_offsets = list(offsets)
        for p in range(self.n_partitions):
            lo = offsets[p]
            hi = min(lo + self.chunks_per_epoch, len(self.by_partition[p]))
            for c in self.by_partition[p][lo:hi]:
                d = asdict(c)
                d["partition_id"] = p
                specs.append(d)
            new_offsets[p] = hi
        return specs, new_offsets

    def read_epoch(self, specs: list[dict]):
        """Chunk specs -> Dataset of raw rows (+ partition_id, chunk_seq).

        One read task per chunk; each task opens only its own row group.
        """
        import ray.data

        columns = self.columns
        primary = self.reader or _parquet_chunk_reader
        fallback = self.fallback_reader

        def read_chunk(batch: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [
                    read_chunk_table(spec, columns, primary, fallback)
                    for spec in batch.to_pylist()
                ]
            )

        ds = ray.data.from_items(specs)
        # one block per chunk-spec so read tasks parallelize per chunk
        ds = ds.repartition(max(1, len(specs)))
        return ds.map_batches(read_chunk, batch_format="pyarrow")

    def run_epoch(self, specs: list[dict], process) -> list:
        """Epoch-as-plain-tasks data plane (see :func:`run_epoch_tasks`):
        one task per chunk runs ``process(spec, table)``; returns the
        per-chunk ack dicts."""
        return run_epoch_tasks(
            specs, self.columns, self.reader, self.fallback_reader, process
        )

    def total_rows(self) -> int:
        return sum(c.n_rows for c in self.chunks)

    def watermark(self, offsets: list[int]) -> int:
        """Monotonic low-watermark over the doc-order event clock.

        Per-partition frontier = first UNread chunk's ``global_row_start``
        (every row it will still emit has event_seq >= that); global
        watermark = min over partitions (SURVEY.md §2.8).  In event-row
        units: all rows with event_seq < watermark are fully ingested.
        """
        end = self.total_rows()
        frontiers = []
        for p, off in enumerate(offsets):
            part = self.by_partition[p]
            frontiers.append(end if off >= len(part) else part[off].global_row_start)
        return min(frontiers) if frontiers else 0

    def describe(self) -> dict:
        return {
            "files": self.files,
            "n_partitions": self.n_partitions,
            "chunks_per_epoch": self.chunks_per_epoch,
            "n_chunks": len(self.chunks),
        }

    def watermark_clock(self, offsets: list[int]) -> int:
        """Watermark in explicit-clock units (requires ``clock_column``):
        min over partitions of the first unread chunk's first clock value;
        partitions with nothing left sit past the max clock."""
        if self.chunk_first_clock is None:
            raise ValueError("source built without clock_column")
        end = self.max_clock + 1
        frontiers = []
        for p, off in enumerate(offsets):
            part = self.by_partition[p]
            frontiers.append(
                end if off >= len(part) else self.chunk_first_clock[part[off].seq]
            )
        return min(frontiers) if frontiers else 0
