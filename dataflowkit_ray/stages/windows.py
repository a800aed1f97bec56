"""Tumbling / sliding / session windows + salted two-phase windowed aggregates.

The reference's natural "window" is a pagination chain: pages 0..N of one
payload until the paginator runs dry or MAX_PAGES
(``/root/reference/scrape/scrape.go:378-445``).  The engine generalizes to
the standard trio over the doc-order event clock (SURVEY.md §2.8):

* tumbling:  ``window_id = event_seq // size``
* sliding:   a row belongs to every window whose ``[w*slide, w*slide+size)``
  range covers its seq (flat-map expansion, vectorized)
* session:   per key, sort by clock and split where the gap exceeds G
  (gap-merge); the session id is the first clock value of the session —
  data-derived, so replays produce identical ids.

Aggregates are **two-phase**: phase 1 collapses each Arrow batch to one
partial row per (key, window[, salt]) via ``pyarrow.Table.group_by``
(a combiner — no shuffle); phase 2 is a small ``Dataset.groupby`` over the
partials.  A hot key therefore contributes at most one row per batch to
the shuffle, and the optional salt splits even the *distinct-count* state
(which cannot pre-collapse) across ``n_salts`` reducers (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.tokenize import fnv1a64_numpy


# ---------------------------------------------------------------- assignment


def _seq_np(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


def assign_tumbling(batch: pa.Table, size: int, clock_col: str = "event_seq") -> pa.Table:
    """Add ``window_id = clock // size`` (int64)."""
    wid = _seq_np(batch, clock_col) // size
    if "window_id" in batch.column_names:
        batch = batch.drop_columns(["window_id"])
    return batch.append_column("window_id", pa.array(wid))


def assign_sliding(
    batch: pa.Table, size: int, slide: int, clock_col: str = "event_seq"
) -> pa.Table:
    """Flat-map expansion: one output row per (row, covering window).

    Vectorized: per-row window counts -> ``np.repeat`` row indices ->
    Arrow ``take`` (zero row-level python).  Window w covers
    ``[w*slide, w*slide + size)``; a row at seq s is in windows
    ``max(0, ceil((s-size+1)/slide)) .. s//slide``.
    """
    s = _seq_np(batch, clock_col)
    w_hi = s // slide
    w_lo = np.maximum(0, -(-(s - size + 1) // slide))  # ceil division
    counts = (w_hi - w_lo + 1).astype(np.int64)
    row_idx = np.repeat(np.arange(len(s)), counts)
    # window id for each expanded row: w_lo[row] + intra-row rank
    cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
    intra = np.arange(counts.sum()) - np.repeat(cum, counts)
    wids = np.repeat(w_lo, counts) + intra
    out = batch.take(pa.array(row_idx))
    if "window_id" in out.column_names:
        out = out.drop_columns(["window_id"])
    return out.append_column("window_id", pa.array(wids))


def session_map_groups(
    gap: int, key_col: str = "source", clock_col: str = "event_seq"
):
    """Returns a ``map_groups`` fn assigning session ids within one key group.

    Session id = first clock value of the session (deterministic).  Runs
    after a ``groupby(key)`` shuffle; inside the group everything is
    vectorized numpy.  Sessions spanning micro-batch epochs are merged by
    the runner via session-state carry-over (state store).
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(clock_col, kind="mergesort").reset_index(drop=True)
        t = df[clock_col].to_numpy(dtype=np.int64)
        if len(t) == 0:
            df["session_id"] = np.array([], dtype=np.int64)
            return df
        new_session = np.concatenate(([True], np.diff(t) > gap))
        starts = t[new_session]
        df["session_id"] = np.repeat(starts, np.diff(np.concatenate((np.nonzero(new_session)[0], [len(t)]))))
        return df

    return fn


def assign_sessions(ds, gap: int, key_col: str = "source", clock_col: str = "event_seq"):
    """Dataset-level session assignment: one shuffle on the session key."""
    return ds.groupby(key_col).map_groups(
        session_map_groups(gap, key_col, clock_col), batch_format="pandas"
    )


# ------------------------------------------------------- two-phase aggregates


def partial_window_agg(keys: tuple[str, ...] = ("source", "window_id")):
    """Phase-1 combiner: collapse a batch to per-(keys) partials.

    Emits ``n_tok_sum`` (int64) and ``rows`` (int64) — the shuffled volume
    is O(distinct keys per batch), not O(rows).
    """

    key_list = list(keys)

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.select(key_list + ["n_tok"])
        agg = t.group_by(key_list).aggregate([("n_tok", "sum"), ("n_tok", "count")])
        return agg.rename_columns(key_list + ["n_tok_sum", "rows"])

    return fn


def windowed_sum(ds, keys: tuple[str, ...] = ("source", "window_id"), batch_size: int = 8192):
    """sum(n_tok) + row count per window key, two-phase."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        partial_window_agg(keys), batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby(list(keys)).aggregate(
        Sum("n_tok_sum", alias_name="sum_n_tok"),
        Sum("rows", alias_name="n_rows"),
    )


def salted_distinct_docs(
    ds,
    keys: tuple[str, ...] = ("source", "window_id"),
    n_salts: int = 16,
    batch_size: int = 8192,
):
    """Exact count-distinct(doc_id) per window key, salted two-phase.

    Phase 1 (combiner): per batch, dedupe (keys, salt, doc_id) and count
    distinct per (keys, salt) — but counts can't be summed across batches,
    so phase 1 emits the *deduped key tuples* ``(keys, salt, doc_id_hash)``
    instead; phase 2 groups by (keys, salt) -> distinct count, phase 3 sums
    salts.  The salt = fnv(doc_id_hash) % n_salts spreads a hot (source,
    window) across ``n_salts`` reducers; because the salt is a pure
    function of doc_id, the same doc never double-counts across salts.
    """
    from ray.data.aggregate import Sum

    key_list = list(keys)

    def dedupe_batch(batch: pa.Table) -> pa.Table:
        # doc identity as int64: the engine's token stream carries
        # event_seq == int(doc_id); fall back to a per-string crc for
        # foreign streams.  Vectorized on the fast path.
        if "event_seq" in batch.column_names:
            h = _seq_np(batch, "event_seq")
        else:
            import zlib

            doc = batch["doc_id"]
            if isinstance(doc, pa.ChunkedArray):
                doc = doc.combine_chunks()
            h = np.fromiter(
                (zlib.crc32(x.encode()) for x in doc.to_pylist()),
                count=len(doc),
                dtype=np.int64,
            )
        salt = (fnv1a64_numpy(h) % np.uint64(n_salts)).astype(np.int32)
        t = batch.select(key_list)
        t = t.append_column("salt", pa.array(salt))
        t = t.append_column("doc_h", pa.array(h))
        return t.group_by(key_list + ["salt", "doc_h"]).aggregate([])

    deduped = ds.map_batches(dedupe_batch, batch_format="pyarrow", batch_size=batch_size)

    def count_group(t: pa.Table) -> pa.Table:
        g = t.group_by(key_list + ["salt"]).aggregate([("doc_h", "count_distinct")])
        return g.rename_columns(key_list + ["salt", "part_distinct"])

    per_salt = deduped.groupby(key_list + ["salt"]).map_groups(
        count_group, batch_format="pyarrow"
    )
    return per_salt.groupby(key_list).aggregate(
        Sum("part_distinct", alias_name="n_distinct_docs")
    )


def topk_sources(ds, k: int = 5, by: str = "sum_n_tok"):
    """Top-k sources by windowed token volume.

    Runs on the already-aggregated (small) stream: a global sort of the
    per-source totals, then ``limit`` — never a sort of the raw stream.
    """
    from ray.data.aggregate import Sum

    per_source = ds.groupby("source").aggregate(Sum(by, alias_name="total_n_tok"))
    return per_source.sort(["total_n_tok", "source"], descending=[True, False]).limit(k)
