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
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.config import np_col
from dataflowkit_ray.tokenize import fnv1a64_numpy


# ---------------------------------------------------------------- assignment


def _seq_np(batch: pa.Table, col: str) -> np.ndarray:
    return np_col(batch[col])


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


def bucket_of(arr: pa.Array | pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id per element (int or string arrays).

    The scale pattern for keyed stages with MANY keys: shuffle on
    ``hash(key) % n_buckets`` instead of the raw key, then process every
    key of a bucket vectorized in ONE call — per-group python calls don't
    survive 10^6+ keys.  String hashing runs over the (small) dictionary
    of uniques only.
    """
    import zlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        h = fnv1a64_numpy(np_col(arr))
    else:
        d = arr.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        uh = np.fromiter(
            (zlib.crc32(str(u).encode()) for u in uniq), count=len(uniq), dtype=np.int64
        )
        h = fnv1a64_numpy(uh[np_col(d.indices)])
    return (h % np.uint64(n_buckets)).astype(np.int64)


def sessionize_table(
    t: pa.Table, gap: int, key_col: str, clock_col: str
) -> pa.Table:
    """Vectorized gap-merge sessionization of ALL keys in one table.

    Sort by (key, clock); a new session starts at a key change or a clock
    gap > G.  Session id = first clock value of the session — data-derived
    (deterministic on replay, SURVEY.md §7 "bit-identical resume")."""
    if len(t) == 0:
        return t.append_column("session_id", pa.array([], type=pa.int64()))
    idx = pc.sort_indices(
        t, sort_keys=[(key_col, "ascending"), (clock_col, "ascending")]
    )
    t = t.take(idx)
    keys = t[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = np_col(keys.dictionary_encode().indices)
    clock = np_col(t[clock_col])
    new_s = np.ones(len(t), dtype=bool)
    new_s[1:] = (codes[1:] != codes[:-1]) | (np.diff(clock) > gap)
    starts_idx = np.nonzero(new_s)[0]
    counts = np.diff(np.append(starts_idx, len(t)))
    session_id = np.repeat(clock[starts_idx], counts)
    if "session_id" in t.column_names:
        t = t.drop_columns(["session_id"])
    return t.append_column("session_id", pa.array(session_id))


def assign_sessions(
    ds,
    gap: int,
    key_col: str = "source",
    clock_col: str = "event_seq",
    n_buckets: int = 64,
):
    """Dataset-level session assignment: one bucket shuffle.

    All events of a key land in one bucket (``hash(key) % n_buckets``);
    each bucket is sessionized vectorized in a single call.  ``n_buckets``
    bounds shuffle fan-in and scales with the cluster, not the key count."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(bucket_of(t[key_col], n_buckets)))

    def per_bucket(t: pa.Table) -> pa.Table:
        return sessionize_table(t, gap, key_col, clock_col).drop_columns(["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
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
        from dataflowkit_ray.stages.agg import checked_rename

        return checked_rename(
            agg,
            key_list + ["n_tok_sum", "n_tok_count"],
            key_list + ["n_tok_sum", "rows"],
        )

    return fn


def windowed_sum(ds, keys: tuple[str, ...] = ("source", "window_id"), batch_size: int | None = None):
    """sum(n_tok) + row count per window key, two-phase (bucket shuffle)."""
    from dataflowkit_ray.stages.agg import hash_agg

    return hash_agg(
        ds,
        keys,
        [("n_tok", "sum", "sum_n_tok"), ("n_tok", "count", "n_rows")],
        batch_size=batch_size,
    )


def salted_distinct_docs(
    ds,
    keys: tuple[str, ...] = ("source", "window_id"),
    n_salts: int = 16,
    batch_size: int | None = None,
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

    # phase 2: shuffle on hash(keys, salt) % n_buckets — all rows of one
    # (keys, salt) meet in one bucket; count-distinct for EVERY group in
    # the bucket happens in one vectorized Arrow call (bucket pattern:
    # per-group python calls don't survive many windows).
    n_buckets = 4 * n_salts

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for k in key_list + ["salt"]:
            h = h * np.uint64(1099511628211) + bucket_of(t[k], 1 << 30).astype(np.uint64)
        return t.append_column("_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def count_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(key_list + ["salt"]).aggregate([("doc_h", "count_distinct")])
        from dataflowkit_ray.stages.agg import checked_rename

        g = checked_rename(
            g,
            key_list + ["salt", "doc_h_count_distinct"],
            key_list + ["salt", "part_distinct"],
        )
        return g.drop_columns(["salt"])

    per_salt = (
        deduped.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
    )
    from dataflowkit_ray.stages.agg import hash_agg

    return hash_agg(
        per_salt, tuple(key_list), [("part_distinct", "sum", "n_distinct_docs")]
    )


def topk_sources(ds, k: int = 5, by: str = "sum_n_tok"):
    """Top-k sources by windowed token volume.

    Runs on the already-aggregated (small) stream: a global sort of the
    per-source totals, then ``limit`` — never a sort of the raw stream.
    """
    from dataflowkit_ray.stages.agg import hash_agg

    per_source = hash_agg(ds, ("source",), [(by, "sum", "total_n_tok")], n_buckets=8)
    return per_source.sort(["total_n_tok", "source"], descending=[True, False]).limit(k)
