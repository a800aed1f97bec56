"""Stateful stream-stream join on ``doc_id`` — the details-join analog.

The reference's central join (J1, SURVEY.md §2.4): a parent block stores a
FK to a child payload's UID, and at encode time the reader recursively
fetches the child rows and **embeds** them — one child row becomes a
struct, N child rows become a list of structs
(``/root/reference/scrape/encoders.go:207-241,233-239``).

Engine design, Ray-Data-first:

1. Within an epoch, the join is :func:`bucket_equi_join` — one sort
   exchange on ``hash(doc_id) % n_buckets`` + a local Acero hash join
   per bucket (it replaced Ray's native ``Dataset.join``, whose
   actor-pool exchange dominated cpu-time; equivalence asserted in
   tests).  ``doc_id`` is high-cardinality, so the hash partitioning is
   naturally balanced (SURVEY.md §4: skew lives in ``source``, not
   ``doc_id``).
2. The embed rule is a pre-aggregation of the child side:
   ``child.groupby(doc_id) -> one row per key with details:list<struct>``.
   That keeps the join itself 1:1 and reproduces the reference's
   "N matches -> list" collapse (A2/A3, ``scrape/scrape.go:75-83``).
3. *Across* epochs, unmatched rows wait in the hash-partitioned state
   store (actor pool, ``dataflowkit_ray.state.store``) with a TTL in
   epochs — see ``runner.StreamingJoin``.

The child stream used by the flagship pipeline is the doc's own
"detail blocks": fixed-size chunks of the token sequence — the analog of
``divide`` splitting a page into repeated blocks
(``/root/reference/scrape/scrape.go:447-517``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_chunks(chunk_size: int = 16, with_tokens: bool = True, id_col: str = "doc_id"):
    """map_batches fn: token stream -> child "detail" stream.

    One output row per ``chunk_size``-token block:
    (<id_col>, chunk_idx:int32, chunk_n_tok:int32[, chunk_tokens:list<int32>]).
    Vectorized flat-map (np.repeat + Arrow take + re-sliced list offsets).

    ``with_tokens=False`` skips materializing the chunk token payload —
    consumers that immediately aggregate (the flagship/details-count
    path) only need the lengths, and gathering the full token buffer per
    chunk was the single most expensive kernel in the flagship profile.

    ``id_col`` picks the parent key carried on child rows: ``event_seq``
    (int64 == int(doc_id)) makes the downstream hash join/aggregate key
    an integer — measurably cheaper than the string doc_id at volume.
    """

    def fn(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        n_tok = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.maximum(1, -(-n_tok // chunk_size))  # empty doc -> 1 empty chunk
        row_idx = np.repeat(np.arange(len(n_tok)), n_chunks)
        cum = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        chunk_idx = (np.arange(n_chunks.sum()) - np.repeat(cum, n_chunks)).astype(np.int64)

        list_off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        list_off = list_off - list_off[0]
        starts = list_off[row_idx] + chunk_idx * chunk_size
        ends = np.minimum(starts + chunk_size, list_off[row_idx + 1])
        lengths = ends - starts

        doc_id = batch[id_col]
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        cols = {
            id_col: doc_id.take(pa.array(row_idx)),
            "chunk_idx": pa.array(chunk_idx.astype(np.int32)),
            "chunk_n_tok": pa.array(lengths.astype(np.int32)),
        }
        if with_tokens:
            # build chunk_tokens as a ListArray over a gathered value buffer
            flat = tokens.flatten()
            val_idx = np.repeat(starts, lengths) + (
                np.arange(lengths.sum())
                - np.repeat(np.concatenate(([0], np.cumsum(lengths)))[:-1], lengths)
            )
            values = flat.take(pa.array(val_idx))
            offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
            cols["chunk_tokens"] = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), values
            )
        return pa.table(cols)

    return fn


def cogroup_join_structs(parent_ds, child_ds, key: str = "doc_id", n_buckets: int = 64):
    """Nested-embed join via cogroup: tagged union + ONE bucket shuffle.

    Acero's hash join cannot carry ``list<struct>`` payload columns, so the
    nested output path co-groups both streams instead — the direct analog
    of the reference's merge-at-encode (``storageResultReader.Read``
    recursively fetching child rows by FK and embedding them,
    ``/root/reference/scrape/encoders.go:207-241``).

    Scale shape: the shuffle key is ``hash(doc_id) % n_buckets`` (a small
    int), NOT the raw doc_id whose cardinality is the stream size; each
    bucket folds EVERY key it holds in one vectorized pass (dictionary
    codes + bincount + one ListArray assembly) — no per-group Python.

    Contract: parent keys are unique per stream (asserted) — same as the
    streaming ``JoinStateShard`` build side.

    Output per parent row: parent columns (minus ``tokens``) +
    ``n_details:int64`` + ``details: list<struct<chunk_idx:int32,
    chunk_n_tok:int32>>`` ordered by chunk_idx.  1 child -> one-element
    list (the scalar-vs-list rule of ``encoders.go:233-239`` is preserved
    on values; Arrow requires one column type).
    """

    def tag_parent(t: pa.Table) -> pa.Table:
        cols = [c for c in t.column_names if c != "tokens"]
        t = t.select(cols)
        n = len(t)
        t = t.append_column("side", pa.array(np.zeros(n, dtype=np.int8)))
        t = t.append_column("chunk_idx", pa.nulls(n, pa.int32()))
        t = t.append_column("chunk_n_tok", pa.nulls(n, pa.int32()))
        return t

    parent_cols = [c for c in parent_ds.schema().names if c != "tokens"]

    def tag_child(t: pa.Table) -> pa.Table:
        n = len(t)
        out = {key: t[key]}
        for c in parent_cols:
            if c == key:
                continue
            out[c] = pa.nulls(n, parent_schema_types[c])
        out["side"] = pa.array(np.ones(n, dtype=np.int8))
        out["chunk_idx"] = t["chunk_idx"]
        out["chunk_n_tok"] = t["chunk_n_tok"]
        return pa.table(out)

    parent_schema = parent_ds.schema()
    parent_schema_types = {
        n_: parent_schema.types[i] for i, n_ in enumerate(parent_schema.names)
    }

    tagged = parent_ds.map_batches(tag_parent, batch_format="pyarrow").union(
        child_ds.map_batches(tag_child, batch_format="pyarrow")
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        from dataflowkit_ray.stages.windows import bucket_of

        return t.append_column("_bucket", pa.array(bucket_of(t[key], n_buckets)))

    def fold_bucket(t: pa.Table) -> pa.Table:
        """Fold EVERY key of the bucket in one vectorized pass."""
        t = t.drop_columns(["_bucket"])
        side = t["side"].to_numpy(zero_copy_only=False)
        parents = t.filter(pa.array(side == 0))
        children = t.filter(pa.array(side == 1))
        if len(parents) == 0 or len(children) == 0:
            # inner semantics on BOTH paths: unmatched rows of either side
            # drop, matching the hash-join path (the streaming runner
            # buffers them in the state store instead; J1 cross-epoch)
            out = {c: pa.array([], type=parent_schema_types[c]) for c in parent_cols}
            out["n_details"] = pa.array([], type=pa.int64())
            out["details"] = pa.array(
                [],
                type=pa.list_(
                    pa.struct([("chunk_idx", pa.int32()), ("chunk_n_tok", pa.int32())])
                ),
            )
            return pa.table(out)
        pk = parents[key]
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        ck = children[key]
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        comb = pa.concat_arrays([pk, ck]).dictionary_encode()
        codes = comb.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        P = len(pk)
        p_codes, c_codes = codes[:P], codes[P:]
        n_codes = len(comb.dictionary)
        if len(np.unique(p_codes)) != P:
            raise ValueError(
                f"cogroup_join_structs: duplicate parent {key} in stream "
                "(contract: unique parent keys, as for JoinStateShard)"
            )
        child_count = np.bincount(c_codes, minlength=n_codes)
        parent_present = np.zeros(n_codes, dtype=bool)
        parent_present[p_codes] = True
        # parents kept (have >= 1 child), ordered by code
        idx_p = np.nonzero(child_count[p_codes] > 0)[0]
        idx_p = idx_p[np.argsort(p_codes[idx_p], kind="stable")]
        kept_codes = p_codes[idx_p]
        # children kept (parent exists), ordered by (code, chunk_idx)
        chunk_idx_np = children["chunk_idx"].to_numpy(zero_copy_only=False)
        idx_c = np.nonzero(parent_present[c_codes])[0]
        idx_c = idx_c[np.lexsort((chunk_idx_np[idx_c], c_codes[idx_c]))]
        children_kept = children.take(pa.array(idx_c))
        counts_kept = child_count[kept_codes]
        offsets = np.concatenate(([0], np.cumsum(counts_kept))).astype(np.int32)
        detail_struct = pa.StructArray.from_arrays(
            [
                children_kept["chunk_idx"].combine_chunks(),
                children_kept["chunk_n_tok"].combine_chunks(),
            ],
            names=["chunk_idx", "chunk_n_tok"],
        )
        details = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), detail_struct
        )
        out = parents.take(pa.array(idx_p)).select(parent_cols)
        out = out.append_column("n_details", pa.array(counts_kept.astype(np.int64)))
        out = out.append_column("details", details)
        return out

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fold_bucket, batch_format="pyarrow")
    )


def bucket_equi_join(
    left_ds,
    right_ds,
    on: str = "doc_id",
    n_buckets: int = 32,
    join_type: str = "inner",
):
    """Generic distributed equi-join via the bucket pattern: tagged
    schema-harmonized union → ONE sort shuffle on ``hash(key) %
    n_buckets`` → per-bucket local Acero hash join.

    Used instead of ``Dataset.join`` on the batch paths: Ray's
    hash-shuffle join spins an actor pool per execution and its exchange
    measured ~10× the cpu-time of everything else in the pipeline at
    bench scale (62 of ~80 cpu-s in the round-2 flagship); this reuses
    the same sort exchange every other stage uses and joins each bucket
    with Acero's vectorized hash join.  Equivalence with
    ``Dataset.join`` is asserted in ``tests/test_join.py``.

    Contract: non-key column names are disjoint across sides (raises
    otherwise).  Scale shape: the shuffle moves each row once;
    ``n_buckets`` bounds per-task memory — size it so
    corpus_bytes / n_buckets fits a task.  ``join_type`` passes through
    to Acero ("inner", "left outer", "full outer", ...).

    Byte-cost note: schema harmonization pads each side with all-null
    columns for the other side's fields, and Arrow ships a full-width
    data buffer for nulls — each row pays the other side's column
    widths through the exchange.  Cheap when one side is narrow (the
    engine's uses: a slim aggregated child vs a wide parent); for two
    wide sides prefer projecting both to the fold's needed columns
    first — every byte through a shuffle is paid at exchange bandwidth.
    """
    lschema, rschema = left_ds.schema(), right_ds.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    shared = (set(lcols) & set(rcols)) - {on}
    if shared:
        raise ValueError(f"bucket_equi_join: overlapping non-key columns {shared}")
    reserved = {"_side", "_bucket"} & (set(lcols) | set(rcols))
    if reserved:
        # the tag stage would silently overwrite them (dict-key collision)
        raise ValueError(f"bucket_equi_join: reserved column names {reserved}")
    types = dict(zip(lschema.names, lschema.types))
    types.update(dict(zip(rschema.names, rschema.types)))
    r_only = [c for c in rcols if c != on]
    all_cols = lcols + r_only

    from dataflowkit_ray.stages.windows import bucket_of

    def tag(side: int, own_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            out = {}
            for c in all_cols:
                if c in own_cols:
                    col = t[c]
                    out[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                else:
                    out[c] = pa.nulls(n, types[c])
            out["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            out["_bucket"] = pa.array(bucket_of(t[on], n_buckets))
            return pa.table(out)

        return fn

    tagged = left_ds.map_batches(tag(0, lcols), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, rcols), batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        side = t["_side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(lcols)
        rt = t.filter(pa.array(side == 1)).select([on, *r_only])
        return lt.join(rt, keys=[on], join_type=join_type).select(all_cols)

    return tagged.groupby("_bucket").map_groups(fold, batch_format="pyarrow")


def bucket_join_agg(
    left_ds,
    right_ds,
    on: str,
    specs: list[tuple[str, str, str]],
    *,
    n_buckets: int = 32,
    join_type: str = "inner",
):
    """Fused aggregate-then-join: equivalent to
    ``bucket_equi_join(left_ds, hash_agg(right_ds, (on,), specs), on)``
    but through ONE exchange instead of two.

    The aggregate-then-join shape (TPC-H Q3: revenue per order, joined
    to orders) normally pays two all-to-alls keyed by the SAME column —
    the aggregate's sort shuffle and the join's.  Here the right side is
    combined map-side (one row per key per batch, the standard combiner),
    TAGGED, and unioned with the left rows into the join's single
    bucket exchange; the per-bucket fold finishes the combine (merge of
    per-batch partials) before the local Acero hash join.  Exchange
    bytes strictly shrink: right partials travel once instead of
    partials + finished aggregates.

    ``specs`` = [(col, fn, out_name)] with fn in sum/count/min/max (mean
    needs a finalize division — use ``hash_agg`` + ``bucket_equi_join``
    for that).  Same disjoint-columns contract as
    :func:`bucket_equi_join`."""
    from dataflowkit_ray.stages.agg import _MERGE, agg_names, checked_rename
    from dataflowkit_ray.stages.windows import bucket_of

    if any(fn == "mean" for _, fn, _ in specs):
        raise ValueError("bucket_join_agg: mean needs hash_agg + bucket_equi_join")
    lschema, rschema = left_ds.schema(), right_ds.schema()
    lcols = list(lschema.names)
    out_names = [out for _, _, out in specs]
    shared = set(lcols) & set(out_names)
    if shared:
        raise ValueError(f"bucket_join_agg: overlapping non-key columns {shared}")
    partial_names = [f"__p{i}" for i in range(len(specs))]
    reserved = (set(partial_names) | {"_side", "_bucket"}) & set(lcols)
    if reserved:
        # tag_left would silently null these out (dict-key collision)
        raise ValueError(f"bucket_join_agg: reserved column names {reserved}")
    part_aggs = [(c, fn) for c, fn, _ in specs]
    merge_aggs = [(p, _MERGE[fn]) for p, (_, fn, _) in zip(partial_names, specs)]

    # partial-column TYPES for the left side's null padding, derived by
    # running the combine on an empty right-schema table (Arrow promotes
    # e.g. sum(int32) -> int64; guessing would mis-type the union)
    empty_r = pa.Table.from_pylist(
        [], schema=pa.schema(list(zip(rschema.names, rschema.types)))
    )
    probe = empty_r.group_by([on]).aggregate(part_aggs)
    probe = checked_rename(probe, agg_names([on], part_aggs), [on] + partial_names)
    ptypes = {p: probe.schema.field(p).type for p in partial_names}

    ltypes = dict(zip(lschema.names, lschema.types))
    all_cols = lcols + out_names

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        out = {}
        for c in lcols:
            col = t[c]
            out[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        for p in partial_names:
            out[p] = pa.nulls(n, ptypes[p])
        out["_side"] = pa.array(np.full(n, 0, dtype=np.int8))
        out["_bucket"] = pa.array(bucket_of(t[on], n_buckets))
        return pa.table(out)

    def combine_tag_right(t: pa.Table) -> pa.Table:
        used = [on] + sorted({c for c, _, _ in specs})
        g = t.select(used).group_by([on]).aggregate(part_aggs)
        g = checked_rename(g, agg_names([on], part_aggs), [on] + partial_names)
        n = len(g)
        out = {}
        for c in lcols:
            if c == on:
                col = g[on]
                out[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            else:
                out[c] = pa.nulls(n, ltypes[c])
        for p in partial_names:
            out[p] = g[p]
        out["_side"] = pa.array(np.full(n, 1, dtype=np.int8))
        out["_bucket"] = pa.array(bucket_of(g[on], n_buckets))
        return pa.table(out)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(combine_tag_right, batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        side = t["_side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(lcols)
        rp = t.filter(pa.array(side == 1)).select([on, *partial_names])
        g = rp.group_by([on]).aggregate(merge_aggs)
        g = checked_rename(g, agg_names([on], merge_aggs), [on] + out_names)
        return lt.join(g, keys=[on], join_type=join_type).select(all_cols)

    return tagged.groupby("_bucket").map_groups(fold, batch_format="pyarrow")


def join_details(
    parent_ds,
    child_ds,
    key: str = "doc_id",
    num_partitions: int = 16,
    with_struct: bool = False,
):
    """Parent ⋈ embedded children on ``doc_id`` (inner, 1:1 after embed).

    ``with_struct=False`` drops the nested ``details`` column (cheap path
    for aggregate-only consumers and the SQL oracle); ``True`` keeps it.
    """
    if with_struct:
        return cogroup_join_structs(parent_ds, child_ds, key=key)
    # aggregate-only embed: the detail aggregate and the parent join are
    # keyed by the SAME column, so both ride ONE tagged bucket exchange
    # (bucket_join_agg) — per-batch combine map-side, final combine +
    # Acero join in the fold.  Never Ray's per-group-python groupby
    # (doc_id cardinality is the stream size).
    parent = parent_ds.drop_columns(["tokens"]) if "tokens" in parent_ds.schema().names else parent_ds
    return bucket_join_agg(
        parent,
        child_ds,
        on=key,
        specs=[
            ("chunk_n_tok", "count", "n_details"),
            ("chunk_n_tok", "sum", "sum_detail_tok"),
        ],
        n_buckets=num_partitions,
        join_type="inner",
    )


def semi_join_route(parent_ds, key_col: str = "doc_id"):
    """IsPath-mode routing (J2): project the key stream only, emit no data
    rows — intermediate hops exist solely to feed keys to the next stage
    (``/root/reference/scrape/scrape.go:538-545``)."""
    return parent_ds.select_columns([key_col])


# ------------------------------------------------------------ range join


class IntervalIndex:
    """Elementary-segment decomposition of a set of CLOSED int64
    intervals [lo, hi] — the vectorized broadcast side of
    :func:`range_join`.

    Boundaries B = sorted unique of all {lo, hi+1}; the domain splits
    into segments [B_j, B_{j+1}) each covered by a FIXED set of
    intervals, precomputed as a flat CSR (segment -> interval ids).
    Probing a value v is then one ``searchsorted`` + one slice — exact
    for arbitrary OVERLAPPING intervals, O(log M + matches) per value,
    no per-row Python.  Build cost O(M log M + overlap mass), paid once
    and shipped via ``ray.put``.
    """

    def __init__(self, lo: np.ndarray, hi: np.ndarray):
        lo = np.asarray(lo, dtype=np.int64)
        hi = np.asarray(hi, dtype=np.int64)
        if len(lo) != len(hi):
            raise ValueError("lo/hi length mismatch")
        if (hi < lo).any():
            raise ValueError("interval with hi < lo")
        if len(hi) and int(hi.max()) == np.iinfo(np.int64).max:
            # hi+1 would wrap to INT64_MIN and corrupt the boundary set
            raise OverflowError(
                "interval hi == INT64_MAX unsupported (closed-interval "
                "decomposition needs hi+1); use INT64_MAX-1 as the open bound"
            )
        self.n_intervals = len(lo)
        B = np.unique(np.concatenate([lo, hi + 1]))
        s0 = np.searchsorted(B, lo)
        s1 = np.searchsorted(B, hi + 1)
        counts = s1 - s0
        total = int(counts.sum())
        iv = np.repeat(np.arange(self.n_intervals, dtype=np.int64), counts)
        seg = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        ) + np.repeat(s0, counts)
        order = np.argsort(seg, kind="stable")  # stable: interval order kept
        self.bounds = B
        self.flat_ids = iv[order]
        # CSR pointers over segments 0..len(B)-2
        self.seg_ptr = np.searchsorted(seg[order], np.arange(len(B)), side="left")

    def probe(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(row_indices, interval_ids) for every containment match."""
        v = np.asarray(values, dtype=np.int64)
        if self.n_intervals == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        j = np.searchsorted(self.bounds, v, side="right") - 1
        valid = (j >= 0) & (j < len(self.bounds) - 1)
        j = np.where(valid, j, 0)
        start = self.seg_ptr[j]
        cnt = np.where(valid, self.seg_ptr[j + 1] - start, 0)
        rows = np.repeat(np.arange(len(v), dtype=np.int64), cnt)
        flat_pos = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        ) + np.repeat(start, cnt)
        return rows, self.flat_ids[flat_pos]


def range_join(
    ds,
    intervals: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    n_cpus: float = 0.5,
):
    """Interval (range) join: every left row joins each interval row
    whose CLOSED range [lo, hi] contains ``value_col`` — the non-equi
    join the brief names alongside the as-of join (e.g. timestamps vs
    maintenance windows, IPs vs CIDR ranges, prices vs brackets).

    Shape: the interval table is the SMALL side (a lookup set) — built
    into an :class:`IntervalIndex` once, ``ray.put`` once, probed
    vectorized per batch; the left stream never shuffles.  Output =
    left columns + the interval's non-(lo,hi) payload columns.  For an
    interval side too large to broadcast, partition the VALUE DOMAIN
    into key ranges, replicate each interval to every range it overlaps
    (bounded by overlap mass), and run this same probe per partition —
    the documented scale path, same trade as broadcast-vs-bucket equi
    joins.

    Values and bounds must be integer-valued (int64 domain — timestamps
    in micros, ids, cents); closed-interval semantics match SQL
    ``BETWEEN``.
    """
    import ray

    lo = intervals[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = intervals[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
    payload_cols = [c for c in intervals.column_names if c not in (lo_col, hi_col)]
    payload = intervals.select(payload_cols)
    idx_ref = ray.put(IntervalIndex(lo, hi))
    payload_ref = ray.put(payload)

    def probe_batch(t: pa.Table) -> pa.Table:
        idx = ray.get(idx_ref)
        pay = ray.get(payload_ref)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        rows, ivs = idx.probe(
            pc.cast(v, pa.int64()).to_numpy(zero_copy_only=False)
        )
        out = t.take(pa.array(rows))
        for c in pay.column_names:
            out = out.append_column(c, pay[c].take(pa.array(ivs)))
        return out

    return ds.map_batches(probe_batch, batch_format="pyarrow", num_cpus=n_cpus)
