"""Mergeable sketches for approximate aggregates at corpus scale.

The exact salted distinct count (``windows.salted_distinct_docs``) ships
every distinct (key, doc) tuple through the shuffle — exact, but at
10^12 documents the shuffle volume is the corpus.  The KMV (k-minimum
values) sketch bounds it: per group only the ``k`` smallest 64-bit hashes
survive, the merge is "k smallest of the union" (associative +
commutative + idempotent — safe under replays and arbitrary partial
merges), and the estimator is ``(k-1) * 2^64 / kth_min`` with relative
error ~ 1/sqrt(k).  Hashing is the engine's deterministic FNV — same
input, same sketch, bit-identical resumes (SURVEY.md §7).

Shape: the standard bucket pattern (stages/agg.py) — per-batch combiner
collapses to one sketch row per key, the shuffle key is
``hash(keys) % n_buckets``, per-bucket merge is vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dataflowkit_ray.stages.agg import composite_bucket
from dataflowkit_ray.tokenize import fnv1a64_numpy, full_hash64

_MAX64 = float(1 << 64)


def _group_id64(keys_tbl: pa.Table, key_list: list[str]) -> np.ndarray:
    """Full-width composite group id (collision space 2^64 — the
    bucket-capped composite_bucket only carries 30 bits per column and
    silently merged distinct keys beyond ~50k groups)."""
    h = np.zeros(len(keys_tbl), dtype=np.uint64)
    for c in key_list:
        h = h * np.uint64(1099511628211) + full_hash64(keys_tbl[c])
    return h


def _offsets32(offsets: np.ndarray) -> pa.Array:
    """int64 fold offsets -> int32 ListArray offsets, with the implicit
    2^31 bound made EXPLICIT: a merge bucket whose flattened kept-hash
    count exceeds int32 would otherwise wrap silently and corrupt every
    list boundary (ADVICE r3).  k-bounded sketches keep real buckets far
    below this; the check is one comparison."""
    if len(offsets) and int(offsets[-1]) > np.iinfo(np.int32).max:
        raise OverflowError(
            f"sketch list offsets exceed int32 ({int(offsets[-1])} values in "
            "one merge bucket); raise n_buckets or switch to large_list"
        )
    return pa.array(offsets.astype(np.int32), pa.int32())


def _kmv_rows(
    keys_tbl: pa.Table, key_list: list[str], hashes: np.ndarray, k: int
) -> pa.Table:
    """Collapse (keys, hash) rows to one sketch row per key group:
    ``minhashes: list<uint64>`` holding the <=k smallest distinct hashes.

    Fully vectorized via :func:`_bottomk_fold` (one lexsort + segment
    arithmetic) — an earlier version looped Python per group, the shape
    this engine bans on high-cardinality keys."""
    gid = _group_id64(keys_tbl, key_list)
    rep_rows, offsets, h_kept, _v = _bottomk_fold(gid, hashes, hashes, k)
    rep = keys_tbl.take(pa.array(rep_rows.astype(np.int64)))
    return pa.table(
        {
            **{c: rep[c] for c in key_list},
            "minhashes": pa.ListArray.from_arrays(
                _offsets32(offsets), pa.array(h_kept, pa.uint64())
            ),
        }
    )


def kmv_estimate(minhashes: np.ndarray, k: int) -> float:
    """Distinct estimate from a sketch (exact when fewer than k hashes)."""
    if len(minhashes) < k:
        return float(len(minhashes))
    kth = float(minhashes[k - 1])
    return (k - 1) * _MAX64 / kth


def kmv_distinct(
    ds,
    keys: tuple[str, ...] = ("source",),
    value_col: str = "doc_id",
    k: int = 256,
    n_buckets: int = 32,
):
    """Approximate count-distinct(value) per key group.

    Output: ``keys + (approx_distinct: double)``.  Relative error
    ~ 1/sqrt(k) (k=256 -> ~6%); exact below k distinct values.
    """
    key_list = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        h = full_hash64(v)  # full 64-bit identity hash (strings incl.)
        sk = _kmv_rows(t.select(key_list), key_list, h, k)
        return sk.append_column(
            "_bucket", pa.array(composite_bucket(sk, key_list, n_buckets))
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge_bucket(t: pa.Table) -> pa.Table:
        """k-smallest-of-union per group + the KMV estimator, fully
        vectorized (one lexsort + segment arithmetic; no per-group
        Python)."""
        mh = t["minhashes"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        flat = mh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        offsets = mh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        row_of = np.repeat(np.arange(len(t)), np.diff(offsets))

        gid = _group_id64(t, key_list)[row_of]
        rep_flat, off2, h_kept, _v = _bottomk_fold(gid, flat, flat, k)
        lens = np.diff(off2)
        starts = off2[:-1]
        # exact below k distinct hashes; else (k-1) * 2^64 / kth_min
        kth_idx = starts + np.minimum(lens, k) - 1
        kth = h_kept[np.maximum(kth_idx, 0)].astype(np.float64)
        est = np.where(
            lens < k,
            lens.astype(np.float64),
            (k - 1) * _MAX64 / np.maximum(kth, 1.0),
        )
        rep = t.take(pa.array(row_of[rep_flat].astype(np.int64)))
        return pa.table(
            {
                **{c: rep[c] for c in key_list},
                "approx_distinct": pa.array(est, pa.float64()),
            }
        )

    return (
        partials.groupby("_bucket")
        .map_groups(
            lambda t: merge_bucket(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )


def grouped_quantiles(
    ds,
    keys: tuple[str, ...],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5,),
    n_buckets: int = 32,
):
    """Exact per-group discrete quantiles via the bucket pattern.

    Values shuffle ONCE on ``hash(keys) % n_buckets`` (same-key rows
    co-locate); each bucket computes every group's order statistics in a
    single vectorized pass (lexsort by (group code, value) + offset
    arithmetic) — no per-group Python, no full sort of the dataset.

    Discrete ("lower") interpolation: result index = ceil(q * n) - 1 of
    the sorted group, matching DuckDB ``quantile_disc``.  Output columns:
    keys + ``q<percent>`` per requested quantile.

    Scale note: a single group's values must fit one task (bucket) —
    true for keyed telemetry/stats groups; a group of corpus scale needs
    the mergeable :func:`quantile_sketch` instead (bounded sketch rows
    through the shuffle), the same trade as ``kmv_distinct`` vs exact
    COUNT DISTINCT."""
    from dataflowkit_ray.stages.agg import composite_bucket

    key_list = list(keys)
    qnames = [f"q{int(round(q * 100)):02d}" for q in quantiles]

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.select(key_list + [value_col])
        return t.append_column(
            "_bucket", pa.array(composite_bucket(t, key_list, n_buckets))
        )

    def bucket_quantiles(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        n = len(t)
        if n == 0:
            cols = {k: t[k] for k in key_list}
            for qn in qnames:
                cols[qn] = t[value_col].slice(0, 0)  # preserve value dtype
            return pa.table(cols)
        # group code per row over the composite key
        codes = np.zeros(n, dtype=np.int64)
        mult = 1
        dicts = []
        for k in key_list:
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            d = col.dictionary_encode()
            idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            codes = codes * max(1, len(d.dictionary)) + idx
            dicts.append(d)
            mult *= max(1, len(d.dictionary))
        # native dtype preserved: int64 cast here silently truncated
        # float-valued columns (e.g. latencies) to zeros
        vals = t[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, codes))
        sc, sv = codes[order], vals[order]
        new = np.ones(n, dtype=bool)
        new[1:] = sc[1:] != sc[:-1]
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n))
        first_rows = order[starts]  # one representative row per group
        cols = {}
        for k in key_list:
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[k] = col.take(pa.array(first_rows))
        for q, qn in zip(quantiles, qnames):
            pos = np.ceil(q * lens).astype(np.int64) - 1
            pos = np.clip(pos, 0, lens - 1)
            cols[qn] = pa.array(sv[starts + pos])
        return pa.table(cols)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_quantiles, batch_format="pyarrow")
    )


# ------------------------------------------------- quantile sketch (bottom-k)


def _bottomk_fold(
    gid: np.ndarray, h: np.ndarray, v: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per distinct gid keep the k smallest DISTINCT h (v stays aligned).

    Returns (first_input_row_per_group, group_offsets, h_kept, v_kept) —
    one vectorized pass (lexsort + segment arithmetic), no per-group
    Python."""
    n = len(gid)
    order = np.lexsort((h, gid))
    g, hh, vv = gid[order], h[order], v[order]
    keep = np.ones(n, dtype=bool)
    keep[1:] = (g[1:] != g[:-1]) | (hh[1:] != hh[:-1])  # replay dedupe
    g, hh, vv, order = g[keep], hh[keep], vv[keep], order[keep]
    m = len(g)
    newg = np.ones(m, dtype=bool)
    newg[1:] = g[1:] != g[:-1]
    starts = np.nonzero(newg)[0]
    seg = np.diff(np.append(starts, m))
    rank = np.arange(m, dtype=np.int64) - np.repeat(starts, seg)
    sel = rank < k
    lens = np.minimum(seg, k)
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    return order[starts], offsets, hh[sel], vv[sel]


def quantile_sketch(
    ds,
    keys: tuple[str, ...],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5,),
    k: int = 512,
    n_buckets: int = 32,
    id_col: str = "doc_id",
):
    """Mergeable per-group quantile sketch: deterministic bottom-k-by-hash
    sample (the quantile sibling of :func:`kmv_distinct`).

    Per group only the ``k`` rows with the smallest ``full_hash64(id)``
    survive — a uniform random sample under the hash's permutation, but
    DETERMINISTIC, and the merge is "k smallest of the union":
    associative, commutative and idempotent, so partial sketches combine
    in any order/grouping with a bit-identical result (replays and
    resumes included).  Rank error of a sample quantile is
    ~ sqrt(q(1-q)/k) * n (k=512 -> ~2% of n at the median); EXACT when
    the group has <= k rows.

    Chosen over KLL/GK deliberately: KLL's compactor coin makes the
    sketch depend on merge ORDER, which breaks both this engine's
    bit-identical-resume contract (SURVEY.md §7) and exact oracle
    gating; the bottom-k sample trades its O(1/k) error for
    O(1/sqrt(k)) and buys order-insensitivity.  The sketch row is
    bounded (k hashes + k values) regardless of group size — per-group
    state never exceeds the sketch, unlike :func:`grouped_quantiles`
    whose single-task-per-group bound this removes.

    Output: keys + ``q<percent>: float64`` per requested quantile
    (discrete/"lower" interpolation on the sample, matching DuckDB
    ``quantile_disc`` in the exact regime).
    """
    key_list = list(keys)
    qnames = [f"q{int(round(q * 100)):02d}" for q in quantiles]

    def _sketch_cols(t: pa.Table, offsets, h_kept, v_kept, rep_rows):
        rep = t.take(pa.array(rep_rows.astype(np.int64)))
        return pa.table(
            {
                **{c: rep[c] for c in key_list},
                "qs_h": pa.ListArray.from_arrays(
                    _offsets32(offsets), pa.array(h_kept, pa.uint64())
                ),
                "qs_v": pa.ListArray.from_arrays(
                    _offsets32(offsets), pa.array(v_kept, pa.float64())
                ),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = full_hash64(ids)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        gid = _group_id64(t.select(key_list), key_list)
        rep_rows, offsets, hk, vk = _bottomk_fold(gid, h, v, k)
        sk = _sketch_cols(t, offsets, hk, vk, rep_rows)
        return sk.append_column(
            "_bucket", pa.array(composite_bucket(sk, key_list, n_buckets))
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            cols = {c: t[c] for c in key_list}
            for qn in qnames:
                cols[qn] = pa.array([], pa.float64())
            return pa.table(cols)
        hs = t["qs_h"]
        if isinstance(hs, pa.ChunkedArray):
            hs = hs.combine_chunks()
        vs = t["qs_v"]
        if isinstance(vs, pa.ChunkedArray):
            vs = vs.combine_chunks()
        flat_h = hs.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        flat_v = vs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = hs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        row_of = np.repeat(np.arange(len(t)), np.diff(offs))
        gid = _group_id64(t, key_list)[row_of]
        rep_flat, offsets, hk, vk = _bottomk_fold(gid, flat_h, flat_v, k)
        # quantiles over each group's kept sample, sorted by VALUE
        g_of = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        order = np.lexsort((vk, g_of))
        sv = vk[order]
        starts = offsets[:-1]
        lens = np.diff(offsets)
        first_rows = row_of[rep_flat]  # representative input row per group
        rep = t.take(pa.array(first_rows.astype(np.int64)))
        cols = {c: rep[c] for c in key_list}
        for q, qn in zip(quantiles, qnames):
            pos = np.clip(np.ceil(q * lens).astype(np.int64) - 1, 0, lens - 1)
            cols[qn] = pa.array(sv[starts + pos], pa.float64())
        return pa.table(cols)

    return (
        partials.groupby("_bucket")
        .map_groups(
            lambda t: merge_bucket(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )


# ----------------------------------------------------- heavy hitters (CMS)

CMS_DEPTH = 4
CMS_WIDTH = 8192


def _cms_word_partial(t: pa.Table, depth: int, width: int) -> pa.Table:
    """One batch -> sparse Count-Min partial rows (d, bucket, cnt) over
    the batch's words.  md5 is computed once per UNIQUE (d, word) via the
    batch dictionary (the ``_word_hashes`` amortization); counts ride the
    dictionary codes."""
    import hashlib

    import pyarrow.compute as pc

    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # drop_null (not fill ""): DuckDB str_split(NULL) unnests to zero
    # rows, so a filled "" word would diverge from the SQL replay
    words = pc.split_pattern(text.drop_null(), pattern=" ").flatten()
    if len(words) == 0:
        return pa.table(
            {
                "d": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    enc = words.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    counts = np.bincount(
        enc.indices.to_numpy(zero_copy_only=False), minlength=len(uniq)
    ).astype(np.int64)
    ds_, bs_, cs_ = [], [], []
    for d in range(depth):
        pre = f"{d}:"
        b = np.fromiter(
            (
                int.from_bytes(hashlib.md5((pre + w).encode()).digest()[8:], "little")
                % width
                for w in uniq
            ),
            count=len(uniq),
            dtype=np.int64,
        )
        # in-batch combine: several words can share a bucket
        dense = np.bincount(b, weights=counts, minlength=width).astype(np.int64)
        nz = np.flatnonzero(dense)
        ds_.append(np.full(len(nz), d, dtype=np.int64))
        bs_.append(nz.astype(np.int64))
        cs_.append(dense[nz])
    return pa.table(
        {
            "d": pa.array(np.concatenate(ds_)),
            "bucket": pa.array(np.concatenate(bs_)),
            "cnt": pa.array(np.concatenate(cs_)),
        }
    )


def cms_build(ds, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    """Distributed Count-Min build over the document word stream: sparse
    per-batch partials -> one (d, bucket) sum exchange -> the dense
    (depth, width) array.  The driver pull is the SKETCH, <= depth*width
    counters (256 KiB at the defaults) — constant in corpus size, the
    same bounded-budget rule as the IVF centroid sample."""
    from dataflowkit_ray.stages.agg import hash_agg

    partials = ds.map_batches(
        lambda t: _cms_word_partial(t, depth, width), batch_format="pyarrow"
    )
    summed = hash_agg(
        partials, ("d", "bucket"), [("cnt", "sum", "cnt")], n_buckets=8
    ).take_all()
    cms = np.zeros((depth, width), dtype=np.int64)
    for r in summed:
        cms[int(r["d"]), int(r["bucket"])] = int(r["cnt"])
    return cms


def cms_heavy_hitters(
    ds,
    ds_again,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
):
    """Top-k most frequent words by Count-Min estimate (Cormode &
    Muthukrishnan, J.Alg'05) — the heavy-hitters member of the sketch
    family (KMV distinct / bottom-k quantiles / CMS counts).

    Two passes, both streaming:
      1. :func:`cms_build` — mergeable, order-insensitive (pure counter
         sums), bounded state (depth x width), broadcast once;
      2. per batch: DISTINCT words -> estimate = min_d cms[d, h_d(word)]
         against the broadcast sketch -> block-local top-k partials ->
         one tiny merge (the ``top_orders`` pattern).  A word in the
         global top-k outranks all but < k words in ANY block containing
         it, so block-local top-k loses nothing (recall exact for the
         estimate ordering).

    Everything — including the approximation itself (md5 bucket
    collisions inflating estimates) — is a deterministic function of the
    word multiset, so a DuckDB oracle REPLAYS the approximate answer
    exactly (``HEAVY_HITTERS_SQL``); no exact-regime carve-out needed.
    Estimates are upper bounds: true_count <= est <= true_count +
    eps*N with eps = e/width at failure prob (1/2)^depth.

    ``ds_again``: the same logical dataset for pass 2 (a Dataset can
    only be consumed once per lineage without re-execution; callers pass
    two reads of the same files).
    """
    import hashlib

    import pyarrow.compute as pc
    import ray

    cms_ref = ray.put(cms_build(ds, depth, width))

    def topk_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "word": pa.array([], pa.string()),
                "est_count": pa.array([], pa.int64()),
            }
        )
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # drop_null (not fill ""): DuckDB str_split(NULL) unnests to zero
        # rows, so a filled "" word would diverge from the SQL replay
        words = pc.split_pattern(text.drop_null(), pattern=" ").flatten()
        if len(words) == 0:
            return empty
        cms = ray.get(cms_ref)
        # uniques via the batch dictionary (O(unique) Python, not
        # O(words)); sorted so stable argsort breaks ties word-asc
        uniq = sorted(words.dictionary_encode().dictionary.to_pylist())
        est = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            pre = f"{d}:"
            b = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5((pre + w).encode()).digest()[8:], "little"
                    )
                    % width
                    for w in uniq
                ),
                count=len(uniq),
                dtype=np.int64,
            )
            np.minimum(est, cms[d, b], out=est)
        order = np.argsort(-est, kind="stable")[:k]  # uniq sorted => ties by word asc
        return pa.table(
            {
                "word": pa.array([uniq[i] for i in order], pa.string()),
                "est_count": pa.array(est[order]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        # dedupe by word (same word carries the identical global estimate
        # from every block), then one final top-k
        w = t["word"].to_pylist()
        e = t["est_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        seen: dict[str, int] = {}
        for wi, ei in zip(w, e):
            seen[wi] = int(ei)
        items = sorted(seen.items())  # word asc for deterministic ties
        ests = np.asarray([v for _, v in items], dtype=np.int64)
        order = np.argsort(-ests, kind="stable")[:k]
        return pa.table(
            {
                "word": pa.array([items[i][0] for i in order], pa.string()),
                "est_count": pa.array(ests[order]),
            }
        )

    return (
        ds_again.map_batches(topk_block, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def heavy_hitters_sql(k: int = 20, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    """DuckDB replay of the CMS estimate — identical md5 bucketing, so
    the oracle reproduces the approximation bit-for-bit."""
    ds_list = ", ".join(str(d) for d in range(depth))
    return f"""
WITH wc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
buck AS (
  SELECT w, c, t.d,
         md5_number_lower(CAST(t.d AS VARCHAR) || ':' || w) % {width} AS b
  FROM wc, (SELECT unnest([{ds_list}]) AS d) t
),
cms AS (SELECT d, b, SUM(c) AS cnt FROM buck GROUP BY d, b),
est AS (
  SELECT buck.w, CAST(MIN(cms.cnt) AS BIGINT) AS est
  FROM buck JOIN cms ON cms.d = buck.d AND cms.b = buck.b
  GROUP BY buck.w
)
SELECT w AS word, est AS est_count
FROM est ORDER BY est DESC, w ASC LIMIT {k}
"""
