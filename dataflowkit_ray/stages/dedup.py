"""Deduplication operators for large-scale training-data pipelines.

The reference's dedup is exact-by-construction: deterministic content-hash
record keys + idempotent Upsert (``/root/reference/scrape/scrape.go:134-155``,
``storage/mongo.go:70-72``).  The engine keeps that (exact dedup by
content hash) and adds the near-dup family a 100 TB corpus needs:

* exact       — hash text -> keep first (min doc_id) per hash
* n-gram      — word w-shingles, exact Jaccard on candidate pairs
* MinHash+LSH — shingle -> minhash signature -> banded buckets -> verify
* SimHash     — 64-bit weighted token hash; near-dup = small Hamming dist

Everything shuffles by BUCKET (``hash % n_buckets``), never by raw key,
and verifies pairs inside vectorized per-bucket calls — the same pattern
as ``stages/agg.hash_agg``.  The verify step is a BUCKET JOIN of the
candidate-pair stream against the (doc -> shingles) stream: no driver
materialization, no corpus-data broadcast, each stage streams.

Hashing is deterministic and full-width: word hashes are md5-lower-64
(DuckDB ``md5_number_lower``-replayable) over the per-batch dictionary
of unique words (vectorized via
``dictionary_encode`` — the Python cost is O(unique words), amortized
over repeats, the same pattern as ``stages/textstats.py``); shingle
hashes are an FNV-1a chain over the word hashes.

Content-identity keys (exact/streaming/corpus dedup) are **128-bit**,
carried as two independent 64-bit lanes and grouped on both
(``tokenize.full_hash128``): 64 bits is NOT collision-free at corpus
scale — 2^64 birthday bounds give ~2-3 expected silent false-merges at
10^10 docs, each deleting a distinct document — while 2^128 cannot
collide at any physical corpus size.  Shingle/band/bucket hashes stay
64-bit: they feed candidate generation or similarity ESTIMATES, where a
collision costs one spurious candidate or an epsilon of bias, not data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.config import FNV_OFFSET, FNV_PRIME
from dataflowkit_ray.stages.agg import composite_bucket, hash_agg
from dataflowkit_ray.tokenize import fnv1a64_numpy, full_hash128


# ----------------------------------------------------------------- hashing


def _word_hashes(text: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Split on ' ' -> (row_offsets int64 (n+1), flat 64-bit word hashes).

    Word hash = lower 8 bytes (little-endian) of md5 of the word bytes —
    chosen so a DuckDB oracle can replay it verbatim via
    ``md5_number_lower`` (byte-order equality asserted in
    tests/test_sql_parity.py).  Computed once per UNIQUE word in the
    batch (dictionary-encode) and broadcast through the codes —
    vectorized; no per-row Python."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    words = pc.split_pattern(text, pattern=" ")
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    if len(flat) == 0:
        return offsets, np.empty(0, np.uint64)
    d = flat.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode()).digest()[8:], "little")
            for u in uniq
        ),
        count=len(uniq),
        dtype=np.uint64,
    )
    wh = uh[d.indices.to_numpy(zero_copy_only=False)]
    return offsets, wh


def shingle_hash_flat(
    text: pa.Array | pa.ChunkedArray, w: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row sorted-UNIQUE hashes of word w-shingles, for a whole batch
    at once: returns ``(row_offsets (n+1), values)`` in list<uint64>
    layout.  Shingle hash = FNV-1a chain over the w word hashes
    (order-sensitive: "a b c" != "c b a").  Rows with fewer than ``w``
    words emit one length-1 chain per word (same set size as hashing each
    word, so Jaccard semantics are unchanged)."""
    offsets, wh = _word_hashes(text)
    n = len(offsets) - 1
    n_words = np.diff(offsets)
    s_len = np.where(n_words >= w, n_words - w + 1, n_words)
    cum = np.concatenate(([0], np.cumsum(s_len)))
    S = int(cum[-1])
    if S == 0:
        return np.zeros(n + 1, np.int64), np.empty(0, np.uint64)
    row_of = np.repeat(np.arange(n), s_len)
    pos = np.arange(S) - np.repeat(cum[:-1], s_len)
    gstart = offsets[:-1][row_of] + pos
    clen = np.where(n_words[row_of] >= w, w, 1)
    h = np.full(S, FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    for j in range(w):
        active = clen > j
        if not active.any():
            break
        h[active] = (h[active] ^ wh[gstart[active] + j]) * prime
    # per-row unique: sort by (row, hash), drop adjacent dups
    order = np.lexsort((h, row_of))
    r, v = row_of[order], h[order]
    keep = np.ones(S, dtype=bool)
    if S > 1:
        keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    r2, v2 = r[keep], v[keep]
    counts = np.bincount(r2, minlength=n)
    out_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return out_off, v2


def shingle_hashes(text: pa.Array | pa.ChunkedArray, w: int = 3) -> list[np.ndarray]:
    """List-of-arrays view over :func:`shingle_hash_flat` (test helper)."""
    off, vals = shingle_hash_flat(text, w)
    return [vals[off[i] : off[i + 1]] for i in range(len(off) - 1)]


def benchmark_shingle_set(bench_ds, text_col: str = "text", w: int = 3) -> np.ndarray:
    """Sorted unique shingle hashes of a BENCHMARK/eval corpus.

    Per-block unique runs distributed; the driver unions block results.
    The driver pull is benchmark-sized by construction — eval suites are
    MB-scale (the engine's catalog-pull rule: only set-of-distinct
    results sized by the SMALL side ever reach the driver), while the
    100 TB training side never leaves its tasks."""

    def block_unique(t: pa.Table) -> pa.Table:
        _, vals = shingle_hash_flat(t[text_col], w)
        u = np.unique(vals)  # sorted unique, uint64
        return pa.table({"h": pa.array(u.view(np.int64))})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in bench_ds.map_batches(block_unique, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, np.uint64)
    # reinterpret BEFORE unique: sorting int64 views then viewing uint64
    # would leave values >= 2^63 out of order and break searchsorted
    return np.unique(np.concatenate(parts).view(np.uint64))


def decontaminate(
    train_ds,
    bench_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
):
    """Benchmark decontamination: per training doc, how many of its
    distinct word w-shingles appear ANYWHERE in the benchmark corpus
    (and the boolean contamination flag).  The standard train/test
    overlap check for LLM corpora (e.g. GPT-3 appx. C / PaLM-style
    n-gram overlap).

    Scale shape: the benchmark shingle set is broadcast ONCE via
    ``ray.put`` (eval suites are MB-scale); each training batch probes
    it row-locally with a vectorized ``searchsorted`` — the training
    side needs ZERO exchange and never materializes.  Output columns:
    ``(doc_id:int64, n_contaminated_shingles:int64, contaminated:bool)``.

    Oracle twin: ``DECONTAMINATE_SQL`` in pipelines/training.py — gram
    STRINGS intersected in DuckDB over the identical shingle definition
    (``_SHINGLES_CTE``); hash-vs-string equivalence holds exactly when
    the 64-bit shingle hash is collision-free on the corpus, the same
    premise every Jaccard oracle here rests on."""
    import ray

    bench = benchmark_shingle_set(bench_ds, text_col=text_col, w=w)
    bench_ref = ray.put(bench)  # sorted uint64

    def probe(t: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        off, vals = shingle_hash_flat(t[text_col], w)
        n = len(t)
        if len(vals) and len(b):
            idx = np.searchsorted(b, vals)
            hit = (idx < len(b)) & (b[np.minimum(idx, len(b) - 1)] == vals)
            row_of = np.repeat(np.arange(n), np.diff(off))
            n_hits = np.bincount(row_of[hit], minlength=n).astype(np.int64)
        else:
            n_hits = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "n_contaminated_shingles": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return train_ds.map_batches(probe, batch_format="pyarrow")


def _gen_consts(k: int, seed_mult: int) -> np.ndarray:
    out = np.empty(k, dtype=np.uint64)
    h = FNV_OFFSET
    for i in range(k):
        h = ((h * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF) ^ (seed_mult + i)
        out[i] = h | 1  # odd
    return out


_MINHASH_MULTS = _gen_consts(256, 0x9E3779B9)
_MINHASH_ADDS = _gen_consts(256, 0x85EBCA77)
_EMPTY_MIN = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_signatures_batch(
    offsets: np.ndarray, values: np.ndarray, k: int = 64
) -> np.ndarray:
    """(n, k) minhash signatures for a whole batch of shingle sets.

    k independent affine rehashes, min-reduced per row with
    ``np.minimum.reduceat`` over ONE reused S-sized buffer.  An earlier
    version materialized fresh (chunk, S) temporaries per chunk — the
    arithmetic was trivial but every fresh multi-MB allocation paid its
    page-fault cost anew, which dominated the whole minhash stage
    (measured 1.7 s vs ~50 ms for 5k docs / 260k shingles); the single
    ``out=`` buffer faults once."""
    n = len(offsets) - 1
    out = np.full((n, k), _EMPTY_MIN, dtype=np.uint64)
    if len(values) == 0 or n == 0:
        return out
    lens = np.diff(offsets)
    nonempty = lens > 0
    st = offsets[:-1][nonempty]
    buf = np.empty_like(values)
    for j in range(k):
        np.multiply(values, _MINHASH_MULTS[j], out=buf)
        np.add(buf, _MINHASH_ADDS[j], out=buf)
        out[nonempty, j] = np.minimum.reduceat(buf, st)
    return out


def minhash_signature(shingles: np.ndarray, k: int = 64) -> np.ndarray:
    """Scalar (single-set) form of :func:`minhash_signatures_batch`."""
    off = np.array([0, len(shingles)], dtype=np.int64)
    return minhash_signatures_batch(off, np.asarray(shingles, dtype=np.uint64), k)[0]


def simhash64_batch(offsets: np.ndarray, values: np.ndarray) -> np.ndarray:
    """64-bit SimHash per row over list<uint64> layout (vectorized).

    Per row: rehash each element (FNV-1a), vote per bit (+1/-1), fingerprint
    bit j = 1 when the vote is positive.  Bit axis processed 8 bits at a
    time with REUSED scratch buffers — fresh multi-MB temporaries per
    chunk pay their page-fault cost every iteration (see
    :func:`minhash_signatures_batch`)."""
    n = len(offsets) - 1
    fp = np.zeros(n, dtype=np.uint64)
    if len(values) == 0 or n == 0:
        return fp
    h = fnv1a64_numpy(values.astype(np.uint64))
    counts = np.diff(offsets).astype(np.int64)
    S = len(values)
    tmp = np.empty((S, 8), dtype=np.uint64)
    csum = np.zeros((S + 1, 8), dtype=np.uint64)
    for b0 in range(0, 64, 8):
        shifts = np.arange(b0, b0 + 8, dtype=np.uint64)
        np.right_shift(h[:, None], shifts[None, :], out=tmp)
        np.bitwise_and(tmp, np.uint64(1), out=tmp)
        np.cumsum(tmp, axis=0, out=csum[1:])
        ones = (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.int64)  # (n, 8)
        votes = 2 * ones - counts[:, None]
        fp |= ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return fp


def simhash64(shingles_or_tokens: np.ndarray) -> int:
    """Scalar SimHash (tests / pattern authoring)."""
    v = np.asarray(shingles_or_tokens, dtype=np.uint64)
    off = np.array([0, len(v)], dtype=np.int64)
    return int(simhash64_batch(off, v)[0])


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return (
        np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


# ------------------------------------------------------------- exact dedup


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", hash_fn=None):
    """Keep-first per content hash: (doc_id=min, n_copies) per distinct text.

    The distributed form of the reference's Upsert-on-content-hash (O3,
    SURVEY.md §2.6): one bucket shuffle, no raw-text exchange.  Content
    key = 128-bit blake2b as two 64-bit lanes, grouped on BOTH
    (``tokenize.full_hash128`` — see module docstring for why 64 bits
    false-merges at corpus scale).  ``hash_fn(text_array) -> (lane1,
    lane2)`` is injectable for the collision tests."""
    hash_fn = hash_fn or full_hash128

    def add_hash(t: pa.Table) -> pa.Table:
        h1, h2 = hash_fn(t[text_col])
        return pa.table(
            {
                id_col: t[id_col],
                "text_h": pa.array(h1.astype(np.int64)),
                "text_h2": pa.array(h2.astype(np.int64)),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    agg = hash_agg(
        hashed,
        ("text_h", "text_h2"),
        [(id_col, "min", id_col), (id_col, "count", "n_copies")],
    )
    return agg.select_columns([id_col, "n_copies"])


# ------------------------------------------------------- near-dup pipeline


def _pairs_from_groups(
    doc_ids: np.ndarray,
    group_ids: np.ndarray,
    max_group_size: int = 512,
) -> np.ndarray:
    """All within-group (a < b) pairs, with an over-dense-group guard.

    Group boundaries are found vectorized; Python touches only the
    multi-member groups (the candidate groups — rare on an honest
    corpus), never every row.

    ``max_group_size`` caps the pair explosion: a band/bucket key shared
    by L documents emits O(L²) candidate pairs, so one boilerplate-heavy
    key with 10⁵ members would emit 10¹⁰ pairs in a single task.  A key
    that dense carries no discriminating signal (it is the banding
    analog of a stop-word), so the whole group is DROPPED — and the drop
    is logged with group count and forfeited pair count (never a silent
    cap).  Production MinHash dedup pipelines apply the same
    document-frequency cut-off to band keys.

    Consequence (intentional): a corpus with > max_group_size documents
    sharing one band key emits NO candidate pairs for that key, so
    recall drops below an exact all-pairs oracle there — the documented
    trade for bounded per-task work.  Catch such clusters with
    :func:`exact_dedup` first (identical docs share a content hash) or
    raise the cap for a recall-critical pass."""
    n = len(group_ids)
    if n == 0:
        return np.empty((0, 2), dtype=np.int64)
    order = np.lexsort((doc_ids, group_ids))
    g = group_ids[order]
    d = doc_ids[order]
    new = np.ones(n, dtype=bool)
    new[1:] = g[1:] != g[:-1]
    starts = np.nonzero(new)[0]
    lens = np.diff(np.append(starts, n))
    over = lens > max_group_size
    if over.any():
        import logging

        n_over = int(over.sum())
        forfeited = int((lens[over] * (lens[over] - 1) // 2).sum())
        logging.getLogger(__name__).warning(
            "pairs_from_groups: dropped %d over-dense group(s) "
            "(> %d members; %d candidate pairs forfeited) — "
            "band keys this dense are non-discriminating",
            n_over,
            max_group_size,
            forfeited,
        )
    pairs = []
    multi = (lens > 1) & ~over
    for s, L in zip(starts[multi], lens[multi]):
        members = d[s : s + L]
        ai, bi = np.triu_indices(int(L), k=1)
        pairs.append(np.stack([members[ai], members[bi]], axis=1))
    if not pairs:
        return np.empty((0, 2), dtype=np.int64)
    return np.unique(np.concatenate(pairs), axis=0)


def pair_payload_join(
    pairs_ds,
    payload_ds,
    verify_fn,
    *,
    id_col: str = "doc_id",
    payload_col: str = "shingles",
    payload_type: pa.DataType | None = None,
    n_buckets: int = 64,
):
    """Bucket join of a candidate-pair stream against a (id -> payload)
    stream, then a per-pair verify — the corpus-scale verify shape shared
    by MinHash-Jaccard and LSH-cosine dedup.

    No driver materialization anywhere: two tagged-union bucket shuffles,
    everything vectorized per bucket.

      shuffle 1 (by hash(id)):   pair halves + payload rows co-group;
          each half row picks up its doc's payload (list gather);
      shuffle 2 (by hash(a,b)):  the two halves of each pair co-group;
          ``verify_fn(pair_table)`` computes the verdict vectorized.

    ``pairs_ds``   schema: (doc_a:int64, doc_b:int64), already distinct.
    ``payload_ds`` schema: (id_col, payload_col) — one row per doc.
    ``verify_fn``  gets a Table (doc_a, doc_b, side:int8, payload) sorted
    by (doc_a, doc_b, side) with exactly 2 rows per pair and returns the
    output Table.

    Scale note: shuffle 1 moves the payload stream once (linear, like any
    groupby); size ``n_buckets`` so corpus_bytes / n_buckets fits a task.
    """
    import ray.data  # noqa: F401  (Dataset ops)

    if payload_type is None:
        payload_type = pa.list_(pa.uint64())

    def halves(t: pa.Table) -> pa.Table:
        a = t["doc_a"]
        b = t["doc_b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        n = len(t)
        jkey = pa.concat_arrays([a, b])
        return pa.table(
            {
                "jkey": jkey,
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([b, b]),
                "payload": pa.nulls(2 * n, payload_type),
            }
        )

    def payload_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(t)
        return pa.table(
            {
                "jkey": pc.cast(ids, pa.int64()),
                "doc_a": pa.nulls(n, pa.int64()),
                "doc_b": pa.nulls(n, pa.int64()),
                "payload": t[payload_col],
            }
        )

    tagged = pairs_ds.map_batches(halves, batch_format="pyarrow").union(
        payload_ds.map_batches(payload_rows, batch_format="pyarrow")
    )

    def add_bucket1(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(composite_bucket(t, ["jkey"], n_buckets))
        )

    def attach_payload(t: pa.Table) -> pa.Table:
        """Per bucket: gather each half row's payload by jkey."""
        is_half = pc.is_valid(t["doc_a"]).to_numpy(zero_copy_only=False)
        half = t.filter(pa.array(is_half))
        pay = t.filter(pa.array(~is_half))
        if len(half) == 0 or len(pay) == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "payload": pa.array([], payload_type),
                }
            )
        pay_ids = pay["jkey"].to_numpy(zero_copy_only=False)
        p_order = np.argsort(pay_ids, kind="stable")
        pay_sorted = pay_ids[p_order]
        hk = half["jkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pay_sorted, hk)
        found = (pos < len(pay_sorted)) & (pay_sorted[np.minimum(pos, len(pay_sorted) - 1)] == hk)
        half = half.filter(pa.array(found))
        idx = p_order[pos[found]]
        payload_col_arr = pay["payload"]
        if isinstance(payload_col_arr, pa.ChunkedArray):
            payload_col_arr = payload_col_arr.combine_chunks()
        gathered = payload_col_arr.take(pa.array(idx))
        a = half["doc_a"].to_numpy(zero_copy_only=False)
        side = (half["jkey"].to_numpy(zero_copy_only=False) != a).astype(np.int8)
        return pa.table(
            {
                "doc_a": half["doc_a"],
                "doc_b": half["doc_b"],
                "side": pa.array(side),
                "payload": gathered,
            }
        )

    attached = (
        tagged.map_batches(add_bucket1, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: attach_payload(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )

    def add_bucket2(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(composite_bucket(t, ["doc_a", "doc_b"], n_buckets))
        )

    def verify_group(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("doc_a", "ascending"),
                ("doc_b", "ascending"),
                ("side", "ascending"),
            ],
        )
        t = t.take(idx)
        # a pair surfacing from several LSH bands arrives with duplicate
        # halves — dedupe here (sorted: keep first per (a, b, side)) so
        # callers don't need a distinct-ify shuffle on the pair stream
        if len(t):
            a = t["doc_a"].to_numpy(zero_copy_only=False)
            b = t["doc_b"].to_numpy(zero_copy_only=False)
            side = t["side"].to_numpy(zero_copy_only=False)
            keep = np.ones(len(t), dtype=bool)
            keep[1:] = (
                (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (side[1:] != side[:-1])
            )
            if not keep.all():
                t = t.filter(pa.array(keep))
        return verify_fn(t)

    return (
        attached.map_batches(add_bucket2, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(verify_group, batch_format="pyarrow")
    )


def _jaccard_verify(threshold: float):
    """verify_fn for :func:`pair_payload_join`: exact Jaccard of the two
    sorted-unique shingle lists per pair, fully vectorized (intersection
    via duplicate counting over the concatenated values)."""

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        newpair = np.ones(len(t), dtype=bool)
        newpair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        pair_id = np.cumsum(newpair) - 1
        n_pairs = int(pair_id[-1]) + 1
        # a well-formed pair has exactly rows (side=0, side=1)
        cnt = np.bincount(pair_id, minlength=n_pairs)
        complete = cnt == 2
        sh = t["payload"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        flat = sh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        off = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        rowlen = np.diff(off)
        vp = np.repeat(pair_id, rowlen)
        order = np.lexsort((flat, vp))
        fv, pv = flat[order], vp[order]
        dup = np.zeros(len(fv), dtype=bool)
        if len(fv) > 1:
            dup[1:] = (pv[1:] == pv[:-1]) & (fv[1:] == fv[:-1])
        inter = np.bincount(pv[dup], minlength=n_pairs) if dup.any() else np.zeros(
            n_pairs, dtype=np.int64
        )
        total = np.bincount(pair_id, weights=rowlen, minlength=n_pairs).astype(np.int64)
        union = total - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        j = np.round(j, 6)
        keep = complete & (j >= threshold)
        first_of_pair = np.nonzero(newpair)[0]
        return pa.table(
            {
                "doc_a": pa.array(a[first_of_pair][keep].astype(np.int64)),
                "doc_b": pa.array(b[first_of_pair][keep].astype(np.int64)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return verify


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    w: int = 3,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Near-dup pairs by MinHash banding, verified with exact Jaccard.

    Stages (each a bucket shuffle away from the next; nothing returns to
    the driver):
      1. map_batches: text -> shingle set -> k-minhash signature ->
         ``bands`` band keys (hash of r=k/bands rows) — (band, key, id)
         rows ONLY (no payload through the banding shuffle);
      2. shuffle on (band, band_key) bucket; within a bucket, group rows
         by band key -> candidate (a, b) pairs; distinct-ify via a small
         bucket aggregate (a pair can surface from several bands);
      3. verify: bucket join of the pair stream against the (doc ->
         shingles) stream (:func:`pair_payload_join`), exact Jaccard per
         pair vectorized, emit pairs >= t.

    With r=k/bands rows per band, P[candidate | J=t] = 1-(1-t^r)^bands —
    at k=64, bands=16 (r=4), J=0.8: ~0.9997; misses are possible in
    principle (documented LSH semantics) but vanish for the near-identical
    duplicates this detects.  Verification makes precision exact.

    The shingle stream is recomputed from text for the verify join (a
    second linear pass) rather than materialized — at 100 TB an epoch-
    scoped cache would trade object-store space for that pass.
    """
    assert k % bands == 0
    r = k // bands

    def sig_stage(t: pa.Table) -> pa.Table:
        off, vals = shingle_hash_flat(t[text_col], w)
        n = len(t)
        sig = minhash_signatures_batch(off, vals, k)  # (n, k)
        keyed = fnv1a64_numpy(sig.ravel()).reshape(n, bands, r).sum(axis=2)
        key_arr = (keyed.ravel() & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_key": pa.array(key_arr),
                id_col: pa.array(np.repeat(ids_np, bands)),
            }
        )

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = t["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = fnv1a64_numpy(b * np.uint64(0x9E3779B97F4A7C15) + key)
        return t.append_column(
            "_bucket", pa.array((mix % np.uint64(n_buckets)).astype(np.int64))
        )

    def pairs_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        group = band * (1 << 40) ^ key
        cand = _pairs_from_groups(ids, group)
        return pa.table(
            {
                "doc_a": pa.array(cand[:, 0].astype(np.int64)),
                "doc_b": pa.array(cand[:, 1].astype(np.int64)),
            }
        )

    # duplicate pairs (several bands agreeing) are deduped inside the
    # verify join's per-pair group — no distinct-ify shuffle needed
    cand = (
        sigs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: pairs_bucket(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )

    def shingle_stage(t: pa.Table) -> pa.Table:
        off, vals = shingle_hash_flat(t[text_col], w)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: pc.cast(ids, pa.int64()),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(off.astype(np.int32), type=pa.int32()),
                    pa.array(vals, type=pa.uint64()),
                ),
            }
        )

    shingle_ds = ds.map_batches(shingle_stage, batch_format="pyarrow")
    return pair_payload_join(
        cand,
        shingle_ds,
        _jaccard_verify(threshold),
        id_col=id_col,
        payload_col="shingles",
        payload_type=pa.list_(pa.uint64()),
        n_buckets=n_buckets,
    )


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """SimHash near-dup pairs: fingerprint -> 4-block Hamming LSH -> verify.

    64-bit fingerprints; by pigeonhole, any pair within Hamming distance
    <= 3 agrees exactly on at least one of 4 16-bit blocks, so blocking on
    each quarter has recall 1.0 (unlike minhash banding) — then verify the
    true distance.  Scales: shuffle key is (block_idx, block_value);
    fingerprints and blocks computed fully vectorized per batch."""

    def fp_stage(t: pa.Table) -> pa.Table:
        off, vals = shingle_hash_flat(t[text_col], w)
        fps = simhash64_batch(off, vals)  # (n,) uint64
        n = len(t)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        block = np.tile(np.arange(4, dtype=np.uint64), n)
        fp_rep = np.repeat(fps, 4)
        block_val = (fp_rep >> (np.uint64(16) * block)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "block": pa.array(block.astype(np.int32)),
                "block_val": pa.array(block_val.astype(np.int32)),
                id_col: pa.array(np.repeat(ids_np, 4)),
                "fp": pa.array(fp_rep.astype(np.int64)),
            }
        )

    fps = ds.map_batches(fp_stage, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["block"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["block_val"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = fnv1a64_numpy(b * np.uint64(65537) + v)
        return t.append_column("_bucket", pa.array((mix % np.uint64(64)).astype(np.int64)))

    def verify_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        group = (
            t["block"].to_numpy(zero_copy_only=False).astype(np.int64) * (1 << 20)
            + t["block_val"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        fp_np = t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # id -> fp lookup (ids repeat across blocks; first occurrence wins)
        uniq_ids, first_idx = np.unique(ids, return_index=True)
        uniq_fp = fp_np[first_idx]
        cand = _pairs_from_groups(ids, group)
        if len(cand) == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        fa = uniq_fp[np.searchsorted(uniq_ids, cand[:, 0])]
        fb = uniq_fp[np.searchsorted(uniq_ids, cand[:, 1])]
        d = _popcount64(fa ^ fb)
        keep = d <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(cand[:, 0][keep].astype(np.int64)),
                "doc_b": pa.array(cand[:, 1][keep].astype(np.int64)),
                "hamming": pa.array(d[keep], pa.int64()),
            }
        )

    pairs = (
        fps.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: verify_bucket(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )
    return hash_agg(
        pairs, ("doc_a", "doc_b"), [("hamming", "min", "hamming")], n_buckets=16
    )


def hot_shingles(ds, df_cap: int, w: int, text_col: str, n_buckets: int):
    """Shingle hashes with document frequency > ``df_cap`` — the
    boilerplate tail ("terms of service…") that every real corpus has.

    Exact df via one (shingle -> count) exchange with per-batch
    combining (emission = unique shingles per batch, 16-byte rows).
    The over-cap set is heavy-hitter-sized by construction (at most
    total_entries / df_cap, in practice a handful of templates), so it
    is pulled to the driver and BROADCAST; a guard raises if an
    adversarial corpus ever makes it non-broadcastable."""
    import logging

    from dataflowkit_ray.stages.agg import hash_agg

    def shingle_entries(t: pa.Table) -> pa.Table:
        _, vals = shingle_hash_flat(t[text_col], w)
        v = vals.view(np.int64)
        # int8 ones: Arrow group_by can't count its own key column, and
        # the column exists only pre-combine inside the task
        return pa.table(
            {"shingle": pa.array(v), "one": pa.array(np.ones(len(v), np.int8))}
        )

    df = hash_agg(
        ds.map_batches(shingle_entries, batch_format="pyarrow"),
        ("shingle",),
        [("one", "count", "df")],
        n_buckets=n_buckets,
    )

    def over_cap(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["df"], df_cap)).select(["shingle"])

    hot = df.map_batches(over_cap, batch_format="pyarrow").take_all()
    hot_arr = np.sort(np.array([r["shingle"] for r in hot], dtype=np.int64))
    if len(hot_arr) > 4_000_000:
        raise ValueError(
            f"hot_shingles: {len(hot_arr)} shingles exceed df_cap={df_cap} "
            "— too many to broadcast. Raise df_cap or pre-clean the corpus."
        )
    if len(hot_arr):
        logging.getLogger(__name__).info(
            "ngram_jaccard: dropping %d shingles with df > %d from the "
            "similarity universe", len(hot_arr), df_cap,
        )
    return hot_arr


def ngram_jaccard_pairs(
    ds,
    threshold: float = 0.5,
    w: int = 3,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 512,
):
    """EXACT n-gram-Jaccard near-dup pairs over the **df-capped shingle
    universe**, by inverted-index co-occurrence counting (the distributed
    set-similarity-join shape of Vernica, Carey, Li, SIGMOD'10).

    The exact-recall complement to :func:`minhash_lsh_pairs`: banding is
    probabilistic (P[candidate | J=0.5] ~ 0.64 at k=64/16 bands), so for
    thresholds below ~0.7 an exact index is the honest tool.

    **Semantics**: the operator is DEFINED over shingles whose document
    frequency is <= ``df_cap`` — Jaccard is computed exactly on the
    filtered sets, and the SQL oracle applies the identical df filter
    (``training._SHINGLES_DF_CTE``).  Rationale: a shingle shared by
    thousands of docs ("terms of service…" boilerplate) carries ~zero
    similarity signal but costs O(df²) co-occurrence rows; at corpus
    scale df >> any cap is CERTAIN, so an operator that refuses hot
    shingles is a guaranteed job-killer (round-4 verdict finding #2),
    and one that silently dropped them would corrupt the exact counts.
    Capping the UNIVERSE keeps the measure exact, stated, and
    scale-safe — the standard move in set-similarity joins (stop-word /
    high-df pruning in Vernica et al. §5, Chaudhuri SSJoin).

    Plan:
      0. :func:`hot_shingles`: one (shingle -> exact df) exchange; the
         over-cap set (heavy-hitter-sized) broadcasts to every task;
      1. map_batches: text -> sorted-unique shingle hashes, hot ones
         dropped ROW-LOCALLY, ``set_len`` = post-filter cardinality ->
         inverted-index entries (shingle, id, set_len);
      2. shuffle on hash(shingle): within each shingle group emit one
         fixed-width co-occurrence row (doc_a, doc_b, len_a, len_b) per
         doc pair — every group is <= df_cap by construction;
      3. :func:`~dataflowkit_ray.stages.agg.hash_agg` on (doc_a, doc_b):
         COUNT of co-occurrence rows = |A ∩ B|, MIN(len) carries the set
         sizes; J = inter / (len_a + len_b - inter) >= t, vectorized.

    A first cut used Bayardo/WWW'07 prefix filtering + the
    :func:`pair_payload_join` verify: correct, but on a template-heavy
    corpus the candidate set is large and every candidate ships BOTH
    docs' shingle-list payloads through two shuffles (~0.5 GB at sf0.1,
    measured 10.4 s).  Counting ships only 32-byte rows — the whole
    emission is ~Σ df(g)² bounded by ``df_cap``, pre-combined per batch
    inside hash_agg phase 1 (measured 8x faster, identical output).
    The df pass re-shingles the corpus once (stateless, deterministic —
    no materialization); total cost ~1.5x the uncapped single pass.

    Output: (doc_a, doc_b, jaccard) — jaccard rounded to 6 dp, the same
    comparison the DuckDB oracle replays.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    import ray

    hot_ref = ray.put(hot_shingles(ds, df_cap, w, text_col, n_buckets))

    def index_stage(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        off, vals = shingle_hash_flat(t[text_col], w)
        n = len(t)
        vals = vals.view(np.int64)
        row_of = np.repeat(np.arange(n), np.diff(off))
        if len(hot):
            # drop hot shingles row-locally (sorted-membership test)
            pos = np.searchsorted(hot, vals)
            pos[pos == len(hot)] = 0
            keep = hot[pos] != vals
            vals, row_of = vals[keep], row_of[keep]
        lens = np.bincount(row_of, minlength=n).astype(np.int64)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "shingle": pa.array(vals),
                id_col: pa.array(ids_np[row_of]),
                "set_len": pa.array(lens[row_of]),
            }
        )

    entries = ds.map_batches(index_stage, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(composite_bucket(t, ["shingle"], n_buckets))
        )

    def cooccur_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "len_a": pa.array([], pa.int64()),
                "len_b": pa.array([], pa.int64()),
            }
        )
        n = len(t)
        if n == 0:
            return empty
        sh = t["shingle"].to_numpy(zero_copy_only=False)
        d = t[id_col].to_numpy(zero_copy_only=False)
        sl = t["set_len"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, sh))
        g, d, sl = sh[order], d[order], sl[order]
        new = np.ones(n, dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, n))
        if glens.max() > df_cap:
            # invariant, not a data condition: hot_shingles removed every
            # group with df > df_cap before the exchange, and df == group
            # size (entries are unique per doc). Reaching here means the
            # df pass and the index pass disagreed — a bug, fail loudly.
            raise RuntimeError(
                f"ngram_jaccard_pairs: internal invariant violated — a "
                f"shingle group of {int(glens.max())} docs survived the "
                f"df_cap={df_cap} filter."
            )
        out_a, out_b, out_la, out_lb = [], [], [], []
        multi = glens > 1
        for s, L in zip(starts[multi], glens[multi]):
            mem = d[s : s + L]
            ml = sl[s : s + L]
            ai, bi = np.triu_indices(int(L), k=1)
            out_a.append(mem[ai])
            out_b.append(mem[bi])
            out_la.append(ml[ai])
            out_lb.append(ml[bi])
        if not out_a:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "doc_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "len_a": pa.array(np.concatenate(out_la).astype(np.int64)),
                "len_b": pa.array(np.concatenate(out_lb).astype(np.int64)),
            }
        )

    cooc = (
        entries.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: cooccur_bucket(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )

    counted = hash_agg(
        cooc,
        ("doc_a", "doc_b"),
        [
            ("len_a", "count", "inter"),
            ("len_a", "min", "len_a"),
            ("len_b", "min", "len_b"),
        ],
        n_buckets=n_buckets,
    )

    def finalize(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        la = t["len_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        lb = t["len_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = la + lb - inter
        j = np.round(np.where(union > 0, inter / np.maximum(union, 1), 1.0), 6)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": t["doc_a"].filter(pa.array(keep)),
                "doc_b": t["doc_b"].filter(pa.array(keep)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return counted.map_batches(finalize, batch_format="pyarrow")


def dedup_clusters(
    pairs_ds,
    ids_ds,
    id_col: str = "doc_id",
    max_iters: int = 50,
    n_shards: int = 4,
    mode: str = "actors",
):
    """Near-dup PAIRS -> duplicate CLUSTERS -> canonical survivors.

    The tail every real dedup pipeline needs after ``minhash_lsh_pairs``
    / ``simhash_pairs`` / ``ngram_jaccard_pairs``: connected components
    over the pair graph, cluster id = min doc_id in the component, keep
    = (doc_id == cluster_id).  Transitively-linked near-dups (A~B, B~C,
    A!~C) collapse to ONE survivor — pairwise filtering alone would keep
    A and C.

    Algorithm: iterative HASH-MIN label propagation (the standard
    MapReduce CC, cf. Rastogi et al., "Finding Connected Components in
    Map-Reduce", ICDE'13); rounds needed = component diameter — near-dup
    clusters are cliques/stars from a banding key, so 2-3 rounds in
    practice.  Labels only ever DECREASE, so the per-round fixpoint
    check is one tiny scalar (global label sum).

    Two execution paths:

    * ``mode="actors"`` (default) — Pregel-style BSP on
      :class:`~dataflowkit_ray.state.cc_shards.CCShard` actors: each
      shard owns hash(node)-sharded labels + CSR adjacency; a round is
      one vectorized propose (peer-bucketed Arrow blobs, actor-to-actor)
      + one apply.  No sort exchanges, no query plans inside the loop —
      the Dataset formulation paid ~3 s of plan+sort fixed cost PER
      ROUND at every scale.  The driver moves shard handles, acks and
      n_shards ints; final labels return as object-store refs.
    * ``mode="dataset"`` — pure Dataset formulation (one bucket join +
      one min-agg per round, labels materialized between rounds), kept
      as the lineage-simple reference; equivalence is pytest-asserted.

    ``pairs_ds``: (doc_a, doc_b) — extra columns ignored.
    ``ids_ds``:   one row per document (singletons keep themselves).
    Output: (doc_id, cluster_id, keep) sorted nowhere (sort at the sink).
    """
    # project the universe stream to its id column up front: callers
    # pass whole document tables, and the full text payload would
    # otherwise transit the object store just to extract doc_id
    ids_ds = ids_ds.select_columns([id_col])
    if mode == "actors":
        return _cc_actors(pairs_ds, ids_ds, id_col, max_iters, n_shards)
    if mode != "dataset":
        raise ValueError(f"unknown dedup_clusters mode {mode!r}")
    return _cc_dataset(pairs_ds, ids_ds, id_col, max_iters)


def _cc_finalize_fn(id_col: str):
    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t["node"],
                "cluster_id": t["label"],
                "keep": pc.equal(t["node"], t["label"]),
            }
        )

    return finalize


def _cc_actors(pairs_ds, ids_ds, id_col: str, max_iters: int, n_shards: int):
    import ray
    import ray.data

    from dataflowkit_ray.state.cc_shards import CCShard, _mod_shard
    from dataflowkit_ray.state.store import shard_pool, table_to_bytes

    shards = shard_pool(CCShard, "cc", n_shards, 0, n_shards)
    # reset() re-ran __init__ with placeholder shard ids; fix each
    ray.get([s.reset.remote(i, n_shards) for i, s in enumerate(shards)])
    ray.get([s.set_peers.remote(shards) for s in shards])

    @ray.remote
    def route(t: pa.Table, kind: str, handles) -> int:
        """Data plane: bucket one block's rows by owner shard and ship
        Arrow blobs straight to the actors — the driver sees acks."""
        if len(t) == 0 or t.num_columns == 0:
            # upstream sampled sorts intermittently emit ZERO-COLUMN
            # empty blocks (Ray internal); nothing to route
            return 0
        if kind == "nodes":
            key = t[id_col]
            out_cols = {"node": pc.cast(key, pa.int64())}
        else:
            out_cols = {
                "node": pc.cast(t["doc_a"], pa.int64()),
                "nbr": pc.cast(t["doc_b"], pa.int64()),
            }
        tt = pa.table(out_cols)
        if kind == "edges":
            # both directions: hash-min propagates along each edge both ways
            rev = pa.table({"node": tt["nbr"], "nbr": tt["node"]})
            tt = pa.concat_tables([tt, rev])
        key_np = tt["node"].to_numpy(zero_copy_only=False)
        owner = _mod_shard(key_np, len(handles))
        refs = []
        for p in range(len(handles)):
            m = owner == p
            if not m.any():
                continue
            blob = table_to_bytes(tt.filter(pa.array(m)))
            fn = handles[p].add_nodes if kind == "nodes" else handles[p].add_edges
            refs.append(fn.remote(blob))
        ray.get(refs)
        return len(tt)

    acks = [
        route.remote(ref, "nodes", shards)
        for ref in ids_ds.to_arrow_refs()
    ] + [
        route.remote(ref, "edges", shards)
        for ref in pairs_ds.to_arrow_refs()
    ]
    ray.get(acks)
    prev_sum = sum(ray.get([s.build.remote() for s in shards]))

    for _ in range(max_iters):
        # BSP barrier lives on the DRIVER: propose returns delivery ack
        # refs (actors must not block on each other's recv)
        ack_lists = ray.get([s.propose.remote() for s in shards])
        ray.get([r for lst in ack_lists for r in lst])
        cur = sum(ray.get([s.apply.remote() for s in shards]))
        if cur == prev_sum:  # labels are nonincreasing; equal sum = fixpoint
            break
        prev_sum = cur

    refs = ray.get([s.emit_ref.remote() for s in shards])
    return ray.data.from_arrow_refs(refs).map_batches(
        _cc_finalize_fn(id_col), batch_format="pyarrow"
    )


def _cc_dataset(pairs_ds, ids_ds, id_col: str, max_iters: int):
    import logging

    from dataflowkit_ray.stages.join import bucket_equi_join

    # Ray's sort picks range boundaries by SAMPLING; on the small keyed
    # sorts of this iterative loop (few distinct _bucket values per
    # round) sampled boundaries can collide and the empty partitions
    # surface as zero-column blocks plus a per-bundle schema warning.
    # The blocks are normalized away by ``retype`` + ``repartition``
    # below (final output is schema-uniform; value-exactness is DuckDB-
    # oracle-gated), so the transient executor warning carries no
    # signal here — scope-filter it for the duration of the loop only.
    class _EmptySortBundleFilter(logging.Filter):
        def filter(self, rec):
            return "RefBundle with a different schema" not in rec.getMessage()

    _exec_logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )

    def to_edges(t: pa.Table) -> pa.Table:
        a = pc.cast(t["doc_a"], pa.int64())
        b = pc.cast(t["doc_b"], pa.int64())
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    def to_labels(t: pa.Table) -> pa.Table:
        i = pc.cast(t[id_col], pa.int64())
        return pa.table({"node": i, "label": i})

    labels = ids_ds.map_batches(to_labels, batch_format="pyarrow").materialize()
    # volume-derived shuffle width; block counts are REPARTITIONED to nb
    # everywhere a shuffle consumes them — sort inputs with more blocks
    # than distinct bucket values emit zero-column empty partitions (the
    # measured r1 pitfall)
    nb = int(min(64, max(4, labels.count() // 20_000 + 4)))
    # each join/agg consumes (edges + labels) or (nbr_labels + labels):
    # keep every persistent table at nb//2 blocks so no shuffle ever sees
    # more input blocks than distinct bucket values
    half = max(1, nb // 2)
    labels = labels.repartition(half).materialize()
    edges = (
        pairs_ds.map_batches(to_edges, batch_format="pyarrow")
        .repartition(half)
        .materialize()
    )
    # the ids stream defines the node universe (same contract as the
    # actors path): edges touching unknown endpoints would otherwise
    # mint label rows for non-existent ids and transitively merge
    # components THROUGH them — semi-restrict both endpoints
    uni_node = labels.map_batches(
        lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow"
    )
    uni_nbr = labels.map_batches(
        lambda t: pa.table({"nbr": t["node"]}), batch_format="pyarrow"
    )
    edges = bucket_equi_join(edges, uni_node, on="node", n_buckets=nb)
    edges = (
        bucket_equi_join(edges, uni_nbr, on="nbr", n_buckets=nb)
        .repartition(half)
        .materialize()
    )
    n_edges = edges.count()

    def label_sum(lds) -> int:
        return int(lds.sum("label"))

    prev_sum = label_sum(labels)
    _filter = _EmptySortBundleFilter()
    _exec_logger.addFilter(_filter)
    try:
        for _ in range(max_iters):
            if n_edges == 0:
                break
            # neighbor labels: edges (node, nbr) x labels (node, label)
            # on node -> candidate (nbr, label); union own labels; min
            # per node
            nbr_labels = bucket_equi_join(
                edges, labels, on="node", n_buckets=nb
            ).map_batches(
                lambda t: pa.table({"node": t["nbr"], "label": t["label"]}),
                batch_format="pyarrow",
            )

            def retype(t: pa.Table) -> pa.Table:
                # empty sort partitions surface as ZERO-COLUMN blocks
                # (Ray internal); normalize them to the typed schema so
                # every downstream RefBundle agrees
                if t.num_columns == 0 or len(t) == 0:
                    return pa.table(
                        {
                            "node": pa.array([], pa.int64()),
                            "label": pa.array([], pa.int64()),
                        }
                    )
                return t.select(["node", "label"])

            labels = (
                hash_agg(
                    nbr_labels.union(labels).repartition(nb),
                    ("node",),
                    [("label", "min", "label")],
                    n_buckets=nb,
                )
                .map_batches(retype, batch_format="pyarrow")
                .repartition(half)
                .materialize()
            )
            cur = label_sum(labels)
            if cur == prev_sum:  # nonincreasing; equal sum = fixpoint
                break
            prev_sum = cur

        out = labels.map_batches(
            _cc_finalize_fn(id_col), batch_format="pyarrow"
        ).materialize()
        # scrub the zero-column empty blocks the loop's sampled sorts
        # can leave behind, so the CALLER's consumption streams
        # schema-uniform bundles: per-block row counts via tiny tasks
        # (refs only on the driver — block count is O(nb), not O(rows))
        import ray as _ray

        @_ray.remote
        def _nrows(block) -> int:
            return len(block)

        refs = out.to_arrow_refs()
        counts = _ray.get([_nrows.remote(r) for r in refs])
        keep_refs = [r for r, c in zip(refs, counts) if c > 0]
        import ray.data as _rd

        return _rd.from_arrow_refs(keep_refs if keep_refs else refs[:1])
    finally:
        # a failure mid-loop must not leak the filter: it would
        # permanently mute a diagnostic the rest of the engine relies on
        _exec_logger.removeFilter(_filter)
