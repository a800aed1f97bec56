"""Deterministic documents -> pre-tokenized sequence table.

The engine's mandated input shape (BASELINE.json ``input_hint``) is::

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

The driver's test tables ship a ``documents`` table (doc_id:int64, text,
lang, source, n_chars).  This module derives the token table from it
**deterministically and SQL-expressibly** so the DuckDB oracle can compute
byte-identical token arrays:

    token(word) = (length(word) * 256 + first_codepoint(word)) % 32000
    (empty word -> first_codepoint treated as 0)

DuckDB equivalent (used verbatim in __ray_entry__.oracle_sql)::

    list_transform(str_split(text, ' '),
        w -> CAST((length(w)*256 + CASE WHEN w='' THEN 0 ELSE ord(w) END)
                  % 32000 AS INTEGER))

This mirrors the reference's parse stage (HTML page -> extracted values,
``/root/reference/scrape/scrape.go:28-85``): a pure, per-record map done
vectorized inside ``map_batches`` over zero-copy Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.config import VOCAB_MOD, FNV_OFFSET, FNV_PRIME, MASK64, np_col

# The single source of truth for the DuckDB-side tokenizer (oracle parity).
TOKEN_SQL_EXPR = (
    "list_transform(str_split(text, ' '), "
    "w -> CAST((length(w)*256 + CASE WHEN w='' THEN 0 ELSE ord(w) END) "
    "% 32000 AS INTEGER))"
)

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("event_seq", pa.int64()),
    ]
)


def token_id(word: str) -> int:
    """Scalar tokenizer (tests / pattern authoring)."""
    first = ord(word[0]) if word else 0
    return (len(word) * 256 + first) % VOCAB_MOD


def _first_codepoints(flat: pa.StringArray) -> np.ndarray:
    """First codepoint of every string in a flat array (0 for empty).

    ASCII fast path reads the raw value buffer; non-ASCII entries (first
    byte >= 0x80) fall back to python ``ord`` — rare by construction.
    """
    arr = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]
    first = np.zeros(len(arr), dtype=np.int64)
    nonempty = ends > starts
    first[nonempty] = data[starts[nonempty]]
    multibyte = first >= 0x80
    if multibyte.any():
        idx = np.nonzero(multibyte)[0]
        vals = arr.take(pa.array(idx)).to_pylist()
        for i, s in zip(idx, vals):
            first[i] = ord(s[0])
    return first


def tokenize_text(text: pa.Array | pa.ChunkedArray) -> tuple[pa.ListArray, pa.Array]:
    """Vectorized text -> (tokens list<int32>, n_tok int32)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(text, pattern=" ")
    flat = words.flatten()
    lengths = np_col(pc.utf8_length(flat))
    first = _first_codepoints(flat)
    tok = ((lengths * 256 + first) % VOCAB_MOD).astype(np.int32)
    offsets = np_col(words.offsets, np.int32)
    offsets = offsets - offsets[0]
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(tok, type=pa.int32()))
    n_tok = pc.cast(pc.list_value_length(tokens), pa.int32())
    return tokens, n_tok


def tokenize_documents(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents batch -> token-stream batch.

    ``event_seq`` (the doc-order event clock, SURVEY.md §2.8) is the
    original int64 doc_id — monotone in file order, so it doubles as the
    watermark domain without depending on row arrival order.
    """
    tokens, n_tok = tokenize_text(batch["text"])
    doc_id_int = batch["doc_id"]
    if isinstance(doc_id_int, pa.ChunkedArray):
        doc_id_int = doc_id_int.combine_chunks()
    return pa.table(
        {
            "doc_id": pc.cast(doc_id_int, pa.string()),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": batch["source"],
            "event_seq": pc.cast(doc_id_int, pa.int64()),
        }
    )


def replicate_slice(t: pa.Table, lo: int, hi: int, id_stride: int = 10_000_000) -> pa.Table:
    """Materialize replicas ``lo..hi-1`` of a tokenized table.

    Each replica r shifts ``event_seq`` (and the derived ``doc_id``) by
    ``r * id_stride`` — replicas are distinct documents in distinct
    windows, so joins stay 1:1 and window counts grow with the replica
    count.  One vectorized gather for the whole slice (an O(repeat)
    python loop of per-replica tables dominated wall time at high
    repeat)."""
    k = hi - lo
    n = len(t)
    seq = t["event_seq"]
    if isinstance(seq, pa.ChunkedArray):
        seq = seq.combine_chunks()
    seq = np_col(seq)
    idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
    new_seq = pa.array(
        np.tile(seq, k)
        + np.repeat(np.arange(lo, hi, dtype=np.int64) * id_stride, n)
    )

    def gather(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.take(idx)

    return pa.table(
        {
            "doc_id": pc.cast(new_seq, pa.string()),
            "tokens": gather(t["tokens"]),
            "n_tok": gather(t["n_tok"]),
            "source": gather(t["source"]),
            "event_seq": new_seq,
        }
    )


def replicate_stream(repeat: int, id_stride: int = 10_000_000):
    """map_batches fn: deterministically scale a token stream ``repeat``×
    (see ``replicate_slice``).  Used by the bench to drive realistic
    volume from the small test tables (allowed: deterministic small-scale
    synthesis, no external data)."""

    def fn(t: pa.Table) -> pa.Table:
        if repeat <= 1:
            return t
        return replicate_slice(t, 0, repeat, id_stride)

    return fn


def documents_files(sf_dir: str) -> list[str]:
    """Resolve the documents table to its file list.

    Two shapes are accepted: the driver's single ``documents.parquet``,
    or a ``documents/`` DIRECTORY of partitioned parts — the shape a
    100 TB corpus actually has (and what ``sinks/resumable.py``
    ``write_partitioned`` produces).  Every documents reader in the
    engine goes through this resolver, so pointing the gate/bench at a
    multi-file corpus needs no per-query changes."""
    import glob
    import os

    d = os.path.join(sf_dir, "documents")
    if os.path.isdir(d):
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet parts under {d}")
        return files
    return [os.path.join(sf_dir, "documents.parquet")]


def table_rows(paths: str | list[str]) -> int:
    """Total row count from parquet footers only (no data read)."""
    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = [paths]
    return sum(pq.read_metadata(p).num_rows for p in paths)


def blocks_for(
    path: str | list[str], rows_per_block: int = 20_000, lo: int = 4, hi: int = 512
) -> int:
    """Volume-derived block count from parquet metadata (free).

    THE block-sizing rule of this engine: Ray's CPU-derived default gave
    64 blocks for a 5k-row table, and every downstream sort coordinated
    64+ near-empty partitions (~10 ms of driver time each) and emitted
    zero-column empty blocks.  Deriving from row count keeps small
    inputs cheap and still fans out at volume.  Shared by every reader
    (token stream, events, documents, embeddings, bench volume mode)."""
    n = table_rows(path)
    return max(lo, min(hi, n // max(1, rows_per_block)))


def load_token_stream(
    sf_dir: str,
    *,
    columns_extra: tuple[str, ...] = (),
    repeat: int = 1,
    num_blocks: int | None = None,
):
    """documents.parquet -> token-stream Dataset (the engine's source).

    Column-prunes at the read (only doc_id/text/source leave storage) and
    tokenizes inside ``map_batches`` with zero-copy Arrow batches.

    ``num_blocks`` pins the read block count.  Ray's default derives it
    from the CPU count, which makes the execution PLAN differ between
    cluster sizes; a volume-derived count keeps the plan identical (the
    honest scaling comparison) and gives big clusters enough parallelism.

    ``repeat > 1`` (bench volume mode) switches to a *replica-sharded
    source*: ``range(num_blocks)`` tasks each synthesize their own slice
    of replicas from the tokenized base table broadcast once with
    ``ray.put``.  This is the shape of a real 100-TB read — thousands of
    independent read tasks, one per file — where the single-file test
    read is 1 task whose 125 SplitBlocks outputs trickle through the
    streaming-generator handshake one block at a time (measured: the
    whole downstream chain ran at parallelism ~1.7 because every block
    release waited on a driver round-trip).
    """
    import ray
    import ray.data

    cols = ["doc_id", "text", "source", *columns_extra]
    files = documents_files(sf_dir)
    if repeat <= 1:
        if num_blocks is None:
            num_blocks = blocks_for(files, rows_per_block=1000)
        ds = ray.data.read_parquet(
            files, columns=cols,
            override_num_blocks=num_blocks,
        )
        return ds.map_batches(
            tokenize_documents, batch_format="pyarrow", zero_copy_batch=True
        )

    import pyarrow.parquet as pq

    # tokenize the (catalog-sized) base table once; broadcast the token
    # table — every synth task reads it zero-copy from the object store
    raw = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
    tok_ref = ray.put(tokenize_documents(raw))
    nb = min(num_blocks or max(64, min(512, repeat // 8)), repeat)
    # replica ranges per synth task (balanced, possibly uneven)
    bounds = np.linspace(0, repeat, nb + 1).astype(np.int64)

    def synth(batch: pa.Table):
        t = ray.get(tok_ref)
        for bid in batch["id"].to_pylist():
            lo, hi = int(bounds[bid]), int(bounds[bid + 1])
            if hi > lo:
                yield replicate_slice(t, lo, hi)

    return ray.data.range(nb, override_num_blocks=nb).map_batches(
        synth, batch_format="pyarrow"
    )


def fnv1a64_numpy(values: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over the *byte representation* of an
    int32/int64 array, one hash per element group is NOT what this does —
    it hashes each element independently (8 bytes little-endian).
    Used for salts and shard routing."""
    v = values.astype(np.uint64)
    h = np.full(v.shape, FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    for shift in range(0, 64, 8):
        byte = (v >> np.uint64(shift)) & np.uint64(0xFF)
        h = (h ^ byte) * prime
    return h


def hash_token_lists(tokens: pa.ListArray) -> np.ndarray:
    """Content hash of each token list (FNV-1a over int32 LE bytes),
    vectorized via segment-wise reduction.  This is the engine's analog of
    the reference's content-hash UID (MD5+CRC32 of the canonical payload,
    ``/root/reference/scrape/scrape.go:134-155``) applied per row: the
    exact-dedup / idempotency key."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = np_col(tokens.flatten(), np.uint32)
    offsets = np_col(tokens.offsets)
    offsets = offsets - offsets[0]
    n = len(tokens)
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    lengths = np.diff(offsets)
    max_len = int(lengths.max()) if n else 0
    # iterate over positions (bounded by max list length), vectorized over rows
    for pos in range(max_len):
        active = lengths > pos
        idx = offsets[:-1][active] + pos
        vals = flat[idx].astype(np.uint64)
        h = out[active]
        for shift in range(0, 32, 8):
            byte = (vals >> np.uint64(shift)) & np.uint64(0xFF)
            h = (h ^ byte) * prime
        out[active] = h
    return out


def full_hash64(arr) -> "np.ndarray":
    """Full-width 64-bit content hash per element (int or string arrays).

    Unlike ``windows.bucket_of`` (which only needs balance and caps
    entropy), this is for IDENTITY: KMV sketch values, group ids, dedup
    keys.  Strings hash via blake2b-8 over the (small) dictionary of
    uniques — a true 64-bit space; a crc32 pre-hash here would cap
    distinct values at 2^32 and saturate cardinality estimates.
    """
    import hashlib

    import pyarrow as _pa
    import pyarrow.compute as _pc

    if isinstance(arr, _pa.ChunkedArray):
        arr = arr.combine_chunks()
    if _pa.types.is_integer(arr.type):
        # nulls hash as 0 (to_numpy would smuggle NaN through the cast)
        arr = _pc.fill_null(arr, 0)
        return fnv1a64_numpy(np_col(arr))
    # nulls hash like the empty string (dictionary_encode keeps them as
    # null INDICES, which to_numpy turns into float NaN -> IndexError)
    arr = _pc.fill_null(arr, "")
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(str(u).encode(), digest_size=8).digest(), "little"
            )
            for u in uniq
        ),
        count=len(uniq),
        dtype=np.uint64,
    )
    return uh[np_col(d.indices)]


def full_hash128(arr) -> tuple["np.ndarray", "np.ndarray"]:
    """128-bit content identity as two independent 64-bit lanes
    (blake2b-16 split into low/high 8 bytes), per string element.

    For DEDUP keys: 2^64 birthday bounds give ~2-3 expected collisions at
    10^10 documents — each one silently deletes a distinct doc — while at
    2^128 a false merge is impossible at any physical corpus size.
    Group/route on BOTH lanes.  Vectorized over the batch dictionary of
    unique strings, same as :func:`full_hash64`."""
    import hashlib

    import pyarrow as _pa
    import pyarrow.compute as _pc

    if isinstance(arr, _pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = _pc.fill_null(arr, "")
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    lo = np.empty(len(uniq), dtype=np.uint64)
    hi = np.empty(len(uniq), dtype=np.uint64)
    for i, u in enumerate(uniq):
        dig = hashlib.blake2b(str(u).encode(), digest_size=16).digest()
        lo[i] = int.from_bytes(dig[:8], "little")
        hi[i] = int.from_bytes(dig[8:], "little")
    codes = np_col(d.indices)
    return lo[codes], hi[codes]
