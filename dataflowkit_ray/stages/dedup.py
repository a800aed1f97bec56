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
as ``stages/agg.hash_agg``.  Deterministic hash functions only (zlib.crc32
+ FNV mixing): replays and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from dataflowkit_ray.config import FNV_OFFSET, FNV_PRIME
from dataflowkit_ray.stages.agg import hash_agg
from dataflowkit_ray.tokenize import fnv1a64_numpy


# ----------------------------------------------------------------- hashing


def crc64_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit content hash per string (crc32 ⊕ adler32 mix)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.to_pylist()
    out = np.empty(len(vals), dtype=np.uint64)
    for i, s in enumerate(vals):
        b = s.encode() if s is not None else b""
        out[i] = (zlib.crc32(b) << 32) | zlib.adler32(b)
    return out


def shingle_hashes(text: pa.Array | pa.ChunkedArray, w: int = 3) -> list[np.ndarray]:
    """Per row: sorted unique hashes of word w-shingles (vectorized per row).

    Shingle hash = FNV-1a over the crc32s of its words — order-sensitive,
    so ("a b c") != ("c b a")."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out: list[np.ndarray] = []
    for s in text.to_pylist():
        words = (s or "").split(" ")
        wh = np.fromiter(
            (zlib.crc32(x.encode()) for x in words), count=len(words), dtype=np.uint64
        )
        if len(words) < w:
            sh = fnv1a64_numpy(wh) if len(words) else np.empty(0, np.uint64)
        else:
            h = np.full(len(wh) - w + 1, FNV_OFFSET, dtype=np.uint64)
            prime = np.uint64(FNV_PRIME)
            for j in range(w):
                h = (h ^ wh[j : len(wh) - w + 1 + j]) * prime
            sh = h
        out.append(np.unique(sh))
    return out


def minhash_signature(shingles: np.ndarray, k: int = 64) -> np.ndarray:
    """k-permutation minhash via k independent affine rehashes (deterministic
    odd multipliers derived from FNV powers)."""
    if len(shingles) == 0:
        return np.full(k, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    mults = _MINHASH_MULTS[:k]
    adds = _MINHASH_ADDS[:k]
    # (k, n) affine transforms; min over shingles per row
    vals = (shingles[None, :] * mults[:, None] + adds[:, None])
    return vals.min(axis=1)


def _gen_consts(k: int, seed_mult: int) -> np.ndarray:
    out = np.empty(k, dtype=np.uint64)
    h = FNV_OFFSET
    for i in range(k):
        h = ((h * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF) ^ (seed_mult + i)
        out[i] = h | 1  # odd
    return out


_MINHASH_MULTS = _gen_consts(256, 0x9E3779B9)
_MINHASH_ADDS = _gen_consts(256, 0x85EBCA77)


def simhash64(shingles_or_tokens: np.ndarray) -> int:
    """64-bit SimHash: sign of per-bit vote over element hashes."""
    if len(shingles_or_tokens) == 0:
        return 0
    h = fnv1a64_numpy(shingles_or_tokens.astype(np.uint64))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


# ------------------------------------------------------------- exact dedup


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep-first per content hash: (doc_id=min, n_copies) per distinct text.

    The distributed form of the reference's Upsert-on-content-hash (O3,
    SURVEY.md §2.6): one bucket shuffle, no raw-text exchange."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = crc64_strings(t[text_col])
        return pa.table(
            {
                id_col: t[id_col],
                "text_h": pa.array(h.astype(np.int64)),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    agg = hash_agg(
        hashed,
        ("text_h",),
        [(id_col, "min", id_col), (id_col, "count", "n_copies")],
    )
    return agg.select_columns([id_col, "n_copies"])


# ------------------------------------------------------- near-dup pipeline


def _pairs_from_groups(doc_ids: np.ndarray, group_ids: np.ndarray) -> np.ndarray:
    """All within-group (a < b) pairs, vectorized-ish per group."""
    order = np.lexsort((doc_ids, group_ids))
    g = group_ids[order]
    d = doc_ids[order]
    pairs = []
    start = 0
    for i in range(1, len(g) + 1):
        if i == len(g) or g[i] != g[start]:
            if i - start > 1:
                members = d[start:i]
                ai, bi = np.triu_indices(len(members), k=1)
                pairs.append(np.stack([members[ai], members[bi]], axis=1))
            start = i
    if not pairs:
        return np.empty((0, 2), dtype=np.int64)
    return np.unique(np.concatenate(pairs), axis=0)


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

    Stages (each a bucket shuffle away from the next):
      1. map_batches: text -> shingle set -> k-minhash signature ->
         ``bands`` band keys (hash of r=k/bands rows) + the shingle set
         (kept as list<uint64> for the verify step);
      2. shuffle on (band, band_key) bucket; within a bucket, group rows
         by band key -> candidate (a, b) pairs;
      3. verify: exact Jaccard of the shingle sets, emit pairs >= t.

    With r=k/bands rows per band, P[candidate | J=t] = 1-(1-t^r)^bands —
    at k=64, bands=16 (r=4), J=0.8: ~0.9997; misses are possible in
    principle (documented LSH semantics) but vanish for the near-identical
    duplicates this detects.  Verification makes precision exact.
    """
    assert k % bands == 0
    r = k // bands

    # stage 1: band rows carry ONLY (band, band_key, id) — carrying the
    # shingle sets here multiplied shuffle volume by ``bands`` (measured
    # 11s -> ~2s at 500 docs after this split).
    def sig_stage(t: pa.Table) -> pa.Table:
        sh = shingle_hashes(t[text_col], w)
        ids = t[id_col].to_pylist()
        n = len(ids)
        band_arr = np.tile(np.arange(bands, dtype=np.int64), n)
        key_arr = np.empty(n * bands, dtype=np.int64)
        for i, s in enumerate(sh):
            sig = minhash_signature(s, k)
            chunks = fnv1a64_numpy(sig).reshape(bands, r).sum(axis=1)
            key_arr[i * bands : (i + 1) * bands] = (
                chunks & np.uint64(0x7FFFFFFFFFFFFFFF)
            ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band_arr),
                "band_key": pa.array(key_arr),
                id_col: pa.array(np.repeat(np.asarray(ids, dtype=np.int64), bands)),
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

    # stage 2: per-bucket candidate pairs (ids only)
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

    cand = (
        sigs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_bucket, batch_format="pyarrow")
    )

    # stage 3: shingle sets for CANDIDATE docs only (bounded by the dup
    # rate + banding false positives), broadcast once for the verify map.
    # At corpus scale swap this broadcast for a bucket join of the pair
    # stream against a (doc -> shingles) stream.
    import ray
    import ray.data

    _parts = [b for b in cand.iter_batches(batch_format="pyarrow") if len(b)]
    if _parts:
        raw = pa.concat_tables(_parts)
        uniq = np.unique(
            np.stack(
                [
                    raw["doc_a"].to_numpy(zero_copy_only=False),
                    raw["doc_b"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        cand_t = pa.table(
            {"doc_a": pa.array(uniq[:, 0]), "doc_b": pa.array(uniq[:, 1])}
        )
    else:
        cand_t = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    needed = set(cand_t["doc_a"].to_pylist()) | set(cand_t["doc_b"].to_pylist())
    needed_ref = ray.put(needed)

    def shingle_stage(t: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = t[id_col].to_pylist()
        mask = np.asarray([i in want for i in ids])
        if not mask.any():
            return pa.table(
                {id_col: pa.array([], pa.int64()), "shingles": pa.array([], pa.list_(pa.uint64()))}
            )
        sub = t.filter(pa.array(mask))
        sh = shingle_hashes(sub[text_col], w)
        return pa.table(
            {
                id_col: sub[id_col],
                "shingles": pa.array([s.tolist() for s in sh], pa.list_(pa.uint64())),
            }
        )

    sh_parts = [
        b
        for b in ds.map_batches(shingle_stage, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    sh_by_id: dict[int, np.ndarray] = {}
    for t in sh_parts:
        for i, d in enumerate(t[id_col].to_pylist()):
            sh_by_id[d] = np.asarray(t["shingles"][i].as_py(), dtype=np.uint64)
    sh_ref = ray.put(sh_by_id)

    # stage 4: verify candidates against the broadcast shingle lookup
    def verify(t: pa.Table) -> pa.Table:
        lut = ray.get(sh_ref)
        out_a, out_b, out_j = [], [], []
        for a, b_ in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            sa, sb = lut[a], lut[b_]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 1.0
            if j >= threshold:
                out_a.append(a)
                out_b.append(b_)
                out_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return ray.data.from_arrow(cand_t).map_batches(verify, batch_format="pyarrow")


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
    true distance.  Scales: shuffle key is (block_idx, block_value)."""

    def fp_stage(t: pa.Table) -> pa.Table:
        sh = shingle_hashes(t[text_col], w)
        ids = t[id_col].to_pylist()
        fps = [simhash64(s) for s in sh]
        rows = {"block": [], "block_val": [], id_col: [], "fp": []}
        for d, fp in zip(ids, fps):
            for blk in range(4):
                rows["block"].append(blk)
                rows["block_val"].append((fp >> (16 * blk)) & 0xFFFF)
                rows[id_col].append(d)
                rows["fp"].append(fp)
        return pa.table(
            {
                "block": pa.array(rows["block"], pa.int32()),
                "block_val": pa.array(rows["block_val"], pa.int32()),
                id_col: pa.array(rows[id_col], pa.int64()),
                "fp": pa.array(np.array(rows["fp"], dtype=np.uint64).astype(np.int64)),
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
        fp_by_id = dict(
            zip(ids, t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64))
        )
        cand = _pairs_from_groups(ids, group)
        out_a, out_b, out_d = [], [], []
        for a, b_ in cand:
            d = int(bin(int(fp_by_id[a]) ^ int(fp_by_id[b_])).count("1"))
            if d <= max_hamming:
                out_a.append(int(a))
                out_b.append(int(b_))
                out_d.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    pairs = (
        fps.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )
    return hash_agg(
        pairs, ("doc_a", "doc_b"), [("hamming", "min", "hamming")], n_buckets=16
    )
