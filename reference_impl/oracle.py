"""Single-node pure-Python oracle for the engine queries that SQL cannot
express (SURVEY.md §7 "reference_impl").

Everything here is written scalar-first, independent of the engine's
vectorized kernels: plain loops over rows, python ints, hashlib/zlib —
so a value bug in the engine's numpy/Arrow code cannot hide in a shared
implementation.  Only the *specifications* are shared (and deliberately
small): the tokenizer formula, FNV-1a constants, the pattern definitions.

Used by scripts/check_correctness.py for the queries that have no
``oracle_sql()`` entry: ``streaming_windowed``, ``streaming_funnel``,
``simhash_pairs``, ``lsh_dup_pairs``, ``doc_fingerprint``,
``multimodal_meta`` — turning their rows-only checks into full
row/schema/value equality.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
MASK64 = 0xFFFFFFFFFFFFFFFF
VOCAB_MOD = 32000


# ------------------------------------------------------------ primitives


def token_id(word: str) -> int:
    first = ord(word[0]) if word else 0
    return (len(word) * 256 + first) % VOCAB_MOD


def tokenize(text: str) -> list[int]:
    return [token_id(w) for w in (text or "").split(" ")]


def fnv1a_bytes(data: bytes, h: int = FNV_OFFSET) -> int:
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & MASK64
    return h


def fnv1a_u64(v: int) -> int:
    """FNV-1a over the 8 little-endian bytes of a uint64 (the engine's
    elementwise hash)."""
    h = FNV_OFFSET
    for shift in range(0, 64, 8):
        h = ((h ^ ((v >> shift) & 0xFF)) * FNV_PRIME) & MASK64
    return h


def word_hash(w: str) -> int:
    return int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")


def shingle_set(text: str, w: int = 3) -> list[int]:
    """Sorted unique FNV chains over md5-lower-64 word hashes; rows with
    fewer than w words emit one length-1 chain per word."""
    words = (text or "").split(" ")
    hs = [word_hash(x) for x in words]
    out = set()
    if len(words) >= w:
        for i in range(len(words) - w + 1):
            h = FNV_OFFSET
            for j in range(w):
                h = ((h ^ hs[i + j]) * FNV_PRIME) & MASK64
            out.add(h)
    else:
        for v in hs:
            out.add(((FNV_OFFSET ^ v) * FNV_PRIME) & MASK64)
    return sorted(out)


def _scan_gaps_scalar(tokens, first_ok, step_oks, gaps, nonoverlapping=True):
    """Leftmost-greedy gapped scan (the batch CEP semantics): for each
    candidate start, take the earliest token satisfying each later step
    within its gap budget.  ``step_oks[j]``/``gaps[j]`` describe step j>=1.
    Returns (start, end_exclusive) index pairs."""
    out = []
    resume = 0
    n = len(tokens)
    for s in range(n):
        if not first_ok(tokens[s]):
            continue
        if nonoverlapping and s < resume:
            continue
        pos = s
        ok = True
        for j in range(len(step_oks)):
            gap = gaps[j]
            lo, hi = pos + 1, min(pos + 1 + gap + 1, n)
            hit = -1
            for p in range(lo, hi):
                if step_oks[j](tokens[p]):
                    hit = p
                    break
            if hit < 0:
                ok = False
                break
            pos = hit
        if ok:
            out.append((s, pos + 1))
            resume = pos + 1
    return out


# --------------------------------------------------------------- oracles


def _docs(sf_dir: str) -> pd.DataFrame:
    import glob
    import os

    d = f"{sf_dir}/documents"
    if os.path.isdir(d):  # multi-file corpus shape
        import pyarrow as pa

        return pa.concat_tables(
            [pq.read_table(f) for f in sorted(glob.glob(f"{d}/*.parquet"))]
        ).to_pandas()
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def oracle_streaming_windowed(sf_dir: str) -> pd.DataFrame:
    """Tumbling windowed (sum, count, details, CEP matches) per source —
    what StreamingRunner commits (window_size=32, chunk=16 details,
    pattern 'spark' then 'join' with max_gap=3, nonoverlapping)."""
    df = _docs(sf_dir)
    size, chunk = 32, 16
    spark, join = token_id("spark"), token_id("join")
    acc: dict = {}
    for _, row in df.iterrows():
        toks = tokenize(row["text"])
        n_tok = len(toks)
        wid = int(row["doc_id"]) // size
        key = (row["source"], wid)
        a = acc.setdefault(key, [0, 0, 0, 0])
        a[0] += n_tok
        a[1] += 1
        a[2] += max(1, -(-n_tok // chunk))
        a[3] += len(
            _scan_gaps_scalar(
                toks, lambda t: t == spark, [lambda t: t == join], [3]
            )
        )
    rows = [
        {
            "source": k[0],
            "window_id": k[1],
            "sum_n_tok": v[0],
            "n_rows": v[1],
            "n_details": v[2],
            "n_matches": v[3],
        }
        for k, v in acc.items()
    ]
    return pd.DataFrame(rows)


EVENT_TOKENS = {"view": 1, "click": 2, "signup": 3, "purchase": 4, "error": 5}


def oracle_streaming_funnel(sf_dir: str) -> pd.DataFrame:
    """signup -> purchase (<= 3 events between) per user over the clock-
    ordered event stream, leftmost-greedy nonoverlapping — the streaming
    NFA's semantics replayed token-at-a-time in plain python."""
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])
    df = t.to_pandas()
    df["clock"] = df["ts"].astype("int64")
    df["token"] = df["event_type"].map(EVENT_TOKENS).fillna(0).astype(int)
    out = []
    for user, g in df.groupby("user_id"):
        g = g.sort_values("clock", kind="stable")
        runs: list[list[int]] = []  # [step, gap_left, start_seq]
        gaps = [0, 3]
        steps = [3, 4]  # signup, purchase
        for clock, token in zip(g["clock"], g["token"]):
            survivors = []
            completed = []
            for step, gap_left, start in runs:
                if token == steps[step]:
                    if step + 1 == len(steps):
                        completed.append((start, clock + 1))
                    else:
                        survivors.append([step + 1, gaps[step + 1], start])
                elif gap_left > 0:
                    survivors.append([step, gap_left - 1, start])
            if token == steps[0]:
                survivors.append([1, gaps[1], clock])
            if completed:
                completed.sort()
                out.append((int(user), completed[0][0], completed[0][1]))
                runs = []  # nonoverlapping: drop everything inside the match
            else:
                runs = survivors
    return pd.DataFrame(out, columns=["key", "start_seq", "end_seq"])


def _simhash(text: str) -> int:
    sh = shingle_set(text)
    if not sh:
        return 0
    votes = [0] * 64
    for v in sh:
        h = fnv1a_u64(v)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp |= 1 << b
    return fp


def oracle_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """Brute-force all-pairs Hamming <= 3 over scalar SimHash fingerprints
    (the engine's 4-block pigeonhole LSH has recall 1.0 at <= 3, so brute
    force IS its specification)."""
    df = _docs(sf_dir)
    fps = {int(r["doc_id"]): _simhash(r["text"]) for _, r in df.iterrows()}
    ids = sorted(fps)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= 3:
                out.append((a, b, d))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])


def oracle_lsh_dup_pairs(
    sf_dir: str, threshold: float = 0.95, n_planes: int = 12, n_tables: int = 6
) -> pd.DataFrame:
    """Scalar replay of the hyperplane-LSH bucketing (deterministic
    pseudo-gaussian planes) + exact cosine verify over the planted-dup
    corpus: the engine's candidate set is a pure function of the data,
    so the oracle reproduces it."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    base_ids = [int(v) for v in t["vec_id"].to_pylist()]
    base = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    dup = base.copy()
    dup[:, 0] += 0.01 * np.linalg.norm(base, axis=1)
    ids = base_ids + [i + 10_000_000 for i in base_ids]
    vecs = np.concatenate([base, dup], axis=0)
    dim = vecs.shape[1]
    n = n_tables * n_planes * dim
    u = np.array(
        [(fnv1a_u64(i) % (1 << 30)) / (1 << 30) for i in range(n * 12)],
        dtype=np.float64,
    )
    planes = (u.reshape(n, 12).sum(axis=1) - 6.0).reshape(n_tables, n_planes, dim)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = vecs / norms
    pairs = set()
    for ti in range(n_tables):
        sigs: dict[int, list[int]] = {}
        for i in range(len(ids)):
            sig = 0
            for p in range(n_planes):
                if float(m[i] @ planes[ti][p]) > 0:
                    sig |= 1 << p
            sigs.setdefault(sig, []).append(i)
        for members in sigs.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, b = ids[members[x]], ids[members[y]]
                    pairs.add((min(a, b), max(a, b), members[x], members[y]))
    out = []
    seen = set()
    for a, b, i, j in sorted(pairs):
        if (a, b) in seen:
            continue
        seen.add((a, b))
        c = round(float(m[i] @ m[j]), 6)
        if c >= threshold:
            out.append((a, b, c))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "cosine"])


def oracle_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    """FNV-1a over the token array's int32 little-endian bytes."""
    df = _docs(sf_dir)
    out = []
    for _, row in df.iterrows():
        h = FNV_OFFSET
        for tok in tokenize(row["text"]):
            for shift in (0, 8, 16, 24):
                h = ((h ^ ((tok >> shift) & 0xFF)) * FNV_PRIME) & MASK64
        out.append((str(int(row["doc_id"])), np.int64(np.uint64(h))))
    return pd.DataFrame(out, columns=["doc_id", "fingerprint"])


def oracle_multimodal_meta(sf_dir: str) -> pd.DataFrame:
    """Synth media -> decode (real PGM/WAV/Y4M containers) -> every-30th
    frame sample.  Scalar replication of the engine's deterministic
    synthesis: image n_frames = 1; audio n_frames = decoded WAV sample
    count = 64 + len(text) %% 256; video n_frames = Y4M FRAME count =
    8 + len(text) %% 64."""
    df = _docs(sf_dir)
    kinds = ["image", "audio", "video"]
    out = []
    for _, row in df.iterrows():
        payload = row["text"].encode()
        media_type = kinds[int(row["doc_id"]) % 3]
        if media_type == "image":
            n_frames = 1
        elif media_type == "audio":
            n_frames = 64 + len(payload) % 256
        else:
            n_frames = 8 + len(payload) % 64
        for k in range(max(1, -(-n_frames // 30))):
            out.append((str(int(row["doc_id"])), k * 30))
    return pd.DataFrame(out, columns=["media_id", "frame_idx"])


ORACLE_FNS = {
    "streaming_windowed": oracle_streaming_windowed,
    "streaming_funnel": oracle_streaming_funnel,
    "simhash_pairs": oracle_simhash_pairs,
    "lsh_dup_pairs": oracle_lsh_dup_pairs,
    "doc_fingerprint": oracle_doc_fingerprint,
    "multimodal_meta": oracle_multimodal_meta,
}
