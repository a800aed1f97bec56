"""SQL-replay parity: the DuckDB expression builders in
``pipelines/sqlgen.py`` must replicate the engine's hash / CEP kernels
bit-for-bit — these are the foundations of the driver-gate oracles for
``doc_fingerprint``, ``simhash_pairs`` and the streaming CEP queries.

No Ray needed: pure numpy kernels vs DuckDB scalar evaluation.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from dataflowkit_ray.pipelines import sqlgen as sg
from dataflowkit_ray.stages.dedup import (
    _word_hashes,
    shingle_hashes,
    simhash64_batch,
)
from dataflowkit_ray.tokenize import fnv1a64_numpy, hash_token_lists


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_md5_number_lower_byte_order(con):
    """DuckDB md5_number_lower == lower 8 md5 bytes little-endian — the
    engine's word-hash basis (dedup._word_hashes)."""
    for w in ["", "a", "hello", "spark join", "été"]:
        got = con.execute("SELECT md5_number_lower(?)", [w]).fetchone()[0]
        exp = int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
        assert int(got) == exp
    # and the vectorized engine kernel agrees
    off, wh = _word_hashes(pa.array(["hello spark"]))
    exp = [
        int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
        for w in ("hello", "spark")
    ]
    assert [int(v) for v in wh] == exp


def test_fnv1a64_int_expr_matches_kernel(con):
    vals = np.array([0, 1, 255, 2**32 - 1, 2**63 + 17, 2**64 - 1], dtype=np.uint64)
    eng = fnv1a64_numpy(vals)
    for v, e in zip(vals, eng):
        got = con.sql(f"SELECT {sg.fnv1a64_int_expr(str(int(v)))}").fetchone()[0]
        assert int(got) == int(e)


def test_token_list_fnv_matches_hash_token_lists(con):
    rng = random.Random(7)
    lists = [[rng.randrange(32000) for _ in range(rng.randrange(0, 12))] for _ in range(40)]
    eng = hash_token_lists(pa.array(lists, type=pa.list_(pa.int32())))
    rows = con.execute(
        f"SELECT {sg.token_list_fnv_expr('t')} FROM (SELECT unnest(?) AS t)",
        [lists],
    ).fetchall()
    assert [int(r[0]) for r in rows] == [int(v) for v in eng]


def test_shingle_chain_matches_engine(con):
    texts = ["a b c d e", "x", "one two", "a a a a", ""]
    eng = shingle_hashes(pa.array(texts), w=3)
    chain3 = sg.shingle_chain_expr(["W[i]", "W[i+1]", "W[i+2]"])
    chain1 = sg.shingle_chain_expr(["wd"])
    rows = con.execute(
        f"""
        SELECT list_sort(list_distinct(
          CASE WHEN len(W) >= 3
               THEN list_transform(generate_series(1, len(W) - 2), i -> {chain3})
               ELSE list_transform(W, wd -> {chain1}) END)) AS sh
        FROM (SELECT str_split(unnest(?), ' ') AS W)
        """,
        [texts],
    ).fetchall()
    for (got,), exp in zip(rows, eng):
        assert [int(v) for v in got] == [int(v) for v in np.sort(exp)]


def _scan_gaps_scalar(tokens, steps, gaps):
    """The engine's leftmost-greedy nonoverlapping gapped scan (the
    specification in reference_impl.oracle, inlined to keep this test
    self-contained)."""
    out = []
    resume = 0
    n = len(tokens)
    for s in range(n):
        if tokens[s] != steps[0] or s < resume:
            continue
        pos, ok = s, True
        for j in range(1, len(steps)):
            hi = min(pos + 1 + gaps[j - 1] + 1, n)
            hit = next((p for p in range(pos + 1, hi) if tokens[p] == steps[j]), -1)
            if hit < 0:
                ok = False
                break
            pos = hit
        if ok:
            out.append((s, pos))
            resume = pos + 1
    return out


def test_cep_regex_equals_scanner_on_random_streams(con):
    """Lazy-gap RE2 global matching == the leftmost-greedy nonoverlapping
    scanner, over random token streams — the equivalence the
    streaming_windowed oracle's n_matches column rests on."""
    rng = random.Random(42)
    steps, gaps = [3, 4], [3]
    pat = sg.cep_regex([sg.hex4(3), sg.hex4(4)], gaps)
    streams = [
        [rng.randrange(1, 6) for _ in range(rng.randrange(0, 40))] for _ in range(300)
    ]
    strs = ["".join(f"g{t:04x}" for t in ts) for ts in streams]
    rows = con.execute(
        f"SELECT len(regexp_extract_all(s, '{pat}')) FROM (SELECT unnest(?) AS s)",
        [strs],
    ).fetchall()
    for (got,), ts in zip(rows, streams):
        assert got == len(_scan_gaps_scalar(ts, steps, gaps))


def test_cep_regex_indexed_recovers_match_positions(con):
    """The indexed encoding's capture groups == the scanner's (start, end)
    token indices — the funnel oracle's clock-join foundation."""
    rng = random.Random(99)
    steps, gaps = [3, 4], [3]
    pat = sg.cep_regex_indexed([sg.hex4(3), sg.hex4(4)], gaps)
    streams = [
        [rng.randrange(1, 6) for _ in range(rng.randrange(0, 40))] for _ in range(300)
    ]
    strs = [
        "".join(f"g{t:04x}i{i:012d}" for i, t in enumerate(ts)) for ts in streams
    ]
    rows = con.execute(
        f"""
        SELECT list_transform(regexp_extract_all(s, '{pat}', 1), x -> CAST(x AS BIGINT)),
               list_transform(regexp_extract_all(s, '{pat}', 2), x -> CAST(x AS BIGINT))
        FROM (SELECT unnest(?) AS s)
        """,
        [strs],
    ).fetchall()
    for (starts, ends), ts in zip(rows, streams):
        exp = _scan_gaps_scalar(ts, steps, gaps)
        assert list(zip(starts, ends)) == exp


def test_simhash_sql_matches_engine_kernel(con):
    """simhash_pairs_sql fingerprints == the vectorized engine fingerprints
    on a synthetic corpus with planted near-dups."""
    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 20))) for _ in range(30)]
    docs.append(docs[0])  # exact dup -> hamming 0 pair must appear
    ids = list(range(len(docs)))

    from dataflowkit_ray.stages.dedup import shingle_hash_flat

    off, vals = shingle_hash_flat(pa.array(docs), 3)
    fps = simhash64_batch(off, vals)
    exp_pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(fps[i]) ^ int(fps[j])).count("1")
            if d <= 3:
                exp_pairs.add((i, j, d))

    con.execute("CREATE OR REPLACE TABLE documents AS SELECT unnest(?) AS doc_id, unnest(?) AS text", [ids, docs])
    got = {tuple(r) for r in con.sql(sg.simhash_pairs_sql(3)).fetchall()}
    con.execute("DROP TABLE documents")
    assert got == exp_pairs and len(got) >= 1
