"""SQL-expression builders that replay the engine's hash kernels in
DuckDB — the machinery that promotes formerly py-oracle-only queries
(doc_fingerprint, simhash_pairs, quantile sketches, CEP counts) into the
driver's hard DuckDB gate.

Every builder mirrors ONE engine kernel bit-for-bit:

* FNV-1a 64 over little-endian bytes  -> ``tokenize.fnv1a64_numpy`` /
  ``tokenize.hash_token_lists`` (config.py constants);
* full-word FNV chain (xor whole 64-bit value, then multiply)
  -> ``dedup.shingle_hash_flat``'s shingle chain;
* md5 lower-64 word hash -> ``dedup._word_hashes`` (DuckDB
  ``md5_number_lower(s)`` == ``int.from_bytes(md5(s).digest()[8:],
  "little")`` — verified in tests);
* leftmost-lazy regex over 'g'+hex4-encoded token streams -> the CEP
  scanner's leftmost-greedy nonoverlapping gap semantics
  (``cep.match_pattern_batch`` / ``cep.StreamingMatcher``).

Arithmetic notes: DuckDB UBIGINT multiplication ERRORS on overflow
instead of wrapping, so the mod-2^64 wrap goes through HUGEINT
(acc < 2^64, prime < 2^41 -> product < 2^105 < HUGEINT max).
"""

from __future__ import annotations

from dataflowkit_ray.config import FNV_OFFSET, FNV_PRIME

_TWO64 = 1 << 64


def u64(expr: str) -> str:
    return f"CAST({expr} AS UBIGINT)"


def fnv_mul_expr(acc: str) -> str:
    """(acc * FNV_PRIME) mod 2^64 with UBIGINT in/out."""
    return (
        f"CAST(CAST({acc} AS HUGEINT) * {FNV_PRIME} % {_TWO64} AS UBIGINT)"
    )


def fnv_step_word(acc: str, x: str) -> str:
    """One FULL-WORD FNV chain step: (acc XOR x) * prime mod 2^64 —
    the shingle-chain step of ``dedup.shingle_hash_flat``."""
    return fnv_mul_expr(f"xor({acc}, {x})")


def fnv_fold_bytes(acc: str, val: str, nbytes: int) -> str:
    """Byte-wise FNV-1a fold of the ``nbytes`` little-endian bytes of an
    unsigned value — ``tokenize.fnv1a64_numpy`` (nbytes=8) and the
    per-token fold of ``tokenize.hash_token_lists`` (nbytes=4)."""
    e = acc
    v = u64(val)
    for i in range(nbytes):
        byte = f"(({v} >> {8 * i}) & 255)" if i else f"({v} & 255)"
        e = fnv_mul_expr(f"xor({e}, {byte})")
    return e


def fnv1a64_int_expr(val: str, nbytes: int = 8) -> str:
    """FNV-1a 64 of an integer's LE bytes, from the standard offset."""
    return fnv_fold_bytes(u64(str(FNV_OFFSET)), val, nbytes)


def u64_to_i64(expr: str) -> str:
    """Reinterpret a UBIGINT as signed int64 (two's complement), the way
    numpy ``astype(int64)`` does."""
    return (
        f"CAST(CASE WHEN {expr} >= {1 << 63} THEN CAST({expr} AS HUGEINT) - {_TWO64} "
        f"ELSE CAST({expr} AS HUGEINT) END AS BIGINT)"
    )


def token_list_fnv_expr(tokens: str) -> str:
    """FNV-1a 64 over the 4-LE-byte folds of every int32 token in a list
    column — ``tokenize.hash_token_lists`` exactly.  Uses ``list_reduce``
    with the offset prepended as the seed element."""
    fold = fnv_fold_bytes("a", "t", 4)
    return (
        f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS UBIGINT), "
        f"list_transform({tokens}, t -> CAST(t AS UBIGINT))), "
        f"(a, t) -> {fold})"
    )


def shingle_chain_expr(word_exprs: list[str]) -> str:
    """Full-word FNV chain over md5-lower-64 word hashes — one shingle
    hash of ``dedup.shingle_hash_flat`` (word_hash basis = md5)."""
    e = u64(str(FNV_OFFSET))
    for w in word_exprs:
        e = fnv_step_word(e, f"md5_number_lower({w})")
    return e


def cep_regex(step_hexes: list[str], gaps: list[int]) -> str:
    """RE2 pattern counting the engine's nonoverlapping leftmost-greedy
    gapped matches over a 'g'+hex4-per-token encoded string.

    Lazy ``{0,g}?`` gap quantifiers take the EARLIEST next step — the
    same single accepting run the scanner picks; global regex iteration
    (leftmost start, resume past each match) equals the scanner's greedy
    nonoverlapping candidate selection (equivalence asserted in
    tests/test_sql_parity.py against random token streams)."""
    assert len(step_hexes) == len(gaps) + 1
    pat = f"g{step_hexes[0]}"
    for hx, gap in zip(step_hexes[1:], gaps):
        pat += f"(?:g[0-9a-f]{{4}}){{0,{gap}}}?g{hx}"
    return pat


def tokens_to_hexstr_expr(tokens: str) -> str:
    """int32 token list -> 'g0a1fg0042...' (4 hex digits per token,
    'g'-marked boundaries so regex matches can only start on a token)."""
    return (
        f"array_to_string(list_transform({tokens}, "
        f"t -> 'g' || printf('%04x', t)), '')"
    )


def cep_regex_indexed(step_hexes: list[str], gaps: list[int]) -> str:
    """:func:`cep_regex` over an INDEXED encoding 'g'+hex4+'i'+dec12 —
    each event chunk carries its 12-decimal-digit stream index, captured
    for the first and last step so the match positions can be joined back
    to event attributes (clocks) in SQL."""
    assert len(step_hexes) == len(gaps) + 1
    idx = "i([0-9]{12})"
    gap_chunk = "g[0-9a-f]{4}i[0-9]{12}"
    pat = f"g{step_hexes[0]}{idx}"
    for hx, gap in zip(step_hexes[1:], gaps):
        pat += f"(?:{gap_chunk}){{0,{gap}}}?g{hx}{idx}"
    return pat


def hex4(token: int) -> str:
    return f"{token:04x}"


def simhash_pairs_sql(max_hamming: int = 3, w: int = 3) -> str:
    """Full-replay DuckDB oracle for ``dedup.simhash_pairs``: md5-lower-64
    word hashes -> FNV shingle chains (w=3; <w words: length-1 chains) ->
    per-row distinct -> FNV-1a rehash -> 64 bit-votes -> fingerprint ->
    all-pairs Hamming filter.  Exact because the engine's 4-block
    pigeonhole LSH has recall 1.0 at Hamming <= 3 and verifies the true
    distance (``dedup.py`` fp_stage/verify_bucket)."""
    assert w == 3, "SQL twin is generated for the engine default w=3"
    chain3 = shingle_chain_expr(["W[i]", "W[i+1]", "W[i+2]"])
    chain1 = shingle_chain_expr(["wd"])
    rehash = fnv1a64_int_expr("s", nbytes=8)
    return f"""
WITH words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, str_split(text, ' ') AS W
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(W) >= 3
                THEN list_transform(generate_series(1, len(W) - 2),
                                    i -> {chain3})
                ELSE list_transform(W, wd -> {chain1})
           END) AS shingles
  FROM words
),
hashed AS (
  SELECT doc_id, {rehash} AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
votes AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit)
  GROUP BY doc_id, bit
),
fp AS (
  SELECT doc_id,
         bit_or(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << bit
                     ELSE CAST(0 AS UBIGINT) END) AS f
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {max_hamming}
"""
