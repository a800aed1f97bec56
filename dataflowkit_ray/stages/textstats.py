"""Text-analysis stages: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All fully vectorized over Arrow batches; the scoring formulas are chosen
to be expressible verbatim in ANSI SQL so the DuckDB oracle can replay
them (check_correctness gate).  The fingerprint is the engine's FNV
content hash (``tokenize.hash_token_lists``) — the per-row analog of the
reference's payload UID (``/root/reference/scrape/scrape.go:134-155``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny deterministic "stopword" list over the synthetic vocabulary;
# a real corpus swaps in a per-language table (broadcast via actor init)
STOPWORDS: tuple[str, ...] = ("a", "the")


def _round6_half_away(x: np.ndarray) -> np.ndarray:
    """round(x, 6) with DuckDB's half-away-from-zero tie rule.  np.round
    is half-to-even, so a tie like 129 chars / 128 words = 1.0078125
    diverges (engine 1.007812 vs oracle 1.007813) exactly at values the
    oracle must replay bit-for-bit.  Non-negative inputs only (all the
    ratios here)."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def text_stats_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_words, n_distinct_words, stopword_ratio, quality_score,
    lang_pred) per document.

    * stopword_ratio = stopword hits / words (6dp)
    * quality_score  = distinct words / words (6dp) — repetition penalty
    * lang_pred      = 'en' when stopword_ratio >= 0.02 else 'unk'
      (an n-gram-free stand-in for langid with the same plumbing: a
      broadcast table of per-language marker rates)
    """
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(text, pattern=" ")
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)

    flat = words.flatten()
    # one dictionary pass feeds both the stopword and the distinct counts
    d = flat.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    idx = d.indices.to_numpy(zero_copy_only=False)
    stop_uniq = np.asarray([u in STOPWORDS for u in uniq], dtype=np.int64)
    stop_np = stop_uniq[idx]
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    stop_counts = np.add.reduceat(
        np.append(stop_np, 0), offsets[:-1]
    ) * (n_words > 0)

    # distinct words per row via the dictionary CODES (exact — a crc
    # hash here would add a 32-bit collision path that undercounts)
    wh = idx.astype(np.int64)
    row_of = np.repeat(np.arange(len(n_words)), n_words)
    order = np.lexsort((wh, row_of))
    rw, hh = row_of[order], wh[order]
    new = np.ones(len(rw), dtype=bool)
    if len(rw) > 1:
        new[1:] = (rw[1:] != rw[:-1]) | (hh[1:] != hh[:-1])
    distinct = np.bincount(rw[new], minlength=len(n_words)).astype(np.int64)

    safe_n = np.maximum(n_words, 1)
    stop_ratio = _round6_half_away(stop_counts / safe_n)
    quality = _round6_half_away(distinct / safe_n)
    lang = np.where(stop_ratio >= 0.02, "en", "unk")

    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(distinct),
            "stopword_ratio": pa.array(stop_ratio),
            "quality_score": pa.array(quality),
            "lang_pred": pa.array(lang.tolist(), pa.string()),
        }
    )


def text_stats(ds):
    return ds.map_batches(text_stats_batch, batch_format="pyarrow")


# the SQL twin of text_stats_batch (single source of truth for the oracle)
TEXT_STATS_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_distinct_words,
       round(len(list_filter(str_split(text, ' '), w -> w IN ('a','the')))
             / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) AS stopword_ratio,
       round(len(list_distinct(str_split(text, ' ')))
             / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) AS quality_score,
       CASE WHEN round(len(list_filter(str_split(text, ' '), w -> w IN ('a','the')))
             / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) >= 0.02
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents
"""


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) — FNV-1a over the token array (rolling
    content hash; exact-dedup / idempotency key)."""
    from dataflowkit_ray.tokenize import hash_token_lists, tokenize_text

    tokens, _ = tokenize_text(t["text"])
    h = hash_token_lists(tokens)
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "fingerprint": pa.array(h.astype(np.int64)),
        }
    )


def doc_fingerprints(ds):
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# --------------------------------------------------- n-gram language ID

# Character-trigram profiles (Cavnar & Trenkle, "N-Gram-Based Text
# Categorization", SDAIR'94): the most frequent trigrams of each
# language, integer-weighted by rank so scores stay exact int64 and the
# DuckDB oracle replays them bit-for-bit.  ASCII-only trigrams on
# purpose: UTF-8 is self-synchronizing, so byte-position matches of an
# ASCII pattern are exactly its character-position matches in ANY utf-8
# text — the vectorized byte scan below and SQL's char-based substr
# agree on every input, multibyte included.  A real deployment swaps in
# bigger per-language tables (same broadcast shape, more rows).
LANG_PROFILES: dict[str, dict[str, int]] = {
    "de": {
        "der": 7, "ein": 6, "sch": 6, "ich": 5, "die": 5, "und": 5,
        "en ": 3, "ung": 3, "cht": 2, " ge": 2, "ver": 1, "nde": 1,
    },
    "en": {
        " th": 7, "the": 7, "he ": 6, "ing": 5, "and": 5, " an": 4,
        "ion": 3, "ent": 3, " of": 3, "of ": 2, "is ": 2, "er ": 1,
    },
    "fr": {
        " de": 7, "de ": 6, "es ": 5, "le ": 5, "ent": 4, "que": 4,
        "les": 3, " la": 3, "ais": 2, "eur": 2, "lle": 2, "ons": 1,
    },
}

_LANGS = sorted(LANG_PROFILES)  # argmax tie-break = lexicographic
_TRIGRAMS = sorted({g for p in LANG_PROFILES.values() for g in p})
_PAT_BYTES = np.array(
    [list(g.encode("ascii")) for g in _TRIGRAMS], dtype=np.uint8
)
# (G, L) weight matrix
_W = np.array(
    [[LANG_PROFILES[l].get(g, 0) for l in _LANGS] for g in _TRIGRAMS],
    dtype=np.int64,
)


def _utf8_flat(text: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(byte_offsets int64 (n+1) zero-based, flat utf-8 bytes) of a
    string column — zero-copy views over the Arrow buffers."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(pc.cast(text, pa.string()), "")
    bufs = text.buffers()
    off = np.frombuffer(bufs[1], np.int32)[
        text.offset : text.offset + len(text) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    return off - off[0], data[off[0] : off[-1]]


def lang_id_batch(t: pa.Table) -> pa.Table:
    """(doc_id, lang_pred, lang_score): overlapping-trigram profile
    scoring.  score(doc, lang) = sum over trigram OCCURRENCES of the
    lang's integer weight; prediction = argmax (ties -> lexicographic),
    'unk' when no profile trigram occurs at all.  One vectorized byte
    scan per profile trigram (G ~ 34), no per-row Python."""
    off, data = _utf8_flat(pc.utf8_lower(t["text"]))
    n = len(off) - 1
    counts = np.zeros((n, len(_TRIGRAMS)), np.int64)
    if len(data) >= 3 and n > 0:
        b0, b1, b2 = data[:-2], data[1:-1], data[2:]
        ends = off[1:]
        for gi in range(len(_TRIGRAMS)):
            p0, p1, p2 = _PAT_BYTES[gi]
            pos = np.flatnonzero((b0 == p0) & (b1 == p1) & (b2 == p2))
            if len(pos) == 0:
                continue
            r = np.searchsorted(off, pos, side="right") - 1
            ok = pos + 3 <= ends[r]  # drop matches spanning row bounds
            counts[:, gi] = np.bincount(r[ok], minlength=n)
    scores = counts @ _W  # (n, L) int64
    top = scores.max(axis=1)
    pred = np.asarray(_LANGS, dtype=object)[np.argmax(scores, axis=1)]
    lang = np.where(top > 0, pred, "unk")
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "lang_pred": pa.array(lang.tolist(), pa.string()),
            "lang_score": pa.array(top),
        }
    )


def lang_id(ds):
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def _lang_profile_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{l}', '{g}', {w})"
        for l in _LANGS
        for g, w in sorted(LANG_PROFILES[l].items())
    )
    return rows


# SQL twin: per-occurrence trigram join against the same profile VALUES
LANG_ID_SQL = f"""
WITH lowered AS (
  SELECT doc_id, lower(text) AS lt FROM documents
),
tg AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, GREATEST(length(lt) - 2, 0)),
           i -> substr(lt, i, 3))) AS g
  FROM lowered
),
prof(lang, g, w) AS (VALUES
    {_lang_profile_values_sql()}
),
sc AS (
  SELECT doc_id, lang, SUM(w) AS score
  FROM tg JOIN prof USING (g)
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM sc
)
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
       COALESCE(CASE WHEN b.score > 0 THEN b.lang END, 'unk') AS lang_pred,
       CAST(COALESCE(b.score, 0) AS BIGINT) AS lang_score
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""


# --------------------------------------------------------- PII redaction

# ordered (pattern, replacement) pairs — RE2 syntax, which Arrow
# (pc.replace_substring_regex) and DuckDB (regexp_replace) both compile,
# so the SQL oracle replays the redaction verbatim
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{9,}\b", "<NUM>"),
)


def redact_pii_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, clean_text, n_pii): scrub emails / IPv4s / long digit
    runs with typed placeholders — the training-data PII pass.

    Vectorized: one RE2 replace per pattern over the whole batch (Arrow
    kernels); ``n_pii`` counts matches on the ORIGINAL text per pattern
    (the SQL twin does the same, so sequential-replacement interactions
    cannot diverge)."""
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_pii = np.zeros(len(text), dtype=np.int64)
    clean = text
    for pat, rep in PII_PATTERNS:
        n_pii += pc.count_substring_regex(text, pattern=pat).to_numpy(
            zero_copy_only=False
        )
        clean = pc.replace_substring_regex(clean, pattern=pat, replacement=rep)
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "clean_text": clean,
            "n_pii": pa.array(n_pii),
        }
    )


def redact_pii(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col), batch_format="pyarrow"
    )


def pii_sql_exprs(text_expr: str = "text") -> tuple[str, str]:
    """(clean_text_expr, n_pii_expr) — the SQL twin of
    :func:`redact_pii_batch` built from the same PII_PATTERNS."""
    clean = text_expr
    for pat, rep in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{rep}', 'g')"
    count = " + ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}'))" for pat, _ in PII_PATTERNS
    )
    return clean, f"CAST({count} AS BIGINT)"


# ----------------------------------------------- repetition quality filter


def repetition_filter_batch(
    t: pa.Table,
    max_dup_frac: float = 0.3,
    min_words: int = 5,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
) -> pa.Table:
    """Gopher-style repetition/format quality gates, per document:

    * ``dup_word_frac`` = 1 - distinct/words (boilerplate repetition)
    * ``mean_word_len`` = word chars / words (2-12 on natural language;
      gibberish and markup fall outside)
    * ``keep``          = all gates pass

    One dictionary pass + segment arithmetic; thresholds mirror the
    published Gopher/MassiveText heuristics at small scale."""
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(text, pattern=" ")
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    chars = np.add.reduceat(np.append(wlen, 0), offsets[:-1]) * (n_words > 0)

    d = flat.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(n_words)), n_words)
    order = np.lexsort((idx, row_of))
    rw, hh = row_of[order], idx[order]
    new = np.ones(len(rw), dtype=bool)
    if len(rw) > 1:
        new[1:] = (rw[1:] != rw[:-1]) | (hh[1:] != hh[:-1])
    distinct = np.bincount(rw[new], minlength=len(n_words)).astype(np.int64)

    safe_n = np.maximum(n_words, 1)
    dup_frac = _round6_half_away(1.0 - distinct / safe_n)
    mean_len = _round6_half_away(chars / safe_n)
    keep = (
        (n_words >= min_words)
        & (dup_frac <= max_dup_frac)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
    )
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "n_words": pa.array(n_words),
            "dup_word_frac": pa.array(dup_frac),
            "mean_word_len": pa.array(mean_len),
            "keep": pa.array(keep),
        }
    )


def repetition_filter(ds, **kw):
    return ds.map_batches(
        lambda t: repetition_filter_batch(t, **kw), batch_format="pyarrow"
    )


# SQL twin of repetition_filter_batch (default thresholds)
REPETITION_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
       round(1.0 - len(list_distinct(str_split(text, ' ')))
             / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) AS dup_word_frac,
       round(list_aggregate(list_transform(str_split(text, ' '), w -> length(w)), 'sum')
             / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) AS mean_word_len,
       (len(str_split(text, ' ')) >= 5
        AND round(1.0 - len(list_distinct(str_split(text, ' ')))
              / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) <= 0.3
        AND round(list_aggregate(list_transform(str_split(text, ' '), w -> length(w)), 'sum')
              / GREATEST(len(str_split(text, ' ')), 1)::DOUBLE, 6) BETWEEN 2.0 AND 12.0
       ) AS keep
FROM documents
"""


# ------------------------------------------------------- token counting

# BPE-ish subword segmentation: letter runs, single digits, single
# punctuation marks — the GPT-2-style pre-tokenizer shape, shared
# verbatim with the SQL oracle (both RE2)
SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_ws_tokens, n_subword_tokens, n_chars, est_tokens_char4)
    — the three standard corpus token-budget estimators side by side:
    whitespace words, BPE-ish subword pieces, and the chars/4 heuristic.
    All Arrow kernels; one RE2 scan for the subword count."""
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_ws = pc.list_value_length(pc.split_pattern(text, pattern=" "))
    n_sub = pc.count_substring_regex(text, pattern=SUBWORD_PATTERN)
    n_chars = pc.utf8_length(text)
    # floor division: round() ties differ between Arrow (half-to-even)
    # and DuckDB (half-away-from-zero); // is tie-free on both sides
    est = pc.divide(pc.cast(n_chars, pa.int64()), 4)
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "n_ws_tokens": pc.cast(n_ws, pa.int64()),
            "n_subword_tokens": pc.cast(n_sub, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "est_tokens_char4": pc.cast(est, pa.int64()),
        }
    )


def token_counts(ds):
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


TOKEN_COUNT_SQL = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{SUBWORD_PATTERN}')) AS BIGINT)
           AS n_subword_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) // 4 AS BIGINT) AS est_tokens_char4
FROM documents
"""
