"""End-to-end corpus preparation: the canonical LLM-training-data
pipeline, composed from the engine's oracle-gated stages.

    raw documents
      -> language gate   (trigram profile argmax == 'en')
      -> quality gate    (Gopher-style repetition/format keep)
      -> PII redaction   (emails / IPv4s / digit runs -> placeholders)
      -> exact dedup     (keep-first per clean-text content hash)
      -> token budget    (whitespace + chars/4 estimators)

Scale shape: every row-local step fuses into ONE ``map_batches`` pass
(the gates and the redaction are all vectorized kernels over the same
batch), then exactly one aggregate exchange (content-hash winners) and
one bucket-join exchange (semi-restrict survivors) — two shuffles of
(int64, int64-ish) rows total, never a full-text exchange.  Every
component is individually hash-gated against DuckDB (``lang_id``,
``quality_filter``, ``pii_redact``, ``exact_dedup``, ``token_counts``),
and the COMPOSITION is gated too (``corpus_prep`` oracle) — operator
chaining is where silent semantic drift usually hides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.stages.agg import hash_agg
from dataflowkit_ray.stages.join import bucket_equi_join
from dataflowkit_ray.stages.textstats import (
    LANG_ID_SQL,
    PII_PATTERNS,
    REPETITION_SQL,
    lang_id_batch,
    pii_sql_exprs,
    repetition_filter_batch,
)
from dataflowkit_ray.tokenize import full_hash128


def _prep_batch(t: pa.Table) -> pa.Table:
    """Fused row-local stage: gates + redaction + counts + content hash."""
    lang = lang_id_batch(t)["lang_pred"]
    keep_q = repetition_filter_batch(t)["keep"]
    mask = pc.and_(pc.equal(lang, "en"), keep_q)
    kept = t.filter(mask)
    clean = kept["text"]
    if isinstance(clean, pa.ChunkedArray):
        clean = clean.combine_chunks()
    for pat, repl in PII_PATTERNS:
        clean = pc.replace_substring_regex(clean, pattern=pat, replacement=repl)
    n_ws = pc.cast(pc.list_value_length(pc.split_pattern(clean, pattern=" ")), pa.int64())
    n_chars = pc.cast(pc.utf8_length(clean), pa.int64())
    # 128-bit content key (two lanes, grouped on both — see
    # stages/dedup.py module docstring): a 64-bit key false-merges ~2-3
    # distinct docs at 10^10 scale, silently dropping them here
    h1, h2 = full_hash128(clean)
    return pa.table(
        {
            "doc_id": pc.cast(kept["doc_id"], pa.int64()),
            "clean_text": clean,
            "n_ws_tokens": n_ws,
            "est_tokens_char4": pc.divide(n_chars, 4),
            "text_h": pa.array(h1.astype(np.int64)),
            "text_h2": pa.array(h2.astype(np.int64)),
        }
    )


def corpus_prep(ds, n_buckets: int = 32):
    """documents Dataset -> surviving (doc_id, clean_text, n_ws_tokens,
    est_tokens_char4, n_copies) rows — see module docstring."""
    prepped = ds.map_batches(_prep_batch, batch_format="pyarrow")

    def hash_rows(t: pa.Table) -> pa.Table:
        return t.select(["text_h", "text_h2", "doc_id"])

    winners = hash_agg(
        prepped.map_batches(hash_rows, batch_format="pyarrow"),
        ("text_h", "text_h2"),
        [("doc_id", "min", "doc_id"), ("doc_id", "count", "n_copies")],
        n_buckets=n_buckets,
    ).select_columns(["doc_id", "n_copies"])

    rows = prepped.map_batches(
        lambda t: t.drop_columns(["text_h", "text_h2"]), batch_format="pyarrow"
    )
    # inner join on doc_id == semi-restrict to winners (a winner id is
    # unique: one doc has one text) + attach its copy count
    return bucket_equi_join(rows, winners, on="doc_id", n_buckets=n_buckets)


_PII_CLEAN, _ = pii_sql_exprs("text")

CORPUS_PREP_SQL = f"""
WITH lang AS ({LANG_ID_SQL}),
qual AS ({REPETITION_SQL}),
kept AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text
  FROM documents d
  JOIN lang ON lang.doc_id = CAST(d.doc_id AS VARCHAR)
  JOIN qual ON qual.doc_id = CAST(d.doc_id AS VARCHAR)
  WHERE lang.lang_pred = 'en' AND qual.keep
),
clean AS (
  SELECT doc_id, {_PII_CLEAN} AS clean_text FROM kept
),
winners AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
  FROM clean GROUP BY clean_text
)
SELECT c.doc_id,
       c.clean_text,
       CAST(len(str_split(c.clean_text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(length(c.clean_text) // 4 AS BIGINT) AS est_tokens_char4,
       w.n_copies
FROM clean c JOIN winners w ON w.doc_id = c.doc_id
"""
