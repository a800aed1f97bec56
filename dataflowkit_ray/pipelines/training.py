"""Training-data pipeline queries: dedup family, similarity search, text
analysis, multimodal plumbing — each with a DuckDB oracle (hash kernels
replayed in SQL via ``pipelines.sqlgen`` where needed); only the
multimodal decode query relies on the pure-python ``reference_impl``
oracle instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from dataflowkit_ray.stages.ann import (
    brute_topk,
    cosine_dup_pairs,
    ivf_centroids,
    ivf_topk,
    lsh_dup_pairs,
)
from dataflowkit_ray.stages.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from dataflowkit_ray.stages.multimodal import media_pipeline
from dataflowkit_ray.stages.textstats import TEXT_STATS_SQL, doc_fingerprints, text_stats


def _blocks_for(path: str | list[str], rows_per_block: int = 20_000) -> int:
    """Volume-derived block count (from parquet metadata, free).

    Ray's CPU-derived default gave 64 blocks for a 5k-row table; every
    downstream sort/groupby then coordinates 64+64 tiny tasks at ~10 ms
    of driver time each, and the dedup pipelines (3 chained shuffles)
    paid ~4 s of pure coordination.  Blocks sized by DATA keep small
    inputs cheap and still fan out at volume."""
    from dataflowkit_ray.tokenize import table_rows

    n = table_rows(path)
    return max(4, min(512, n // rows_per_block + 1))


def _docs(sf_dir: str):
    import ray.data

    from dataflowkit_ray.tokenize import documents_files

    files = documents_files(sf_dir)
    return ray.data.read_parquet(
        files, columns=["doc_id", "text"], override_num_blocks=_blocks_for(files)
    )


def _emb(sf_dir: str):
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    return ray.data.read_parquet(path, override_num_blocks=_blocks_for(path))


def q_exact_dedup(sf_dir: str):
    return exact_dedup(_docs(sf_dir))


def q_minhash_dup_pairs(sf_dir: str):
    """MinHash(64) + 32-band LSH candidates, exact-Jaccard verified >= 0.8.

    Banding is probabilistic recall (miss prob ~(1-J^2)^32 < 1e-14 at the
    0.8 threshold) — the oracle's exact all-pairs join agrees on any
    non-adversarial corpus; precision is exact by verification."""
    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.8, k=64, bands=32)


def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT n-gram-Jaccard pairs at t=0.5 via inverted-index
    co-occurrence counting — recall 1.0 where minhash banding is
    probabilistic (P[candidate | J=0.5] ~ 0.64); the oracle is the same
    exact all-pairs join at the lower threshold."""
    return ngram_jaccard_pairs(_docs(sf_dir), threshold=0.5)


def q_dedup_clusters(sf_dir: str):
    """Pairs -> connected components -> canonical survivors: hash-min
    label propagation over the minhash near-dup graph (cluster id = min
    doc_id in the component; keep = doc_id == cluster_id).  The oracle
    replays it as a recursive-CTE transitive closure over the same
    exact-Jaccard pair set."""
    from dataflowkit_ray.stages.dedup import dedup_clusters

    pairs = minhash_lsh_pairs(_docs(sf_dir), threshold=0.8, k=64, bands=32)
    return dedup_clusters(pairs, _docs(sf_dir))


def q_simhash_pairs(sf_dir: str):
    return simhash_pairs(_docs(sf_dir), max_hamming=3)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-5 for the first 10 vectors (broadcast query
    matrix, per-batch float64 matmul, partial top-k -> bucket merge).
    Only the 10 query rows are read driver-side (row-filtered read)."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", filters=[("vec_id", "<", 10)]
    )
    qv = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qi = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    return brute_topk(_emb(sf_dir), qv, qi, k=5)


def q_ivf_topk(sf_dir: str):
    """IVF-partitioned ANN top-k: deterministic k-means coarse quantizer
    (hash-sampled build set, fixed Lloyd iterations) + probe-limited scan.
    Run at n_probe = n_centroids, where IVF is EXACT (so the DuckDB
    cross-join oracle applies); the n_probe < n_centroids regime (compute
    ~ n_probe/n_centroids) is recall-tested in pytest."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", filters=[("vec_id", "<", 10)]
    )
    qv = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qi = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    cent = ivf_centroids(_emb(sf_dir), n_centroids=16, n_rows=n_rows)
    return ivf_topk(_emb(sf_dir), qv, qi, cent, k=5, n_probe=len(cent))


def q_embedding_dup_pairs(sf_dir: str):
    """Near-dup embedding pairs (cosine >= 0.42 — chosen to be non-empty
    on the synthetic embeddings, whose max off-diagonal cosine is ~0.51).

    Distributed block-pair all-pairs join: exact (recall 1, so the SQL
    cross-join oracle agrees), no driver materialization, no corpus
    broadcast.  At a production threshold (>= ~0.9) ``lsh_dup_pairs``
    prunes the O(N^2) compare instead."""
    return cosine_dup_pairs(_emb(sf_dir), threshold=0.42, n_blocks=8)


def plant_near_dups(t):
    """Deterministic near-duplicate per vector: first component nudged by
    1% of the norm (cosine ~0.99995), id shifted by 10M.  The synthesis
    that makes a high-threshold dedup query non-trivial on the synthetic
    embeddings (whose max natural off-diagonal cosine is ~0.51)."""
    import pyarrow as pa

    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    dup = vecs.copy()
    dup[:, 0] += 0.01 * np.linalg.norm(vecs, axis=1)
    out_ids = np.concatenate([ids, ids + 10_000_000])
    out_vecs = np.concatenate([vecs, dup], axis=0)
    return pa.table(
        {
            "vec_id": pa.array(out_ids),
            "embedding": pa.array(list(out_vecs)),
        }
    )


def q_lsh_dup_pairs(sf_dir: str):
    """Scale-path ANN dedup at a PRODUCTION threshold (0.95): hyperplane
    LSH only bounds the candidate set when the threshold is high (at 0.42
    a 5000-vector corpus yields ~10^6 random collisions).  The corpus is
    the embeddings table plus one planted near-dup per vector; expected
    output = exactly the planted pairs.  Miss probability per pair
    ~(1 - 0.998^12)^6 ~ 1e-10 — recall is effectively 1, which the
    pure-python oracle (identical plane replay) checks exactly."""
    ds = _emb(sf_dir).map_batches(plant_near_dups, batch_format="pyarrow")
    return lsh_dup_pairs(ds, threshold=0.95, n_planes=12, n_tables=6)


def q_text_stats(sf_dir: str):
    return text_stats(_docs(sf_dir))


def q_doc_fingerprint(sf_dir: str):
    return doc_fingerprints(_docs(sf_dir))


def _plant_pii(t):
    """Deterministically append synthetic PII to every third document —
    the same expression the SQL oracle applies, so redaction is exercised
    on real matches (the synthetic corpus contains none)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    cond = pa.array(ids % 3 == 0)
    octet = pa.array((ids % 256).astype(str))
    planted = pc.binary_join_element_wise(
        t["text"],
        " contact u",
        pc.cast(t["doc_id"], pa.string()),
        "@example.com at 10.0.",
        octet,
        ".7",
        "",
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": pc.if_else(cond, planted, t["text"]),
        }
    )


def q_pii_redact(sf_dir: str):
    """PII scrub (emails / IPv4s / long digit runs -> typed placeholders)
    over the document stream, with deterministic planted PII on every
    third doc.  Vectorized RE2 via Arrow kernels; DuckDB replays the
    identical patterns (both engines compile RE2), so the oracle matches
    byte-for-byte."""
    from dataflowkit_ray.stages.textstats import redact_pii

    return redact_pii(_docs(sf_dir).map_batches(_plant_pii, batch_format="pyarrow"))


def q_token_counts(sf_dir: str):
    """Corpus token-budget estimators per doc: whitespace words, BPE-ish
    subword pieces (GPT-2-style pre-tokenizer regex, RE2 shared with the
    oracle), chars/4 heuristic."""
    from dataflowkit_ray.stages.textstats import token_counts

    return token_counts(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    """Character-trigram language ID (Cavnar-Trenkle profiles, integer
    rank weights): vectorized overlapping byte-scan per profile trigram,
    argmax across broadcast per-language weight columns; the DuckDB
    oracle replays the identical profile via an inline VALUES join."""
    from dataflowkit_ray.stages.textstats import lang_id

    return lang_id(_docs(sf_dir))


def q_heavy_hitters(sf_dir: str):
    """Top-20 corpus words by Count-Min estimate: mergeable bounded
    sketch (256 KiB) broadcast once, block-local top-k, one tiny merge.
    The DuckDB oracle replays the SAME md5 bucketing, so even the
    approximation (collision-inflated estimates) hash-matches."""
    from dataflowkit_ray.stages.sketch import cms_heavy_hitters

    return cms_heavy_hitters(_docs(sf_dir), _docs(sf_dir), k=20)


def q_corpus_prep(sf_dir: str):
    """END-TO-END corpus prep composition (lang gate -> quality gate ->
    PII redact -> exact dedup -> token budget): all row-local stages
    fused into one map_batches pass, then one aggregate + one join
    exchange.  The composition itself is hash-gated — chaining is where
    silent semantic drift hides."""
    from dataflowkit_ray.pipelines.corpus import corpus_prep

    return corpus_prep(_docs(sf_dir))


def q_resumable_tokens(sf_dir: str):
    """Token counting pushed through the RESUMABLE shard sink: one task
    per input row-group writes an atomic part + done-marker, the result
    is read back from committed parts only.  Oracle = the plain
    token-count SQL — proving the sink round-trip is lossless.  (The
    resume/skip semantics themselves are pytest-gated in
    tests/test_resumable.py.)"""
    import tempfile

    from dataflowkit_ray.sinks.resumable import read_committed, resumable_shard_map
    from dataflowkit_ray.stages.textstats import token_count_batch

    out = tempfile.mkdtemp(prefix="resumable_tokens_", dir="/tmp")
    from dataflowkit_ray.tokenize import documents_files

    resumable_shard_map(
        documents_files(sf_dir),
        out,
        token_count_batch,
        columns=["doc_id", "text"],
    )
    return read_committed(out)


def q_quality_filter(sf_dir: str):
    """Gopher-style repetition/format gates per document (dup-word
    fraction, mean word length, keep flag)."""
    from dataflowkit_ray.stages.textstats import repetition_filter

    return repetition_filter(_docs(sf_dir))


def q_multimodal_meta(sf_dir: str):
    """Binary-payload plumbing: synth media -> actor-pool decode (stub
    kernel) -> frame sampling; schema/actor wiring is the tested part."""
    return media_pipeline(_docs(sf_dir))


def q_decontaminate(sf_dir: str):
    """Train/test overlap check: docs with CAST(doc_id) % 29 == 0 play
    the benchmark/eval set; every OTHER doc is scored by how many of its
    distinct trigram shingles appear anywhere in the benchmark.  The
    benchmark shingle set broadcasts once; the training side is one
    row-local map_batches — zero exchange."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dataflowkit_ray.stages.dedup import decontaminate

    def split(bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
            m = (ids % 29 == 0) if bench else (ids % 29 != 0)
            return t.filter(pa.array(m))

        return fn

    bench = _docs(sf_dir).map_batches(split(True), batch_format="pyarrow")
    train = _docs(sf_dir).map_batches(split(False), batch_format="pyarrow")
    return decontaminate(train, bench)


TRAINING_QUERIES = {
    "decontaminate": q_decontaminate,
    "exact_dedup": q_exact_dedup,
    "minhash_dup_pairs": q_minhash_dup_pairs,
    "dedup_clusters": q_dedup_clusters,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_pairs": q_simhash_pairs,
    "ann_topk": q_ann_topk,
    "ivf_topk": q_ivf_topk,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "lsh_dup_pairs": q_lsh_dup_pairs,
    "text_stats": q_text_stats,
    "pii_redact": q_pii_redact,
    "quality_filter": q_quality_filter,
    "token_counts": q_token_counts,
    "lang_id": q_lang_id,
    "heavy_hitters": q_heavy_hitters,
    "resumable_tokens": q_resumable_tokens,
    "corpus_prep": q_corpus_prep,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_meta": q_multimodal_meta,
}

# mirrors shingle_hash_flat exactly, including the <w-words fallback:
# a doc with fewer than 3 words contributes its DISTINCT WORDS as the
# shingle set (the engine emits one length-1 hash chain per word there;
# word-vs-trigram strings can never collide across the two regimes, so
# set cardinalities — hence Jaccard — agree on every doc pair)
_SHINGLES_CTE = """
sh AS (
  SELECT doc_id,
         CASE WHEN len(str_split(text,' ')) < 3
              THEN list_distinct(str_split(text,' '))
              ELSE list_distinct(
                list_transform(
                  generate_series(1, len(str_split(text,' ')) - 2),
                  i -> str_split(text,' ')[i] || ' ' || str_split(text,' ')[i+1]
                       || ' ' || str_split(text,' ')[i+2]
                )
              ) END AS grams
  FROM documents
)
"""

TRAINING_ORACLES = {
    # gram STRINGS intersected where the engine intersects gram HASHES —
    # equivalent exactly when the 64-bit shingle hash is collision-free
    # on the corpus (the premise of every Jaccard oracle below)
    "decontaminate": f"""
        WITH {_SHINGLES_CTE},
        b AS (
          SELECT DISTINCT unnest(grams) AS g
          FROM sh WHERE CAST(doc_id AS BIGINT) % 29 = 0
        ),
        tr AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(grams) AS g
          FROM sh WHERE CAST(doc_id AS BIGINT) % 29 <> 0
        ),
        h AS (
          SELECT tr.doc_id, COUNT(*) AS n_hits
          FROM tr JOIN b USING (g) GROUP BY tr.doc_id
        )
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               COALESCE(h.n_hits, 0) AS n_contaminated_shingles,
               COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM documents d
        LEFT JOIN h ON h.doc_id = CAST(d.doc_id AS BIGINT)
        WHERE CAST(d.doc_id AS BIGINT) % 29 <> 0
    """,
    "exact_dedup": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "minhash_dup_pairs": f"""
        WITH {_SHINGLES_CTE}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.grams, b.grams))::DOUBLE
                     / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    """,
    "ngram_jaccard_pairs": None,  # assigned below (df-capped CTE)
    "ann_topk": """
        WITH q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 10
        ),
        sims AS (
          SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS sim
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id != q.qid
        ),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
    "embedding_dup_pairs": """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.42
    """,
    "text_stats": TEXT_STATS_SQL,
}

def _shingles_df_cte(df_cap: int) -> str:
    """The df-capped shingle universe — the oracle twin of
    ``stages.dedup.hot_shingles`` + the row-local drop in
    ``ngram_jaccard_pairs``: grams with document frequency > df_cap are
    excluded from every set BEFORE intersections/unions.  Shares
    ``_SHINGLES_CTE``'s gram definition verbatim, so the two universes
    can only differ if a 64-bit shingle-hash collision merges two grams'
    df counts across the cap (the same collision assumption every other
    shingle oracle already makes)."""
    return f"""{_SHINGLES_CTE.rstrip()},
u AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
hot AS (SELECT gram FROM u GROUP BY gram HAVING COUNT(*) > {df_cap}),
shf AS (
  SELECT u.doc_id, list(u.gram) AS grams
  FROM u LEFT JOIN hot ON u.gram = hot.gram
  WHERE hot.gram IS NULL
  GROUP BY u.doc_id
)
"""


def ngram_jaccard_oracle_sql(threshold: float = 0.5, df_cap: int = 512) -> str:
    return f"""
        WITH {_shingles_df_cte(df_cap)}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.grams, b.grams))::DOUBLE
                     / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        FROM shf a JOIN shf b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))), 6) >= {threshold}
    """


TRAINING_ORACLES["ngram_jaccard_pairs"] = ngram_jaccard_oracle_sql()

TRAINING_ORACLES["ivf_topk"] = TRAINING_ORACLES["ann_topk"]

from dataflowkit_ray.stages.textstats import REPETITION_SQL, pii_sql_exprs

_pii_clean, _pii_count = pii_sql_exprs("planted")
TRAINING_ORACLES["pii_redact"] = f"""
    WITH p AS (
      SELECT doc_id,
             CASE WHEN CAST(doc_id AS BIGINT) % 3 = 0
                  THEN text || ' contact u' || doc_id || '@example.com at 10.0.'
                       || CAST(CAST(doc_id AS BIGINT) % 256 AS VARCHAR) || '.7'
                  ELSE text END AS planted
      FROM documents
    )
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           {_pii_clean} AS clean_text,
           {_pii_count} AS n_pii
    FROM p
"""
TRAINING_ORACLES["quality_filter"] = REPETITION_SQL

from dataflowkit_ray.stages.textstats import TOKEN_COUNT_SQL

TRAINING_ORACLES["token_counts"] = TOKEN_COUNT_SQL
from dataflowkit_ray.stages.textstats import LANG_ID_SQL  # noqa: E402

TRAINING_ORACLES["lang_id"] = LANG_ID_SQL

# dedup_clusters: recursive-CTE transitive closure over the SAME exact
# pair predicate as minhash_dup_pairs; cluster = min reachable doc_id
TRAINING_ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLES_CTE.strip()},
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
),
e AS (SELECT da AS u, db AS v FROM p UNION ALL SELECT db AS u, da AS v FROM p),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
)
SELECT d.doc_id,
       CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT) AS cluster_id,
       (d.doc_id = LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id))) AS keep
FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
GROUP BY d.doc_id
"""

from dataflowkit_ray.stages.sketch import heavy_hitters_sql  # noqa: E402

TRAINING_ORACLES["heavy_hitters"] = heavy_hitters_sql(20)
# same SQL: the resumable sink must be a lossless round-trip of the
# identical transform
TRAINING_ORACLES["resumable_tokens"] = TOKEN_COUNT_SQL

from dataflowkit_ray.pipelines.corpus import CORPUS_PREP_SQL  # noqa: E402

TRAINING_ORACLES["corpus_prep"] = CORPUS_PREP_SQL

# multimodal_meta: the synthesize -> REAL container decode -> every-30th
# frame sample chain is a pure function of (doc_id, utf-8 byte length),
# so SQL replays the expected metadata independently of the decoders:
# image n_frames = 1; audio = decoded WAV sample count = 64 + L % 256;
# video = walked Y4M FRAME count = 8 + L % 64.  A decoder bug (wrong
# plane geometry, off-by-one frame walk) breaks the hash match.
TRAINING_ORACLES["multimodal_meta"] = """
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             CASE CAST(doc_id AS BIGINT) % 3
               WHEN 0 THEN 1
               WHEN 1 THEN 64 + octet_length(encode(text)) % 256
               ELSE 8 + octet_length(encode(text)) % 64
             END AS n_frames
      FROM documents
    )
    SELECT media_id,
           CAST((u.k - 1) * 30 AS BIGINT) AS frame_idx
    FROM m,
         unnest(generate_series(
           1, GREATEST(1, CAST(ceil(n_frames / 30.0) AS BIGINT)))) AS u(k)
"""

from dataflowkit_ray.pipelines import sqlgen as _sg
from dataflowkit_ray.tokenize import TOKEN_SQL_EXPR as _TOKEN_SQL_EXPR

# doc_fingerprint: FNV-1a-64 over the token array's int32 LE bytes,
# replayed in DuckDB via list_reduce (sqlgen.token_list_fnv_expr —
# byte-for-byte vs the engine kernel, tests/test_sql_parity.py).
TRAINING_ORACLES["doc_fingerprint"] = f"""
    WITH tok AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_TOKEN_SQL_EXPR} AS tokens
      FROM documents
    )
    SELECT doc_id,
           {_sg.u64_to_i64(_sg.token_list_fnv_expr('tokens'))} AS fingerprint
    FROM tok
"""

# simhash_pairs: full fingerprint replay (md5-lower-64 word hashes ->
# FNV shingle chains -> bit votes) + all-pairs Hamming filter; exact
# because the engine's 4-block pigeonhole blocking has recall 1.0 at
# Hamming <= 3 and verifies true distances.
TRAINING_ORACLES["simhash_pairs"] = _sg.simhash_pairs_sql(max_hamming=3)

# lsh_dup_pairs: at threshold 0.95 over the planted-dup corpus the
# exact all-pairs join IS the specification (natural max off-diagonal
# cosine ~0.51; per-pair LSH miss probability ~1e-10) — DuckDB replants
# the dups and cross-joins.  The plane-replay candidate-set oracle stays
# in reference_impl.oracle for exact-recall cross-checks.
TRAINING_ORACLES["lsh_dup_pairs"] = """
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    planted AS (
      SELECT vec_id + 10000000 AS vec_id,
             list_prepend(v[1] + 0.01 * sqrt(list_sum(list_transform(v, x -> x * x))),
                          v[2:]) AS v
      FROM base
    ),
    allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM allv a JOIN allv b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95
"""

