"""Driver-facing query registry: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle where SQL can express it.

Every callable takes ``sf_dir`` and returns a ``ray.data.Dataset``.
Column names match the oracle SQL exactly (the driver's compare sorts
columns by name before value-hashing).  None of these call ``ray.init``—
the driver owns the session.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.config import DEFAULT_CONFIG
from dataflowkit_ray.stages.cep import Pattern, Step, match_counts
from dataflowkit_ray.stages.join import explode_chunks, join_details
from dataflowkit_ray.stages.scalars import filters_stage
from dataflowkit_ray.stages.windows import (
    assign_sessions,
    assign_sliding,
    assign_tumbling,
    salted_distinct_docs,
    topk_sources,
    windowed_sum,
)
from dataflowkit_ray.tokenize import TOKEN_SQL_EXPR, load_token_stream, token_id

CFG = DEFAULT_CONFIG

# shared SQL fragment: the token-stream view over documents
TOKEN_CTE = f"""
tok AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         {TOKEN_SQL_EXPR} AS tokens,
         CAST(len(str_split(text, ' ')) AS INTEGER) AS n_tok,
         source,
         CAST(doc_id AS BIGINT) AS event_seq
  FROM documents
)
"""


# --------------------------------------------------------------- queries


def q_token_table(sf_dir: str):
    """The mandated input shape itself — per-row token-array equality."""
    return load_token_stream(sf_dir)


def q_tumbling_agg(sf_dir: str):
    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_tumbling(b, CFG.tumbling_size), batch_format="pyarrow"
    )
    return windowed_sum(ds)


def q_sliding_agg(sf_dir: str):
    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_sliding(b, CFG.sliding_size, CFG.sliding_slide),
        batch_format="pyarrow",
    )
    return windowed_sum(ds)


def q_distinct_docs(sf_dir: str):
    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_tumbling(b, CFG.tumbling_size), batch_format="pyarrow"
    )
    return salted_distinct_docs(ds, n_salts=CFG.n_salts)


def q_topk_sources(sf_dir: str):
    ds = load_token_stream(sf_dir).map_batches(
        lambda b: assign_tumbling(b, CFG.tumbling_size), batch_format="pyarrow"
    )
    return topk_sources(windowed_sum(ds), k=5)


def _read_events(sf_dir: str, columns: list[str]):
    """events.parquet read with a volume-derived block count (metadata,
    free) — Ray's CPU-derived default makes 64 blocks of a 100k-row
    table, and each downstream sort then coordinates 64+ near-empty
    partitions (and emits zero-column empty blocks that strip RefBundle
    schemas)."""
    import ray.data

    from dataflowkit_ray.tokenize import blocks_for

    path = f"{sf_dir}/events.parquet"
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=blocks_for(path)
    )


def q_session_events(sf_dir: str):
    """Session windows with 30-min gap over real event timestamps, keyed by
    user — the pagination-chain-as-session analog (SURVEY.md §2.8)."""
    import ray.data

    from dataflowkit_ray.stages.agg import hash_agg

    ev = _read_events(sf_dir, ["user_id", "ts"])

    def to_clock(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "t": pc.cast(t["ts"], pa.int64()),  # epoch micros
            }
        )

    ev = ev.map_batches(to_clock, batch_format="pyarrow")
    gap_us = 30 * 60 * 1_000_000
    sess = assign_sessions(ev, gap=gap_us, key_col="user_id", clock_col="t")
    return hash_agg(sess, ("user_id", "session_id"), [("t", "count", "n_events")])


def q_join_details(sf_dir: str):
    ds = load_token_stream(sf_dir)
    child = ds.map_batches(explode_chunks(16, with_tokens=False), batch_format="pyarrow")
    return join_details(ds, child, num_partitions=CFG.join_num_partitions)


def q_join_details_nested(sf_dir: str):
    """The reference's embed rule verbatim: child rows folded into a
    ``details: list<struct>`` column ordered by chunk_idx (1 child ->
    one-element list; N -> list), ``encoders.go:207-241,233-239``.

    For the oracle compare the struct column is projected to a
    deterministic string digest ("idx:ntok;..." in chunk order) — the
    driver's sort-columns-then-hash compare can't order dict cells; the
    struct itself is asserted in tests/test_join.py."""
    ds = load_token_stream(sf_dir)
    child = ds.map_batches(explode_chunks(16, with_tokens=False), batch_format="pyarrow")
    nested = join_details(ds, child, with_struct=True)

    def digest(t: pa.Table) -> pa.Table:
        det = t["details"]
        if isinstance(det, pa.ChunkedArray):
            det = det.combine_chunks()
        # vectorized "idx:ntok;..." digest: format the flattened structs,
        # re-wrap with the list offsets, join per row
        flat = det.flatten()
        elem = pc.binary_join_element_wise(
            pc.cast(flat.field("chunk_idx"), pa.string()),
            pc.cast(flat.field("chunk_n_tok"), pa.string()),
            ":",
        )
        import numpy as np

        off = det.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = (off - off[0]).astype(np.int32)
        reprs = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off, pa.int32()), elem), ";"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": t["n_tok"],
                "source": t["source"],
                "event_seq": t["event_seq"],
                "n_details": t["n_details"],
                "details_repr": reprs,
            }
        )

    return nested.map_batches(digest, batch_format="pyarrow")


def q_semi_route(sf_dir: str):
    """IsPath-mode routing (J2): intermediate hops emit only the key
    stream for the next stage (``scrape/scrape.go:538-545``)."""
    from dataflowkit_ray.stages.join import semi_join_route

    return semi_join_route(load_token_stream(sf_dir), key_col="doc_id")


def q_cep_contiguous(sf_dir: str):
    """Count of contiguous 'batch batch' token bigrams per doc
    (overlapping scan) — the SQL-expressible CEP case."""
    b = token_id("batch")
    pat = Pattern(steps=(Step(literal=b), Step(literal=b)), mode="overlapping")
    return match_counts(load_token_stream(sf_dir), pat)


def q_streaming_windowed(sf_dir: str):
    """Full streaming path: micro-batch epochs -> window state actors ->
    watermark close -> exactly-once sink; returns the committed output.
    DuckDB oracle: tumbling aggregate + the CEP scanner replayed as a
    lazy-gap RE2 over hex-encoded token streams (``sqlgen.cep_regex``;
    regex-vs-scanner equivalence asserted in tests/test_sql_parity.py)."""
    import tempfile

    from dataflowkit_ray.runner import StreamingRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    from dataflowkit_ray.tokenize import documents_files

    docs = documents_files(sf_dir)
    wd = tempfile.mkdtemp(prefix="dfkr_stream_", dir="/tmp")
    StreamingRunner(
        docs,
        wd,
        chunks_per_epoch=2,
        target_rows=_epoch_rows(docs, n_epochs=16, floor=256),
    ).run()
    return ExactlyOnceSink(f"{wd}/out").read_committed()


def q_streaming_arrivals(sf_dir: str):
    """Runtime work discovery (the reference's paginate-finds-pages
    semantics, ``scrape/scrape.go:378-445``): the run starts with only the
    FIRST HALF of the corpus on disk; the second half lands mid-run (after
    epoch 0 commits) and ``MicroBatchSource.rescan()`` picks it up between
    epochs.  The committed stream output must equal the batch tumbling
    aggregate over the UNION — same oracle as ``streaming_windowed``.

    The driver-side split-write below is the ARRIVAL SIMULATOR (this box
    has no external producer), not part of the pipeline; the engine only
    ever sees the glob."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from dataflowkit_ray.runner import StreamingRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    wd = tempfile.mkdtemp(prefix="dfkr_arrive_", dir="/tmp")
    inbox = f"{wd}/inbox"
    os.makedirs(inbox)
    from dataflowkit_ray.tokenize import documents_files

    t = pa.concat_tables(
        [
            pq.read_table(f, columns=["doc_id", "text", "source"])
            for f in documents_files(sf_dir)
        ]
    )
    half = len(t) // 2
    first = f"{inbox}/part-000.parquet"
    pq.write_table(t.slice(0, half), first)
    late = t.slice(half)
    dropped = []

    def drop_late(epoch, info):
        if not dropped:
            pq.write_table(late, f"{inbox}/part-001.parquet")
            dropped.append(epoch)

    StreamingRunner(
        [first],
        wd,
        chunks_per_epoch=2,
        target_rows=_epoch_rows(documents_files(sf_dir), n_epochs=16, floor=256),
        discover=f"{inbox}/*.parquet",
    ).run(on_epoch=drop_late)
    assert dropped, "arrival file never landed mid-run"
    return ExactlyOnceSink(f"{wd}/out").read_committed()


def q_filtered_read(sf_dir: str):
    """Predicate + projection pushdown at the read (SURVEY.md 'Prune at
    the read'): only (doc_id, source, n_chars) columns and only rows with
    lang = 'en' AND n_chars > 200 leave storage."""
    import pyarrow.dataset as pds
    import ray.data

    from dataflowkit_ray.tokenize import documents_files

    ds = ray.data.read_parquet(
        documents_files(sf_dir),
        columns=["doc_id", "source", "n_chars"],
        filter=(pds.field("lang") == "en") & (pds.field("n_chars") > 200),
    )
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.string()),
                "source": t["source"],
                "n_chars": t["n_chars"],
            }
        ),
        batch_format="pyarrow",
    )


def q_drop_short(sf_dir: str):
    """Row-predicate drop (the includeIfEmpty analog, M13): keep docs
    with n_tok > 40 — vectorized Arrow filter inside map_batches."""
    ds = load_token_stream(sf_dir)

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_tok"], 40))
        return t.select(["doc_id", "n_tok", "source"])

    return ds.map_batches(keep, batch_format="pyarrow")


def _epoch_rows(path: str | list[str], n_epochs: int = 10, floor: int = 512) -> int:
    """Volume-derived micro-batch size: ~``n_epochs`` epochs regardless of
    scale factor.  The streaming-semantics invariant (state carried across
    epochs, watermark closes, exactly-once commits) is exercised by
    SEVERAL epochs, not hundreds — a fixed 512-row epoch gave ~190 epochs
    at sf0.1 and the query spent 9 s in per-epoch driver coordination."""
    from dataflowkit_ray.tokenize import table_rows

    n = table_rows(path)
    return max(floor, n // n_epochs)


def q_streaming_funnel(sf_dir: str):
    """Cross-batch CEP output: signup -> purchase (gap <= 3 events) per
    user, with NFA partial runs carried across epochs in state shards.
    DuckDB oracle: the NFA replayed as an index-carrying lazy-gap RE2
    over per-user clock-ordered event tokens (``sqlgen.cep_regex_indexed``
    — capture groups recover the start/end event indices, joined back to
    clocks; equivalence asserted in tests/test_sql_parity.py)."""
    import tempfile

    from dataflowkit_ray.event_runner import EventStreamRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    wd = tempfile.mkdtemp(prefix="dfkr_funnel_", dir="/tmp")
    EventStreamRunner(
        [f"{sf_dir}/events.parquet"],
        wd,
        target_rows=_epoch_rows(f"{sf_dir}/events.parquet"),
    ).run()
    return ExactlyOnceSink(f"{wd}/matches").read_committed()


def q_approx_distinct(sf_dir: str):
    """KMV distinct sketch per source (the approximate path for 10^12-key
    distinct counts; shuffle volume bounded at k hashes per group).  On
    this corpus every group has < k distinct docs, so the sketch is in
    its exact regime and hash-matches COUNT(DISTINCT)."""
    from dataflowkit_ray.stages.sketch import kmv_distinct

    return kmv_distinct(load_token_stream(sf_dir), keys=("source",), k=256)


def q_sample_docs(sf_dir: str):
    """Deterministic sampling — randomness is banned for replay-identity
    (SURVEY.md §7), so the sample predicate is a pure function of the key:
    keep docs whose id hashes into the first decile."""
    ds = load_token_stream(sf_dir)

    def keep(t: pa.Table) -> pa.Table:
        seq = t["event_seq"]
        if isinstance(seq, pa.ChunkedArray):
            seq = seq.combine_chunks()
        import numpy as np

        mask = pa.array(seq.to_numpy(zero_copy_only=False) % 10 == 0)
        return t.filter(mask).select(["doc_id", "n_tok", "source"])

    return ds.map_batches(keep, batch_format="pyarrow")


_MIXTURE_RATES = {"src0": 1000, "src1": 500, "src2": 250, "src3": 125}
_MIXTURE_DEFAULT_PM = 100


def q_mixture_sample(sf_dir: str):
    """Training-data mixture weighting: each source sampled at its own
    deterministic per-mille rate (src0 kept whole, src1 at 50%, ...,
    everything else at 10%) via a multiplicative 64-bit key hash —
    row-local, zero exchange, SQL-replayable (stages/policy.py)."""
    from dataflowkit_ray.stages.policy import mixture_sample

    return mixture_sample(
        load_token_stream(sf_dir),
        _MIXTURE_RATES,
        default_pm=_MIXTURE_DEFAULT_PM,
        # gate projection — the SQL twin selects the same three columns;
        # the operator itself defaults to keeping the full payload
        columns=["doc_id", "n_tok", "source"],
    )


def q_pack_manifest(sf_dir: str):
    """Concat-and-chunk packing manifest at seq_len=2048: per doc, its
    global token offset in the event_seq-ordered stream and the
    first/last fixed-length pack it occupies (stages/pack.py — one tiny
    driver-bounded bucket-offset aggregate + one int-only exchange)."""
    from dataflowkit_ray.stages.pack import pack_manifest

    return pack_manifest(load_token_stream(sf_dir), seq_len=2048, group_size=512)


def q_streaming_join(sf_dir: str):
    """Stream-stream join the STREAMING way: documents and embeddings as
    two lagged micro-batch sources, parents buffered in JoinStateShard
    actors until the child epoch arrives, exactly-once commits.  Oracle:
    the plain inner join."""
    import tempfile

    from dataflowkit_ray.join_runner import StreamJoinRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    from dataflowkit_ray.tokenize import documents_files

    docs = documents_files(sf_dir)
    wd = tempfile.mkdtemp(prefix="dfkr_join_", dir="/tmp")
    StreamJoinRunner(
        docs,
        [f"{sf_dir}/embeddings.parquet"],
        wd,
        right_lag=2,
        target_rows=_epoch_rows(docs, n_epochs=10, floor=128),
    ).run()
    return ExactlyOnceSink(f"{wd}/out").read_committed()


def q_streaming_sessions(sf_dir: str):
    """Sessions computed the STREAMING way — micro-batch epochs, session
    state carried across epochs in shard actors, watermark-timed closes,
    exactly-once commits — then read back from the manifests.  Oracle:
    the same single-pass SQL sessionization as ``session_events``."""
    import tempfile

    import pyarrow.compute as _pc

    from dataflowkit_ray.event_runner import EventStreamRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    wd = tempfile.mkdtemp(prefix="dfkr_sess_", dir="/tmp")
    EventStreamRunner(
        [f"{sf_dir}/events.parquet"],
        wd,
        target_rows=_epoch_rows(f"{sf_dir}/events.parquet"),
    ).run()
    ds = ExactlyOnceSink(f"{wd}/sessions").read_committed()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["key"],
                "session_id": t["session_id"],
                "n_events": t["n_events"],
            }
        )

    return ds.map_batches(rename, batch_format="pyarrow")


def q_filters_regex(sf_dir: str):
    """Scalar filter chain: regex-extract all s-words, ';'-join, uppercase."""
    import ray.data

    from dataflowkit_ray.tokenize import documents_files

    ds = ray.data.read_parquet(documents_files(sf_dir), columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.string()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        filters_stage("text", [("regex", r"\b(s[a-z]*)"), ("uppercase", None)], "extracted"),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "extracted"])


def q_asof_profile(sf_dir: str):
    """As-of join (J4 latest-value-wins, the cookie-store lookup analog,
    ``fetch/service.go:52-115``): each purchase event picks up the user's
    most recent signup at or before it.  One bucket shuffle, vectorized
    per-bucket resolution (stages/asof.py)."""
    import ray.data

    from dataflowkit_ray.stages.asof import asof_join

    def split_left(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {
                "user_id": pc.cast(s["user_id"], pa.int64()),
                "purchase_ts": pc.cast(s["ts"], pa.int64()),
                "value": s["value"],
            }
        )

    def split_right(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["event_type"], "signup"))
        return pa.table(
            {
                "user_id": pc.cast(s["user_id"], pa.int64()),
                "signup_ts": pc.cast(s["ts"], pa.int64()),
            }
        )

    cols = ["user_id", "ts", "event_type", "value"]
    left = _read_events(sf_dir, cols).map_batches(split_left, batch_format="pyarrow")
    right = _read_events(sf_dir, cols).map_batches(split_right, batch_format="pyarrow")
    return asof_join(
        left, right, key="user_id", left_on="purchase_ts", right_on="signup_ts"
    )


def q_source_policy(sf_dir: str):
    """Per-source policy broadcast (S3/ST1 robots-config analog): the
    distinct-source config table is built from a pruned metadata read,
    ``ray.put`` once, loaded per ACTOR in ``__init__``, and applied
    vectorized (stages/policy.py)."""
    import ray.data

    from dataflowkit_ray.stages.policy import source_policy_filter

    from dataflowkit_ray.tokenize import documents_files

    srcs = ray.data.read_parquet(
        documents_files(sf_dir), columns=["source"]
    ).unique("source")
    return source_policy_filter(
        load_token_stream(sf_dir), sources=srcs
    ).map_batches(
        lambda t: t.select(["doc_id", "n_tok", "source"]), batch_format="pyarrow"
    )


def q_quantiles(sf_dir: str):
    """Exact per-source n_tok quantiles (p50/p90): one bucket shuffle,
    per-bucket vectorized order statistics (stages/sketch.py)."""
    from dataflowkit_ray.stages.sketch import grouped_quantiles

    return grouped_quantiles(
        load_token_stream(sf_dir), ("source",), "n_tok", (0.5, 0.9)
    )


def q_quantiles_sketch(sf_dir: str):
    """Mergeable per-source n_tok quantiles via the bottom-k-by-hash
    sample sketch (stages/sketch.py ``quantile_sketch``): bounded sketch
    rows through the shuffle instead of every value, merge
    order-insensitive.  At gate scale every source group holds <= k
    rows, so the sketch is EXACT and the DuckDB ``quantile_disc`` oracle
    applies bit-for-bit; the sub-sampling regime's rank-error bound is
    tested in pytest (tests/test_sketch.py)."""
    import pyarrow.compute as _pc

    from dataflowkit_ray.stages.sketch import quantile_sketch

    out = quantile_sketch(
        load_token_stream(sf_dir),
        ("source",),
        "n_tok",
        (0.5, 0.9),
        # k covers the largest per-source group through sf1 (~2500
        # docs/source): the exact-regime precondition of the bit-exact
        # quantile_disc oracle holds at every shipped scale factor, not
        # just the gate's.  The sub-sampling regime is what the pytest
        # rank-error bound exercises.
        k=4096,
        id_col="doc_id",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "q50": _pc.cast(t["q50"], pa.int64()),
                "q90": _pc.cast(t["q90"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_quantiles_sketch_approx(sf_dir: str):
    """The quantile sketch's SUB-SAMPLING regime, driver-gated: k=8 with
    ~25 docs/source at sf0.01, so every group keeps 8 of ``seen`` rows
    (kept < seen).  The bottom-k-by-hash sample is deterministic
    (``full_hash64`` = FNV-1a over the int64 ``event_seq`` = the numeric
    doc id), so the DuckDB oracle replays the SELECTION itself — rank
    rows by the same hash, keep 8, quantile_disc over the kept set — and
    the compare stays bit-exact even though the sketch is
    approximating."""
    import pyarrow.compute as _pc

    from dataflowkit_ray.stages.sketch import quantile_sketch

    out = quantile_sketch(
        load_token_stream(sf_dir), ("source",), "n_tok", (0.5, 0.9),
        k=8, id_col="event_seq",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "q50": _pc.cast(t["q50"], pa.int64()),
                "q90": _pc.cast(t["q90"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_avg_tok(sf_dir: str):
    """Mean token count per source — the derived (sum, count) aggregate
    riding one bucket shuffle (stages/agg.py ``mean``)."""
    from dataflowkit_ray.stages.agg import hash_agg

    ds = load_token_stream(sf_dir).map_batches(
        lambda t: t.select(["source", "n_tok"]), batch_format="pyarrow"
    )
    return hash_agg(ds, ("source",), [("n_tok", "mean", "avg_n_tok")])


# ----------------------------------------------------------------- oracles


ORACLES: dict[str, str] = {
    "token_table": f"WITH {TOKEN_CTE} SELECT doc_id, tokens, n_tok, source, event_seq FROM tok",
    "tumbling_agg": f"""
        WITH {TOKEN_CTE}
        SELECT source, event_seq // {CFG.tumbling_size} AS window_id,
               CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok,
               COUNT(*) AS n_rows
        FROM tok GROUP BY 1, 2
    """,
    "sliding_agg": f"""
        WITH {TOKEN_CTE},
        w AS (
          SELECT source, n_tok,
                 unnest(generate_series(
                    GREATEST(0, CAST(ceil((event_seq - {CFG.sliding_size} + 1) / {CFG.sliding_slide}.0) AS BIGINT)),
                    event_seq // {CFG.sliding_slide})) AS window_id
          FROM tok
        )
        SELECT source, window_id, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok,
               COUNT(*) AS n_rows
        FROM w GROUP BY 1, 2
    """,
    "distinct_docs": f"""
        WITH {TOKEN_CTE}
        SELECT source, event_seq // {CFG.tumbling_size} AS window_id,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs
        FROM tok GROUP BY 1, 2
    """,
    "topk_sources": f"""
        WITH {TOKEN_CTE}
        SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_n_tok
        FROM tok GROUP BY source
        ORDER BY total_n_tok DESC, source ASC LIMIT 5
    """,
    "session_events": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        flagged AS (
          SELECT user_id, t,
                 CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                           > 1800000000
                      OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM e
        ),
        grouped AS (
          SELECT user_id, t,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                                        ROWS UNBOUNDED PRECEDING) AS grp
          FROM flagged
        )
        SELECT user_id, CAST(MIN(t) AS BIGINT) AS session_id, COUNT(*) AS n_events
        FROM grouped GROUP BY user_id, grp
    """,
    "join_details": f"""
        WITH {TOKEN_CTE},
        chunks AS (
          SELECT doc_id,
                 unnest(generate_series(0,
                    GREATEST(0, CAST(ceil(n_tok / 16.0) AS BIGINT) - 1))) AS chunk_idx,
                 n_tok
          FROM tok
        ),
        child AS (
          SELECT doc_id, chunk_idx,
                 LEAST(16, n_tok - chunk_idx * 16) AS chunk_n_tok
          FROM chunks
        ),
        emb AS (
          SELECT doc_id, COUNT(*) AS n_details,
                 CAST(SUM(chunk_n_tok) AS BIGINT) AS sum_detail_tok
          FROM child GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_tok, t.source, t.event_seq, e.n_details, e.sum_detail_tok
        FROM tok t JOIN emb e USING (doc_id)
    """,
    "join_details_nested": f"""
        WITH {TOKEN_CTE},
        chunks AS (
          SELECT doc_id,
                 unnest(generate_series(0,
                    GREATEST(0, CAST(ceil(n_tok / 16.0) AS BIGINT) - 1))) AS chunk_idx,
                 n_tok
          FROM tok
        ),
        child AS (
          SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
                 CAST(LEAST(16, n_tok - chunk_idx * 16) AS INTEGER) AS chunk_n_tok
          FROM chunks
        ),
        emb AS (
          SELECT doc_id, COUNT(*) AS n_details,
                 array_to_string(
                   list(chunk_idx || ':' || chunk_n_tok ORDER BY chunk_idx), ';'
                 ) AS details_repr
          FROM child GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_tok, t.source, t.event_seq, e.n_details, e.details_repr
        FROM tok t JOIN emb e USING (doc_id)
    """,
    "semi_route": f"WITH {TOKEN_CTE} SELECT doc_id FROM tok",
    "cep_contiguous": f"""
        WITH {TOKEN_CTE},
        pos AS (
          SELECT doc_id, source, event_seq,
                 unnest(tokens) AS t, generate_subscripts(tokens, 1) AS i
          FROM tok
        )
        SELECT a.doc_id, a.source, a.event_seq, COUNT(*) AS n_matches
        FROM pos a JOIN pos b
          ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE a.t = {token_id('batch')} AND b.t = {token_id('batch')}
        GROUP BY 1, 2, 3
    """,
    "filters_regex": r"""
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               COALESCE(upper(array_to_string(regexp_extract_all(text, '\b(s[a-z]*)', 1), ';')), '') AS extracted
        FROM documents
    """,
}


def q_streaming_dedup(sf_dir: str):
    """Exact dedup computed the STREAMING way — micro-batch document
    epochs, seen-hash state sharded by content hash and carried across
    epochs, checkpointed, final-flushed into exactly-once sink parts —
    then read back from the manifests.  Oracle: the SAME keep-first SQL
    as the batch ``exact_dedup`` (the stream's final state must equal
    the batch aggregate)."""
    import tempfile

    from dataflowkit_ray.dedup_runner import DedupStreamRunner
    from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

    from dataflowkit_ray.tokenize import documents_files

    docs = documents_files(sf_dir)
    wd = tempfile.mkdtemp(prefix="dfkr_dedup_", dir="/tmp")
    DedupStreamRunner(
        docs,
        wd,
        target_rows=_epoch_rows(docs),
    ).run()
    return ExactlyOnceSink(f"{wd}/dedup").read_committed()


def q_range_join_events(sf_dir: str):
    """Range (interval) join: every event joins each of 48 OVERLAPPING
    time windows containing its timestamp (2x-overlap tiling of the
    observed ts span, derived from parquet row-group statistics — a
    metadata-only pass).  Broadcast elementary-segment interval index,
    vectorized probe per batch, no shuffle; oracle = SQL BETWEEN join
    over the identically-derived window table."""
    from datetime import datetime, timedelta

    import pyarrow.parquet as pq

    from dataflowkit_ray.stages.join import range_join

    path = f"{sf_dir}/events.parquet"
    md = pq.read_metadata(path)
    ts_i = md.schema.names.index("ts")
    mins, maxs = [], []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ts_i).statistics
        mins.append(st.min)
        maxs.append(st.max)
    epoch = datetime(1970, 1, 1)
    us = timedelta(microseconds=1)
    tmin = (min(mins) - epoch) // us
    tmax = (max(maxs) - epoch) // us
    span = tmax - tmin + 1
    n_w = 48
    ivs = pa.table(
        {
            "window_id": pa.array(range(n_w), pa.int64()),
            "lo": pa.array([tmin + (i * span) // n_w for i in range(n_w)], pa.int64()),
            "hi": pa.array(
                [tmin + ((i + 2) * span) // n_w - 1 for i in range(n_w)], pa.int64()
            ),
        }
    )
    import ray.data

    from dataflowkit_ray.tokenize import blocks_for

    ds = ray.data.read_parquet(
        path, columns=["event_id", "ts"], override_num_blocks=blocks_for(path)
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return range_join(ds, ivs, "ts_us")


QUERIES = {
    "token_table": q_token_table,
    "tumbling_agg": q_tumbling_agg,
    "sliding_agg": q_sliding_agg,
    "distinct_docs": q_distinct_docs,
    "topk_sources": q_topk_sources,
    "session_events": q_session_events,
    "join_details": q_join_details,
    "join_details_nested": q_join_details_nested,
    "semi_route": q_semi_route,
    "cep_contiguous": q_cep_contiguous,
    "filters_regex": q_filters_regex,
    "streaming_windowed": q_streaming_windowed,
    "streaming_arrivals": q_streaming_arrivals,
    "streaming_sessions": q_streaming_sessions,
    "streaming_dedup": q_streaming_dedup,
    "range_join_events": q_range_join_events,
    "filtered_read": q_filtered_read,
    "drop_short": q_drop_short,
    "streaming_funnel": q_streaming_funnel,
    "streaming_join": q_streaming_join,
    "sample_docs": q_sample_docs,
    "mixture_sample": q_mixture_sample,
    "pack_manifest": q_pack_manifest,
    "approx_distinct": q_approx_distinct,
    "asof_profile": q_asof_profile,
    "source_policy": q_source_policy,
    "quantiles": q_quantiles,
    "quantiles_sketch": q_quantiles_sketch,
    "quantiles_sketch_approx": q_quantiles_sketch_approx,
    "avg_tok": q_avg_tok,
}

ORACLES["avg_tok"] = f"""
    WITH {TOKEN_CTE}
    SELECT source, avg(n_tok) AS avg_n_tok FROM tok GROUP BY source
"""

ORACLES["quantiles"] = f"""
    WITH {TOKEN_CTE}
    SELECT source,
           CAST(quantile_disc(n_tok, 0.50) AS BIGINT) AS q50,
           CAST(quantile_disc(n_tok, 0.90) AS BIGINT) AS q90
    FROM tok GROUP BY source
"""

ORACLES["quantiles_sketch"] = ORACLES["quantiles"]

# the sub-sampling regime: replay the deterministic bottom-k-by-hash
# selection (full_hash64 over int64 ids = sqlgen's FNV fold), then
# quantile_disc over the kept sample — bit-exact despite kept < seen.
from dataflowkit_ray.pipelines import sqlgen as _sg_q

ORACLES["quantiles_sketch_approx"] = f"""
    WITH {TOKEN_CTE},
    hashed AS (
      SELECT source, n_tok,
             {_sg_q.fnv1a64_int_expr('CAST(doc_id AS BIGINT)')} AS h
      FROM tok
    ),
    ranked AS (
      SELECT source, n_tok,
             row_number() OVER (PARTITION BY source ORDER BY h) AS r
      FROM hashed
    )
    SELECT source,
           CAST(quantile_disc(n_tok, 0.50) AS BIGINT) AS q50,
           CAST(quantile_disc(n_tok, 0.90) AS BIGINT) AS q90
    FROM ranked WHERE r <= 8 GROUP BY source
"""

ORACLES["asof_profile"] = """
    WITH l AS (SELECT user_id, epoch_us(ts) AS purchase_ts, value
               FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, epoch_us(ts) AS signup_ts
               FROM events WHERE event_type = 'signup')
    SELECT l.user_id, l.purchase_ts, l.value, r.signup_ts
    FROM l ASOF JOIN r
      ON l.user_id = r.user_id AND l.purchase_ts >= r.signup_ts
"""

ORACLES["source_policy"] = f"""
    WITH {TOKEN_CTE}
    SELECT doc_id, n_tok, source FROM tok
    WHERE n_tok >= 20 + (length(source) % 4) * 10
"""

ORACLES["approx_distinct"] = """
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS approx_distinct
    FROM documents GROUP BY source
"""

ORACLES["sample_docs"] = f"""
    WITH {TOKEN_CTE}
    SELECT doc_id, n_tok, source FROM tok WHERE event_seq % 10 = 0
"""

from dataflowkit_ray.stages.policy import mixture_sample_sql as _mix_sql

ORACLES["mixture_sample"] = _mix_sql(
    _MIXTURE_RATES, default_pm=_MIXTURE_DEFAULT_PM, token_cte=TOKEN_CTE
)

from dataflowkit_ray.stages.pack import pack_manifest_sql as _pack_sql

ORACLES["pack_manifest"] = _pack_sql(seq_len=2048, token_cte=TOKEN_CTE)

ORACLES["streaming_join"] = f"""
    WITH {TOKEN_CTE}
    SELECT t.doc_id, t.n_tok, t.source, CAST(e.label AS INTEGER) AS label
    FROM tok t JOIN embeddings e ON CAST(t.doc_id AS BIGINT) = e.vec_id
"""

ORACLES["streaming_sessions"] = ORACLES["session_events"]
# the stream-final dedup state must equal the batch aggregate — ONE
# oracle definition shared with exact_dedup so they can never drift
from dataflowkit_ray.pipelines.training import TRAINING_ORACLES as _TRAINING_ORACLES

ORACLES["streaming_dedup"] = _TRAINING_ORACLES["exact_dedup"]

ORACLES["range_join_events"] = """
WITH b AS (
  SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS tmin,
         CAST(epoch_us(MAX(ts)) AS BIGINT) AS tmax
  FROM events
),
w AS (
  SELECT CAST(t.i AS BIGINT) AS window_id,
         b.tmin + (CAST(t.i AS BIGINT) * (b.tmax - b.tmin + 1)) // 48 AS lo,
         b.tmin + ((CAST(t.i AS BIGINT) + 2) * (b.tmax - b.tmin + 1)) // 48 - 1 AS hi
  FROM b, (SELECT unnest(generate_series(0, 47)) AS i) t
)
SELECT e.event_id, CAST(epoch_us(e.ts) AS BIGINT) AS ts_us, w.window_id
FROM events e JOIN w ON CAST(epoch_us(e.ts) AS BIGINT) BETWEEN w.lo AND w.hi
"""
ORACLES["filtered_read"] = """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, n_chars
    FROM documents WHERE lang = 'en' AND n_chars > 200
"""
ORACLES["drop_short"] = f"""
    WITH {TOKEN_CTE} SELECT doc_id, n_tok, source FROM tok WHERE n_tok > 40
"""

from dataflowkit_ray.pipelines import sqlgen as _sg

# streaming_windowed: the committed stream output equals the batch
# tumbling aggregate; n_matches replays the gapped CEP scanner as a
# lazy-gap RE2 over hex-encoded token streams (sqlgen.cep_regex —
# equivalence vs the scanner asserted in tests/test_sql_parity.py).
_WIN_PAT = _sg.cep_regex(
    [_sg.hex4(token_id("spark")), _sg.hex4(token_id("join"))], [3]
)
ORACLES["streaming_windowed"] = f"""
    WITH {TOKEN_CTE},
    enc AS (
      SELECT source, event_seq // {CFG.tumbling_size} AS window_id, n_tok,
             {_sg.tokens_to_hexstr_expr('tokens')} AS s
      FROM tok
    )
    SELECT source, window_id,
           CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok,
           COUNT(*) AS n_rows,
           CAST(SUM(GREATEST(1, CAST(ceil(n_tok / 16.0) AS BIGINT))) AS BIGINT) AS n_details,
           CAST(SUM(len(regexp_extract_all(s, '{_WIN_PAT}'))) AS BIGINT) AS n_matches
    FROM enc GROUP BY 1, 2
"""

# streaming_arrivals: work discovered MID-RUN must change nothing about
# the result — the stream over (first half, late-arriving second half)
# equals the batch aggregate over the whole table, i.e. the exact same
# oracle as streaming_windowed.
ORACLES["streaming_arrivals"] = ORACLES["streaming_windowed"]

# streaming_funnel: the cross-epoch NFA (signup -> purchase, gap <= 3)
# replayed as an index-carrying lazy-gap RE2 over per-user clock-ordered
# event tokens; the two capture groups recover the start/end event
# indices, joined back to their clocks.  (user_id, ts) has no ties in the
# events tables, so ORDER BY clock is deterministic.
_FUNNEL_PAT = _sg.cep_regex_indexed([_sg.hex4(3), _sg.hex4(4)], [3])
ORACLES["streaming_funnel"] = f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS clock,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'signup' THEN 3 WHEN 'purchase' THEN 4
                  WHEN 'error' THEN 5 ELSE 0 END AS token
      FROM events
    ),
    ordered AS (
      SELECT user_id, clock, token,
             row_number() OVER (PARTITION BY user_id ORDER BY clock) - 1 AS idx
      FROM ev
    ),
    enc AS (
      SELECT user_id,
             string_agg('g' || printf('%04x', token) || 'i' || printf('%012d', idx),
                        '' ORDER BY idx) AS s
      FROM ordered GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             regexp_extract_all(s, '{_FUNNEL_PAT}', 1) AS starts,
             regexp_extract_all(s, '{_FUNNEL_PAT}', 2) AS ends
      FROM enc
    ),
    pairs AS (
      SELECT user_id, CAST(unnest(starts) AS BIGINT) AS si,
             CAST(unnest(ends) AS BIGINT) AS ei
      FROM m
    )
    SELECT CAST(p.user_id AS BIGINT) AS key, o1.clock AS start_seq,
           o2.clock + 1 AS end_seq
    FROM pairs p
    JOIN ordered o1 ON o1.user_id = p.user_id AND o1.idx = p.si
    JOIN ordered o2 ON o2.user_id = p.user_id AND o2.idx = p.ei
"""

from dataflowkit_ray.pipelines.relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES
from dataflowkit_ray.pipelines.training import TRAINING_ORACLES, TRAINING_QUERIES

QUERIES.update(TRAINING_QUERIES)
ORACLES.update(TRAINING_ORACLES)
QUERIES.update(RELATIONAL_QUERIES)
ORACLES.update(RELATIONAL_ORACLES)
