"""Flagship end-to-end pipeline: the engine's headline workload.

token stream (source) -> event clock -> tumbling windows
  -> windowed aggregate (two-phase combiner)   [the wide step]
  + details join on doc_id                     [co-partitioned join]
  + CEP pattern matches per doc                [NFA stage]
-> per-(source, window) summary.

This is the pipeline ``bench.py`` times (sequences/sec) and ``entry()``
smoke-runs; the streaming runner (``dataflowkit_ray.runner``) executes the
same stages epoch-by-epoch with an exactly-once sink.

Shuffle budget (SURVEY.md §7 "Shuffles and their keys"): exactly ONE
all-to-all — the final ``(source, window_id)`` bucket aggregate.

The details join is executed WITHOUT an exchange.  The child "detail"
stream is derived row-locally from the parent stream (a doc's detail
chunks come from its own token row — the same containment the
reference's ``divide`` guarantees for blocks in a page,
``/root/reference/scrape/scrape.go:447-517``), so parent and child are
*co-partitioned by construction*: every join key's rows for both sides
sit in the same batch.  A hash join between co-partitioned streams needs
no shuffle — each task joins its own batch (the classic co-partitioned
join elimination; Spark/Flink do the same when both sides share a
partitioner).  The join itself is still a real per-batch Acero hash
join keyed on ``event_seq`` — no row-order assumption, only
co-location — and ``tests/test_flagship_join.py`` asserts it equals the
shuffle ``Dataset.join`` on the same input.  The generic two-stream case
(sides NOT co-partitioned) keeps the exchange: ``stages/join.py`` /
``queries.join_details``.

Earlier rounds paid a ``materialize()`` + a 3-branch lineage + a
hash-shuffle join + a 3x-volume partial union here; measured fixed cost
S ~ 7-9.5 s per job capped scaling efficiency at ~0.65-0.70.  The fused
single-consumer chain removes the materialize barrier, the join actors
and two of every three shuffle bytes (per-batch merge of the three
metric streams before the exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dataflowkit_ray.config import DEFAULT_CONFIG, EngineConfig
from dataflowkit_ray.stages.agg import checked_rename
from dataflowkit_ray.stages.cep import Pattern, Step, match_pattern_batch
from dataflowkit_ray.stages.join import explode_chunks, join_details
from dataflowkit_ray.stages.windows import assign_tumbling
from dataflowkit_ray.tokenize import load_token_stream, token_id

# one conforming partial schema for all three metric streams
_METRICS = ("sum_n_tok", "n_rows", "n_details", "n_matches")


def default_pattern() -> Pattern:
    """'spark ... join' with a gap — a selector-chain-with-descendant
    analog over the synthetic vocabulary."""
    return Pattern(
        steps=(Step(literal=token_id("spark")), Step(literal=token_id("join"), max_gap=3)),
        mode="nonoverlapping",
    )


def _conform(t: pa.Table, present: dict[str, str], key_col: str = "source") -> pa.Table:
    """Project a per-window partial onto the common metric schema,
    zero-filling absent metrics so union + Sum-groupby == outer-join."""
    n = len(t)
    cols: dict[str, object] = {key_col: t[key_col], "window_id": t["window_id"]}
    for m in _METRICS:
        src = present.get(m)
        cols[m] = (
            t[src].cast(pa.int64()) if src is not None else pa.array(np.zeros(n, dtype=np.int64))
        )
    return pa.table(cols)


def _child_agg(t: pa.Table) -> pa.Table:
    """Per-doc detail aggregate (one row per parent key), derived
    row-locally: a doc's detail chunks come from its own token row, so
    no pre-aggregation shuffle is needed (containment by construction).
    Kept module-level so the equivalence test can drive the shuffle-join
    variant with the identical child."""
    n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    nd = np.maximum(1, -(-n_tok // 16))
    return pa.table(
        {
            "event_seq": t["event_seq"],
            "n_details": pa.array(nd),
            "sum_detail_tok": pa.array(n_tok),
        }
    )


def _file_sources(f: str) -> list[str]:
    """One file's distinct source values (catalog-sized; runs in a task)."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    return _pc.unique(_pq.read_table(f, columns=["source"])["source"]).to_pylist()


_CATALOG_TASK = None  # cached remote fn (exporting per call costs ~50 ms)


def source_catalog(files: list[str]) -> list[str]:
    """Distributed distinct over the ``source`` column: one Ray task per
    file returns that file's catalog-sized unique set; the driver unions.
    The raw column never transits the driver, and the catalog covers
    EVERY file (a single-file scan missed sources absent from file 0).
    At one file this is one round-trip (~50 ms warm); at 100k files it is
    the same fan-out the read itself schedules."""
    global _CATALOG_TASK
    import ray

    if _CATALOG_TASK is None:
        _CATALOG_TASK = ray.remote(num_cpus=1)(_file_sources)
    sets = ray.get([_CATALOG_TASK.remote(f) for f in files])
    return sorted(set().union(*map(set, sets)))


def flagship_pipeline(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    repeat: int = 1,
    materialize: bool = False,
):
    """Returns the per-(source, window) summary Dataset:
    (source, window_id, sum_n_tok, n_rows, n_details, n_matches).

    ``repeat`` deterministically scales the stream (bench volume knob).
    ``materialize`` is accepted for API compatibility; the fused
    single-consumer chain no longer branches, so nothing needs pinning.

    Plan: read -> tokenize -> [replicate] -> one fused partials pass
    (windows + CEP + co-partitioned details join + per-batch merge +
    bucket tag) -> ONE bucket-shuffle merge -> attach source string.
    """
    pattern = default_pattern()
    matcher = match_pattern_batch(pattern, carry=("src_id", "event_seq"))
    wsize = cfg.tumbling_size

    # volume-derived block count: the plan (and per-block work) is then
    # IDENTICAL at every cluster size — Ray's CPU-derived default gives
    # small clusters fewer/fatter blocks, which skews scaling comparisons.
    # ~16 replicas (80k rows) per block: driver dispatch + sort
    # coordination cost ~10 ms per task, so halving the task count cut
    # measured fixed overhead ~2x with no straggler penalty.
    blocks = max(32, min(256, repeat // 16)) if repeat > 1 else None
    ds = load_token_stream(sf_dir, repeat=repeat, num_blocks=blocks)

    # every shuffle byte is paid at exchange bandwidth, so the source
    # STRING never enters a shuffle: rows carry an int32 ``src_id``
    # through the exchange and the string re-attaches on the final
    # (small) result.  The catalog is a DISTRIBUTED distinct: one Ray
    # task per input file uniques its own source column (workers read,
    # the driver receives only catalog-sized sets) — a driver-side scan
    # of file 0 here both pulled a raw data column through the driver
    # and KeyError'd on any source absent from the first file.
    from dataflowkit_ray.tokenize import documents_files

    srcs = source_catalog(documents_files(sf_dir))
    src_to_id = {v: i for i, v in enumerate(srcs)}

    def add_src_id(t: pa.Table) -> pa.Table:
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        lut = np.asarray(
            [src_to_id[u] for u in d.dictionary.to_pylist()], dtype=np.int32
        )
        sid = lut[d.indices.to_numpy(zero_copy_only=False)]
        return t.drop_columns(["source"]).append_column("src_id", pa.array(sid))

    ds = ds.map_batches(add_src_id, batch_format="pyarrow")

    # ---- ONE fused pass: window-sum + CEP-match + details-join partials,
    # merged to one row per (src_id, window_id) per batch before the
    # exchange (each window straddles at most two blocks, so the partial
    # stream is ~#keys rows, not 3x the input).
    def all_partials(b: pa.Table) -> pa.Table:
        b = assign_tumbling(b, wsize)

        g = b.select(["src_id", "window_id", "n_tok"]).group_by(
            ["src_id", "window_id"]
        ).aggregate([("n_tok", "sum"), ("n_tok", "count")])
        g = checked_rename(
            g,
            ["src_id", "window_id", "n_tok_sum", "n_tok_count"],
            ["src_id", "window_id", "s", "c"],
        )
        win = _conform(g, {"sum_n_tok": "s", "n_rows": "c"}, key_col="src_id")

        m = assign_tumbling(matcher(b), wsize)
        gm = m.select(["src_id", "window_id"]).group_by(
            ["src_id", "window_id"]
        ).aggregate([([], "count_all")])
        gm = checked_rename(
            gm,
            ["src_id", "window_id", "count_all"],
            ["src_id", "window_id", "m"],
        )
        cep = _conform(gm, {"n_matches": "m"}, key_col="src_id")

        # co-partitioned details join: a real Acero hash join on
        # event_seq, executed batch-locally because both sides live in
        # this batch (see module docstring) — no exchange.
        child = _child_agg(b)
        parent = b.select(["event_seq", "src_id", "window_id"])
        joined = parent.join(child, keys=["event_seq"], join_type="inner")
        gd = joined.select(["src_id", "window_id", "n_details"]).group_by(
            ["src_id", "window_id"]
        ).aggregate([("n_details", "sum")])
        gd = checked_rename(
            gd,
            ["src_id", "window_id", "n_details_sum"],
            ["src_id", "window_id", "d"],
        )
        det = _conform(gd, {"n_details": "d"}, key_col="src_id")

        merged = pa.concat_tables([win, cep, det])
        out = merged.group_by(["src_id", "window_id"]).aggregate(
            [(mname, "sum") for mname in _METRICS]
        )
        return checked_rename(
            out,
            ["src_id", "window_id", *(f"{m}_sum" for m in _METRICS)],
            ["src_id", "window_id", *_METRICS],
        )

    partials = ds.map_batches(all_partials, batch_format="pyarrow")

    # ---- the ONE all-to-all: bucket-shuffle merge of per-batch partials
    from dataflowkit_ray.stages.agg import hash_agg

    # bucket count well above the sort partition count (= #blocks): with
    # as many distinct _bucket values as partitions, sampled range
    # boundaries occasionally collide and produce an empty (schema-less)
    # partition; 8x headroom keeps every partition non-empty
    agg = hash_agg(
        partials,
        ("src_id", "window_id"),
        [(m, "sum", m) for m in _METRICS],
        combine=False,
        n_buckets=max(256, 8 * (blocks or 32)),
    )

    src_arr = np.asarray(srcs, dtype=object)

    def attach_source(t: pa.Table) -> pa.Table:
        sid = t["src_id"].to_numpy(zero_copy_only=False)
        out = {"source": pa.array(src_arr[sid], pa.string())}
        for c in t.column_names:
            if c != "src_id":
                out[c] = t[c]
        return pa.table(out)

    return agg.map_batches(attach_source, batch_format="pyarrow")
