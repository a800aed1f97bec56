"""Flagship end-to-end pipeline: the engine's headline workload.

token stream (source) -> event clock -> tumbling windows
  -> windowed aggregate (two-phase combiner)   [the wide step]
  + details join on doc_id                     [stream-stream join]
  + CEP pattern matches per doc                [NFA stage]
-> per-(source, window) summary.

This is the pipeline ``bench.py`` times (sequences/sec) and ``entry()``
smoke-runs; the streaming runner (``dataflowkit_ray.runner``) executes the
same stages epoch-by-epoch with an exactly-once sink.

Shuffle budget (SURVEY.md §7 "Shuffles and their keys"): ONE hash join on
``doc_id`` (the details join) and ONE small groupby on
``(source, window_id)``.  The three metric streams (window sums, detail
counts, CEP match counts) are merged by *union of conforming partials +
one groupby*, not by joining tiny aggregated streams — join-actor startup
dominated wall time and starved low-CPU sessions in the joined variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dataflowkit_ray.config import DEFAULT_CONFIG, EngineConfig
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


def flagship_pipeline(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    repeat: int = 1,
    materialize: bool = True,
):
    """Returns the per-(source, window) summary Dataset:
    (source, window_id, sum_n_tok, n_rows, n_details, n_matches).

    ``repeat`` deterministically scales the stream (bench volume knob).

    ``materialize`` pins the tokenized stream in the object store once so
    the three consumer branches don't each re-execute read+tokenize (Ray
    re-runs a branched lineage per consumer; measured 4× redundant
    tokenize).  In the streaming runner this is bounded by construction —
    each epoch materializes only its own micro-batch slice — so it is the
    epoch model, not a full-input materialization, at scale.
    """
    pattern = default_pattern()
    matcher = match_pattern_batch(pattern, carry=("src_id", "event_seq"))
    wsize = cfg.tumbling_size

    # volume-derived block count: the plan (and per-block work) is then
    # IDENTICAL at every cluster size — Ray's CPU-derived default gives
    # small clusters fewer/fatter blocks, which skews scaling comparisons
    blocks = max(64, min(512, repeat // 8)) if repeat > 1 else None
    ds = load_token_stream(sf_dir, repeat=repeat, num_blocks=blocks)

    # every shuffle byte is paid at exchange bandwidth, so the source
    # STRING never enters a shuffle: the (tiny) source catalog comes from
    # a pruned metadata-scale read, rows carry an int32 ``src_id`` through
    # every partial/join, and the string re-attaches on the final (small)
    # result.  At 100 TB the catalog is a metadata table; this is the
    # dictionary-encode-through-the-exchange pattern.
    import ray.data as _rd

    srcs = sorted(
        _rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source"]
        ).unique("source")
    )
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
    if materialize:
        ds = ds.materialize()

    # ---- one fused pass: window-sum partials + CEP match partials
    def metrics_partial(b: pa.Table) -> pa.Table:
        b = assign_tumbling(b, wsize)
        g = b.select(["src_id", "window_id", "n_tok"]).group_by(
            ["src_id", "window_id"]
        ).aggregate([("n_tok", "sum"), ("n_tok", "count")])
        g = g.rename_columns(["src_id", "window_id", "s", "c"])
        win = _conform(g, {"sum_n_tok": "s", "n_rows": "c"}, key_col="src_id")

        m = assign_tumbling(matcher(b), wsize)
        gm = m.select(["src_id", "window_id"]).group_by(
            ["src_id", "window_id"]
        ).aggregate([([], "count_all")])
        gm = gm.rename_columns(["src_id", "window_id", "m"])
        return pa.concat_tables(
            [win, _conform(gm, {"n_matches": "m"}, key_col="src_id")]
        )

    metrics = ds.map_batches(metrics_partial, batch_format="pyarrow")

    # ---- the stream-stream details join (the real shuffle-join stage),
    # folded to per-window detail counts.  Key = event_seq (int64 ==
    # int(doc_id)): integer hash keys through the join beat the string
    # doc_id at volume.  Both sides are projected to exactly the columns
    # the downstream fold reads — the join is an all-to-all, so every
    # byte through it is paid at shuffle bandwidth.  The child AGGREGATE
    # (one row per doc) is computed batch-locally: a doc's detail chunks
    # derive from its own row (the same containment the reference's
    # ``divide`` guarantees for blocks in a page), so the pre-aggregation
    # shuffle of the generic ``join_details`` path is unnecessary here —
    # the parent x child-aggregate hash join remains the real exchange.
    def child_agg(t: pa.Table) -> pa.Table:
        n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.maximum(1, -(-n_tok // 16))
        return pa.table(
            {
                "event_seq": t["event_seq"],
                "n_details": pa.array(nd),
                "sum_detail_tok": pa.array(n_tok),
            }
        )

    child = ds.map_batches(child_agg, batch_format="pyarrow")
    parent = ds.map_batches(
        lambda t: t.select(["event_seq", "src_id"]), batch_format="pyarrow"
    )
    # shuffle partition count follows the cluster (a deployment knob like
    # Spark's shuffle partitions, not part of the logical plan)
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", cfg.join_num_partitions)) if _ray.is_initialized() else cfg.join_num_partitions
    joined = parent.join(
        child,
        join_type="inner",
        num_partitions=max(16, min(32, ncpu)),
        on=("event_seq",),
    )

    def details_partial(t: pa.Table) -> pa.Table:
        t = assign_tumbling(t, wsize)
        g = t.select(["src_id", "window_id", "n_details"]).group_by(
            ["src_id", "window_id"]
        ).aggregate([("n_details", "sum")])
        g = g.rename_columns(["src_id", "window_id", "d"])
        return _conform(g, {"n_details": "d"}, key_col="src_id")

    details = joined.map_batches(details_partial, batch_format="pyarrow")

    # ---- merge: union of conforming partials -> ONE bucket aggregate
    from dataflowkit_ray.stages.agg import hash_agg

    merged = metrics.union(details)
    agg = hash_agg(
        merged, ("src_id", "window_id"), [(m, "sum", m) for m in _METRICS]
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
