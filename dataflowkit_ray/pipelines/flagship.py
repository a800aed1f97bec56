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


def _conform(t: pa.Table, present: dict[str, str]) -> pa.Table:
    """Project a per-window partial onto the common metric schema,
    zero-filling absent metrics so union + Sum-groupby == outer-join."""
    n = len(t)
    cols: dict[str, object] = {"source": t["source"], "window_id": t["window_id"]}
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
    matcher = match_pattern_batch(pattern)
    wsize = cfg.tumbling_size

    ds = load_token_stream(sf_dir, repeat=repeat)
    if materialize:
        ds = ds.materialize()

    # ---- one fused pass: window-sum partials + CEP match partials
    def metrics_partial(b: pa.Table) -> pa.Table:
        b = assign_tumbling(b, wsize)
        g = b.select(["source", "window_id", "n_tok"]).group_by(
            ["source", "window_id"]
        ).aggregate([("n_tok", "sum"), ("n_tok", "count")])
        g = g.rename_columns(["source", "window_id", "s", "c"])
        win = _conform(g, {"sum_n_tok": "s", "n_rows": "c"})

        m = assign_tumbling(matcher(b), wsize)
        gm = m.select(["source", "window_id"]).group_by(
            ["source", "window_id"]
        ).aggregate([([], "count_all")])
        gm = gm.rename_columns(["source", "window_id", "m"])
        return pa.concat_tables([win, _conform(gm, {"n_matches": "m"})])

    metrics = ds.map_batches(metrics_partial, batch_format="pyarrow")

    # ---- the stream-stream details join (the real shuffle-join stage),
    # folded to per-window detail counts.  Key = event_seq (int64 ==
    # int(doc_id)): integer hash keys through the join/aggregate beat the
    # string doc_id at volume.
    child = ds.map_batches(
        explode_chunks(16, with_tokens=False, id_col="event_seq"),
        batch_format="pyarrow",
    )
    joined = join_details(
        ds, child, key="event_seq", num_partitions=cfg.join_num_partitions
    )

    def details_partial(t: pa.Table) -> pa.Table:
        t = assign_tumbling(t, wsize)
        g = t.select(["source", "window_id", "n_details"]).group_by(
            ["source", "window_id"]
        ).aggregate([("n_details", "sum")])
        g = g.rename_columns(["source", "window_id", "d"])
        return _conform(g, {"n_details": "d"})

    details = joined.map_batches(details_partial, batch_format="pyarrow")

    # ---- merge: union of conforming partials -> ONE bucket aggregate
    from dataflowkit_ray.stages.agg import hash_agg

    merged = metrics.union(details)
    return hash_agg(
        merged, ("source", "window_id"), [(m, "sum", m) for m in _METRICS]
    )
