"""Flagship end-to-end pipeline: the engine's headline workload.

token stream (source) -> event clock -> tumbling windows
  -> windowed aggregate (two-phase)           [the wide step]
  + details join on doc_id                    [stream-stream join]
  + CEP pattern matches per doc               [NFA stage]
-> per-(source, window) summary.

This is the pipeline ``bench.py`` times (sequences/sec) and ``entry()``
smoke-runs; the streaming runner (``dataflowkit_ray.runner``) executes the
same stages epoch-by-epoch with an exactly-once sink.
"""

from __future__ import annotations

from dataflowkit_ray.config import DEFAULT_CONFIG, EngineConfig
from dataflowkit_ray.stages.cep import Pattern, Step, match_pattern_batch
from dataflowkit_ray.stages.join import explode_chunks, join_details
from dataflowkit_ray.stages.windows import assign_tumbling, windowed_sum
from dataflowkit_ray.tokenize import load_token_stream, token_id


def default_pattern() -> Pattern:
    """'spark ... join' with a gap — a selector-chain-with-descendant
    analog over the synthetic vocabulary."""
    return Pattern(
        steps=(Step(literal=token_id("spark")), Step(literal=token_id("join"), max_gap=3)),
        mode="nonoverlapping",
    )


def flagship_pipeline(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Returns the per-(source, window) summary Dataset:
    (source, window_id, sum_n_tok, n_rows, n_details, n_matches)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = load_token_stream(sf_dir)

    # windowed aggregate (two-phase combiner + small shuffle)
    windowed = ds.map_batches(
        lambda b: assign_tumbling(b, cfg.tumbling_size),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    agg = windowed_sum(windowed, batch_size=cfg.batch_size)

    # details join (chunk children), then collapse to per-window detail count
    child = ds.map_batches(
        explode_chunks(16), batch_format="pyarrow", batch_size=cfg.batch_size
    )
    joined = join_details(ds, child, num_partitions=cfg.join_num_partitions)

    def _window_details(t):
        import pyarrow as pa
        import numpy as np

        seq = t["event_seq"]
        if isinstance(seq, pa.ChunkedArray):
            seq = seq.combine_chunks()
        wid = seq.to_numpy(zero_copy_only=False) // cfg.tumbling_size
        out = pa.table(
            {
                "source": t["source"],
                "window_id": pa.array(wid),
                "n_details": t["n_details"],
            }
        )
        return out.group_by(["source", "window_id"]).aggregate([("n_details", "sum")])

    details_per_window = (
        joined.map_batches(_window_details, batch_format="pyarrow")
        .groupby(["source", "window_id"])
        .aggregate(Sum("n_details_sum", alias_name="n_details"))
    )

    # CEP matches folded to the same window grain
    matches = ds.map_batches(
        match_pattern_batch(default_pattern()),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    def _window_matches(t):
        import pyarrow as pa

        seq = t["event_seq"]
        if isinstance(seq, pa.ChunkedArray):
            seq = seq.combine_chunks()
        wid = seq.to_numpy(zero_copy_only=False) // cfg.tumbling_size
        out = pa.table(
            {"source": t["source"], "window_id": pa.array(wid)}
        )
        return out.group_by(["source", "window_id"]).aggregate([([], "count_all")])

    matches_per_window = (
        matches.map_batches(_window_matches, batch_format="pyarrow")
        .groupby(["source", "window_id"])
        .aggregate(Sum("count_all", alias_name="n_matches"))
    )

    out = agg.join(
        details_per_window,
        join_type="left_outer",
        num_partitions=cfg.join_num_partitions,
        on=("source", "window_id"),
    )
    out = out.join(
        matches_per_window,
        join_type="left_outer",
        num_partitions=cfg.join_num_partitions,
        on=("source", "window_id"),
    )
    return out
