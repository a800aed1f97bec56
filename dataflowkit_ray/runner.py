"""The streaming epoch loop: micro-batch ingestion -> windowed state ->
watermark-driven emission -> exactly-once sink -> checkpoint.

Mirrors the reference lifecycle (``Task.Parse``: validate -> workers ->
pipeline -> encode, ``/root/reference/scrape/scrape.go:210-269``) recast
per SURVEY.md §3.4: control stays in the driver, data NEVER returns to it
— not even pre-aggregated partials.  The data plane is per-chunk Ray
tasks that compute per-(source, window) metric partials and ship them
STRAIGHT to the :class:`WindowStateShard` actors (idempotent per
(epoch, chunk) staging keys); closed windows are written by each shard
as its OWN sink part.  The driver moves chunk specs, ack dicts and
manifest metadata only — the same task->shard pattern as
``event_runner`` / ``join_runner``.

Per epoch:

1. ``source.next_slice`` -> chunk specs (per-partition offsets advance);
2. one RAY TASK per chunk reads its row-group slice, computes ALL
   per-window metric partials (sum/count/details/matches) chunk-locally
   — the detail-embed is chunk-local because child chunks derive from
   their parent row, the same containment the reference's ``divide``
   guarantees for blocks in a page (``scrape/scrape.go:447-517``) — and
   stages them on the shard owning each (source, window) key;
3. ``merge_staged`` folds the staged partials into shard state
   (idempotent per epoch — a replayed epoch merges into the restored
   pre-epoch state);
4. watermark advances (min partition frontier); windows strictly below it
   close and each shard writes its own deterministic sink part
   (``pop_closed_to_sink`` — replay rewrites, never appends);
5. the driver publishes the epoch manifest (metadata only);
6. checkpoint {offsets, watermark, state snapshots, metrics} — written
   AFTER the commit, so crash-between leaves a committed epoch that the
   resumed run simply re-commits byte-identically.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from dataflowkit_ray.checkpoint import CheckpointStore
from dataflowkit_ray.config import DEFAULT_CONFIG, EngineConfig
from dataflowkit_ray.pipelines.flagship import _METRICS, default_pattern
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.stages.agg import checked_rename
from dataflowkit_ray.sources.microbatch import MicroBatchSource
from dataflowkit_ray.state.store import (
    ShardedState,
    WindowStateShard,
    table_to_bytes,
)


def _window_chunk_process(partial_fn, shards):
    """Factory for the per-chunk task body: chunk rows -> per-window
    partials -> staged on the shard owning each (source, window) key.
    Shard routing uses the SAME composite bucket as the state pool, so a
    key always lands on the shard that accumulates (and later pops) it."""
    n_shards = len(shards)

    def for_epoch(epoch: int):
        def process(spec: dict, t: pa.Table) -> dict:
            from dataflowkit_ray.stages.agg import composite_bucket

            p = partial_fn(t)
            refs = []
            if len(p):
                sh = composite_bucket(p, ["source", "window_id"], n_shards)
                ckey = (spec["seq"], spec["global_row_start"])
                for i in range(n_shards):
                    m = sh == i
                    if m.any():
                        refs.append(
                            shards[i].stage.remote(
                                epoch, ckey, table_to_bytes(p.filter(pa.array(m)))
                            )
                        )
            ray.get(refs)  # epoch consumption implies delivery
            return {"rows": len(t), "partial_rows": len(p)}

        return process

    return for_epoch


def epoch_partials_fn(
    window_size: int, pattern, chunk_size: int = 16, slide: int | None = None
):
    """One fused map_batches pass: raw doc rows -> per-(source, window)
    metric partials (sum_n_tok, n_rows, n_details, n_matches).

    ``slide`` switches tumbling -> sliding: rows expand to every covering
    window (flat-map) before the per-batch combiner; the state store and
    sink are window-kind agnostic."""
    import numpy as np

    from dataflowkit_ray.pipelines.flagship import _conform
    from dataflowkit_ray.stages.cep import match_pattern_batch
    from dataflowkit_ray.stages.windows import assign_sliding, assign_tumbling
    from dataflowkit_ray.tokenize import tokenize_documents

    matcher = match_pattern_batch(pattern)

    def assign(b: pa.Table) -> pa.Table:
        if slide is None:
            return assign_tumbling(b, window_size)
        return assign_sliding(b, window_size, slide)

    def fn(raw: pa.Table) -> pa.Table:
        b0 = tokenize_documents(raw)  # unexpanded: the matcher's input
        b = assign(b0)  # sliding expands rows to every covering window

        g = b.select(["source", "window_id", "n_tok"]).group_by(
            ["source", "window_id"]
        ).aggregate([("n_tok", "sum"), ("n_tok", "count")])
        g = checked_rename(
            g,
            ["source", "window_id", "n_tok_sum", "n_tok_count"],
            ["source", "window_id", "s", "c"],
        )
        win = _conform(g, {"sum_n_tok": "s", "n_rows": "c"})

        # details: chunks of a doc are batch-local -> n_details = ceil(n_tok/16)
        # (under sliding windows a doc counts once per covering window,
        # matching the batch semantics of assign_sliding + sum)
        from dataflowkit_ray.config import np_col

        n_tok = np_col(b["n_tok"])
        nd = np.maximum(1, -(-n_tok // chunk_size))
        dt = pa.table(
            {
                "source": b["source"],
                "window_id": b["window_id"],
                "nd": pa.array(nd),
            }
        ).group_by(["source", "window_id"]).aggregate([("nd", "sum")])
        dt = checked_rename(
            dt, ["source", "window_id", "nd_sum"], ["source", "window_id", "d"]
        )
        det = _conform(dt, {"n_details": "d"})

        # matcher runs on UNexpanded rows (else sliding would duplicate
        # matches per covering window); match rows then window-assign
        m = assign(matcher(b0))
        gm = m.select(["source", "window_id"]).group_by(
            ["source", "window_id"]
        ).aggregate([([], "count_all")])
        gm = checked_rename(
            gm, ["source", "window_id", "count_all"], ["source", "window_id", "m"]
        )
        mat = _conform(gm, {"n_matches": "m"})

        return pa.concat_tables([win, det, mat])

    return fn


class StreamingRunner:
    def __init__(
        self,
        files: list[str],
        work_dir: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
        window_size: int | None = None,
        n_shards: int | None = None,
        pattern=None,
        chunks_per_epoch: int = 2,
        target_rows: int = 512,
        slide: int | None = None,
        discover: str | None = None,
    ):
        self.cfg = cfg
        self.window_size = window_size or cfg.tumbling_size
        if slide is not None and slide <= 0:
            raise ValueError(f"slide must be >= 1, got {slide}")
        self.slide = slide  # None -> tumbling; else sliding
        self.n_shards = n_shards or cfg.state_shards
        self.pattern = pattern or default_pattern()
        self._source_kwargs = dict(
            n_partitions=cfg.n_partitions,
            chunks_per_epoch=chunks_per_epoch,
            target_rows=target_rows,
            columns=["doc_id", "text", "source"],
            discover=discover,
        )
        self.source = MicroBatchSource(files, **self._source_kwargs)
        self.sink = ExactlyOnceSink(f"{work_dir}/out")
        self.ckpt = CheckpointStore(f"{work_dir}/checkpoint")

    def run(self, max_epochs: int | None = None, on_epoch=None) -> dict:
        state = ShardedState(
            WindowStateShard, self.n_shards, list(_METRICS), "n_rows",
            pool="windows",
        )
        latest = self.ckpt.latest()
        finalized = False
        if latest is not None:
            meta = self.ckpt.read_meta(latest)
            offsets = meta["offsets"]
            epoch = meta["epoch"] + 1
            finalized = meta.get("final", False)
            # file ARRIVAL order is stream identity: chunk seqs (partition
            # routing) and global_row_start (the event clock) depend on
            # enumeration order, so a resume rebuilds the source from the
            # checkpointed order, not the directory's current sort order
            if meta.get("files") and meta["files"] != self.source.files:
                self.source = MicroBatchSource(
                    meta["files"], preserve_file_order=True, **self._source_kwargs
                )
            state.restore(self.ckpt.read_state(latest, "windows", self.n_shards))
        else:
            offsets = self.source.initial_offsets()
            epoch = 0

        partial_fn = epoch_partials_fn(
            self.window_size, self.pattern, slide=self.slide
        )
        ran = 0
        while True:
            # runtime work discovery (the reference's paginate-finds-pages
            # semantics): pick up files that arrived since the last epoch.
            # After a FINAL flush the stream is closed — late arrivals
            # against a finalized checkpoint need a fresh work_dir (their
            # windows were already emitted and popped).
            if not finalized:
                self.source.rescan()
            if self.source.done(offsets):
                break
            if max_epochs is not None and ran >= max_epochs:
                break
            specs, new_offsets = self.source.next_slice(offsets)
            rows_in = sum(s["n_rows"] for s in specs)
            # data plane: one task per chunk -> partials -> shard staging;
            # the driver sees only the per-chunk ack dicts
            self.source.run_epoch(
                specs, _window_chunk_process(partial_fn, state.shards)(epoch)
            )
            n_partials = sum(
                ray.get([s.merge_staged.remote(epoch) for s in state.shards])
            )

            offsets = new_offsets
            wm_event = self.source.watermark(offsets)
            wm_window = self._closed_frontier(wm_event)
            self._commit(
                epoch, wm_window, offsets, wm_event, state,
                metrics={"rows_in": rows_in, "chunks": len(specs),
                         "partial_rows": n_partials},
            )
            if on_epoch is not None:
                # observability/test hook, called after the commit (the
                # epoch it reports is durable); arrival tests use it to
                # drop files mid-run deterministically
                on_epoch(epoch, {"rows_in": rows_in, "chunks": len(specs)})
            ran += 1
            epoch += 1

        if self.source.done(offsets) and not finalized:
            # final flush closes every remaining window; max_epochs bounds
            # ingest epochs only (a done source always flushes)
            wm_event = self.source.watermark(offsets)
            self._commit(
                epoch, 1 << 60, offsets, wm_event, state, final=True,
                metrics={"rows_in": 0, "chunks": 0, "partial_rows": 0},
            )
            epoch += 1

        shard_stats = ray.get([s.stats.remote() for s in state.shards])

        return {
            "epochs": epoch,
            "watermark": self.source.watermark(offsets),
            "late_rows": sum(s["late_rows"] for s in shard_stats),
            "open_windows": sum(s["open_windows"] for s in shard_stats),
            "committed_epochs": self.sink.committed_epochs(),
            "rows_out": sum(
                self.sink.manifest(e)["rows"] for e in self.sink.committed_epochs()
            ),
        }

    def _closed_frontier(self, wm_event: int) -> int:
        """First window id NOT yet closable.  Tumbling window w covers
        [w*size, (w+1)*size): closed when wm >= (w+1)*size.  Sliding
        window w covers [w*slide, w*slide+size): closed when
        wm >= w*slide + size."""
        if self.slide is None:
            return wm_event // self.window_size
        return max(0, (wm_event - self.window_size) // self.slide + 1)

    def _commit(
        self, epoch, wm_window, offsets, wm_event, state, final=False, metrics=None
    ):
        # each shard writes its OWN sink part (closed-window rows never
        # transit the driver); the driver assembles manifests only
        parts = [
            p
            for p in ray.get(
                [
                    s.pop_closed_to_sink.remote(
                        wm_window, self.sink.parts_dir, epoch, i
                    )
                    for i, s in enumerate(state.shards)
                ]
            )
            if p is not None
        ]
        self.sink.publish_epoch(
            epoch,
            parts,
            extra={
                "offsets": offsets,
                "watermark_event": wm_event,
                "watermark_window": min(wm_window, 1 << 60),
                "final": final,
                "metrics": metrics or {},
            },
        )
        self.ckpt.write(
            epoch,
            {"offsets": offsets, "watermark_event": wm_event, "final": final,
             "files": self.source.files},
            {"windows": state.snapshot()},
        )
        self.ckpt.prune()


def main(argv: list[str] | None = None) -> None:
    """CLI: ``python -m dataflowkit_ray.runner <parquet>... --work-dir D``.

    The one place (besides bench.py and the test fixture) that owns a Ray
    session; resumable — re-running with the same work dir continues from
    the last checkpoint.
    """
    import argparse
    import json

    import ray as _ray

    p = argparse.ArgumentParser(description="streaming epoch runner")
    p.add_argument("files", nargs="+", help="input parquet files (documents schema)")
    p.add_argument("--work-dir", required=True, help="output + checkpoint root")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--slide", type=int, default=None,
                   help="sliding-window slide (default: tumbling)")
    p.add_argument("--window-size", type=int, default=None)
    p.add_argument("--chunks-per-epoch", type=int, default=2)
    p.add_argument("--target-rows", type=int, default=512)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--discover", default=None,
                   help="glob rescanned between epochs for newly-arrived files")
    args = p.parse_args(argv)

    if not _ray.is_initialized():
        _ray.init(
            address="local",
            include_dashboard=False,
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    try:
        runner = StreamingRunner(
            args.files,
            args.work_dir,
            chunks_per_epoch=args.chunks_per_epoch,
            target_rows=args.target_rows,
            slide=args.slide,
            window_size=args.window_size,
            discover=args.discover,
        )
        print(json.dumps(runner.run(max_epochs=args.max_epochs)))
    finally:
        _ray.shutdown()


if __name__ == "__main__":
    main()
