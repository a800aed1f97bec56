"""Event-stream runner: session windows + cross-batch CEP over a keyed
event stream, exactly-once, checkpointed.

Drives the two state interactions the document runner doesn't:
sessions that SPAN epochs (gap-merge with watermark timeout) and NFA
partial matches that survive micro-batch boundaries — the engine analogs
of the reference's pagination-chain sessions (``scrape/scrape.go:378-445``)
and multi-page selector chains (``scrape_test.go:199-279``).

Stream shape: events table ``(event_id, ts, user_id, event_type, ...)``
sorted by ``ts`` — clock = epoch-micros, key = ``user_id``, CEP token =
a small event-type id.  Per-epoch event tuples are pre-projected in
``map_batches`` and routed to hash shards; the driver moves only those
bounded projections, never payload columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from dataflowkit_ray.checkpoint import CheckpointStore
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.sources.microbatch import MicroBatchSource
from dataflowkit_ray.state.session_store import CEPStateShard, SessionStateShard


EVENT_TOKENS = {"view": 1, "click": 2, "signup": 3, "purchase": 4, "error": 5}

# default stream pattern: signup then purchase with up to 3 other events
# between (a funnel query) — nonoverlapping, leftmost-greedy
DEFAULT_EVENT_PATTERN = (
    [{"literal": EVENT_TOKENS["signup"]}, {"literal": EVENT_TOKENS["purchase"], "max_gap": 3}],
    "nonoverlapping",
)


def project_events(t: pa.Table) -> pa.Table:
    """events batch -> (key, clock, token) [+ chunk_seq when present]."""
    et = t["event_type"]
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    d = et.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    lut = np.asarray([EVENT_TOKENS.get(u, 0) for u in uniq], dtype=np.int64)
    from dataflowkit_ray.config import np_col

    tok = lut[np_col(d.indices)]
    cols = {
        "key": pc.cast(t["user_id"], pa.int64()),
        "clock": pc.cast(t["ts"], pa.int64()),
        "token": pa.array(tok),
    }
    if "chunk_seq" in t.column_names:
        cols["chunk_seq"] = pc.cast(t["chunk_seq"], pa.int64())
    if "_chunk_row" in t.column_names:
        cols["_chunk_row"] = pc.cast(t["_chunk_row"], pa.int64())
    return pa.table(cols)


def make_chunk_process(
    shard_groups: list[list],
    n_shards: int,
    epoch: int,
    project,
    late_floor: int | None = None,
):
    """Per-chunk task body (``MicroBatchSource.run_epoch``): project the
    chunk's rows and route them to shard actors DIRECTLY — the task is
    the data plane; the driver never holds rows.

    One ``stage`` call per (chunk, shard), keyed by ``(chunk_seq, first
    _chunk_row)`` — deterministic, so a retried task re-sends the same
    keys harmlessly.  ``shard_groups`` is a list of actor LISTS: every
    actor in group i receives shard i's sub-batch (e.g. session + CEP
    shards).  Blocks on the acks so epoch consumption implies delivery.

    ``late_floor``: the watermark committed at the end of the PREVIOUS
    epoch.  Rows with ``clock < late_floor`` are LATE — sessions at or
    before that clock may already be closed and sunk, so admitting them
    would mint spurious second sessions.  They are dropped here (counted
    in the ack's ``late``) exactly like ``WindowStateShard.late_rows``
    in the windowed runner.  On an in-order stream this mask never
    fires (the watermark trails every unread chunk's first clock); it
    exists for ``discover=`` streams where a newly-arrived file may
    carry clocks older than work already committed."""
    from dataflowkit_ray.stages.windows import bucket_of
    from dataflowkit_ray.state.store import table_to_bytes

    def process(spec: dict, t: pa.Table) -> dict:
        refs = []
        late = 0
        n_rows = len(t)
        if n_rows:
            sub = project(t)
            if late_floor is not None:
                # fill_null(True): a NULL clock cannot be placed on the
                # event timeline, so once a floor exists it is dropped AS
                # late (and counted) — Table.filter's null-drops would
                # otherwise vanish such rows without accounting
                late_mask = pc.fill_null(
                    pc.less(sub["clock"], pa.scalar(late_floor, pa.int64())), True
                )
                late = int(pc.sum(late_mask).as_py() or 0)
                if late:
                    sub = sub.filter(pc.invert(late_mask))
                    if not len(sub):
                        return {"rows": n_rows, "late": late}
            sh = bucket_of(sub["key"], n_shards)
            payload = sub.drop_columns(
                [c for c in ("chunk_seq", "_chunk_row") if c in sub.column_names]
            )
            ckey = (spec["seq"], spec["global_row_start"])
            for shard_i in range(n_shards):
                ms = sh == shard_i
                if not ms.any():
                    continue
                blob = table_to_bytes(payload.filter(pa.array(ms)))
                for group in shard_groups:
                    refs.append(group[shard_i].stage.remote(epoch, ckey, blob))
        ray.get(refs)
        return {"rows": n_rows, "late": late}

    return process


class EventStreamRunner:
    def __init__(
        self,
        files: list[str],
        work_dir: str,
        gap: int = 30 * 60 * 1_000_000,  # 30 min in micros
        n_shards: int = 4,
        pattern=None,
        n_partitions: int = 4,
        chunks_per_epoch: int = 1,
        target_rows: int = 128,
        discover: str | None = None,
    ):
        self.gap = gap
        self.n_shards = n_shards
        self.pattern_steps, self.pattern_mode = pattern or DEFAULT_EVENT_PATTERN
        self._source_kwargs = dict(
            n_partitions=n_partitions,
            chunks_per_epoch=chunks_per_epoch,
            target_rows=target_rows,
            columns=["ts", "user_id", "event_type"],
            clock_column="ts",
            discover=discover,
        )
        self.source = MicroBatchSource(files, **self._source_kwargs)
        self.session_sink = ExactlyOnceSink(f"{work_dir}/sessions", n_sink_parts=4)
        self.match_sink = ExactlyOnceSink(f"{work_dir}/matches", n_sink_parts=4)
        self.ckpt = CheckpointStore(f"{work_dir}/checkpoint")

    def run(self, max_epochs: int | None = None, on_epoch=None) -> dict:
        from dataflowkit_ray.state.store import shard_pool

        # session-scoped reusable pools: fresh-actor spawn + first-kernel
        # warmup cost ~0.5 s per query at every scale (pure fixed cost)
        sessions = shard_pool(
            SessionStateShard, "sessions", self.n_shards, self.gap
        )
        ceps = shard_pool(
            CEPStateShard, "cep", self.n_shards, self.pattern_steps, self.pattern_mode
        )
        latest = self.ckpt.latest()
        finalized = False
        if latest is not None:
            meta = self.ckpt.read_meta(latest)
            offsets = meta["offsets"]
            epoch = meta["epoch"] + 1
            finalized = meta.get("final", False)
            prev_wm = meta.get("watermark")
            # arrival order is stream identity (see StreamingRunner.run)
            if meta.get("files") and meta["files"] != self.source.files:
                self.source = MicroBatchSource(
                    meta["files"], preserve_file_order=True, **self._source_kwargs
                )
            ray.get(
                [
                    s.restore.remote(sn)
                    for s, sn in zip(
                        sessions, self.ckpt.read_state(latest, "sessions", self.n_shards)
                    )
                ]
                + [
                    c.restore.remote(sn)
                    for c, sn in zip(
                        ceps, self.ckpt.read_state(latest, "cep", self.n_shards)
                    )
                ]
            )
        else:
            offsets = self.source.initial_offsets()
            epoch = 0
            prev_wm = None

        ran = 0
        late_events = 0
        while True:
            # runtime work discovery between epochs (no-op w/o discover=;
            # a finalized stream is closed — see StreamingRunner.run)
            if not finalized:
                self.source.rescan()
            if self.source.done(offsets):
                break
            if max_epochs is not None and ran >= max_epochs:
                break
            specs, new_offsets = self.source.next_slice(offsets)
            # data plane: one task per chunk -> project -> route to shard
            # actors INSIDE the task; the driver sees only ack dicts
            acks = self.source.run_epoch(
                specs,
                make_chunk_process(
                    [sessions, ceps], self.n_shards, epoch, project_events,
                    late_floor=prev_wm,
                ),
            )
            late_events += sum(a.get("late", 0) for a in acks)
            ray.get([s.seal.remote(epoch) for s in sessions])
            # each CEP shard writes its OWN match sink part (rows never
            # transit the driver); only part metadata comes back
            match_parts = ray.get(
                [
                    c.seal_to_sink.remote(epoch, self.match_sink.parts_dir, i)
                    for i, c in enumerate(ceps)
                ]
            )

            offsets = new_offsets
            # MONOTONE watermark: a file discovered mid-run may carry
            # clocks older than the committed frontier, which would drag
            # min-over-partitions backwards; a regressed wm in manifests/
            # checkpoints is meaningless (work behind it is already
            # sunk), so clamp to the last committed value — the rows
            # behind it were dropped as late above
            wm = self.source.watermark_clock(offsets)
            if prev_wm is not None:
                wm = max(wm, prev_wm)
            self._commit(epoch, wm, offsets, sessions, ceps, match_parts)
            prev_wm = wm
            if on_epoch is not None:
                on_epoch(epoch, {"chunks": len(specs)})
            ran += 1
            epoch += 1

        if self.source.done(offsets) and not finalized:
            # max_epochs bounds INGEST epochs only — once the source is
            # done the flush must run, else gap-open tail sessions are
            # silently never emitted despite a "complete" summary
            self._commit(epoch, 1 << 62, offsets, sessions, ceps, [], final=True)
            epoch += 1

        stats = ray.get([s.stats.remote() for s in sessions])
        return {
            "epochs": epoch,
            "late_events": late_events,
            "open_sessions": sum(s["open_sessions"] for s in stats),
            "sessions_out": sum(
                self.session_sink.manifest(e)["rows"]
                for e in self.session_sink.committed_epochs()
            ),
            "matches_out": sum(
                self.match_sink.manifest(e)["rows"]
                for e in self.match_sink.committed_epochs()
            ),
        }

    def _commit(self, epoch, wm, offsets, sessions, ceps, match_parts, final=False):
        """Publish the epoch: every shard writes its own session/match
        sink part (``seal_to_sink`` pattern — closed-session volume is
        not driver-sized at scale); the driver assembles MANIFESTS only,
        then checkpoints."""
        extra = {"offsets": offsets, "watermark": int(wm), "final": final}
        sess_parts = ray.get(
            [
                s.pop_closed_to_sink.remote(
                    wm, self.session_sink.parts_dir, epoch, i
                )
                for i, s in enumerate(sessions)
            ]
        )
        self.session_sink.publish_epoch(
            epoch, [p for p in sess_parts if p], extra=extra
        )
        self.match_sink.publish_epoch(
            epoch, [p for p in match_parts if p], extra=extra
        )
        self.ckpt.write(
            epoch,
            {"offsets": offsets, "watermark": int(wm), "final": final,
             "files": self.source.files},
            {
                "sessions": ray.get([s.snapshot.remote() for s in sessions]),
                "cep": ray.get([c.snapshot.remote() for c in ceps]),
            },
        )
        self.ckpt.prune()
