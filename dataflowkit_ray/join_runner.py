"""Stream-stream join runner: two micro-batched sources joined on
``doc_id`` in actor-pool hash state — the full streaming form of the
reference's details join (J1, SURVEY.md §2.4: parent rows hold a FK,
child rows arrive later, the merge emits when both sides are present).

Left stream: the token table derived from ``documents``; right stream:
``embeddings`` (vec_id ≡ doc_id).  The right source can LAG by a fixed
number of epochs — parents buffer in :class:`JoinStateShard` until their
child arrives, exactly the cross-payload buffering the reference does via
its KV store (``scrape/encoders.go:207-241``).  Output commits
exactly-once per epoch; join buffers snapshot into every checkpoint.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from dataflowkit_ray.checkpoint import CheckpointStore
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.sources.microbatch import MicroBatchSource
from dataflowkit_ray.state.store import JoinStateShard
from dataflowkit_ray.tokenize import tokenize_documents


class StreamJoinRunner:
    def __init__(
        self,
        left_files: list[str],
        right_files: list[str],
        work_dir: str,
        n_shards: int = 4,
        right_lag: int = 0,
        ttl_epochs: int = 64,  # bounded buffers: checkpoint size is
        # O(unmatched rows within TTL), not O(all rows ever seen)
        n_partitions: int = 4,
        chunks_per_epoch: int = 1,
        target_rows: int = 128,
    ):
        self.n_shards = n_shards
        self.right_lag = right_lag
        self.ttl = ttl_epochs
        self.left = MicroBatchSource(
            left_files,
            n_partitions=n_partitions,
            chunks_per_epoch=chunks_per_epoch,
            target_rows=target_rows,
            columns=["doc_id", "text", "source"],
        )
        self.right = MicroBatchSource(
            right_files,
            n_partitions=n_partitions,
            chunks_per_epoch=chunks_per_epoch,
            target_rows=target_rows,
            columns=["vec_id", "label"],
        )
        self.sink = ExactlyOnceSink(f"{work_dir}/out", n_sink_parts=4)
        self.ckpt = CheckpointStore(f"{work_dir}/checkpoint")

    def _route_epoch(self, source, specs, project, shards, epoch, side) -> None:
        """Data plane: one task per chunk projects its rows and pushes
        them straight to the join shards (idempotent per (epoch, side,
        chunk key)); the driver consumes only ack dicts."""
        from dataflowkit_ray.stages.windows import bucket_of
        from dataflowkit_ray.state.store import table_to_bytes

        n_shards = self.n_shards

        def process(spec: dict, t: pa.Table) -> dict:
            refs = []
            n = len(t)
            if n:
                sub = project(t)
                sh = bucket_of(sub["doc_id"], n_shards)
                payload = sub.drop_columns(
                    [
                        c
                        for c in ("chunk_seq", "_chunk_row")
                        if c in sub.column_names
                    ]
                )
                ckey = (spec["seq"], spec["global_row_start"])
                for i in range(n_shards):
                    ms = sh == i
                    if not ms.any():
                        continue
                    refs.append(
                        shards[i].stage.remote(
                            epoch,
                            side,
                            ckey,
                            table_to_bytes(payload.filter(pa.array(ms))),
                        )
                    )
            ray.get(refs)
            return {"rows": n}

        source.run_epoch(specs, process)

    def run(self, max_epochs: int | None = None) -> dict:
        from dataflowkit_ray.state.store import shard_pool

        shards = shard_pool(JoinStateShard, "join", self.n_shards)
        latest = self.ckpt.latest()
        if latest is not None:
            meta = self.ckpt.read_meta(latest)
            l_off, r_off = meta["left_offsets"], meta["right_offsets"]
            epoch = meta["epoch"] + 1
            ray.get(
                [
                    s.restore.remote(sn)
                    for s, sn in zip(
                        shards, self.ckpt.read_state(latest, "join", self.n_shards)
                    )
                ]
            )
        else:
            l_off = self.left.initial_offsets()
            r_off = self.right.initial_offsets()
            epoch = 0

        def proj_left(t: pa.Table) -> pa.Table:
            tok = tokenize_documents(t)
            out = tok.select(["doc_id", "n_tok", "source"]).append_column(
                "chunk_seq", pc.cast(t["chunk_seq"], pa.int64())
            )
            return out.append_column("_chunk_row", pc.cast(t["_chunk_row"], pa.int64()))

        def proj_right(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.cast(t["vec_id"], pa.string()),
                    "label": pc.cast(t["label"], pa.int32()),
                    "chunk_seq": pc.cast(t["chunk_seq"], pa.int64()),
                    "_chunk_row": pc.cast(t["_chunk_row"], pa.int64()),
                }
            )

        ran = 0
        while not (self.left.done(l_off) and self.right.done(r_off)):
            if max_epochs is not None and ran >= max_epochs:
                break
            l_specs, l_new = self.left.next_slice(l_off)
            if l_specs:
                self._route_epoch(self.left, l_specs, proj_left, shards, epoch, "left")

            if epoch >= self.right_lag:
                r_specs, r_new = self.right.next_slice(r_off)
                if r_specs:
                    self._route_epoch(
                        self.right, r_specs, proj_right, shards, epoch, "right"
                    )
            else:
                r_new = r_off

            # seal: each shard applies its staged epoch (lefts first, so
            # same-epoch pairs join) and writes its OWN sink part; only
            # part metadata returns to the driver
            parts = [
                p
                for p in ray.get(
                    [
                        s.seal_to_sink.remote(epoch, self.sink.parts_dir, i)
                        for i, s in enumerate(shards)
                    ]
                )
                if p is not None
            ]
            ray.get([s.expire.remote(epoch, self.ttl) for s in shards])

            self._commit(epoch, l_new, r_new, shards, parts)
            l_off, r_off = l_new, r_new
            ran += 1
            epoch += 1

        return {
            "epochs": epoch,
            "rows_out": sum(
                self.sink.manifest(e)["rows"] for e in self.sink.committed_epochs()
            ),
        }

    def _commit(self, epoch, l_off, r_off, shards, parts):
        self.sink.publish_epoch(
            epoch, parts, extra={"left_offsets": l_off, "right_offsets": r_off}
        )
        self.ckpt.write(
            epoch,
            {"left_offsets": l_off, "right_offsets": r_off},
            {"join": ray.get([s.snapshot.remote() for s in shards])},
        )
        self.ckpt.prune()


