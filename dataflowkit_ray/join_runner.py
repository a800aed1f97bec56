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
from dataflowkit_ray.state.store import JoinStateShard, bytes_to_table, table_to_bytes
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

    def _route(self, t: pa.Table) -> list[pa.Table | None]:
        from dataflowkit_ray.state.store import route_by_key

        return route_by_key(t, "doc_id", self.n_shards)

    def _epoch_table(self, source, specs, project) -> pa.Table:
        ds = source.read_epoch(specs).map_batches(project, batch_format="pyarrow")
        parts = [b for b in ds.iter_batches(batch_format="pyarrow") if len(b)]
        return pa.concat_tables(parts) if parts else None

    def run(self, max_epochs: int | None = None) -> dict:
        shards = [JoinStateShard.remote() for _ in range(self.n_shards)]
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
            return tok.select(["doc_id", "n_tok", "source"])

        def proj_right(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.cast(t["vec_id"], pa.string()),
                    "label": pc.cast(t["label"], pa.int32()),
                }
            )

        ran = 0
        while not (self.left.done(l_off) and self.right.done(r_off)):
            if max_epochs is not None and ran >= max_epochs:
                break
            l_specs, l_new = self.left.next_slice(l_off)
            lt = self._epoch_table(self.left, l_specs, proj_left) if l_specs else None

            if epoch >= self.right_lag:
                r_specs, r_new = self.right.next_slice(r_off)
                rt = (
                    self._epoch_table(self.right, r_specs, proj_right)
                    if r_specs
                    else None
                )
            else:
                r_new, rt = r_off, None

            # feed left fully first, then right: a pair arriving in the
            # same epoch joins immediately (right probes the fresh buffer)
            out_tables: list[pa.Table] = []
            for side, tbl in (("left", lt), ("right", rt)):
                if tbl is None:
                    continue
                refs = [
                    shard.probe_and_buffer.remote(epoch, side, table_to_bytes(sub))
                    for shard, sub in zip(shards, self._route(tbl))
                    if sub is not None
                ]
                for b in ray.get(refs):
                    if b:
                        out_tables.append(bytes_to_table(b))
            ray.get([s.expire.remote(epoch, self.ttl) for s in shards])

            self._commit(epoch, l_new, r_new, shards, out_tables)
            l_off, r_off = l_new, r_new
            ran += 1
            epoch += 1

        return {
            "epochs": epoch,
            "rows_out": sum(
                self.sink.manifest(e)["rows"] for e in self.sink.committed_epochs()
            ),
        }

    def _commit(self, epoch, l_off, r_off, shards, out_tables):
        import ray.data

        nonempty = [t for t in out_tables if len(t)]
        out = (
            pa.concat_tables(nonempty)
            if nonempty
            else pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "n_tok": pa.array([], pa.int32()),
                    "source": pa.array([], pa.string()),
                    "label": pa.array([], pa.int32()),
                }
            )
        )
        if len(out):
            out = out.take(
                pc.sort_indices(out, sort_keys=[("doc_id", "ascending")])
            )
        self.sink.commit_epoch(
            ray.data.from_arrow(out),
            epoch,
            extra={"left_offsets": l_off, "right_offsets": r_off},
        )
        self.ckpt.write(
            epoch,
            {"left_offsets": l_off, "right_offsets": r_off},
            {"join": ray.get([s.snapshot.remote() for s in shards])},
        )
        self.ckpt.prune()


