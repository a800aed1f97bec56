"""Streaming exact-dedup runner: micro-batch document ingest with a
persistent seen-hash store, exactly-once final output, checkpointed
crash-resume.

The op a 100-TB web-crawl ingest actually runs: documents stream in
epoch by epoch, duplicates are folded into (min doc_id, copy count)
keyed state sharded across actors by content hash, and the FINAL sink
equals the batch :func:`~dataflowkit_ray.stages.dedup.exact_dedup`
bit-for-bit (same DuckDB oracle).  Same task->shard data plane as the
session/CEP runners (``event_runner.make_chunk_process``): chunk tasks
hash + route rows directly to shard actors; the driver moves acks,
manifests and checkpoints only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from dataflowkit_ray.checkpoint import CheckpointStore
from dataflowkit_ray.event_runner import make_chunk_process
from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink
from dataflowkit_ray.sources.microbatch import MicroBatchSource
from dataflowkit_ray.state.dedup_store import DedupStateShard


def project_docs(t: pa.Table) -> pa.Table:
    """documents batch -> (key, key2 = 128-bit content hash lanes,
    doc_id) [+ chunk cols].  24 bytes per row enter the shard route —
    never the text.  Routing buckets on lane 1 only (balance), identity
    groups on BOTH lanes (see stages/dedup.py module docstring: 64-bit
    keys false-merge at corpus scale)."""
    from dataflowkit_ray.tokenize import full_hash128

    h1, h2 = full_hash128(t["text"])
    cols = {
        "key": pa.array(h1.astype(np.int64)),
        "key2": pa.array(h2.astype(np.int64)),
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
    }
    for c in ("chunk_seq", "_chunk_row"):
        if c in t.column_names:
            cols[c] = pc.cast(t[c], pa.int64())
    return pa.table(cols)


class DedupStreamRunner:
    def __init__(
        self,
        files: list[str],
        work_dir: str,
        n_shards: int = 4,
        n_partitions: int = 4,
        chunks_per_epoch: int = 1,
        target_rows: int = 128,
        discover: str | None = None,
        retention_epochs: int | None = None,
    ):
        self.n_shards = n_shards
        # None = exact dedup (state grows with distinct keys); an int
        # turns on bounded windowed dedup with emit-on-evict semantics
        # (state/dedup_store.py module docstring)
        self.retention_epochs = retention_epochs
        self._source_kwargs = dict(
            n_partitions=n_partitions,
            chunks_per_epoch=chunks_per_epoch,
            target_rows=target_rows,
            columns=["doc_id", "text"],
            discover=discover,
        )
        self.source = MicroBatchSource(files, **self._source_kwargs)
        self.sink = ExactlyOnceSink(f"{work_dir}/dedup", n_sink_parts=n_shards)
        self.ckpt = CheckpointStore(f"{work_dir}/checkpoint")

    def run(self, max_epochs: int | None = None, on_epoch=None) -> dict:
        from dataflowkit_ray.state.store import shard_pool

        shards = shard_pool(
            DedupStateShard, "dedup", self.n_shards, self.retention_epochs
        )
        latest = self.ckpt.latest()
        finalized = False
        if latest is not None:
            meta = self.ckpt.read_meta(latest)
            offsets = meta["offsets"]
            epoch = meta["epoch"] + 1
            finalized = meta.get("final", False)
            # arrival order is stream identity (see StreamingRunner.run)
            if meta.get("files") and meta["files"] != self.source.files:
                self.source = MicroBatchSource(
                    meta["files"], preserve_file_order=True, **self._source_kwargs
                )
            ray.get(
                [
                    s.restore.remote(sn)
                    for s, sn in zip(
                        shards, self.ckpt.read_state(latest, "dedup", self.n_shards)
                    )
                ]
            )
        else:
            offsets = self.source.initial_offsets()
            epoch = 0

        ran = 0
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
            self.source.run_epoch(
                specs,
                make_chunk_process([shards], self.n_shards, epoch, project_docs),
            )
            if self.retention_epochs is not None:
                # emit-on-evict: expired keys become this epoch's sink
                # parts (each shard writes its own; manifests only here)
                parts = ray.get(
                    [
                        s.seal_evict_to_sink.remote(
                            epoch, self.sink.parts_dir, i
                        )
                        for i, s in enumerate(shards)
                    ]
                )
                self.sink.publish_epoch(
                    epoch, [p for p in parts if p], extra={"offsets": new_offsets}
                )
            else:
                ray.get([s.seal.remote(epoch) for s in shards])
            offsets = new_offsets
            self.ckpt.write(
                epoch,
                {"offsets": offsets, "final": False,
                 "files": self.source.files},
                {"dedup": ray.get([s.snapshot.remote() for s in shards])},
            )
            self.ckpt.prune()
            if on_epoch is not None:
                on_epoch(epoch, {"chunks": len(specs)})
            ran += 1
            epoch += 1

        if self.source.done(offsets) and not finalized:
            # final flush: each shard writes its own sorted sink part;
            # only part metadata returns for the manifest
            parts = ray.get(
                [
                    s.final_to_sink.remote(self.sink.parts_dir, epoch, i)
                    for i, s in enumerate(shards)
                ]
            )
            self.sink.publish_epoch(
                epoch, [p for p in parts if p], extra={"offsets": offsets}
            )
            self.ckpt.write(
                epoch,
                {"offsets": offsets, "final": True},
                {"dedup": ray.get([s.snapshot.remote() for s in shards])},
            )
            self.ckpt.prune()
            epoch += 1

        stats = ray.get([s.stats.remote() for s in shards])
        return {
            "epochs": epoch,
            "distinct": sum(s["distinct"] for s in stats),
            "rows_out": sum(
                self.sink.manifest(e)["rows"] for e in self.sink.committed_epochs()
            ),
        }
