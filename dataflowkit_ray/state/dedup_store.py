"""Streaming exact-dedup state shard: keyed seen-hash store across
micro-batch epochs.

The web-scale-ingest version of :func:`~dataflowkit_ray.stages.dedup.
exact_dedup`: documents arrive epoch by epoch, each shard owns a bucket
of the 128-bit content-key space (routed on lane 1, keyed on both
lanes) and keeps (min doc_id, copy count) per distinct key — the
streaming analog of the reference's
idempotent Upsert-on-content-hash (``/root/reference/storage/
mongo.go:70-72``; SURVEY.md §2.6 O3).  After the final epoch, every
shard writes its own sorted sink part; the FINAL output is identical to
the batch operator (asserted by the ``streaming_dedup`` DuckDB oracle,
which is the same SQL as ``exact_dedup``).

State size is O(distinct keys) per shard — the inherent memory of
exact streaming dedup; shard count scales it horizontally (24 bytes per
distinct doc per shard).  Checkpoints snapshot the full per-shard array
per epoch; at very long streams a delta/compaction scheme (or the diskv
TTL backend in ``state/store.py``) would amortize that — documented
trade for bit-identical crash-resume.

**Retention knob** (``retention_epochs``): an unbounded stream cannot
keep every key forever, so the knob turns exact dedup into WINDOWED
dedup with stated semantics: a key not seen for ``retention_epochs``
epochs is FINAL — its (min doc_id, n_copies) row is emitted to the sink
at eviction time, its state freed, and a later re-occurrence of the
same content starts a NEW row (duplicates farther apart than the
retention window are not folded — the standard streaming-dedup trade,
cf. Flink state TTL).  ``retention_epochs=None`` (default) keeps the
exact, grows-with-distinct-keys behavior; the ``streaming_dedup``
oracle runs that exact mode.  Eviction is deterministic in (state,
epoch), so crash-replay rewrites identical parts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from dataflowkit_ray.state.store import StagingBuffer, np_int64


@ray.remote
class DedupStateShard:
    def __init__(self, retention_epochs: int | None = None):
        # (lane1, lane2) 128-bit content key -> [min doc_id, copies,
        # last_seen_epoch]
        self.state: dict[tuple[int, int], list[int]] = {}
        self.retention = retention_epochs
        self.last_applied: int = -1
        self.staging = StagingBuffer()
        from dataflowkit_ray.state.store import warm_arrow_kernels

        warm_arrow_kernels()

    def reset(self, *args) -> None:
        self.__init__(*args)

    def stage(self, epoch: int, chunk_seq, blob: bytes) -> None:
        """Idempotent (epoch, chunk) staging — map_batches tasks are the
        data plane; the driver only ever calls :meth:`seal`."""
        self.staging.stage(epoch, chunk_seq, blob, self.last_applied)

    def seal(self, epoch: int) -> dict:
        """Apply every staged chunk of the epoch; returns counters."""
        t = self.staging.drain(epoch)
        if epoch <= self.last_applied:
            return {"rows": 0}
        self.last_applied = epoch
        if t is None:
            return {"rows": 0}
        self._merge_table(t, epoch)
        return {"rows": len(t)}

    def seal_evict_to_sink(
        self, epoch: int, parts_dir: str, part_idx: int
    ) -> dict | None:
        """Seal the epoch, then (retention mode) evict every key not
        seen within ``retention_epochs`` and write the evicted rows as
        this shard's epoch sink part — emit-on-evict windowed-dedup
        semantics (module docstring).  Deterministic in (state, epoch):
        a crash-replay recomputes the identical part."""
        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        self.seal(epoch)
        if self.retention is None:
            return None
        cutoff = epoch - self.retention
        expired = [k for k, v in self.state.items() if v[2] <= cutoff]
        if not expired:
            return None
        rows = sorted((self.state[k][0], self.state[k][1]) for k in expired)
        for k in expired:
            del self.state[k]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "n_copies": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        return write_sink_part(parts_dir, epoch, part_idx, t)

    def _merge_table(self, t: pa.Table, epoch: int) -> None:
        """Vectorized epoch merge: one in-batch (128-bit key -> min id,
        count) reduction in numpy, then Python only over DISTINCT keys
        for the state-dict update (the session-shard idiom).  Identity =
        BOTH hash lanes (a 64-bit key false-merges at corpus scale)."""
        n = len(t)
        if n == 0:
            return
        h = np_int64(t["key"])
        h2 = np_int64(t["key2"])
        d = np_int64(t["doc_id"])
        order = np.lexsort((d, h2, h))
        h, h2, d = h[order], h2[order], d[order]
        first = np.ones(n, dtype=bool)
        first[1:] = (h[1:] != h[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, n))
        mins = d[starts]  # sorted by (h, h2, d): first row per key = min id
        st = self.state
        for hh, hh2, mi, c in zip(
            h[starts].tolist(), h2[starts].tolist(), mins.tolist(), counts.tolist()
        ):
            cur = st.get((hh, hh2))
            if cur is None:
                st[(hh, hh2)] = [mi, int(c), epoch]
            else:
                if mi < cur[0]:
                    cur[0] = mi
                cur[1] += int(c)
                cur[2] = epoch

    def final_to_sink(self, parts_dir: str, epoch: int, part_idx: int) -> dict | None:
        """Write this shard's (doc_id, n_copies) rows, sorted by doc_id,
        as its own deterministic sink part — the global aggregate is only
        final at stream end, so emission happens exactly once, here."""
        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        if not self.state:
            return None
        rows = sorted((v[0], v[1]) for v in self.state.values())
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "n_copies": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        return write_sink_part(parts_dir, epoch, part_idx, t)

    def snapshot(self) -> dict:
        items = self.state.items()
        return {
            "last_applied": self.last_applied,
            "h": np.fromiter((k[0] for k, _ in items), np.int64, len(self.state)),
            "h2": np.fromiter((k[1] for k, _ in items), np.int64, len(self.state)),
            "mid": np.fromiter((v[0] for _, v in items), np.int64, len(self.state)),
            "cnt": np.fromiter((v[1] for _, v in items), np.int64, len(self.state)),
            "seen": np.fromiter((v[2] for _, v in items), np.int64, len(self.state)),
        }

    def restore(self, snap: dict) -> None:
        self.last_applied = snap["last_applied"]
        self.state = {
            (int(k), int(k2)): [int(m), int(c), int(e)]
            for k, k2, m, c, e in zip(
                snap["h"], snap["h2"], snap["mid"], snap["cnt"], snap["seen"]
            )
        }

    def stats(self) -> dict:
        return {
            "distinct": len(self.state),
            "last_applied": self.last_applied,
            "retention": self.retention,
        }
