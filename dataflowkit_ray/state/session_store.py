"""Session-window state shard: gap-merge sessions that span micro-batch
epochs — the trickiest state interaction called out in SURVEY.md §7.

Correctness contract: per key, events arrive in CLOCK ORDER across
epochs.  The micro-batch source guarantees this — ``next_slice`` advances
every partition in lockstep, so each epoch covers a contiguous clock
range of the (clock-sorted) input.  Under that contract:

* an in-batch gap > G definitively closes the open session (no later
  event can fall inside it);
* an open session is closed by time when ``watermark - last_clock > G``
  (no partition can still deliver an event within the gap).

A fully out-of-order merge would need re-openable pending sessions —
out of scope; the contract is asserted in ``merge`` (monotonicity check).
Session id = first clock of the session (data-derived, replay-stable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from dataflowkit_ray.state.store import (
    StagingBuffer,
    bytes_to_table,
    np_int64,
    table_to_bytes,
)


@ray.remote
class SessionStateShard:
    def __init__(self, gap: int):
        self.gap = gap
        # key -> [session_start, last_clock, n_events]
        self.open: dict[int | str, list[int]] = {}
        self.pending: list[tuple[int | str, int, int, int]] = []  # closed, unemitted
        self.last_applied: int = -1  # epochs strictly increase; scalar guard
        # out-of-order events are DROPPED and counted (mirroring
        # WindowStateShard.late_rows) — raising here would wedge the
        # runner in a crash-loop on resume (the restored state replays
        # the same batch and re-raises)
        self.ooo_dropped: int = 0
        self.staging = StagingBuffer()
        from dataflowkit_ray.state.store import warm_arrow_kernels

        warm_arrow_kernels()

    def reset(self, *args) -> None:
        """Re-initialize for pool reuse (see ``store.shard_pool``)."""
        self.__init__(*args)

    def stage(self, epoch: int, chunk_seq: int, blob: bytes) -> None:
        """Idempotent (epoch, chunk) staging — the data-plane entry point
        for map_batches tasks; the driver only calls :meth:`seal`."""
        self.staging.stage(epoch, chunk_seq, blob, self.last_applied)

    def seal(self, epoch: int) -> None:
        """Apply every staged chunk of the epoch in chunk order."""
        t = self.staging.drain(epoch)
        if epoch <= self.last_applied:
            return
        self.last_applied = epoch
        if t is not None:
            self._merge_table(t)

    def merge(self, epoch: int, blob: bytes) -> None:
        if epoch <= self.last_applied:
            return
        self.last_applied = epoch
        self._merge_table(bytes_to_table(blob))

    def _merge_table(self, t: pa.Table) -> None:
        """Apply one epoch's events, fully vectorized.

        Per-event work is numpy (one lexsort + segment arithmetic over
        (key, clock)); Python touches only DISTINCT keys (state-dict
        I/O) — a per-event Python loop here was the last row-at-a-time
        path on the streaming ingest side.  Semantics are identical to
        the scalar definition (asserted against a scalar reference in
        ``tests/test_session_merge.py``): events below a key's open-
        session last clock are dropped+counted (out-of-order), a gap
        larger than ``self.gap`` closes the running session, the final
        session of each key stays open."""
        n = len(t)
        if n == 0:
            return
        k_col = t["key"]
        if isinstance(k_col, pa.ChunkedArray):
            k_col = k_col.combine_chunks()
        d = k_col.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        g = np_int64(d.indices)
        cl = np_int64(t["clock"])
        order = np.lexsort((cl, g))
        g, cl = g[order], cl[order]

        G = len(uniq)
        NEG = np.int64(-(1 << 62))
        open_last = np.full(G, NEG, dtype=np.int64)
        open_start = np.zeros(G, dtype=np.int64)
        open_n = np.zeros(G, dtype=np.int64)
        has_open = np.zeros(G, dtype=bool)
        for gi, k in enumerate(uniq):
            st = self.open.get(k)
            if st is not None:
                has_open[gi] = True
                open_start[gi], open_last[gi], open_n[gi] = st

        # out-of-order drop: below the open session's last clock (within
        # the batch clocks are sorted ascending, so intra-batch events
        # can never be out of order relative to each other)
        ooo = cl < open_last[g]
        self.ooo_dropped += int(ooo.sum())
        keep = ~ooo
        g, cl = g[keep], cl[keep]
        m = len(g)
        if m == 0:
            return

        first = np.ones(m, dtype=bool)
        first[1:] = g[1:] != g[:-1]
        prev = np.empty(m, dtype=np.int64)
        prev[1:] = cl[:-1]
        prev[first] = np.where(has_open[g[first]], open_last[g[first]], cl[first])
        gap_break = (cl - prev) > self.gap
        newsess = gap_break | (first & ~has_open[g])

        # a first event that gap-breaks closes the OPEN session with no
        # batch events in it
        for i in np.nonzero(first & gap_break & has_open[g])[0]:
            gi = int(g[i])
            self.pending.append(
                (uniq[gi], int(open_start[gi]), int(open_last[gi]), int(open_n[gi]))
            )

        # session segments: boundaries at every new session start or at a
        # group's continuation of its open session
        sfirst = newsess | first
        s_idx = np.nonzero(sfirst)[0]
        s_len = np.diff(np.append(s_idx, m))
        s_g = g[s_idx]
        cont = first[s_idx] & ~newsess[s_idx]  # continues the open session
        s_start = np.where(cont, open_start[s_g], cl[s_idx])
        s_last = cl[s_idx + s_len - 1]
        s_count = s_len + np.where(cont, open_n[s_g], 0)
        glast = np.ones(len(s_idx), dtype=bool)
        glast[:-1] = s_g[1:] != s_g[:-1]  # each group's final session

        for si in np.nonzero(~glast)[0]:
            self.pending.append(
                (uniq[int(s_g[si])], int(s_start[si]), int(s_last[si]), int(s_count[si]))
            )
        for si in np.nonzero(glast)[0]:
            self.open[uniq[int(s_g[si])]] = [
                int(s_start[si]),
                int(s_last[si]),
                int(s_count[si]),
            ]

    def _pop_closed_table(self, watermark: int) -> pa.Table:
        out = list(self.pending)
        self.pending = []
        for k in sorted(self.open, key=lambda x: (str(x))):
            st = self.open[k]
            if watermark - st[1] > self.gap:
                out.append((k, st[0], st[1], st[2]))
                del self.open[k]
        out.sort(key=lambda r: (str(r[0]), r[1]))
        key_type = pa.int64() if out and isinstance(out[0][0], int) else pa.string()
        return pa.table(
            {
                "key": pa.array([r[0] for r in out], key_type),
                "session_id": pa.array([r[1] for r in out], pa.int64()),
                "session_end": pa.array([r[2] for r in out], pa.int64()),
                "n_events": pa.array([r[3] for r in out], pa.int64()),
            }
        )

    def pop_closed(self, watermark: int) -> bytes:
        """Emit pending sessions + open sessions timed out by watermark."""
        return table_to_bytes(self._pop_closed_table(watermark))

    def pop_closed_to_sink(
        self, watermark: int, parts_dir: str, epoch: int, part_idx: int
    ) -> dict | None:
        """Write this shard's closed sessions as its OWN deterministic
        sink part (the ``JoinStateShard.seal_to_sink`` pattern,
        ``state/store.py``): rows never visit the driver, which gets
        back only part metadata for the manifest — at volume the
        per-epoch closed-session table is not driver-sized."""
        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        t = self._pop_closed_table(watermark)
        if not len(t):
            return None
        return write_sink_part(parts_dir, epoch, part_idx, t)

    def snapshot(self) -> dict:
        return {
            "gap": self.gap,
            "open": {k: list(v) for k, v in self.open.items()},
            "pending": list(self.pending),
            "last_applied": self.last_applied,
            "ooo_dropped": self.ooo_dropped,
        }

    def restore(self, snap: dict) -> None:
        self.gap = snap["gap"]
        self.open = {k: list(v) for k, v in snap["open"].items()}
        self.pending = [tuple(p) for p in snap["pending"]]
        self.last_applied = snap["last_applied"]
        self.ooo_dropped = snap.get("ooo_dropped", 0)

    def stats(self) -> dict:
        return {
            "open_sessions": len(self.open),
            "pending": len(self.pending),
            "ooo_dropped": self.ooo_dropped,
        }


@ray.remote
class CEPStateShard:
    """Cross-batch NFA state: one StreamingMatcher per key.

    Token events (key, clock, token) arrive per epoch in per-key clock
    order (same contract as sessions).  Completed matches are emitted as
    (key, start_seq, end_seq); partial runs persist across epochs in the
    matcher's run list (SURVEY.md §2.10 "cross-batch partial matches")."""

    def __init__(self, pattern_steps: list[dict], mode: str):
        from dataflowkit_ray.stages.cep import Pattern, Step

        self.pattern = Pattern(
            steps=tuple(
                Step(
                    literal=s.get("literal"),
                    any_of=tuple(s["any_of"]) if s.get("any_of") else None,
                    residue=tuple(s["residue"]) if s.get("residue") else None,
                    predicate=s.get("predicate"),  # plugin steps work streamed
                    max_gap=s.get("max_gap", 0),
                )
                for s in pattern_steps
            ),
            mode=mode,
        )
        self.matchers: dict = {}
        self.last_applied: int = -1
        self.staging = StagingBuffer()
        from dataflowkit_ray.state.store import warm_arrow_kernels

        warm_arrow_kernels()

    def reset(self, *args) -> None:
        self.__init__(*args)

    def stage(self, epoch: int, chunk_seq: int, blob: bytes) -> None:
        self.staging.stage(epoch, chunk_seq, blob, self.last_applied)

    def _seal_table(self, epoch: int) -> pa.Table:
        t = self.staging.drain(epoch)
        if epoch <= self.last_applied:
            t = None
        else:
            self.last_applied = epoch
        if t is None:
            return self._empty_matches()
        return self._feed_table(t)

    def seal(self, epoch: int) -> bytes:
        """Apply staged chunks in chunk order; returns the completed
        matches of the epoch (small: bounded by match rate)."""
        return table_to_bytes(self._seal_table(epoch))

    def seal_to_sink(
        self, epoch: int, parts_dir: str, part_idx: int
    ) -> dict | None:
        """Apply the epoch AND write this shard's completed matches as
        its own sink part, sorted (key, start_seq) for deterministic
        replay — match rows never transit the driver."""
        import pyarrow.compute as pc

        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        t = self._seal_table(epoch)
        if not len(t):
            return None
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("key", "ascending"), ("start_seq", "ascending")]
            )
        )
        return write_sink_part(parts_dir, epoch, part_idx, t)

    @staticmethod
    def _empty_matches() -> pa.Table:
        return pa.table(
            {
                "key": pa.array([], pa.int64()),
                "start_seq": pa.array([], pa.int64()),
                "end_seq": pa.array([], pa.int64()),
            }
        )

    def feed(self, epoch: int, blob: bytes) -> bytes:
        if epoch <= self.last_applied:
            return table_to_bytes(self._empty_matches())
        self.last_applied = epoch
        return table_to_bytes(self._feed_table(bytes_to_table(blob)))

    def _feed_table(self, t: pa.Table) -> pa.Table:
        from dataflowkit_ray.stages.cep import StreamingMatcher

        keys = t["key"].to_pylist()
        clocks = np_int64(t["clock"])
        tokens = np_int64(t["token"])
        order = np.lexsort((clocks, np.asarray([hash(k) for k in keys])))
        out_k, out_s, out_e = [], [], []
        for i in order:
            k = keys[i]
            m = self.matchers.get(k)
            if m is None:
                m = self.matchers[k] = StreamingMatcher(self.pattern)
            for s, e in m.feed(int(tokens[i]), int(clocks[i])):
                out_k.append(k)
                out_s.append(s)
                out_e.append(e)
        # evict keys with no live partial runs: actor memory and snapshot
        # size track LIVE NFA state, not every key ever seen
        for k in [k for k, m in self.matchers.items() if not m.runs]:
            del self.matchers[k]
        key_type = pa.string() if out_k and isinstance(out_k[0], str) else pa.int64()
        return pa.table(
            {
                "key": pa.array(out_k, key_type),
                "start_seq": pa.array(out_s, pa.int64()),
                "end_seq": pa.array(out_e, pa.int64()),
            }
        )

    def snapshot(self) -> dict:
        from dataclasses import asdict

        return {
            "last_applied": self.last_applied,
            "runs": {
                k: [asdict(r) for r in m.runs] for k, m in self.matchers.items()
            },
        }

    def restore(self, snap: dict) -> None:
        from dataflowkit_ray.stages.cep import NFARun, StreamingMatcher

        self.last_applied = snap["last_applied"]
        self.matchers = {
            k: StreamingMatcher(self.pattern, [NFARun(**r) for r in runs])
            for k, runs in snap["runs"].items()
        }
