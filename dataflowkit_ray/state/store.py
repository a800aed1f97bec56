"""Hash-sharded keyed state-store actors.

The reference's run state is a mutex-guarded in-process map plus an
external KV for intermediate rows (``/root/reference/scrape/structure.go:79-95``,
``storage/storage.go:26-44``).  The engine splits it: transient blocks
live in Ray's object store; *keyed accumulator state* (open windows, join
buffers, cross-batch NFA runs) lives in a pool of shard actors, keyed by
``hash(key) % n_shards``, snapshot/restored per epoch for bit-identical
resume (SURVEY.md §2.8 "Incremental state").

Two actors:

* :class:`WindowStateShard` — per-(source, window_id) int64 metric
  accumulators with watermark-driven close and late-row accounting.
* :class:`JoinStateShard` — per-doc_id two-sided buffers with TTL in
  epochs: the cross-epoch half of the stream-stream join (J1, SURVEY.md
  §2.4); rows that meet within an epoch never reach these actors.

All payloads cross actor boundaries as Arrow IPC bytes (zero python-object
serialization of row data).
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc
import ray


def table_to_bytes(t: pa.Table, compression: str | None = "auto") -> bytes:
    """Arrow-IPC-serialize a shard message.

    ``compression`` resolution: explicit arg ("zstd" / "lz4" / None for
    force-uncompressed) > GRAFT_SHARD_IPC_COMPRESSION env var > engine
    config ``shard_ipc_compression``; the "auto" sentinel (default)
    means "consult env/config" — a plain None default could never
    express an explicit uncompressed override.  The env var is the
    cluster-facing switch because it reaches every worker/actor process
    (set before ray.init locally; runtime_env env_vars on a real
    cluster), whereas a driver-side config mutation is invisible to
    workers, which re-import their own config.  Default resolution is
    None: on one box the exchange is a memcpy and a codec only burns
    CPU; "zstd" shrinks the int-only partial/event payloads 5-6.7x for
    NIC-bound clusters (see config.py).  The stream is self-describing,
    so readers need no flag and mixed-codec senders coexist."""
    if compression == "auto":
        compression = os.environ.get("GRAFT_SHARD_IPC_COMPRESSION") or None
        if compression is None:
            from dataflowkit_ray.config import DEFAULT_CONFIG

            compression = DEFAULT_CONFIG.shard_ipc_compression
        if compression in ("", "none"):
            compression = None
    if compression not in (None, "zstd", "lz4"):
        # reject HERE with a readable message: a typo'd env var would
        # otherwise surface as an opaque pyarrow error inside remote
        # chunk tasks at the first exchange message
        raise ValueError(
            "shard IPC compression must be zstd | lz4 | none, got "
            f"{compression!r} (check GRAFT_SHARD_IPC_COMPRESSION)"
        )
    buf = io.BytesIO()
    opts = ipc.IpcWriteOptions(compression=compression) if compression else None
    with ipc.new_stream(buf, t.schema, options=opts) as w:
        w.write_table(t)
    return buf.getvalue()


def bytes_to_table(b: bytes) -> pa.Table:
    return ipc.open_stream(io.BytesIO(b)).read_all()


from dataflowkit_ray.config import np_col as np_int64  # pandas-free int view


def warm_arrow_kernels() -> None:
    """Touch the Arrow kernels the shard actors use, once, at actor
    construction: the FIRST dispatch of a compute kernel in a fresh
    process pays ~0.2-0.3 s of lazy initialization, which previously
    landed on the first epoch's seal/merge call (serialized behind the
    epoch barrier).  In ``__init__`` the cost overlaps actor spawn across
    the whole pool.  Nearly free when the process is already warm."""
    import pyarrow.compute as pc

    t = pa.table({"k": pa.array(["a", "b"]), "v": pa.array([2, 1], pa.int64())})
    t["k"].combine_chunks().dictionary_encode()
    pc.sort_indices(t, sort_keys=[("v", "ascending")])
    t.take(pa.array([0], pa.int64()))
    bytes_to_table(table_to_bytes(t))


_POOLS: dict = {}


def spawn_shard(actor_cls, *args):
    """Spawn one state shard with ``scheduling_strategy="SPREAD"``.

    Shard actors hold the engine's keyed state and receive every chunk
    task's Arrow partials: packed onto one node (Ray's default bin-
    packing) they would serialize on that node's NIC/object store at
    cluster scale.  SPREAD places the pool across nodes best-effort —
    a no-op on one node, load-balancing on many (asserted against a
    simulated two-node cluster in tests/test_placement.py).

    Broadcast note: ``ray.put`` objects referenced by spread actors are
    fetched once per NODE into that node's object store and shared by
    every actor/task there — spreading shards does not multiply
    broadcast traffic."""
    return actor_cls.options(scheduling_strategy="SPREAD").remote(*args)


def shard_pool(actor_cls, name: str, n: int, *args) -> list:
    """Session-scoped REUSABLE shard-actor pool.

    Spawning a shard pool per query cost ~0.5 s (actor process startup +
    first-kernel warmup) at EVERY scale — pure fixed overhead.  A pool is
    keyed by (name, n) and reused across runs in the same driver
    session; ``reset(*args)`` re-runs ``__init__`` so each run starts
    from empty state (resumed runs then ``restore`` their checkpoint on
    top, exactly as with fresh actors).  Staleness is detected two ways:
    a pool cached under a DIFFERENT Ray session (a ``ray.shutdown``/
    ``ray.init`` cycle invalidates every handle, and calling into a
    stale handle raises a plain ``Exception`` — not ``RayActorError`` —
    so exception-type sniffing cannot catch it) is dropped without being
    called; a same-session pool whose actors died raises
    ``RayActorError`` from ``reset`` and is respawned.  Any other reset
    failure (bad ctor args, a bug in ``reset``) propagates instead of
    silently leaking live actors.  The pool key includes the actor class
    so a name reuse across classes cannot hand back actors of the wrong
    type."""
    import ray

    # cluster identity must be per-CLUSTER, not per-job: get_job_id()
    # restarts from '01000000' after every ray.shutdown()/ray.init()
    # cycle (verified), so job id alone would collide across cycles and
    # hand back dead handles.  The GCS address changes with every local
    # cluster (fresh port); job id disambiguates drivers within one.
    ctx = ray.get_runtime_context()
    session = (getattr(ctx, "gcs_address", None), ctx.get_job_id())
    key = (actor_cls, name, n)
    cached = _POOLS.get(key)
    if cached is not None:
        pool_session, pool = cached
        if pool_session == session:
            try:
                ray.get([a.reset.remote(*args) for a in pool])
                return pool
            except ray.exceptions.RayActorError:
                # dead pool (killed actors) -> respawn.  Best-effort
                # kill in case only SOME actors died.
                for a in pool:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
        # else: handles from a previous Ray session — unusable, nothing
        # to kill (that session's actor processes are gone); respawn.
    pool = [spawn_shard(actor_cls, *args) for _ in range(n)]
    _POOLS[key] = (session, pool)
    return pool


class StagingBuffer:
    """Idempotent (epoch, chunk)-keyed staging of Arrow blobs inside a
    shard actor.

    This is what lets map_batches TASKS send epoch data to shard actors
    directly (the driver never touches rows): a retried/re-executed task
    re-sends the same deterministic chunk keys and simply overwrites
    identical bytes; ``drain`` concatenates once, in key order, when the
    driver seals the epoch.  Keys are ``(chunk_seq, first row id of the
    piece)`` so a chunk whose output block Ray split across tasks stages
    each piece separately instead of overwriting.  Staged data is NOT
    part of any checkpoint — a resumed epoch is re-sent from the
    source."""

    def __init__(self):
        self.staged: dict[int, dict] = {}

    def stage(self, epoch: int, chunk_key, blob: bytes, last_applied: int) -> None:
        if epoch <= last_applied:
            return
        self.staged.setdefault(epoch, {})[chunk_key] = blob

    def drain(self, epoch: int) -> pa.Table | None:
        for e in [e for e in self.staged if e < epoch]:
            del self.staged[e]
        blobs = self.staged.pop(epoch, None)
        if not blobs:
            return None
        return pa.concat_tables(
            [bytes_to_table(b) for _, b in sorted(blobs.items())]
        )


@ray.remote
class WindowStateShard:
    """One shard of windowed-aggregate state.

    State: ``(source, window_id) -> int64[len(metrics)]``.  ``merge`` is
    idempotent per epoch (an epoch replayed after a crash re-merges into
    the *restored* pre-epoch state, and the applied-epoch set guards
    double-push within a run).  Rows for windows already closed are
    dropped and counted (the late-data metric, SURVEY.md §2.8)."""

    def __init__(self, metrics: list[str], late_weight: str | None = None):
        self.metrics = list(metrics)
        # late accounting: sum this metric of dropped partials (e.g. the
        # input-row count) instead of counting partial rows — a dropped
        # partial may represent many input rows
        self.late_idx = self.metrics.index(late_weight) if late_weight else None
        self.state: dict[tuple[str, int], np.ndarray] = {}
        # epochs arrive strictly increasing (runner contract), so a scalar
        # high-watermark replaces the applied-set: bounded state instead
        # of O(epochs) per snapshot
        self.last_applied: int = -1
        self.closed_frontier: int = -1  # max closed window_id
        self.late_rows: int = 0
        self.staging = StagingBuffer()
        warm_arrow_kernels()

    def reset(self, *args) -> None:
        """Re-initialize for pool reuse (see :func:`shard_pool`)."""
        self.__init__(*args)

    def where(self) -> str:
        """Node id hosting this shard (placement diagnostics/tests)."""
        return ray.get_runtime_context().get_node_id()

    def stage(self, epoch: int, chunk_key, blob: bytes) -> None:
        """Idempotent (epoch, chunk)-keyed staging — the data-plane entry
        point for chunk TASKS (rows/partials never visit the driver); a
        retried task re-sends identical bytes under the same key."""
        self.staging.stage(epoch, chunk_key, blob, self.last_applied)

    def merge_staged(self, epoch: int) -> int:
        """Apply every staged partial of the epoch (chunk-key order).
        Duplicate (source, window) keys across chunks fold via the
        state-dict ``+=`` — deliberately NO Arrow groupby here: the
        first groupby in a fresh actor process pays ~0.25 s of kernel
        initialization, which dominated the whole streaming query.
        Returns the number of staged partial rows (metrics only)."""
        t = self.staging.drain(epoch)
        if epoch <= self.last_applied:
            return 0
        self.last_applied = epoch
        if t is None or len(t) == 0:
            return 0
        self._merge_table(t)
        return len(t)

    def merge(self, epoch: int, blob: bytes) -> None:
        if epoch <= self.last_applied:
            return
        self.last_applied = epoch
        self._merge_table(bytes_to_table(blob))

    def _merge_table(self, t: pa.Table) -> None:
        srcs = t["source"].to_pylist()
        wids = t["window_id"].to_pylist()
        vals = np.stack([np_int64(t[m]) for m in self.metrics], axis=1)
        for s, w, v in zip(srcs, wids, vals):
            if w <= self.closed_frontier:
                self.late_rows += (
                    int(v[self.late_idx]) if self.late_idx is not None else 1
                )
                continue
            key = (s, int(w))
            acc = self.state.get(key)
            if acc is None:
                self.state[key] = v.copy()
            else:
                acc += v

    def pop_closed(self, watermark_window: int) -> bytes:
        """Emit + delete all windows with window_id < watermark_window,
        sorted by (source, window_id) — deterministic output order."""
        self.closed_frontier = max(self.closed_frontier, watermark_window - 1)
        keys = sorted(k for k in self.state if k[1] < watermark_window)
        rows = {
            "source": [k[0] for k in keys],
            "window_id": [k[1] for k in keys],
        }
        vals = (
            np.stack([self.state.pop(k) for k in keys], axis=0)
            if keys
            else np.zeros((0, len(self.metrics)), dtype=np.int64)
        )
        for i, m in enumerate(self.metrics):
            rows[m] = vals[:, i]
        t = pa.table(
            {
                "source": pa.array(rows["source"], pa.string()),
                "window_id": pa.array(rows["window_id"], pa.int64()),
                **{m: pa.array(rows[m], pa.int64()) for m in self.metrics},
            }
        )
        return table_to_bytes(t)

    def pop_closed_to_sink(
        self, watermark_window: int, parts_dir: str, epoch: int, part_idx: int
    ) -> dict | None:
        """Pop closed windows AND write them as this shard's OWN
        deterministic sink part (the ``SessionStateShard`` /
        ``JoinStateShard`` pattern): closed-window rows never visit the
        driver, which gets back only part metadata for the manifest."""
        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        t = bytes_to_table(self.pop_closed(watermark_window))
        if not len(t):
            return None
        return write_sink_part(parts_dir, epoch, part_idx, t)

    def snapshot(self) -> dict:
        keys = sorted(self.state)
        t = pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "window_id": pa.array([k[1] for k in keys], pa.int64()),
                **{
                    m: pa.array(
                        np.array([self.state[k][i] for k in keys], dtype=np.int64)
                    )
                    for i, m in enumerate(self.metrics)
                },
            }
        )
        return {
            "table": table_to_bytes(t),
            "last_applied": self.last_applied,
            "closed_frontier": self.closed_frontier,
            "late_rows": self.late_rows,
        }

    def restore(self, snap: dict) -> None:
        t = bytes_to_table(snap["table"])
        self.state = {}
        srcs = t["source"].to_pylist()
        wids = t["window_id"].to_pylist()
        vals = np.stack(
            [np_int64(t[m]) for m in self.metrics], axis=1
        ) if len(t) else np.zeros((0, len(self.metrics)), dtype=np.int64)
        for s, w, v in zip(srcs, wids, vals):
            self.state[(s, int(w))] = v.copy()
        self.last_applied = snap["last_applied"]
        self.closed_frontier = snap["closed_frontier"]
        self.late_rows = snap["late_rows"]

    def stats(self) -> dict:
        return {"open_windows": len(self.state), "late_rows": self.late_rows}


@ray.remote
class JoinStateShard:
    """One shard of stream-stream join buffers keyed by ``doc_id``.

    ``probe_and_buffer(side, table)``: rows whose opposite side is already
    buffered join immediately and are emitted; the rest are buffered with
    the current epoch as birth.  ``expire(epoch, ttl)`` drops buffers older
    than ``ttl`` epochs (the reference's item TTL,
    ``/root/reference/storage/diskv.go:49-81``, in epoch units).

    Buffers are COLUMNAR: arriving Arrow batches are kept whole; the
    per-key index maps doc_id -> (table_idx, row_idx) and joins gather
    matched rows with one vectorized ``take`` per call — no per-row IPC
    blobs, no per-row schema overhead.

    Key semantics: left keys are unique (keep-first; duplicates counted
    in ``dup_lefts`` — the batch path asserts the same contract); rights
    may repeat and are consumed on match.  The LEFT side is the build
    side: a left row is retained until TTL so rights keep joining no
    matter when they arrive."""

    def __init__(self):
        self.left_tabs: list[pa.Table] = []
        self.left_epochs: list[np.ndarray] = []
        self.left_idx: dict = {}  # doc -> (ti, ri)
        self.right_tabs: list[pa.Table] = []
        self.right_epochs: list[np.ndarray] = []
        self.right_idx: dict = {}  # doc -> [(epoch, ti, ri)]
        self.dup_lefts = 0
        self.expired_rows = 0
        self.staging = StagingBuffer()
        self.sealed_through = -1
        warm_arrow_kernels()

    def reset(self, *args) -> None:
        self.__init__(*args)

    @staticmethod
    def _gather(tabs: list[pa.Table], locs: list[tuple[int, int]]) -> pa.Table:
        bases = np.cumsum([0] + [len(t) for t in tabs])
        cat = pa.concat_tables(tabs)
        idx = pa.array([bases[ti] + ri for ti, ri in locs], pa.int64())
        return cat.take(idx)

    @staticmethod
    def _hjoin(lt: pa.Table, rt: pa.Table) -> pa.Table:
        cols = dict(zip(lt.column_names, lt.columns))
        for name, col in zip(rt.column_names, rt.columns):
            if name not in cols:
                cols[name] = col
        return pa.table(cols)

    def probe_and_buffer(self, epoch: int, side: str, blob: bytes) -> bytes:
        out = self._probe_table(epoch, side, bytes_to_table(blob))
        return table_to_bytes(out) if out is not None else b""

    def stage(self, epoch: int, side: str, chunk_key, blob: bytes) -> None:
        """Idempotent per (epoch, side, chunk_key) — called from inside
        map_batches tasks; ``chunk_key`` = (chunk_seq, first row id of
        the piece), see :class:`StagingBuffer`."""
        self.staging.stage(epoch, (side, chunk_key), blob, self.sealed_through)

    def seal_to_sink(
        self, epoch: int, parts_dir: str, part_idx: int, sort_col: str = "doc_id"
    ) -> dict | None:
        """Apply the staged epoch (lefts first, then rights — same-epoch
        pairs join immediately) and write this shard's join output as its
        OWN deterministic sink part: rows never visit the driver, which
        gets back only the part metadata for the manifest."""
        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        blobs = self.staging.staged.pop(epoch, {}) if epoch > self.sealed_through else {}
        for e in [e for e in self.staging.staged if e < epoch]:
            del self.staging.staged[e]
        self.sealed_through = max(self.sealed_through, epoch)
        lefts = [
            bytes_to_table(b) for (s, _), b in sorted(blobs.items()) if s == "left"
        ]
        rights = [
            bytes_to_table(b) for (s, _), b in sorted(blobs.items()) if s == "right"
        ]
        outs = []
        for side, tabs in (("left", lefts), ("right", rights)):
            if tabs:
                r = self._probe_table(epoch, side, pa.concat_tables(tabs))
                if r is not None and len(r):
                    outs.append(r)
        if not outs:
            return None
        out = pa.concat_tables(outs)
        import pyarrow.compute as pc

        out = out.take(pc.sort_indices(out, sort_keys=[(sort_col, "ascending")]))
        return write_sink_part(parts_dir, epoch, part_idx, out)

    def _probe_table(self, epoch: int, side: str, t: pa.Table) -> pa.Table | None:
        for aux in ("chunk_seq", "partition_id", "_chunk_row"):
            if aux in t.column_names:
                t = t.drop_columns([aux])
        docs = t["doc_id"].to_pylist()
        if side == "left":
            # keep-first must also hold WITHIN a batch: track batch-local
            # keys, else both copies land in the buffer with the index
            # pointing at the last (contract break + dup_lefts undercount)
            seen_in_batch: set = set()
            keep = []
            for i, d in enumerate(docs):
                if d in self.left_idx or d in seen_in_batch:
                    continue
                seen_in_batch.add(d)
                keep.append(i)
            self.dup_lefts += len(docs) - len(keep)
            if len(keep) < len(docs):
                t = t.take(pa.array(keep, pa.int64()))
                docs = [docs[i] for i in keep]
            ti = len(self.left_tabs)
            self.left_tabs.append(t)
            self.left_epochs.append(np.full(len(t), epoch, dtype=np.int64))
            l_locs: list[tuple[int, int]] = []
            r_locs: list[tuple[int, int]] = []
            for i, d in enumerate(docs):
                self.left_idx[d] = (ti, i)
                rights = self.right_idx.pop(d, None)
                if rights:
                    for _, rti, rri in rights:
                        l_locs.append((ti, i))
                        r_locs.append((rti, rri))
            if not l_locs:
                return None
            return self._hjoin(
                self._gather(self.left_tabs, l_locs),
                self._gather(self.right_tabs, r_locs),
            )
        # right side: probe the left index; unmatched rows buffer
        matched_i: list[int] = []
        l_locs = []
        unmatched_i: list[int] = []
        for i, d in enumerate(docs):
            loc = self.left_idx.get(d)
            if loc is not None:
                matched_i.append(i)
                l_locs.append(loc)
            else:
                unmatched_i.append(i)
        if unmatched_i:
            sub = t.take(pa.array(unmatched_i, pa.int64()))
            ti = len(self.right_tabs)
            self.right_tabs.append(sub)
            self.right_epochs.append(np.full(len(sub), epoch, dtype=np.int64))
            for pos, i in enumerate(unmatched_i):
                self.right_idx.setdefault(docs[i], []).append((epoch, ti, pos))
        if not matched_i:
            return None
        rt = t.take(pa.array(matched_i, pa.int64()))
        lt = self._gather(self.left_tabs, l_locs)
        return self._hjoin(lt, rt)

    def _compact(self, min_epoch: int) -> int:
        """Rebuild both sides keeping only live, unexpired rows; returns
        rows dropped by TTL (consumed rights are garbage, not 'expired')."""
        dropped = 0
        # left
        live = [
            (d, ti, ri)
            for d, (ti, ri) in self.left_idx.items()
        ]
        kept = [
            (d, ti, ri)
            for d, ti, ri in live
            if self.left_epochs[ti][ri] >= min_epoch
        ]
        dropped += len(live) - len(kept)
        if self.left_tabs:
            locs = [(ti, ri) for _, ti, ri in kept]
            eps = np.array(
                [self.left_epochs[ti][ri] for ti, ri in locs], dtype=np.int64
            )
            new_t = self._gather(self.left_tabs, locs) if locs else None
            self.left_tabs = [new_t] if new_t is not None and len(new_t) else []
            self.left_epochs = [eps] if len(eps) else []
            self.left_idx = {d: (0, i) for i, (d, _, _) in enumerate(kept)}
        # right
        live_r = [
            (d, e, ti, ri)
            for d, lst in self.right_idx.items()
            for (e, ti, ri) in lst
        ]
        kept_r = [(d, e, ti, ri) for d, e, ti, ri in live_r if e >= min_epoch]
        dropped += len(live_r) - len(kept_r)
        if self.right_tabs:
            locs_r = [(ti, ri) for _, _, ti, ri in kept_r]
            new_rt = self._gather(self.right_tabs, locs_r) if locs_r else None
            self.right_tabs = [new_rt] if new_rt is not None and len(new_rt) else []
            self.right_epochs = (
                [np.array([e for _, e, _, _ in kept_r], dtype=np.int64)]
                if kept_r
                else []
            )
            self.right_idx = {}
            for i, (d, e, _, _) in enumerate(kept_r):
                self.right_idx.setdefault(d, []).append((e, 0, i))
        return dropped

    def expire(self, epoch: int, ttl: int) -> int:
        """Drop buffers older than ttl epochs; ``expired_rows`` counts
        ROWS dropped.  Also compacts consumed-right garbage."""
        self.expired_rows += self._compact(epoch - ttl)
        return self.expired_rows

    def snapshot(self) -> dict:
        self._compact(-(1 << 62))  # drop consumed garbage, nothing by TTL
        return {
            "left": table_to_bytes(self.left_tabs[0]) if self.left_tabs else None,
            "left_epochs": self.left_epochs[0].tolist() if self.left_epochs else [],
            "right": table_to_bytes(self.right_tabs[0]) if self.right_tabs else None,
            "right_epochs": (
                self.right_epochs[0].tolist() if self.right_epochs else []
            ),
            "dup_lefts": self.dup_lefts,
            "expired_rows": self.expired_rows,
            "sealed_through": self.sealed_through,
        }

    def restore(self, snap: dict) -> None:
        self.__init__()
        self.dup_lefts = snap.get("dup_lefts", 0)
        self.expired_rows = snap["expired_rows"]
        self.sealed_through = snap.get("sealed_through", -1)
        if snap["left"] is not None:
            t = bytes_to_table(snap["left"])
            self.left_tabs = [t]
            self.left_epochs = [np.asarray(snap["left_epochs"], dtype=np.int64)]
            self.left_idx = {
                d: (0, i) for i, d in enumerate(t["doc_id"].to_pylist())
            }
        if snap["right"] is not None:
            t = bytes_to_table(snap["right"])
            self.right_tabs = [t]
            eps = np.asarray(snap["right_epochs"], dtype=np.int64)
            self.right_epochs = [eps]
            for i, d in enumerate(t["doc_id"].to_pylist()):
                self.right_idx.setdefault(d, []).append((int(eps[i]), 0, i))

    def stats(self) -> dict:
        return {
            "buffered_left": len(self.left_idx),
            "buffered_right": sum(len(v) for v in self.right_idx.values()),
            "dup_lefts": self.dup_lefts,
            "expired_rows": self.expired_rows,
        }


class ShardedState:
    """Driver-side handle over a pool of state shards.

    ``pool`` reuses a session-scoped named pool (:func:`shard_pool`)
    instead of spawning fresh actors — the per-query fixed-cost fix."""

    def __init__(self, actor_cls, n_shards: int, *args, pool: str | None = None):
        self.n_shards = n_shards
        if pool is not None:
            self.shards = shard_pool(actor_cls, pool, n_shards, *args)
        else:
            self.shards = [spawn_shard(actor_cls, *args) for _ in range(n_shards)]

    def shard_of_table(self, t: pa.Table, key_cols: list[str]) -> np.ndarray:
        from dataflowkit_ray.stages.agg import composite_bucket

        return composite_bucket(t, key_cols, self.n_shards)

    def route(self, t: pa.Table, key_cols: list[str]) -> list[pa.Table | None]:
        """Split a table into per-shard sub-tables (None when empty)."""
        if len(t) == 0:
            return [None] * self.n_shards
        sh = self.shard_of_table(t, key_cols)
        out = []
        for i in range(self.n_shards):
            mask = sh == i
            out.append(t.filter(pa.array(mask)) if mask.any() else None)
        return out

    def snapshot(self) -> list:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list) -> None:
        ray.get([s.restore.remote(sn) for s, sn in zip(self.shards, snaps)])


def route_by_key(t: pa.Table, key_col: str, n_shards: int) -> list[pa.Table | None]:
    """Shared hash-split of a table across shard actors (one routing
    implementation for every runner — int and string keys, vectorized)."""
    from dataflowkit_ray.stages.windows import bucket_of

    if len(t) == 0:
        return [None] * n_shards
    sh = bucket_of(t[key_col], n_shards)
    return [
        t.filter(pa.array(sh == i)) if (sh == i).any() else None
        for i in range(n_shards)
    ]


@ray.remote
class LatestValueShard:
    """Keyed latest-value-wins state (J4): the streaming form of the
    reference's cookie/session jar — each fetch reads the latest stored
    value for its key and writes back an updated one
    (``/root/reference/fetch/service.go:52-115``).

    ``put_batch`` upserts iff the new clock is >= the stored one (equal
    clock: last write wins, deterministic under the per-epoch ordering
    contract); ``lookup`` returns the current value for each requested
    key.  Arrow-blob API like every other shard."""

    def __init__(self):
        self.state: dict = {}  # key -> (clock, value)
        warm_arrow_kernels()

    def reset(self, *args) -> None:
        self.__init__(*args)

    def put_batch(self, blob: bytes) -> int:
        t = bytes_to_table(blob)
        keys = t["key"].to_pylist()
        clocks = t["clock"].to_pylist()
        vals = t["value"].to_pylist()
        n = 0
        for k, c, v in zip(keys, clocks, vals):
            cur = self.state.get(k)
            if cur is None or c >= cur[0]:
                self.state[k] = (c, v)
                n += 1
        return n

    def lookup(self, blob: bytes) -> bytes:
        t = bytes_to_table(blob)
        keys = t["key"].to_pylist()
        out_k, out_c, out_v = [], [], []
        for k in keys:
            cur = self.state.get(k)
            if cur is not None:
                out_k.append(k)
                out_c.append(cur[0])
                out_v.append(cur[1])
        key_type = t.schema.field("key").type
        return table_to_bytes(
            pa.table(
                {
                    "key": pa.array(out_k, key_type),
                    "clock": pa.array(out_c, pa.int64()),
                    "value": pa.array(out_v, pa.float64()),
                }
            )
        )

    def snapshot(self) -> dict:
        return {"state": dict(self.state)}

    def restore(self, snap: dict) -> None:
        self.state = dict(snap["state"])

    def stats(self) -> dict:
        return {"keys": len(self.state)}
