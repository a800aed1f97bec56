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

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc
import ray


def table_to_bytes(t: pa.Table) -> bytes:
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    return buf.getvalue()


def bytes_to_table(b: bytes) -> pa.Table:
    return ipc.open_stream(io.BytesIO(b)).read_all()


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

    def merge(self, epoch: int, blob: bytes) -> None:
        if epoch <= self.last_applied:
            return
        self.last_applied = epoch
        t = bytes_to_table(blob)
        srcs = t["source"].to_pylist()
        wids = t["window_id"].to_pylist()
        vals = np.stack(
            [t[m].to_numpy(zero_copy_only=False).astype(np.int64) for m in self.metrics],
            axis=1,
        )
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
            [t[m].to_numpy(zero_copy_only=False).astype(np.int64) for m in self.metrics],
            axis=1,
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
    ``/root/reference/storage/diskv.go:49-81``, in epoch units)."""

    def __init__(self):
        self.left: dict[str, tuple[int, bytes]] = {}  # doc_id -> (epoch, row blob)
        self.right: dict[str, list[tuple[int, bytes]]] = {}
        self.expired_rows = 0

    def probe_and_buffer(self, epoch: int, side: str, blob: bytes) -> bytes:
        """Returns joined rows (left row columns + right row columns).

        The LEFT side is the build side: a left row is ALWAYS retained
        (until TTL) so rights for the same key keep joining no matter
        when they arrive — arrival order must not change the join result
        (a left that only popped buffered rights would silently drop any
        right arriving after it).  Rights are consumed on match."""
        t = bytes_to_table(blob)
        out: list[pa.Table] = []
        if side == "left":
            for i, doc in enumerate(t["doc_id"].to_pylist()):
                row = table_to_bytes(t.slice(i, 1))
                self.left[doc] = (epoch, row)
                rights = self.right.pop(doc, None)
                if rights:
                    for _, rb in rights:
                        out.append(_join_rows(row, rb))
        else:
            for i, doc in enumerate(t["doc_id"].to_pylist()):
                row = table_to_bytes(t.slice(i, 1))
                l = self.left.get(doc)
                if l is not None:
                    out.append(_join_rows(l[1], row))
                else:
                    self.right.setdefault(doc, []).append((epoch, row))
        if not out:
            return b""
        return table_to_bytes(pa.concat_tables(out))

    def expire(self, epoch: int, ttl: int) -> int:
        """Drop buffers older than ttl epochs; ``expired_rows`` counts
        ROWS dropped (incl. rows expired out of partially-kept lists)."""
        drop_l = [k for k, (e, _) in self.left.items() if epoch - e > ttl]
        for k in drop_l:
            del self.left[k]
        dropped_r = 0
        empty_keys = []
        for k, lst in self.right.items():
            keep = [(e, b) for e, b in lst if epoch - e <= ttl]
            dropped_r += len(lst) - len(keep)
            if keep:
                self.right[k] = keep
            else:
                empty_keys.append(k)
        for k in empty_keys:
            del self.right[k]
        self.expired_rows += len(drop_l) + dropped_r
        return self.expired_rows

    def snapshot(self) -> dict:
        return {
            "left": dict(self.left),
            "right": {k: list(v) for k, v in self.right.items()},
            "expired_rows": self.expired_rows,
        }

    def restore(self, snap: dict) -> None:
        self.left = dict(snap["left"])
        self.right = {k: list(v) for k, v in snap["right"].items()}
        self.expired_rows = snap["expired_rows"]


def _join_rows(left_blob: bytes, right_blob: bytes) -> pa.Table:
    lt = bytes_to_table(left_blob)
    rt = bytes_to_table(right_blob)
    cols = dict(zip(lt.column_names, lt.columns))
    for name, col in zip(rt.column_names, rt.columns):
        if name not in cols:
            cols[name] = col
    return pa.table(cols)


class ShardedState:
    """Driver-side handle over a pool of state shards."""

    def __init__(self, actor_cls, n_shards: int, *args):
        self.n_shards = n_shards
        self.shards = [actor_cls.remote(*args) for _ in range(n_shards)]

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
