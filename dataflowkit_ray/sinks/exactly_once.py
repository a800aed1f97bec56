"""Exactly-once Parquet sink: idempotent per-partition parts + manifests.

The reference achieves replay-safety by *idempotent keyed Upsert*: record
keys are deterministic (``uid-page-block``, ``scrape/scrape.go:604``) and
Mongo ``Upsert`` overwrites on re-run (``storage/mongo.go:70-72``), so a
retried payload never duplicates rows.  The engine's file-level analog
(SURVEY.md §2.8 "Exactly-once"):

* part files are named deterministically ``part-e{epoch}-p{part}.parquet``
  — a replayed epoch REWRITES the same names, never appends;
* each write goes to a temp name in the same directory, then atomic
  ``os.replace`` — readers never see partial files;
* an epoch is visible only once ``manifest-e{epoch}.json`` exists (also
  atomically renamed); readers list parts from manifests, never by
  globbing the directory.

Writes happen inside ``map_groups`` tasks (one per sink partition), so
the sink streams at full cluster parallelism; only the tiny manifest rows
return to the driver.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(path: str) -> None:
    """fsync the parent dir after os.replace — the rename itself must be
    durable before the manifest may be considered published."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(os.path.dirname(path) or ".")


def atomic_write_parquet(t: pa.Table, final: str) -> None:
    """THE parquet commit discipline (single definition — resumable.py
    and the shard-sink writers share it): write to a temp name in the
    same directory, fsync the data, atomic rename, fsync the directory
    so the rename itself is durable before any manifest references it."""
    tmp = final + ".tmp"
    pq.write_table(t, tmp)
    _fsync_file(tmp)
    os.replace(tmp, final)
    _fsync_dir(os.path.dirname(final) or ".")


def write_sink_part(
    parts_dir: str, epoch: int, part_idx: int, t: pa.Table
) -> dict:
    """Write one deterministic epoch part atomically (idempotent: a
    replayed epoch rewrites the same name).  Callable from any worker or
    actor — this is how shard actors sink their own output without the
    rows ever visiting the driver."""
    name = f"part-e{epoch:05d}-p{part_idx:04d}.parquet"
    atomic_write_parquet(t, os.path.join(parts_dir, name))
    return {"part": name, "rows": len(t)}


class ExactlyOnceSink:
    def __init__(self, out_dir: str, n_sink_parts: int = 8):
        self.out_dir = out_dir
        self.parts_dir = os.path.join(out_dir, "parts")
        self.manifest_dir = os.path.join(out_dir, "manifests")
        self.n_sink_parts = n_sink_parts
        os.makedirs(self.parts_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ------------------------------------------------------------- write

    def commit_epoch(
        self, ds, epoch: int, extra: dict | None = None, part_col: str | None = None
    ) -> dict:
        """Write one epoch's Dataset and publish its manifest.

        ``part_col``: int column to shard output by (e.g. ``partition_id``);
        default shards by a deterministic hash of the first key column.
        Rows land in ``n_sink_parts`` files written in parallel tasks.
        """
        from dataflowkit_ray.stages.agg import composite_bucket

        parts_dir, n_parts = self.parts_dir, self.n_sink_parts

        def add_part(t: pa.Table) -> pa.Table:
            if part_col is not None:
                import numpy as np

                c = t[part_col]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                pid = (
                    c.to_numpy(zero_copy_only=False).astype(np.int64) % n_parts
                )
                arr = pa.array(pid.astype(np.int64))
            else:
                arr = pa.array(composite_bucket(t, [t.column_names[0]], n_parts))
            return t.append_column("_sink_part", arr)

        def write_part(t: pa.Table) -> pa.Table:
            part = int(t["_sink_part"][0].as_py())
            t = t.drop_columns(["_sink_part"])
            name = f"part-e{epoch:05d}-p{part:04d}.parquet"
            # a durable manifest must never reference a part whose data
            # blocks were lost
            atomic_write_parquet(t, os.path.join(parts_dir, name))
            return pa.table({"part": [name], "rows": [len(t)]})

        written = (
            ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_sink_part")
            .map_groups(write_part, batch_format="pyarrow")
            .take_all()  # tiny: one row per sink part
        )
        return self.publish_epoch(
            epoch,
            [{"part": r["part"], "rows": int(r["rows"])} for r in written],
            extra=extra,
        )

    def publish_epoch(
        self, epoch: int, parts: list[dict], extra: dict | None = None
    ) -> dict:
        """Publish the manifest for parts already written (by tasks or by
        shard actors via :func:`write_sink_part`) — the atomic visibility
        flip; only manifest METADATA passes through the caller."""
        manifest = {
            "epoch": epoch,
            "parts": sorted(parts, key=lambda r: r["part"]),
            "rows": int(sum(r["rows"] for r in parts)),
            **(extra or {}),
        }
        _atomic_write_json(self._manifest_path(epoch), manifest)
        return manifest

    # -------------------------------------------------------------- read

    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-e{epoch:05d}.json")

    def committed_epochs(self) -> list[int]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("manifest-e") and f.endswith(".json"):
                out.append(int(f[len("manifest-e") : -len(".json")]))
        return out

    def _compact_manifest_path(self, idx: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-c{idx:05d}.json")

    def compaction_manifests(self) -> list[int]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("manifest-c") and f.endswith(".json"):
                out.append(int(f[len("manifest-c") : -len(".json")]))
        return out

    def manifest(self, epoch: int) -> dict:
        with open(self._manifest_path(epoch)) as f:
            return json.load(f)

    def committed_parts(self) -> list[dict]:
        """Manifest-listed parts with row counts, compaction-aware.

        The newest compaction manifest absorbs every epoch manifest
        <= its compacted_through; interrupted cleanup leaves stale
        absorbed manifests + older compactions, both skipped here."""
        parts = []
        compacted_through = -1
        compacts = self.compaction_manifests()
        if compacts:
            newest = compacts[-1]
            with open(self._compact_manifest_path(newest)) as f:
                cm = json.load(f)
            compacted_through = cm["compacted_through"]
            parts.extend(cm["parts"])
        for e in self.committed_epochs():
            if e <= compacted_through:
                continue
            parts.extend(self.manifest(e)["parts"])
        return parts

    def committed_files(self) -> list[str]:
        return [os.path.join(self.parts_dir, p["part"]) for p in self.committed_parts()]

    def read_committed(self):
        """Dataset over manifest-listed parts only (never directory globs)."""
        import ray.data

        files = self.committed_files()
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files)

    def read_committed_table(self) -> pa.Table:
        files = self.committed_files()
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files])


def read_committed_ordered(sink: "ExactlyOnceSink", order_cols: list[str]):
    """Ordered read-back of committed output (the storageResultReader
    analog: sequential key order ``uid-page-block``,
    ``/root/reference/scrape/encoders.go:174-263``): Dataset sorted by
    the given lineage/order columns."""
    return sink.read_committed().sort(order_cols)


# ------------------------------------------------------------- compaction


def _compact_group_files(paths: list[str], parts_dir: str, name: str) -> dict:
    """Rewrite one group of part files into one part, row-group at a time
    (peak memory = one row group, never the dataset)."""
    final = os.path.join(parts_dir, name)
    tmp = final + ".tmp"
    schema = pq.read_schema(paths[0])
    rows = 0
    with pq.ParquetWriter(tmp, schema) as writer:
        for p in paths:
            pf = pq.ParquetFile(p)
            for rg in range(pf.num_row_groups):
                t = pf.read_row_group(rg)
                writer.write_table(t)
                rows += len(t)
    _fsync_file(tmp)
    os.replace(tmp, final)
    _fsync_dir(parts_dir)
    return {"part": name, "rows": rows}


def compact(sink: "ExactlyOnceSink", target_rows_per_part: int = 1_000_000) -> dict:
    """Rewrite all committed epochs into few large parts (the small-files
    problem: one part per sink partition per epoch means thousands of
    epochs leave thousands of tiny files).

    DISTRIBUTED: part files are greedily packed into row-count-bounded
    groups from manifest metadata only; each group is rewritten by one
    Ray task streaming row groups through a ParquetWriter — no process
    (driver included) ever holds more than one row group of data.

    Exactly-once discipline is preserved: compacted parts are written to
    temp names + atomic rename, then ONE compaction manifest (next epoch
    number, ``compacted_through`` = last absorbed epoch) is published
    atomically; readers seeing it skip every absorbed manifest.  A crash
    mid-compaction leaves the old manifests authoritative.  Absorbed
    part files are deleted only AFTER the manifest flips (lazy cleanup —
    orphans are harmless because readers never glob)."""
    import ray

    epochs = sink.committed_epochs()
    if not epochs:
        return {"compacted_through": None, "parts": []}
    absorbed = sink.committed_parts()
    absorbed_files = [os.path.join(sink.parts_dir, p["part"]) for p in absorbed]
    prev_compacts = sink.compaction_manifests()
    last = epochs[-1]
    # compaction manifests live in their OWN namespace (manifest-cNNNNN /
    # part-cNNNNN-*): a resumed runner's next commit_epoch(last+1) must
    # never overwrite the compaction and orphan the absorbed data
    comp_idx = (max(prev_compacts) + 1) if prev_compacts else 0
    # greedy metadata-only packing into ~target_rows_per_part groups
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for p in absorbed:
        f = os.path.join(sink.parts_dir, p["part"])
        if cur and cur_rows + int(p["rows"]) > target_rows_per_part:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += int(p["rows"])
    if cur:
        groups.append(cur)
    task = ray.remote(_compact_group_files)
    parts = ray.get(
        [
            task.remote(g, sink.parts_dir, f"part-c{comp_idx:05d}-{i:04d}.parquet")
            for i, g in enumerate(groups)
        ]
    )
    manifest = {
        "compaction": comp_idx,
        "parts": parts,
        "rows": int(sum(p["rows"] for p in parts)),
        "compacted_through": last,
    }
    _atomic_write_json(sink._compact_manifest_path(comp_idx), manifest)
    # lazy cleanup: absorbed epoch manifests, older compactions, old parts
    for e in epochs:
        try:
            os.remove(sink._manifest_path(e))
        except FileNotFoundError:
            pass
    for c in prev_compacts:
        try:
            os.remove(sink._compact_manifest_path(c))
        except FileNotFoundError:
            pass
    for f in absorbed_files:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
    return manifest
