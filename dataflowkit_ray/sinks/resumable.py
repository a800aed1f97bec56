"""Resumable partitioned Parquet output for the batch paths.

At 100 TB a job WILL be preempted mid-write; the output layout has to
make the re-run cheap.  Two shapes, both built on the atomic
write-temp + ``os.replace`` + marker discipline of
:mod:`dataflowkit_ray.sinks.exactly_once` (the reference gets the same
property from idempotent keyed Upsert, ``storage/mongo.go:70-72``;
SURVEY.md §2.8):

* :func:`resumable_shard_map` — the map-only shape.  The unit of work is
  an INPUT shard (parquet file × row-group); each Ray task reads one
  shard, applies a batch transform, and writes exactly one deterministic
  output part plus a ``done-*.json`` marker.  A re-run lists markers
  first and schedules only the pending shards — finished shards are
  skipped before a single input byte is read.  This is the shape for
  tokenize / quality-filter / PII-redact sweeps where output is
  row-local in the input.

* :func:`write_partitioned` — the post-shuffle shape, for a Dataset
  that no longer aligns with input shards (after joins / groupbys).
  Rows are hash-bucketed into ``n_parts`` deterministic partitions,
  each written atomically with its own marker; on resume, rows bound
  for already-committed partitions are dropped right after the bucket
  stage (a vectorized mask, before the shuffle), so only missing
  partitions pay compute and I/O.

Markers record input identity (path, row-group, rows); they do NOT
fingerprint the transform — rerunning with a different transform into
the same directory is the caller's bug.  Delete the directory (or pass
``resume=False``) to recompute.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dataflowkit_ray.errors import StateError
from dataflowkit_ray.sinks.exactly_once import (
    _atomic_write_json,
    atomic_write_parquet as _atomic_write_table,
)


def list_input_shards(paths: list[str] | str) -> list[dict]:
    """Expand parquet file(s) into (path, row_group) work units.  Row
    groups are the natural resume grain: they are independently readable
    (column chunks carry their own offsets) and a writer that sized them
    for HDFS/S3 scans (~128 MB) sized them for re-runs too."""
    if isinstance(paths, str):
        paths = [paths]
    shards = []
    for p in sorted(paths):
        n = pq.ParquetFile(p).num_row_groups
        shards.extend({"path": p, "row_group": g} for g in range(n))
    return shards


def _marker_name(shard_idx: int) -> str:
    return f"done-{shard_idx:05d}.json"


def _part_name(shard_idx: int) -> str:
    return f"part-{shard_idx:05d}.parquet"


def finished_shards(out_dir: str) -> dict[int, dict]:
    """Committed shard markers (idx -> marker dict).  Readers and
    re-runs trust markers only — a part file without its marker is an
    interrupted write and will be atomically replaced."""
    out: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if name.startswith("done-") and name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as f:
                m = json.load(f)
            out[int(m["shard"])] = m
    return out


def resumable_shard_map(
    in_paths: list[str] | str,
    out_dir: str,
    batch_fn,
    columns: list[str] | None = None,
    resume: bool = True,
) -> dict:
    """Apply ``batch_fn(pa.Table) -> pa.Table`` to every input shard,
    writing one output part per shard; skip shards already committed.

    Returns ``{"processed": n, "skipped": n, "rows": total_out_rows}``
    (counts only — no row data returns to the driver).
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    shards = list_input_shards(in_paths)
    done = finished_shards(out_dir) if resume else {}
    # markers record WHICH input they cover; a resume over a changed
    # input list (file added/removed/rewritten) silently shifts shard
    # indices, so skipping by index alone would mix transforms of
    # different inputs — refuse instead
    for i, m in done.items():
        if i >= len(shards) or (
            m["path"] != shards[i]["path"]
            or int(m["row_group"]) != int(shards[i]["row_group"])
        ):
            raise StateError(
                f"resumable_shard_map: marker {_marker_name(i)} covers "
                f"({m['path']!r}, row_group={m['row_group']}) but the "
                f"current input assigns shard {i} "
                f"{'nothing' if i >= len(shards) else repr(shards[i])} — "
                "the input set changed under a resume directory. Use a "
                "fresh out_dir (or resume=False) to recompute."
            )
    pending = [
        {"shard": i, **s} for i, s in enumerate(shards) if i not in done
    ]
    skipped_rows = sum(m["rows"] for m in done.values())
    if not pending:
        return {"processed": 0, "skipped": len(done), "rows": skipped_rows}

    def process(batch: pa.Table) -> pa.Table:
        rows_out = []
        for r in batch.to_pylist():  # <= a few shard descriptors, not data
            idx = int(r["shard"])
            t = pq.ParquetFile(r["path"]).read_row_group(
                int(r["row_group"]), columns=columns
            )
            result = batch_fn(t)
            _atomic_write_table(result, os.path.join(out_dir, _part_name(idx)))
            _atomic_write_json(
                os.path.join(out_dir, _marker_name(idx)),
                {
                    "shard": idx,
                    "path": r["path"],
                    "row_group": int(r["row_group"]),
                    "rows": len(result),
                },
            )
            rows_out.append({"shard": idx, "rows": len(result)})
        return pa.Table.from_pylist(
            rows_out,
            schema=pa.schema([("shard", pa.int64()), ("rows", pa.int64())]),
        )

    manifest = (
        ray.data.from_items(pending, override_num_blocks=len(pending))
        .map_batches(process, batch_format="pyarrow", batch_size=1)
        .take_all()  # one tiny row per shard
    )
    return {
        "processed": len(manifest),
        "skipped": len(done),
        "rows": skipped_rows + int(sum(r["rows"] for r in manifest)),
    }


def read_committed(out_dir: str):
    """Dataset over committed parts only (marker-listed, never globbed)."""
    import ray

    done = finished_shards(out_dir)
    files = [
        os.path.join(out_dir, _part_name(i)) for i in sorted(done)
    ]
    return ray.data.read_parquet(files)


# --------------------------------------------------------- post-shuffle


def write_partitioned(
    ds,
    out_dir: str,
    key_cols: list[str],
    n_parts: int = 64,
    resume: bool = True,
) -> dict:
    """Hash-partitioned resumable output for an arbitrary Dataset.

    Deterministic partition = ``hash(key_cols) % n_parts`` (the same
    :func:`~dataflowkit_ray.stages.agg.composite_bucket` used by every
    shuffle in the engine, so output partitioning can reuse an upstream
    exchange's key).  Committed partitions are masked out straight after
    the bucket column is appended — upstream stages still run (the
    Dataset is opaque), but no skipped-partition row enters the shuffle
    or touches disk.  For map-only jobs prefer
    :func:`resumable_shard_map`, which skips the READ as well.
    """
    from dataflowkit_ray.stages.agg import composite_bucket

    os.makedirs(out_dir, exist_ok=True)
    # Partitioning-identity guard (mirror of resumable_shard_map's
    # refuse-on-changed-input): markers are only reusable under the SAME
    # (n_parts, key_cols) hash modulus.  Resuming with a different layout
    # would silently drop rows whose new bucket id collides with an
    # old-layout committed partition (or IndexError on a shrink), so the
    # layout is pinned in a dir-level meta file and mismatches refuse.
    meta_path = os.path.join(out_dir, "_partition_meta.json")
    meta = {"n_parts": int(n_parts), "key_cols": list(key_cols)}
    done = finished_shards(out_dir) if resume else {}
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != meta:
            raise StateError(
                f"write_partitioned: {out_dir!r} was written with "
                f"n_parts={prev['n_parts']}, key_cols={prev['key_cols']} "
                f"but this run asked for n_parts={meta['n_parts']}, "
                f"key_cols={meta['key_cols']} — committed markers are "
                "meaningless under a different hash layout. Use a fresh "
                "out_dir (or resume=False) to recompute."
            )
    elif resume and done:
        # markers exist but there is no layout pin: a directory written
        # before the meta file existed (or by something else).  The hash
        # modulus those markers were committed under is unverifiable —
        # stamping the NEW layout over them would silently mask buckets
        # whose ids collide across layouts (the exact corruption the
        # guard exists to prevent), so refuse.
        raise StateError(
            f"write_partitioned: {out_dir!r} has committed markers but no "
            "_partition_meta.json pinning their (n_parts, key_cols) "
            "layout — cannot verify they match this run. Recompute with "
            "resume=False (or use a fresh out_dir)."
        )
    else:
        # fresh run (or resume=False recompute): stale markers AND stale
        # part data from any previous layout must go — markers would
        # poison a LATER resume, and orphaned part-*.parquet from a
        # larger old n_parts would be swept up by glob-based readers
        # (documents_files, DuckDB views) alongside the new parts
        if not resume:
            for name in os.listdir(out_dir):
                stale_marker = name.startswith("done-") and name.endswith(".json")
                stale_part = name.startswith("part-") and name.endswith(".parquet")
                if stale_marker or stale_part:
                    os.remove(os.path.join(out_dir, name))
        _atomic_write_json(meta_path, meta)
    done_ids = np.zeros(n_parts, dtype=bool)
    for i in done:
        done_ids[i] = True
    skipped_rows = sum(m["rows"] for m in done.values())

    def add_part(t: pa.Table) -> pa.Table:
        pid = composite_bucket(t, key_cols, n_parts)
        t = t.append_column("_out_part", pa.array(pid.astype(np.int64)))
        if done_ids.any():
            t = t.filter(pa.array(~done_ids[pid]))
        return t

    def write_part(t: pa.Table) -> pa.Table:
        part = int(t["_out_part"][0].as_py())
        t = t.drop_columns(["_out_part"])
        _atomic_write_table(t, os.path.join(out_dir, _part_name(part)))
        _atomic_write_json(
            os.path.join(out_dir, _marker_name(part)),
            {"shard": part, "rows": len(t)},
        )
        return pa.table({"shard": [part], "rows": [len(t)]})

    written = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_out_part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()  # one tiny row per partition
    )
    return {
        "processed": len(written),
        "skipped": len(done),
        "rows": skipped_rows + int(sum(r["rows"] for r in written)),
    }
