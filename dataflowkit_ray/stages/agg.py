"""General two-phase hash aggregation via the bucket pattern.

Ray Data's built-in ``groupby().aggregate()`` sorts by the raw key and
then iterates groups in Python — fine for dozens of groups, hopeless for
10^5+ (measured: 14s for a Sum over 100k ``doc_id`` groups at sf0.1).
The scale shape used everywhere in this engine instead:

  phase 1 (combiner, no shuffle): ``pyarrow.Table.group_by`` inside each
      ``map_batches`` call collapses the batch to one partial row per key;
  shuffle: on ``_bucket = hash(keys) % n_buckets`` — a SMALL int key, so
      the sort-based exchange sorts ints and produces ``n_buckets``
      groups regardless of key cardinality;
  phase 2 (finalize): one vectorized ``pyarrow.Table.group_by`` per
      bucket merges the partials for EVERY key in the bucket at once.

This mirrors the reference's per-page partials persisted under keys and
merged at encode (``/root/reference/scrape/scrape.go:604-617`` +
``encoders.go:192-244``), with the bucket count — not the key count —
bounding shuffle fan-in (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dataflowkit_ray.stages.windows import bucket_of

# how a partial aggregate merges across batches
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def composite_bucket(t: pa.Table, key_list: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic bucket id from several key columns (FNV-style mix)."""
    h = np.zeros(len(t), dtype=np.uint64)
    for k in key_list:
        h = h * np.uint64(1099511628211) + bucket_of(t[k], 1 << 30).astype(np.uint64)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def checked_rename(g: pa.Table, expected: list[str], new_names: list[str]) -> pa.Table:
    """``rename_columns`` with the positional assumption made EXPLICIT.

    ``group_by().aggregate()`` output order (keys first, then
    ``<col>_<fn>`` / ``count_all``) has differed across pyarrow
    versions; every positional rename of an aggregate result goes
    through here so a reordering pyarrow bump fails LOUDLY instead of
    silently mislabeling metric columns (ADVICE r3)."""
    if g.column_names != expected:
        raise AssertionError(
            f"aggregate output columns {g.column_names} != expected {expected}; "
            "pyarrow group_by output order changed"
        )
    return g.rename_columns(new_names)


def agg_names(key_list: list[str], aggs: list[tuple]) -> list[str]:
    """The generated column names of ``group_by(key_list).aggregate(aggs)``
    on the pinned pyarrow: keys first, then ``<col>_<fn>`` (``count_all``
    for the nullary count)."""
    return key_list + [f"{c}_{fn}" if c != [] else "count_all" for c, fn in aggs]


def hash_agg(
    ds,
    keys: tuple[str, ...],
    specs: list[tuple[str, str, str]],
    *,
    n_buckets: int = 64,
    batch_size: int | None = None,
    combine: bool = True,
):
    """``specs`` = [(col, fn, out_name)] with fn in sum/count/min/max/mean.

    ``mean`` is a DERIVED aggregate: it rides the shuffle as (sum, count)
    partials — the only decomposition that merges correctly — and the
    division happens once per key in phase 2 (float64 output).

    ``combine=False`` skips phase 1 when the input is already one row per
    key per batch (e.g. outputs of a per-batch combiner upstream).
    Output columns: ``keys + [out_name...]``.

    ``batch_size`` stays None by default: an explicit batch_size larger
    than the upstream block size makes Ray COALESCE blocks into fewer
    tasks, and with operator fusion that serializes the whole upstream
    chain (measured: a 30s single-task CEP stage that should have been
    64-way parallel).  Set it only on an unfused combiner stage.
    """
    key_list = list(keys)
    # expand mean -> (sum, count) partial pair + a finalize division
    expanded: list[tuple[str, str, str]] = []
    mean_final: list[tuple[str, str, str]] = []  # (out, sum_partial, cnt_partial)
    for i, (c, fn, out) in enumerate(specs):
        if fn == "mean":
            expanded.append((c, "sum", f"__msum{i}"))
            expanded.append((c, "count", f"__mcnt{i}"))
            mean_final.append((out, f"__msum{i}", f"__mcnt{i}"))
        else:
            expanded.append((c, fn, out))
    specs = expanded
    partial_names = [f"__p{i}" for i in range(len(specs))]
    merge_aggs = [(p, _MERGE[fn]) for p, (_, fn, _) in zip(partial_names, specs)]
    out_names = [out for _, _, out in specs]

    def phase1(t: pa.Table) -> pa.Table:
        used = key_list + sorted({c for c, _, _ in specs})
        aggs = [(c, fn) for c, fn, _ in specs]
        g = t.select(used).group_by(key_list).aggregate(aggs)
        g = checked_rename(g, agg_names(key_list, aggs), key_list + partial_names)
        return g.append_column(
            "_bucket", pa.array(composite_bucket(g, key_list, n_buckets))
        )

    def tag_only(t: pa.Table) -> pa.Table:
        t = t.select(key_list + [c for c, _, _ in specs])
        t = t.rename_columns(key_list + partial_names)
        return t.append_column(
            "_bucket", pa.array(composite_bucket(t, key_list, n_buckets))
        )

    partials = ds.map_batches(
        phase1 if combine else tag_only, batch_format="pyarrow", batch_size=batch_size
    )

    def phase2(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["_bucket"]).group_by(key_list).aggregate(merge_aggs)
        g = checked_rename(g, agg_names(key_list, merge_aggs), key_list + out_names)
        for out, ps, pc_ in mean_final:
            s = g[ps].to_numpy(zero_copy_only=False).astype(np.float64)
            c = g[pc_].to_numpy(zero_copy_only=False).astype(np.float64)
            g = g.append_column(out, pa.array(s / np.maximum(c, 1.0)))
        if mean_final:
            g = g.drop_columns(
                [p for _, ps, pc_ in mean_final for p in (ps, pc_)]
            )
        return g

    return partials.groupby("_bucket").map_groups(phase2, batch_format="pyarrow")
