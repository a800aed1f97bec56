"""As-of (latest-value-wins) keyed join — the cookie-store lookup analog.

The reference keeps a per-source cookie/session jar: each fetch reads the
LATEST stored value for its key, writes back an updated one
(``/root/reference/fetch/service.go:52-115``).  Batch form: for every
left row, join the right row with the greatest ``right_on <= left_on``
for the same key (DuckDB/standard ASOF JOIN, inner semantics).

Scale shape: ONE bucket shuffle on ``hash(key) % n_buckets`` (never the
raw key); each bucket resolves every key it holds in one vectorized pass:
lexsort both sides together with rights ordered before lefts at equal
timestamps, then a cumulative right-counter gives each left row its
predecessor right row — no per-key Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_on: str,
    right_on: str,
    n_buckets: int = 32,
):
    """Inner as-of join: left columns + right columns (minus ``key``).

    Column names of the two sides must be disjoint apart from ``key``
    (rename upstream — same rule as Acero joins)."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    l_cols = list(left_schema.names)
    r_cols = [c for c in right_schema.names if c != key]
    l_types = dict(zip(left_schema.names, left_schema.types))
    r_types = dict(zip(right_schema.names, right_schema.types))
    overlap = (set(l_cols) - {key}) & set(r_cols)
    if overlap:
        raise ValueError(f"asof_join column collision: {sorted(overlap)}")

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        out = {c: t[c] for c in l_cols}
        for c in r_cols:
            out[c] = pa.nulls(n, r_types[c])
        out["_side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(out)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        out = {}
        for c in l_cols:
            out[c] = t[key] if c == key else pa.nulls(n, l_types[c])
        for c in r_cols:
            out[c] = t[c]
        out["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(out)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        from dataflowkit_ray.stages.windows import bucket_of

        return t.append_column("_bucket", pa.array(bucket_of(t[key], n_buckets)))

    def fold(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        side = t["_side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 1)).drop_columns(["_side"])
        rt = t.filter(pa.array(side == 0)).drop_columns(["_side"])
        empty = pa.table(
            {
                **{c: pa.array([], l_types[c]) for c in l_cols},
                **{c: pa.array([], r_types[c]) for c in r_cols},
            }
        )
        if len(lt) == 0 or len(rt) == 0:
            return empty
        lk = lt[key]
        rk = rt[key]
        if isinstance(lk, pa.ChunkedArray):
            lk = lk.combine_chunks()
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        comb = pa.concat_arrays([rk.cast(lk.type), lk]).dictionary_encode()
        codes = comb.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_r = len(rt)
        r_code, l_code = codes[:n_r], codes[n_r:]
        l_ts = lt[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        r_ts = rt[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        # rights in (code, ts) order — their stable relative order inside
        # the combined sort below is identical
        r_order = np.lexsort((r_ts, r_code))
        all_code = np.concatenate([r_code, l_code])
        all_ts = np.concatenate([r_ts, l_ts])
        is_left = np.concatenate(
            [np.zeros(n_r, dtype=np.int8), np.ones(len(lt), dtype=np.int8)]
        )
        order = np.lexsort((is_left, all_ts, all_code))
        cum = np.cumsum(is_left[order] == 0) - 1  # last right slot so far
        left_pos = np.nonzero(is_left[order] == 1)[0]
        slots = cum[left_pos]
        left_orig = order[left_pos] - n_r
        valid = slots >= 0
        rc_sorted = r_code[r_order]
        ok = np.zeros(len(left_pos), dtype=bool)
        ok[valid] = rc_sorted[slots[valid]] == l_code[left_orig][valid]
        li = left_orig[ok]
        ri = r_order[slots[ok]]
        out_l = lt.take(pa.array(li, pa.int64()))
        out_r = rt.take(pa.array(ri, pa.int64()))
        cols = {c: out_l[c] for c in l_cols}
        for c in r_cols:
            cols[c] = out_r[c]
        return pa.table(cols)

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
