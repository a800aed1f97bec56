"""Scalar transform registry — the reference's ``Filter`` set.

``Filter.Apply`` (``/root/reference/scrape/scrape.go:87-132``) supports
``trim / lowercase / uppercase / capitalize / regex``; regex extracts one
capture group, joins all matches with ``";"`` and yields ``""`` on no
match (``scrape/scrape.go:119-127``).  The engine keeps the same registry
keyed by name (spec-driven, SURVEY.md §2.9) but applies each transform
vectorized over Arrow string arrays inside ``map_batches``.

DuckDB oracle equivalents (used in __ray_entry__.oracle_sql):
trim(x), lower(x), upper(x),
capitalize -> regexp_replace(x, '\\b[a-z]', y -> upper(y), 'g') analog,
regex -> array_to_string(regexp_extract_all(x, pat, 1), ';').
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


def _combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def f_trim(arr: pa.Array, param: str | None = None) -> pa.Array:
    return pc.utf8_trim_whitespace(_combine(arr))


def f_lowercase(arr: pa.Array, param: str | None = None) -> pa.Array:
    return pc.utf8_lower(_combine(arr))


def f_uppercase(arr: pa.Array, param: str | None = None) -> pa.Array:
    return pc.utf8_upper(_combine(arr))


def f_capitalize(arr: pa.Array, param: str | None = None) -> pa.Array:
    # reference uses Go strings.Title (every word) — pc.utf8_title matches
    return pc.utf8_title(_combine(arr))


def f_regex(arr: pa.Array, param: str) -> pa.Array:
    """All matches of capture group 1 (or whole match when no group),
    ';'-joined; "" when none — exactly ``scrape/scrape.go:119-127``.

    pyarrow has no extract-all kernel, so this runs a compiled C regex
    per value (still far from the hot path: scalar filters apply to short
    config-selected columns, not token arrays)."""
    rx = re.compile(param)
    grp = 1 if rx.groups >= 1 else 0

    def one(s: str | None) -> str:
        if s is None:
            return ""
        return ";".join(m.group(grp) for m in rx.finditer(s))

    a = _combine(arr)
    return pa.array([one(v) for v in a.to_pylist()], type=pa.string())


def f_relurl(arr: pa.Array, param: str) -> pa.Array:
    """Resolve each (possibly relative) URL against the base ``param`` —
    the reference's ``utils.RelUrl`` (``/root/reference/utils/utils.go:41-53``,
    Go ``url.ResolveReference`` == stdlib ``urljoin``).  Null/"" pass
    through as ""."""
    from urllib.parse import urljoin

    a = _combine(arr)
    return pa.array(
        [urljoin(param, v) if v else "" for v in a.to_pylist()],
        type=pa.string(),
    )


FILTERS: dict[str, Callable[[pa.Array, str | None], pa.Array]] = {
    "trim": f_trim,
    "lowercase": f_lowercase,
    "uppercase": f_uppercase,
    "capitalize": f_capitalize,
    "regex": f_regex,
    "relurl": f_relurl,
}


def apply_filters(
    batch: pa.Table,
    column: str,
    filters: list[tuple[str, str | None]],
    out_column: str | None = None,
) -> pa.Table:
    """Apply a filter chain to one column (order preserved, like the
    reference applying ``Field.Filters`` sequentially)."""
    arr = batch[column]
    for name, param in filters:
        if name not in FILTERS:
            raise ValueError(f"unknown filter {name!r}; known: {sorted(FILTERS)}")
        arr = FILTERS[name](arr, param)
    out = out_column or column
    if out in batch.column_names:
        batch = batch.drop_columns([out])
    return batch.append_column(out, arr)


def filters_stage(column: str, filters: list[tuple[str, str | None]], out_column: str | None = None):
    """map_batches-ready closure."""

    def fn(batch: pa.Table) -> pa.Table:
        return apply_filters(batch, column, filters, out_column)

    return fn


# ---------------------------------------------------- array/list helpers
# (reference: intArrayToString / floatArrayToString ';'-join,
#  /root/reference/scrape/encoders.go:384-394; ArrayContains,
#  /root/reference/utils/utils.go:69-76)


def f_array_join(arr: pa.Array | pa.ChunkedArray, sep: str = ";") -> pa.Array:
    """list<any> -> sep-joined string per row (vectorized)."""
    a = _combine(arr)
    return pc.binary_join(pc.cast(a, pa.list_(pa.string())), sep)


def f_array_contains(arr: pa.Array | pa.ChunkedArray, value) -> pa.Array:
    """list<any> CONTAINS value -> bool per row.

    Membership over the flattened values + per-row any() via min/max of
    segment sums — all Arrow/numpy, no row loop."""
    import numpy as np

    a = _combine(arr)
    flat = a.flatten()
    hit = pc.equal(flat, value)
    hits = hit.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = a.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    lengths = np.diff(offsets)
    seg = np.add.reduceat(np.append(hits, 0), offsets[:-1]) * (lengths > 0)
    return pa.array(seg > 0)
