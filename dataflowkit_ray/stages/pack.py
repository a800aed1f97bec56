"""Sequence-packing manifest — the concat-and-chunk pretraining prep.

Standard LLM pretraining concatenates the token stream in a canonical
order and slices it into fixed-length training sequences ("packs") of
``seq_len`` tokens, letting documents straddle pack boundaries.  This
stage computes the PACKING MANIFEST: for every doc, its global token
offset in the concatenated stream and the first/last pack it occupies —
metadata-level (no token bytes move), which is what a downstream
materializer or loader actually needs to cut packs out of the original
parquet.

Scale shape (the global prefix sum, distributed):
  1. bucket docs by ``g = event_seq // group_size`` (deterministic,
     order-preserving);
  2. ONE tiny aggregate — per-bucket token sums (``hash_agg``, result is
     ``n_docs / group_size`` rows);
  3. the driver exclusive-prefix-sums the bucket totals (catalog-scale:
     ``group_size`` is the knob that bounds this — at 10^12 docs,
     ``group_size=10^7`` keeps the driver array at 10^5 int64s) and
     broadcasts the offsets via ``ray.put``;
  4. ONE int-only exchange — ``groupby(g).map_groups``: each bucket
     sorts its (doc_id, n_tok, event_seq) rows by the event clock,
     cumsums locally, and adds its broadcast base offset.
Token payloads never move; the two exchanges carry 24-byte rows.

Oracle twin (PACK_MANIFEST_SQL): a plain windowed running sum
``SUM(n_tok) OVER (ORDER BY event_seq ROWS UNBOUNDED PRECEDING ... 1
PRECEDING)`` — exact, hash-gated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_manifest(ds, seq_len: int, group_size: int = 4096):
    """token stream -> (doc_id, global_start, pack_first, pack_last).

    ``pack_last`` is clamped to ``>= pack_first`` so an (anomalous)
    zero-token doc sits wholly in its starting pack instead of ending in
    the previous one — the SQL twin applies the same GREATEST clamp, and
    integer division stays on non-negative operands on both sides
    (DuckDB ``//`` truncates where numpy floors; negatives never occur
    after the clamp)."""
    import ray

    from dataflowkit_ray.config import np_col
    from dataflowkit_ray.stages.agg import hash_agg

    if seq_len <= 0 or group_size <= 0:
        raise ValueError("pack_manifest: seq_len and group_size must be > 0")

    def _empty_manifest() -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "global_start": pa.array([], pa.int64()),
                "pack_first": pa.array([], pa.int64()),
                "pack_last": pa.array([], pa.int64()),
            }
        )

    def project(t: pa.Table) -> pa.Table:
        seq = np_col(t["event_seq"])
        if len(seq) and seq.min() < 0:
            # a negative clock would floor-divide to a negative bucket id
            # and corrupt every downstream offset — refuse loudly
            raise ValueError(
                "pack_manifest: event clock must be non-negative, got "
                f"{int(seq.min())}"
            )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
                "event_seq": pa.array(seq),
                "g": pa.array(seq // group_size),
            }
        )

    # materialize the 32-byte-row projection ONCE: both passes (bucket
    # totals, then the group cumsum) consume it, and an unmaterialized
    # lineage would re-run the full upstream read+tokenize per pass (the
    # measured branched-lineage pitfall).  Cost is ~32 GB per 10^9 docs
    # in the object store (spillable); at extreme scale land `slim` in a
    # scratch parquet via write_partitioned instead and read it twice.
    slim = ds.map_batches(project, batch_format="pyarrow").materialize()

    # bucket totals: the ONLY driver pull, group_size-bounded by design
    totals = (
        hash_agg(slim, ("g",), [("n_tok", "sum", "tok_sum")], n_buckets=16)
        .to_pandas()
    )
    if totals.empty:  # empty input: hash_agg loses schema, guard first
        return ray.data.from_arrow(_empty_manifest())
    totals = totals.sort_values("g")
    gids = totals["g"].to_numpy().astype(np.int64)  # sorted bucket ids
    sums = totals["tok_sum"].to_numpy().astype(np.int64)
    base = np.zeros(len(sums), dtype=np.int64)
    if len(sums) > 1:
        base[1:] = np.cumsum(sums[:-1])
    # (gids, base) lookup by searchsorted — sized by the BUCKET COUNT
    # (n_docs / group_size), never by max(event_seq): a dense array
    # indexed by g would be O(clock range), exploding on sparse clocks
    offs_ref = ray.put((gids, base))

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # zero-row group block (the r1 sort pitfall)
            return _empty_manifest()
        gids_l, base_l = ray.get(offs_ref)
        order = np.argsort(np_col(t["event_seq"]), kind="stable")
        n_tok = np_col(t["n_tok"])[order]
        doc = np_col(t["doc_id"])[order]
        g = int(t["g"][0].as_py())
        start = np.zeros(len(n_tok), dtype=np.int64)
        if len(n_tok) > 1:
            start[1:] = np.cumsum(n_tok[:-1])
        start += base_l[np.searchsorted(gids_l, g)]
        pack_first = start // seq_len
        pack_last = np.maximum(start + n_tok - 1, start) // seq_len
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "global_start": pa.array(start),
                "pack_first": pa.array(pack_first),
                "pack_last": pa.array(pack_last),
            }
        )

    return (
        slim.groupby("g").map_groups(finish, batch_format="pyarrow")
    )


def pack_manifest_sql(seq_len: int, token_cte: str) -> str:
    """DuckDB twin: global running token sum over the event clock."""
    return f"""
        WITH {token_cte},
        w AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(n_tok AS BIGINT) AS n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (
                   ORDER BY event_seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS global_start
          FROM tok
        )
        SELECT doc_id,
               global_start,
               global_start // {seq_len} AS pack_first,
               GREATEST(global_start + n_tok - 1, global_start)
                 // {seq_len} AS pack_last
        FROM w
    """
