"""Relational queries over the TPC-H-style tables — the engine's generic
operators (pruned reads, bucket-pattern aggregation, broadcast semi-join,
bucket equi-join, top-k) exercised on wide relational data.

The reference has no relational surface; these exist to show the SAME
primitives that run the document pipeline run classic warehouse shapes
unchanged (SURVEY.md §2.5/§2.6 mappings).

Float discipline: money/quantity columns are converted to FIXED-POINT
int64 at the scan (cents / basis points) so every distributed sum is
exact integer arithmetic — a double sum's value depends on addition
order, which differs between the engine's per-batch partials and
DuckDB's sequential scan, and the oracle gate compares bit-for-bit.
The one division back to currency happens once per output row, in the
same expression order on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.stages.agg import hash_agg
from dataflowkit_ray.tokenize import blocks_for

_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def _us(date: str) -> int:
    """Naive timestamp -> epoch micros, tz-free (datetime.timestamp()
    would silently apply the local zone)."""
    return int((np.datetime64(date, "us") - _EPOCH) / np.timedelta64(1, "us"))


_Q1_CUTOFF = "1998-09-02"
_Q3_DATE = "1998-01-01"
_Q3_SEGMENT = "BUILDING"

# Per-row bound on disc_price_c = price_c * (10000 - discount_bp):
# TPC-H caps l_extendedprice near $110k -> price_c < 1.1e7 cents, times
# 10^4 bp -> 1.1e11 per row.  int64 holds ~9.2e18, so per-GROUP sums are
# safe below ~8e7 rows/group; the finalize step enforces this.
_DISC_PRICE_C_MAX = 11_000_000 * 10_000


def _read(sf_dir: str, table: str, columns: list[str]):
    """Pruned read with a metadata-stripped schema: the warehouse
    parquet files carry pandas field metadata whose dict payload defeats
    Ray's schema hashing (every read task then logs "Failed to hash the
    schemas (for deduplication)" and block-schema dedup is skipped);
    passing the bare projected schema restores it."""
    import pyarrow.parquet as pq
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    sch = pq.read_schema(path).remove_metadata()
    return ray.data.read_parquet(
        path,
        columns=columns,
        schema=pa.schema([sch.field(c) for c in columns]),
        override_num_blocks=blocks_for(path),
    )


def _fixed(col, scale: int) -> np.ndarray:
    """value -> fixed-point int64 with DuckDB's round() tie rule
    (half-AWAY-from-zero; np.rint is half-to-even, and a price of
    exactly 2.125 would scale to 212 here vs 213 in the oracle).
    Non-negative money/quantity columns only."""
    v = col.to_numpy(zero_copy_only=False) * scale
    return np.floor(v + 0.5).astype(np.int64)


def _scaled_lineitem(t: pa.Table) -> dict[str, np.ndarray]:
    """Fixed-point projections: qty in hundredths, price in cents,
    disc_price in cents*bp (÷1e6 to currency).  The single scaling
    definition for BOTH relational queries — the two SQL oracles use the
    same constants.  ``qty_c`` only when the projection carries it."""
    p = _fixed(t["l_extendedprice"], 100)
    d = _fixed(t["l_discount"], 10000)
    out = {"price_c": p, "disc_price_c": p * (10000 - d)}
    if "l_quantity" in t.column_names:
        out["qty_c"] = _fixed(t["l_quantity"], 100)
    return out


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1 analog: pricing summary per (returnflag, linestatus).

    Pruned read -> vectorized filter + fixed-point projection ->
    ``hash_agg`` (per-batch combiner + ONE bucket shuffle) -> one
    finalize division per output row."""
    cutoff = _us(_Q1_CUTOFF)

    def project(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        t = t.filter(pc.less_equal(ship, cutoff))
        s = _scaled_lineitem(t)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": pa.array(s["qty_c"]),
                "price_c": pa.array(s["price_c"]),
                "disc_price_c": pa.array(s["disc_price_c"]),
            }
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(project, batch_format="pyarrow")

    agg = hash_agg(
        ds,
        ("l_returnflag", "l_linestatus"),
        [
            ("qty_c", "sum", "sum_qty_c"),
            ("price_c", "sum", "sum_price_c"),
            ("disc_price_c", "sum", "sum_disc_price_c"),
            ("qty_c", "count", "count_order"),
        ],
        n_buckets=16,
    )

    def finalize(t: pa.Table) -> pa.Table:
        sq = t["sum_qty_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        sp = t["sum_price_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        sd = t["sum_disc_price_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["count_order"].to_numpy(zero_copy_only=False)
        # int64-overflow guard: disc_price_c addends are bounded by
        # _DISC_PRICE_C_MAX, so a group of n rows can only exceed int64
        # when n * bound >= 2^63 (~8e7 rows/group, ~sf90 for Q1's six
        # groups).  A distributed int64 sum wraps SILENTLY there while
        # the DuckDB oracle promotes to HUGEINT — refuse loudly instead
        # of diverging quietly.
        if (n.astype(np.float64) * _DISC_PRICE_C_MAX >= 2.0**63).any():
            raise OverflowError(
                "lineitem_agg: group row count puts the fixed-point "
                "disc_price sum at int64 overflow risk; re-scale the "
                "fixed-point constants or sum in two int64 levels"
            )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pa.array(sq / 100.0),
                "sum_base_price": pa.array(sp / 100.0),
                "sum_disc_price": pa.array(sd / 1000000.0),
                "avg_qty": pa.array((sq / 100.0) / n),
                "count_order": pa.array(n.astype(np.int64)),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


LINEITEM_AGG_SQL = f"""
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity      * 100)   AS BIGINT) AS qc,
         CAST(round(l_extendedprice * 100)   AS BIGINT) AS pc_,
         CAST(round(l_discount      * 10000) AS BIGINT) AS dc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qc)  AS DOUBLE) / 100.0     AS sum_qty,
       CAST(sum(pc_) AS DOUBLE) / 100.0     AS sum_base_price,
       CAST(sum(pc_ * (10000 - dc)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
       (CAST(sum(qc) AS DOUBLE) / 100.0) / count(*) AS avg_qty,
       count(*) AS count_order
FROM s GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(sf_dir: str):
    """TPC-H Q3 analog: top-10 open orders by revenue for one market
    segment.

    Shapes on display: the customer dimension is a BROADCAST semi-join
    (catalog-scale read, ``ray.put`` once, ``np.isin`` per batch — never
    a shuffle); lineitem pre-aggregates revenue per order through
    per-batch partials BEFORE any exchange (combiner-first rule); the
    aggregate's combine AND the order×revenue join share ONE tagged
    bucket shuffle (:func:`~dataflowkit_ray.stages.join.bucket_join_agg`
    — both are keyed by o_orderkey); the final top-k sorts only the
    (small) joined aggregate."""
    import ray

    import pyarrow.parquet as pq

    date = _us(_Q3_DATE)

    # dimension broadcast: customers of the segment (catalog-scale)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = pc.cast(
        cust.filter(pc.equal(cust["c_mktsegment"], _Q3_SEGMENT))["c_custkey"],
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    keys_ref = ray.put(np.sort(keys))

    def filter_orders(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        keep = (od < date) & np.isin(ck, ks, assume_unique=False)
        return pa.table(
            {"o_orderkey": pa.array(t["o_orderkey"].to_numpy(zero_copy_only=False)[keep])}
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(filter_orders, batch_format="pyarrow")

    def project_lineitem(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        t = t.filter(pc.greater(ship, date))
        s = _scaled_lineitem(t)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "revenue_c": pa.array(s["disc_price_c"]),
            }
        )

    # aggregate + join through ONE exchange (both are keyed by
    # o_orderkey): lineitem's per-batch revenue partials ride the join's
    # tagged bucket shuffle and the fold finishes the combine before the
    # local Acero join — half the all-to-alls of hash_agg-then-join
    from dataflowkit_ray.stages.join import bucket_join_agg

    joined = bucket_join_agg(
        orders,
        _read(
            sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(project_lineitem, batch_format="pyarrow"),
        on="o_orderkey",
        specs=[("revenue_c", "sum", "revenue_c")],
        n_buckets=16,
    )

    # scale-correct top-k: block-local top-10 partials (vectorized
    # lexsort), then ONE tiny merge — a global sort of the joined
    # aggregate would be an all-to-all whose only purpose is to keep 10
    # rows
    def partial_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "revenue_c": pa.array([], pa.int64()),
                }
            )
        rc = t["revenue_c"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -rc))[:10]
        return pa.table(
            {
                "o_orderkey": pa.array(ok[order].astype(np.int64)),
                "revenue_c": pa.array(rc[order].astype(np.int64)),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        t = partial_topk(t)  # merge of <= 10 * n_blocks partial rows
        rc = t["revenue_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "revenue": pa.array(rc / 1000000.0),
            }
        )

    return (
        joined.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow")
    )


TOP_ORDERS_SQL = f"""
WITH r AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS revenue_c
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{_Q3_DATE}'
  GROUP BY l_orderkey
)
SELECT o.o_orderkey, CAST(r.revenue_c AS DOUBLE) / 1000000.0 AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN r ON r.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}' AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
ORDER BY r.revenue_c DESC, o.o_orderkey
LIMIT 10
"""

RELATIONAL_QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "top_orders": q_top_orders,
}
RELATIONAL_ORACLES = {
    "lineitem_agg": LINEITEM_AGG_SQL,
    "top_orders": TOP_ORDERS_SQL,
}
