"""Per-source policy broadcast — the robots.txt / per-domain-config
analog (S3/ST1): a SMALL per-source config table is built once, broadcast
via ``ray.put``, and loaded ONCE PER ACTOR in ``__init__`` (never
re-shipped per batch), then applied vectorized to the token stream.

The reference fetches per-domain robots rules once and consults them on
every request (``/root/reference/fetch/fetcher.go:123-137``,
``scrape/scrape.go:343-349``); here the policy is a deterministic
min-token threshold per source so the DuckDB oracle can replay it:

    min_tok(source) = 20 + (length(source) % 4) * 10
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def policy_for_source(source: str) -> int:
    return 20 + (len(source) % 4) * 10


def build_source_policy(sources: list[str]) -> dict[str, int]:
    """The tiny config table (one row per distinct source)."""
    return {s: policy_for_source(s) for s in sources}


class SourcePolicyFilter:
    """Actor-pool stage: policy table loaded once per actor.

    ``__init__`` receives the ``ray.put`` ObjectRef and resolves it ONCE
    (per actor, not per batch); ``__call__`` applies the threshold
    vectorized through the batch's source dictionary."""

    def __init__(self, policy_ref):
        import ray

        self.policy: dict[str, int] = ray.get(policy_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        # unknown sources (not in the policy table) default to the
        # formula — the policy table is authoritative when present
        thresh = np.asarray(
            [self.policy.get(u, policy_for_source(u)) for u in uniq],
            dtype=np.int64,
        )
        per_row = thresh[d.indices.to_numpy(zero_copy_only=False)]
        n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        # keep the FULL stream schema: the policy is a row filter, and
        # downstream spec stages (pattern/join/window) still need
        # tokens/event_seq — projection is the caller's decision
        return t.filter(pa.array(n_tok >= per_row))


class ThrottleStage:
    """Politeness throttle (ST6): caps the per-actor row rate — the batch
    analog of the reference's per-domain fetch delay
    (``/root/reference/scrape/scrape.go:343-349``: 500 ms + jitter per
    request).  Identity on DATA (replays bit-identical); the rate cap is
    a wall-clock side effect only, so it lives outside every oracle
    comparison.  Rate is per actor: total ceiling = rate x concurrency."""

    def __init__(self, rows_per_sec: float):
        if rows_per_sec <= 0:
            raise ValueError("rows_per_sec must be > 0")
        self.rate = rows_per_sec

    def __call__(self, t: pa.Table) -> pa.Table:
        import time

        time.sleep(len(t) / self.rate)
        return t


def throttle(ds, rows_per_sec: float, concurrency: int = 1):
    """Rate-capped identity stage (actor pool)."""
    return ds.map_batches(
        ThrottleStage,
        fn_constructor_args=(rows_per_sec,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )


def source_policy_filter(token_ds, sources: list[str] | None = None, concurrency: int = 2):
    """token stream -> policy-filtered stream.

    Builds the distinct-source config table (a tiny aggregate — pass
    ``sources`` from a pruned metadata read to avoid re-deriving the
    stream), broadcasts it once, and filters through an actor pool."""
    import ray

    if sources is None:
        sources = token_ds.unique("source")
    ref = ray.put(build_source_policy(sources))
    return token_ds.map_batches(
        SourcePolicyFilter,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )


# ------------------------------------------------- mixture sampling
# Training-data mixture weighting: keep each source at its own
# deterministic rate (per-mille).  Randomness is banned for
# replay-identity (SURVEY.md §7), so the sample predicate is a pure
# function of the row key — a multiplicative 64-bit hash of doc_id —
# and the identical expression is writable in DuckDB HUGEINT
# arithmetic (MIXTURE_KEY_SQL), making the sampler oracle-replayable.

from dataflowkit_ray.config import FNV_PRIME as _MIX_PRIME

_U64 = "18446744073709551616"  # 2^64
# DuckDB % keeps the dividend's sign, numpy's uint64 cast wraps — map
# the id into [0, 2^64) FIRST so negative ids bucket identically on
# both sides (HUGEINT is 128-bit: u < 2^64 times the 41-bit prime
# stays < 2^105, no overflow)
MIXTURE_KEY_SQL = (
    f"CAST((((CAST(doc_id AS HUGEINT) % {_U64}) + {_U64}) % {_U64}"
    f" * {_MIX_PRIME}) % {_U64} % 1000 AS BIGINT)"
)


def mixture_bucket(ids: np.ndarray) -> np.ndarray:
    """per-mille bucket of each int64 doc id (wrapping u64 multiply)."""
    k = ids.astype(np.uint64) * np.uint64(_MIX_PRIME)  # wraps mod 2^64
    return (k % np.uint64(1000)).astype(np.int64)


def mixture_sample(
    ds,
    rates_pm: dict[str, int],
    default_pm: int = 0,
    id_col: str = "doc_id",
    source_col: str = "source",
    columns: list[str] | None = None,
):
    """Per-source mixture sampler: keep a row iff its per-mille bucket
    < the source's rate (e.g. {"web": 350, "code": 1000} keeps 35% of
    web and all of code).  The rate table is mixture-config-sized and
    travels INSIDE the closure (a few strings); the sample itself is a
    row-local vectorized filter — zero exchange, zero driver pull,
    streams at 100 TB.  Rate lookup runs once per UNIQUE source per
    batch via the dictionary, not per row.

    ``columns``: projection of the surviving rows (None keeps EVERY
    column — a mixture terminal must emit the training payload itself,
    not just its keys)."""
    from dataflowkit_ray.config import np_col

    rates = dict(rates_pm)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np_col(pc.cast(t[id_col], pa.int64()))
        bucket = mixture_bucket(ids)
        src = t[source_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        lut = np.asarray(
            [rates.get(s, default_pm) for s in d.dictionary.to_pylist()],
            dtype=np.int64,
        )
        thresh = lut[np_col(d.indices)]
        out = t.filter(pa.array(bucket < thresh))
        return out.select(columns) if columns is not None else out

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sample_sql(
    rates_pm: dict[str, int], default_pm: int = 0, token_cte: str = ""
) -> str:
    """DuckDB twin of :func:`mixture_sample` over the tokenized stream
    (projected to the gate's (doc_id, n_tok, source)).  Source names are
    quote-escaped; an empty rate table degenerates to the default rate
    alone (no CASE — DuckDB rejects a WHEN-less CASE)."""
    if rates_pm:
        cases = " ".join(
            f"WHEN '{s.replace(chr(39), chr(39) * 2)}' THEN {int(pm)}"
            for s, pm in sorted(rates_pm.items())
        )
        rate_expr = f"CASE source {cases} ELSE {int(default_pm)} END"
    else:
        rate_expr = str(int(default_pm))
    return f"""
        WITH {token_cte}
        SELECT doc_id, n_tok, source FROM tok
        WHERE {MIXTURE_KEY_SQL} < {rate_expr}
    """
