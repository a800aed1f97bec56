"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and every batch does one float64 matmul against it (the
broadcast-small-side pattern of SURVEY.md §2.4 J3, never re-shipped per
batch).  Scale path: LSH-bucketed variant — random-hyperplane signs
(deterministic planes) bucket vectors so only same-bucket pairs are
compared; recall < 1 by construction, precision exact (verified cosine).

Float discipline: all similarities computed in float64 and rounded to 6
decimals BEFORE ranking, ties broken by ascending id — the DuckDB oracle
applies the identical rounding, so rankings agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataflowkit_ray.tokenize import fnv1a64_numpy


def _mat(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms



_TOPK_EMPTY = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    }
)


def _emit_topk_rows(sims: np.ndarray, ids: np.ndarray, qids: np.ndarray, k: int) -> pa.Table:
    """Per-batch partial top-k rows from a (Q, B) sim matrix (shared by
    the brute and IVF paths; entries <= -2.0 are masked out).

    Fully vectorized: one argpartition over the matrix, one composite-key
    argsort for the (sim desc, id asc) deterministic order, one boolean
    gather — no per-query Python (a row-at-a-time loop here was flat at
    Q=10 but the wrong shape for a 1k-query fan-out).  The composite key
    relies on sims being rounded to 6 decimals and ids < 2^40."""
    Q, B = sims.shape
    if Q == 0 or B == 0:
        return _TOPK_EMPTY
    ids = ids.astype(np.int64)
    if len(ids) and (int(ids.max()) >= (1 << 40) or int(ids.min()) < 0):
        # the composite key would overflow/misorder silently;
        # fail loudly instead (remap snowflake-style ids upstream)
        raise ValueError("_emit_topk_rows: neighbor ids must be in [0, 2^40)")
    top = min(k + 1, B)  # +1: a self-match may occupy a slot
    if top < B:
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
    else:
        idx = np.broadcast_to(np.arange(B, dtype=np.int64), (Q, B))
    nid = ids[idx]  # (Q, top)
    s = np.take_along_axis(sims, idx, axis=1)
    si = np.rint(s * 1e6).astype(np.int64)  # exact: sims pre-rounded to 6dp
    key = (np.int64(2_000_000) - si) * np.int64(1 << 40) + nid
    order = np.argsort(key, axis=1, kind="stable")
    nid = np.take_along_axis(nid, order, axis=1)
    s = np.take_along_axis(s, order, axis=1)
    qrep = np.repeat(qids.astype(np.int64), top).reshape(Q, top)
    valid = (s > -2.0) & (nid != qrep)
    return pa.table(
        {
            "query_id": pa.array(qrep[valid]),
            "neighbor_id": pa.array(nid[valid]),
            "sim": pa.array(s[valid], pa.float64()),
        }
    )


def _merge_topk(partials, k: int):
    """Global top-k per query over the partial rows: one bucket shuffle
    on query_id + a vectorized per-bucket rank (shared final stage)."""
    from dataflowkit_ray.stages.windows import bucket_of

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(bucket_of(t["query_id"], 16)))

    def finalize(t: pa.Table) -> pa.Table:
        """Vectorized per-bucket rank: one lexsort + one segment-relative
        arange — no per-query Python."""
        if len(t) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        qids = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nids = t["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = t["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nids, -sims, qids))  # qid asc, sim desc, id asc
        q_s, n_s, s_s = qids[order], nids[order], sims[order]
        newq = np.ones(len(q_s), dtype=bool)
        newq[1:] = q_s[1:] != q_s[:-1]
        starts = np.nonzero(newq)[0]
        seg_len = np.diff(np.append(starts, len(q_s)))
        rank = np.arange(len(q_s), dtype=np.int64) - np.repeat(starts, seg_len)
        keep = rank < k
        return pa.table(
            {
                "query_id": pa.array(q_s[keep]),
                "neighbor_id": pa.array(n_s[keep]),
                "sim": pa.array(s_s[keep], pa.float64()),
                "rank": pa.array(rank[keep] + 1),
            }
        )

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(lambda t: finalize(t.drop_columns(["_bucket"])), batch_format="pyarrow")
    )


def brute_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Top-k cosine neighbors of each query over the whole dataset.

    Per batch: partial top-k against the broadcast query matrix (one
    matmul); a final small aggregation keeps the global top-k per query.
    Self-matches (same id) are excluded.
    """
    import ray

    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)  # broadcast once, read by every task
    qid = np.asarray(query_ids, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _unit(_mat(t[vec_col]))
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False)
        sims = np.round(qm @ m.T, 6)  # (Q, B)
        return _emit_topk_rows(sims, ids, qid, k)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _merge_topk(partials, k)


def cosine_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    all_vecs: np.ndarray | None = None,  # ignored (kept for API compat)
    all_ids: np.ndarray | None = None,
):
    """All (a < b) pairs with cosine >= threshold — distributed block-pair
    all-pairs join (recall 1.0, exact).

    Each vector is hash-assigned to one of ``n_blocks`` blocks and
    replicated once per *block pair* it participates in (``n_blocks``
    copies); one shuffle co-groups every block pair (i <= j) and a single
    float64 matmul per group finds the qualifying pairs.  Nothing touches
    the driver; shuffle volume is N * n_blocks rows, compute is the
    inherent O(N^2) of an all-pairs-below-threshold query, split over
    ``n_blocks * (n_blocks+1) / 2`` tasks.  Size ``n_blocks`` ~
    sqrt(N^2 / pairs_per_task) at corpus scale.  For HIGH thresholds use
    :func:`lsh_dup_pairs`, which prunes the candidate space instead.
    """

    def expand(t: pa.Table) -> pa.Table:
        m = _mat(t[vec_col])
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        own = (fnv1a64_numpy(ids.astype(np.uint64)) % np.uint64(n_blocks)).astype(
            np.int64
        )
        n = len(ids)
        other = np.tile(np.arange(n_blocks, dtype=np.int64), n)
        own_rep = np.repeat(own, n_blocks)
        lo = np.minimum(own_rep, other)
        hi = np.maximum(own_rep, other)
        # each row lands in group (o,o) once and in each (o,x) once, so
        # every block pair co-groups exactly one copy of each member row
        group = lo * n_blocks + hi
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        row_idx = np.repeat(np.arange(n), n_blocks)
        return pa.table(
            {
                "_grp": pa.array(group),
                "_own": pa.array(own_rep),
                id_col: pa.array(ids[row_idx]),
                vec_col: vecs.take(pa.array(row_idx)),
            }
        )

    def compare(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        grp = int(t["_grp"][0].as_py())
        lo, hi = grp // n_blocks, grp % n_blocks
        own = t["_own"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _unit(_mat(t[vec_col]))
        if lo == hi:
            # deduplicate the n_blocks copies of each same-block row
            uniq, first = np.unique(ids, return_index=True)
            mm = m[first]
            sims = np.round(mm @ mm.T, 6)
            ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b = uniq[ai], uniq[bi]
            cs = sims[ai, bi]
        else:
            li = own == lo
            ri = own == hi
            if not li.any() or not ri.any():
                return empty
            sims = np.round(m[li] @ m[ri].T, 6)
            ai, bi = np.nonzero(sims >= threshold)
            a, b = ids[li][ai], ids[ri][bi]
            cs = sims[ai, bi]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table(
            {
                "doc_a": pa.array(a2.astype(np.int64)),
                "doc_b": pa.array(b2.astype(np.int64)),
                "cosine": pa.array(cs, pa.float64()),
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(compare, batch_format="pyarrow")
    )


def lsh_dup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Scale path: random-hyperplane LSH buckets, verify cosine in-bucket.

    Deterministic planes (FNV-seeded LCG); vectors agreeing on all
    ``n_planes`` signs in ANY of ``n_tables`` tables become candidates.
    Output schema matches :func:`cosine_dup_pairs`; recall < 1 by design.
    """

    dim_holder = {}

    def planes_for(dim: int) -> np.ndarray:
        if dim not in dim_holder:
            # deterministic pseudo-gaussian via sum of 12 LCG uniforms
            n = n_tables * n_planes * dim
            seed = np.arange(n * 12, dtype=np.uint64)
            u = (fnv1a64_numpy(seed) % np.uint64(1 << 30)).astype(np.float64) / (1 << 30)
            g = u.reshape(n, 12).sum(axis=1) - 6.0
            dim_holder[dim] = g.reshape(n_tables, n_planes, dim)
        return dim_holder[dim]

    def sig_stage(t: pa.Table) -> pa.Table:
        """Ships (table, sig, id) ONLY — vectors never enter the banding
        shuffle (÷ n_tables shuffle bytes vs replicating the vector)."""
        m = _unit(_mat(t[vec_col]))
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        pl = planes_for(m.shape[1])
        n = len(ids)
        # (T, B) signature matrix in one shot
        signs = np.einsum("bd,tpd->tbp", m, pl) > 0  # (T, B, P)
        sig = (
            signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)[None, None, :]
        ).sum(axis=2)  # (T, B)
        return pa.table(
            {
                "table": pa.array(
                    np.repeat(np.arange(n_tables, dtype=np.int32), n)
                ),
                "sig": pa.array(sig.ravel().astype(np.int64)),
                id_col: pa.array(np.tile(ids, n_tables)),
            }
        )

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        ti = t["table"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sg = t["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = fnv1a64_numpy(ti * np.uint64(0x9E3779B97F4A7C15) + sg)
        return t.append_column("_bucket", pa.array((mix % np.uint64(64)).astype(np.int64)))

    from dataflowkit_ray.stages.agg import hash_agg
    from dataflowkit_ray.stages.dedup import _pairs_from_groups, pair_payload_join

    def pairs_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        group = (
            t["table"].to_numpy(zero_copy_only=False).astype(np.int64) * (1 << 50)
            + t["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        cand = _pairs_from_groups(ids, group)
        return pa.table(
            {
                "doc_a": pa.array(cand[:, 0].astype(np.int64)),
                "doc_b": pa.array(cand[:, 1].astype(np.int64)),
            }
        )

    # duplicate pairs (several tables agreeing) dedupe inside the verify
    # join's per-pair group — no distinct-ify shuffle needed
    cand = (
        sigs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: pairs_bucket(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )

    # verify: bucket join of pairs x (id -> vector); batched dot products
    def payload_stage(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        return pa.table({id_col: pc.cast(ids, pa.int64()), "vec": vecs})

    payload_ds = ds.map_batches(payload_stage, batch_format="pyarrow")
    vec_type = payload_ds.schema().types[1]

    def cosine_verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        newpair = np.ones(len(t), dtype=bool)
        newpair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        pair_id = np.cumsum(newpair) - 1
        n_pairs = int(pair_id[-1]) + 1
        complete = np.bincount(pair_id, minlength=n_pairs) == 2
        m = _unit(_mat(t["payload"]))
        first = np.nonzero(newpair)[0]
        i0 = first[complete]
        cs = np.round(np.einsum("ij,ij->i", m[i0], m[i0 + 1]), 6)
        keep = cs >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[i0][keep].astype(np.int64)),
                "doc_b": pa.array(b[i0][keep].astype(np.int64)),
                "cosine": pa.array(cs[keep], pa.float64()),
            }
        )

    return pair_payload_join(
        cand,
        payload_ds,
        cosine_verify,
        id_col=id_col,
        payload_col="vec",
        payload_type=vec_type,
        n_buckets=64,
    )


# ----------------------------------------------------------------- IVF


def ivf_centroids(
    ds,
    n_centroids: int = 16,
    n_iters: int = 5,
    sample_cap: int = 4096,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means over a hash-sampled
    subset with an ABSOLUTE row budget, fixed iteration count, seeds =
    the sample's lowest-id rows.

    Scale shape: the sample filter keeps ids with
    ``hash(id) % (n_rows // sample_cap) == 0``, so ~``sample_cap`` rows
    reach the driver REGARDLESS of corpus size (an earlier version
    pulled a fixed 1/7 *fraction* — a corpus-fraction driver pull, wrong
    at 100 TB; this is the faiss-style train-on-a-bounded-sample build).
    No distributed sort either: the sample is ordered driver-side.
    ``n_rows`` avoids a count pass when the caller knows the corpus size
    (e.g. from parquet metadata); ``ds.count()`` is metadata-only for
    un-transformed parquet reads."""
    if n_rows is None:
        n_rows = ds.count()
    mod = max(1, n_rows // sample_cap)

    def sample(t: pa.Table) -> pa.Table:
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (fnv1a64_numpy(ids) % np.uint64(mod)) == 0
        return t.filter(pa.array(keep)).select([id_col, vec_col])

    st = ds.map_batches(sample, batch_format="pyarrow").take_all()
    ids = np.asarray([r[id_col] for r in st], dtype=np.int64)
    m = _unit(np.asarray([r[vec_col] for r in st], dtype=np.float64))
    m = m[np.argsort(ids)]  # deterministic regardless of arrival order
    k = min(n_centroids, len(m))
    cent = m[:k].copy()  # deterministic seeds: k lowest-id sample rows
    for _ in range(n_iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def _score_cell(
    t: pa.Table,
    qm: np.ndarray,
    qids: np.ndarray,
    probed: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> tuple[pa.Table, int]:
    """Score ONE inverted-list cell against only the queries probing it.

    Returns (partial top-k rows, number of scored (query, vector)
    entries) — the count is what the probe-shrink pytest asserts on:
    compute, not just emitted rows, must scale with n_probe."""
    if len(t) == 0:
        return _TOPK_EMPTY, 0
    cell = int(t["_cell"][0].as_py())
    q_idx = np.nonzero(probed[:, cell])[0]
    if len(q_idx) == 0:
        return _TOPK_EMPTY, 0
    ids = (
        t[id_col].combine_chunks()
        if isinstance(t[id_col], pa.ChunkedArray)
        else t[id_col]
    ).to_numpy(zero_copy_only=False)
    m = _unit(_mat(t[vec_col]))
    sims = np.round(qm[q_idx] @ m.T, 6)  # (Q_probing, cell_size)
    return _emit_topk_rows(sims, ids, qids[q_idx], k), sims.size


def ivf_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF top-k over real inverted lists: vectors are hash-partitioned
    by nearest-centroid cell ONCE (the index-build shuffle), and each
    cell partition is scored ONLY against the queries probing it — so
    the matmul work itself shrinks ~ n_probe / n_centroids
    (``tests/test_training_ops.py::test_ivf_scored_rows_shrink`` asserts
    the scored-entry count, not just the emitted rows; an earlier
    version computed the full Q x B matrix and masked, which saved
    nothing).  ``n_probe = len(centroids)`` degrades to exact brute
    force.  Partitioning assumption: one cell's vectors fit one task —
    cells are bounded by corpus/n_centroids on mid-scale corpora; size
    ``n_centroids`` accordingly (sqrt(N) is the classic choice).
    Centroids + query matrix + probe mask are one small ``ray.put``
    broadcast; the cell exchange ships each vector exactly once."""
    import ray

    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    qid = np.asarray(query_ids, dtype=np.int64)
    cent = np.asarray(centroids, dtype=np.float64)
    # boolean (Q, K) probe mask: the n_probe nearest centroids per query
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    probed = np.zeros((len(q), len(cent)), dtype=bool)
    probed[np.arange(len(q))[:, None], probe] = True
    ref = ray.put((q, qid, cent, probed))

    def assign(t: pa.Table) -> pa.Table:
        """One matmul per batch routes each vector to its cell — the
        inverted-list build side of the exchange."""
        _qm, _qi, cm, _pm = ray.get(ref)
        m = _unit(_mat(t[vec_col]))
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        cell = np.argmax(m @ cm.T, axis=1).astype(np.int64)
        return pa.table({"_cell": pa.array(cell), id_col: pa.array(ids), "vec": vecs})

    def score(t: pa.Table) -> pa.Table:
        qm, qids, _cm, pm = ray.get(ref)
        out, _n = _score_cell(t, qm, qids, pm, k, id_col=id_col)
        return out

    partials = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_cell")
        .map_groups(score, batch_format="pyarrow")
    )
    return _merge_topk(partials, k)

