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
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        top = min(k + 1, sims.shape[1])  # +1: a self-match may occupy a slot
        for qi in range(sims.shape[0]):
            s = sims[qi]
            idx = np.argpartition(-s, top - 1)[:top]
            # deterministic order: sim desc, id asc
            idx = idx[np.lexsort((ids[idx], -s[idx]))]
            for j in idx:
                if ids[j] == qid[qi]:
                    continue
                rows["query_id"].append(int(qid[qi]))
                rows["neighbor_id"].append(int(ids[j]))
                rows["sim"].append(float(s[j]))
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                "sim": pa.array(rows["sim"], pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        qids = t["query_id"].to_numpy(zero_copy_only=False)
        nids = t["neighbor_id"].to_numpy(zero_copy_only=False)
        sims = t["sim"].to_numpy(zero_copy_only=False)
        out = {"query_id": [], "neighbor_id": [], "sim": [], "rank": []}
        for q_ in np.unique(qids):
            m = qids == q_
            order = np.lexsort((nids[m], -sims[m]))[:k]
            for r, j in enumerate(order):
                out["query_id"].append(int(q_))
                out["neighbor_id"].append(int(nids[m][j]))
                out["sim"].append(float(sims[m][j]))
                out["rank"].append(r + 1)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
                "rank": pa.array(out["rank"], pa.int64()),
            }
        )

    # per-query partials are tiny (k+1 per batch); one bucket shuffle on query_id
    from dataflowkit_ray.stages.windows import bucket_of

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(bucket_of(t["query_id"], 16)))

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(lambda t: finalize(t.drop_columns(["_bucket"])), batch_format="pyarrow")
    )


def cosine_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    all_vecs: np.ndarray | None = None,
    all_ids: np.ndarray | None = None,
):
    """All (a < b) pairs with cosine >= threshold — blocked brute force.

    Each batch multiplies against the broadcast full matrix (the small
    side at test scale; at corpus scale swap in :func:`lsh_dup_pairs`).
    """
    import ray

    m_ref = ray.put((_unit(np.asarray(all_vecs, dtype=np.float64)), np.asarray(all_ids)))

    def block(t: pa.Table) -> pa.Table:
        full, full_ids = ray.get(m_ref)
        m = _unit(_mat(t[vec_col]))
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False)
        sims = np.round(m @ full.T, 6)
        bi, fj = np.nonzero(sims >= threshold)
        a = ids[bi]
        b = full_ids[fj]
        keep = a < b
        return pa.table(
            {
                "doc_a": pa.array(a[keep].astype(np.int64)),
                "doc_b": pa.array(b[keep].astype(np.int64)),
                "cosine": pa.array(sims[bi, fj][keep]),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow")


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
        m = _unit(_mat(t[vec_col]))
        ids = (
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray)
            else t[id_col]
        ).to_numpy(zero_copy_only=False)
        pl = planes_for(m.shape[1])
        rows = {"table": [], "sig": [], id_col: [], vec_col: []}
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        for ti in range(n_tables):
            signs = (m @ pl[ti].T) > 0  # (B, n_planes)
            sig = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(
                axis=1
            )
            rows["table"].extend([ti] * len(ids))
            rows["sig"].extend(sig.astype(np.int64).tolist())
            rows[id_col].extend(ids.tolist())
        return pa.table(
            {
                "table": pa.array(rows["table"], pa.int32()),
                "sig": pa.array(rows["sig"], pa.int64()),
                id_col: pa.array(rows[id_col], pa.int64()),
                vec_col: pa.concat_arrays([vecs.combine_chunks() if isinstance(vecs, pa.ChunkedArray) else vecs] * n_tables),
            }
        )

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        ti = t["table"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sg = t["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = fnv1a64_numpy(ti * np.uint64(0x9E3779B97F4A7C15) + sg)
        return t.append_column("_bucket", pa.array((mix % np.uint64(64)).astype(np.int64)))

    from dataflowkit_ray.stages.dedup import _pairs_from_groups

    def verify_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        group = (
            t["table"].to_numpy(zero_copy_only=False).astype(np.int64) * (1 << 50)
            + t["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        m = _unit(_mat(t[vec_col]))
        vec_by_id = {}
        for i, d in enumerate(ids):
            vec_by_id.setdefault(int(d), m[i])
        cand = _pairs_from_groups(ids, group)
        out = {"doc_a": [], "doc_b": [], "cosine": []}
        for a, b_ in cand:
            c = round(float(vec_by_id[int(a)] @ vec_by_id[int(b_)]), 6)
            if c >= threshold:
                out["doc_a"].append(int(a))
                out["doc_b"].append(int(b_))
                out["cosine"].append(c)
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"], pa.int64()),
                "doc_b": pa.array(out["doc_b"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    pairs = (
        sigs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )
    from dataflowkit_ray.stages.agg import hash_agg

    return hash_agg(pairs, ("doc_a", "doc_b"), [("cosine", "min", "cosine")], n_buckets=16)
