"""KMV distinct sketch: accuracy envelope, merge associativity, exactness
below k, determinism."""

import numpy as np
import pyarrow as pa
import pytest

from dataflowkit_ray.stages.sketch import kmv_distinct, kmv_estimate
from dataflowkit_ray.tokenize import fnv1a64_numpy


def _stream(n_rows, n_distinct, n_keys=3):
    import ray.data

    rng = np.arange(n_rows)
    t = pa.table(
        {
            "source": pa.array([f"s{i % n_keys}" for i in rng]),
            "doc_id": pa.array((rng % n_distinct).astype(np.int64)),
        }
    )
    return ray.data.from_arrow(t).repartition(8), t


def test_exact_below_k(ray_session):
    ds, t = _stream(n_rows=500, n_distinct=60)
    out = kmv_distinct(ds, keys=("source",), k=256).to_pandas()
    # 60 distinct doc_ids per key (each key sees all residues) < k -> exact
    exact = t.to_pandas().groupby("source").doc_id.nunique()
    for _, row in out.iterrows():
        assert row.approx_distinct == exact[row.source]


def test_estimate_within_error_envelope(ray_session):
    k = 256
    ds, t = _stream(n_rows=40_000, n_distinct=10_000)
    out = kmv_distinct(ds, keys=("source",), k=k).to_pandas()
    exact = t.to_pandas().groupby("source").doc_id.nunique()
    for _, row in out.iterrows():
        rel = abs(row.approx_distinct - exact[row.source]) / exact[row.source]
        assert rel < 5 / np.sqrt(k)  # generous envelope (~31%); typical ~6%


def test_deterministic_across_runs(ray_session):
    ds1, _ = _stream(n_rows=10_000, n_distinct=3_000)
    ds2, _ = _stream(n_rows=10_000, n_distinct=3_000)
    a = kmv_distinct(ds1, k=64).to_pandas().sort_values("source").reset_index(drop=True)
    b = kmv_distinct(ds2, k=64).to_pandas().sort_values("source").reset_index(drop=True)
    assert a.equals(b)


def test_kmv_estimate_monotone_in_kth():
    h = np.sort(fnv1a64_numpy(np.arange(1000, dtype=np.int64)))
    small = kmv_estimate(h[:256], 256)
    # doubling the density of small hashes doubles the estimate (roughly)
    h2 = np.sort(fnv1a64_numpy(np.arange(2000, dtype=np.int64)))
    big = kmv_estimate(h2[:256], 256)
    assert big > small * 1.5


def test_grouped_quantiles_match_numpy(ray_session):
    """Exact bucket-pattern order statistics == brute per-group numpy."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.sketch import grouped_quantiles

    rng = np.random.RandomState(3)
    n = 5000
    t = pa.table(
        {
            "k": pa.array([f"g{int(x)}" for x in rng.randint(0, 37, n)]),
            "v": pa.array(rng.randint(0, 10_000, n).astype(np.int64)),
        }
    )
    got = (
        grouped_quantiles(
            ray.data.from_arrow(t).repartition(8), ("k",), "v", (0.5, 0.9)
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    df = t.to_pandas()
    for k, g in df.groupby("k"):
        sv = np.sort(g.v.to_numpy())
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            pos = max(0, int(np.ceil(q * len(sv))) - 1)
            assert got.loc[k, col] == sv[pos], (k, col)


def test_grouped_quantiles_float_values(ray_session):
    """Regression: float value columns keep their dtype (an int64 cast
    silently truncated them to zeros)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.sketch import grouped_quantiles

    t = pa.table(
        {
            "k": pa.array(["a"] * 5),
            "v": pa.array([0.1, 0.9, 0.5, 0.7, 0.3], pa.float64()),
        }
    )
    got = grouped_quantiles(ray.data.from_arrow(t), ("k",), "v", (0.5,)).to_pandas()
    assert got.loc[0, "q50"] == 0.5


def test_quantile_sketch_exact_when_group_fits(ray_session):
    """<= k rows per group: the bottom-k sample IS the group, so the
    sketch equals exact quantile_disc."""
    from dataflowkit_ray.pipelines.queries import QUERIES

    SF = "/root/testdata/sf0.001"

    got = (
        QUERIES["quantiles_sketch"](SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exact = (
        QUERIES["quantiles"](SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got["q50"].tolist() == exact["q50"].astype("int64").tolist()
    assert got["q90"].tolist() == exact["q90"].astype("int64").tolist()


def test_quantile_sketch_error_bound_and_merge_insensitivity(ray_session):
    """Sub-sampling regime: 20k values in one group at k=256 must land
    within ~4*sqrt(q(1-q)/k) rank error of the true quantile, and the
    answer must be identical however the input is blocked (merge is
    associative/commutative by construction)."""
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.sketch import quantile_sketch

    n, k = 20_000, 256
    # deterministic skewed values + unique ids
    ids = np.arange(n, dtype=np.int64)
    vals = (ids * 2_654_435_761 % 100_000).astype(np.int64)  # pseudo-uniform
    t = pa.table(
        {
            "grp": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_id": pa.array(ids.astype(str)),
            "val": pa.array(vals),
        }
    )

    def run(num_blocks):
        ds = ray.data.from_arrow(t).repartition(num_blocks)
        out = quantile_sketch(
            ds, ("grp",), "val", (0.5, 0.9), k=k, id_col="doc_id"
        ).to_pandas()
        return float(out["q50"].iloc[0]), float(out["q90"].iloc[0])

    q50_a, q90_a = run(4)
    q50_b, q90_b = run(17)
    assert (q50_a, q90_a) == (q50_b, q90_b)  # blocking-insensitive

    sv = np.sort(vals)
    for q, est in ((0.5, q50_a), (0.9, q90_a)):
        true_rank = q * n
        est_rank = np.searchsorted(sv, est, side="right")
        tol = 4 * np.sqrt(q * (1 - q) / k) * n
        assert abs(est_rank - true_rank) <= tol, (q, est_rank, true_rank, tol)

def test_cms_partial_accepts_plain_array():
    """_cms_word_partial must work on a plain pa.Array text column, not
    only ChunkedArray (regression: the split line was indented into the
    ChunkedArray branch, leaving `words` unbound on the Array path)."""
    from dataflowkit_ray.stages.sketch import _cms_word_partial

    t = pa.table({"text": pa.array(["a b a", "b c", None])})
    # rebuild with a non-chunked column
    plain = pa.Table.from_arrays(
        [t["text"].combine_chunks()], names=["text"]
    )
    chunked = pa.Table.from_arrays(
        [pa.chunked_array([["a b a"], ["b c", None]])], names=["text"]
    )
    out_plain = _cms_word_partial(plain, depth=2, width=64).to_pandas()
    out_chunked = _cms_word_partial(chunked, depth=2, width=64).to_pandas()
    key = ["d", "bucket"]
    assert (
        out_plain.sort_values(key).reset_index(drop=True).equals(
            out_chunked.sort_values(key).reset_index(drop=True)
        )
    )
    assert out_plain.cnt.sum() == 2 * 5  # 5 words x depth 2


def test_shard_pool_propagates_reset_errors(ray_session):
    """A reset failure that is NOT an actor death must propagate (and
    not silently leak live actors via blanket respawn); the pool key
    includes the actor class so name reuse across classes is safe."""
    import ray

    from dataflowkit_ray.state import store as store_mod

    @ray.remote
    class Good:
        def __init__(self, tag="x"):
            self.tag = tag

        def reset(self, tag="x"):
            self.tag = tag

        def who(self):
            return ("good", self.tag)

    @ray.remote
    class Fussy:
        def reset(self, *a):
            raise RuntimeError("bad ctor args")

        def who(self):
            return ("fussy", None)

    p1 = store_mod.shard_pool(Good, "advice_pool", 2)
    assert ray.get(p1[0].who.remote()) == ("good", "x")
    # same name, different class -> distinct pool, not wrong-type reuse
    p2 = store_mod.shard_pool(Fussy, "advice_pool", 2)
    assert ray.get(p2[0].who.remote()) == ("fussy", None)
    assert p1[0] is not p2[0]
    # second fetch hits reset() which raises -> must PROPAGATE
    with pytest.raises(ray.exceptions.RayTaskError):
        store_mod.shard_pool(Fussy, "advice_pool", 2)
    # dead actors -> respawn path still works
    for a in p1:
        ray.kill(a)
    p3 = store_mod.shard_pool(Good, "advice_pool", 2)
    assert ray.get(p3[0].who.remote()) == ("good", "x")
