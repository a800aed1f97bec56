"""SessionStateShard._merge_table (vectorized) vs a scalar reference:
randomized streams with out-of-order events, gap splits, multi-epoch
feeds and mixed open/new keys must produce identical state, pending
sessions and ooo counts."""

import numpy as np
import pyarrow as pa


class ScalarShard:
    """The original per-event definition, kept as the semantics spec."""

    def __init__(self, gap: int):
        self.gap = gap
        self.open: dict = {}
        self.pending: list = []
        self.ooo_dropped = 0

    def merge(self, keys, clocks):
        order = np.lexsort((clocks, np.asarray([hash(k) for k in keys])))
        by_key: dict = {}
        for i in order:
            by_key.setdefault(keys[i], []).append(int(clocks[i]))
        for k, cs in by_key.items():
            st = self.open.get(k)
            for c in cs:
                if st is None:
                    st = [c, c, 0]
                elif c < st[1]:
                    self.ooo_dropped += 1
                    continue
                elif c - st[1] > self.gap:
                    self.pending.append((k, st[0], st[1], st[2]))
                    st = [c, c, 0]
                st[1] = c
                st[2] += 1
            self.open[k] = st


def _mk_table(keys, clocks):
    return pa.table(
        {
            "key": pa.array(keys, pa.int64()),
            "clock": pa.array(np.asarray(clocks, dtype=np.int64)),
        }
    )


def _vec_shard(gap):
    from dataflowkit_ray.state.session_store import SessionStateShard

    # use the undecorated class (actor) - access the wrapped class
    cls = SessionStateShard.__ray_metadata__.modified_class if hasattr(
        SessionStateShard, "__ray_metadata__"
    ) else SessionStateShard
    return cls(gap)


def _canon_pending(p):
    return sorted((str(k), int(a), int(b), int(c)) for k, a, b, c in p)


def test_session_merge_matches_scalar_randomized():
    rng = np.random.default_rng(11)
    for trial in range(20):
        gap = int(rng.integers(3, 30))
        vec = _vec_shard(gap)
        ref = ScalarShard(gap)
        for epoch in range(4):
            n = int(rng.integers(1, 120))
            keys = rng.integers(0, 8, n).tolist()
            # mostly-increasing clocks with occasional out-of-order dips
            base = epoch * 1000
            clocks = base + np.sort(rng.integers(0, 400, n))
            dips = rng.random(n) < 0.15
            clocks = np.where(dips, clocks - int(rng.integers(0, 1500)), clocks)
            # scalar spec processes per-key in sorted clock order, so
            # feed both the same table
            vec._merge_table(_mk_table(keys, clocks))
            ref.merge(keys, clocks)
        assert vec.ooo_dropped == ref.ooo_dropped, trial
        assert {k: list(v) for k, v in vec.open.items()} == {
            k: list(v) for k, v in ref.open.items()
        }, trial
        assert _canon_pending(vec.pending) == _canon_pending(ref.pending), trial


def test_session_merge_empty_and_all_ooo():
    vec = _vec_shard(10)
    vec._merge_table(_mk_table([1, 1], [100, 105]))
    assert vec.open[1] == [100, 105, 2]
    # all events below the open last clock: dropped, state unchanged
    vec._merge_table(_mk_table([1, 1, 1], [50, 60, 104]))
    assert vec.ooo_dropped == 3
    assert vec.open[1] == [100, 105, 2]
    # empty batch is a no-op
    vec._merge_table(_mk_table([], []))
    assert vec.open[1] == [100, 105, 2] and not vec.pending


def test_shard_sink_parts_idempotent(tmp_path):
    """pop_closed_to_sink / seal_to_sink write deterministic part names:
    a replayed epoch rewrites the same file (no duplicates), empty
    output writes nothing."""
    import os

    import pyarrow.parquet as pq

    shard = _vec_shard(gap=10)
    parts = str(tmp_path / "parts")
    os.makedirs(parts)
    # open a session, then close it via a gap
    shard._merge_table(_mk_table([7, 7], [100, 103]))
    shard._merge_table(_mk_table([7], [200]))  # closes [100,103], opens [200]
    meta1 = shard.pop_closed_to_sink(150, parts, epoch=3, part_idx=1)
    assert meta1 and meta1["rows"] == 1
    f = os.path.join(parts, meta1["part"])
    t = pq.read_table(f)
    assert t.column("session_id").to_pylist() == [100]
    # nothing left to close below the watermark: no part written
    assert shard.pop_closed_to_sink(150, parts, epoch=4, part_idx=1) is None
    # replay: a shard restored to the earlier state rewrites the SAME file
    shard2 = _vec_shard(gap=10)
    shard2._merge_table(_mk_table([7, 7], [100, 103]))
    shard2._merge_table(_mk_table([7], [200]))
    meta2 = shard2.pop_closed_to_sink(150, parts, epoch=3, part_idx=1)
    assert meta2["part"] == meta1["part"]
    assert pq.read_table(f).equals(t)


def test_cep_shard_seal_to_sink(tmp_path):
    """CEPStateShard.seal_to_sink writes sorted matches as its own part;
    an epoch with no matches writes nothing."""
    import os

    from dataflowkit_ray.state.session_store import CEPStateShard
    from dataflowkit_ray.state.store import table_to_bytes

    cls = CEPStateShard.__ray_metadata__.modified_class if hasattr(
        CEPStateShard, "__ray_metadata__"
    ) else CEPStateShard
    shard = cls([{"literal": 3}, {"literal": 4, "max_gap": 1}], "nonoverlapping")
    parts = str(tmp_path / "parts")
    os.makedirs(parts)
    t = _mk_table([1, 1, 2], [10, 11, 10])
    t = t.append_column("token", pa.array([3, 4, 3], pa.int64()))
    shard.stage(0, 0, table_to_bytes(t))
    meta = shard.seal_to_sink(0, parts, part_idx=2)
    assert meta and meta["rows"] == 1  # key 1: signup(10)->purchase(11)
    # next epoch: no staged events -> empty -> no part
    assert shard.seal_to_sink(1, parts, part_idx=2) is None
