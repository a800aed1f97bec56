"""Lineage/clock helpers: partition assignment, watermark, late mask."""

import numpy as np
import pyarrow as pa

from dataflowkit_ray.clock import assign_clock, late_rows_mask, watermark_of


def test_assign_clock_lineage_roundtrip():
    t = pa.table({"event_seq": pa.array([0, 1, 7, 8, 15], pa.int64())})
    out = assign_clock(t, n_partitions=4)
    pid = out["partition_id"].to_pylist()
    off = out["offset"].to_pylist()
    assert pid == [0, 1, 3, 0, 3]
    assert off == [0, 0, 1, 2, 3]
    # lineage is invertible: seq == offset * n + partition
    assert [o * 4 + p for o, p in zip(off, pid)] == [0, 1, 7, 8, 15]


def test_watermark_min_over_partitions():
    assert watermark_of({}) == -1
    assert watermark_of({0: 10, 1: 3, 2: 99}) == 3


def test_late_rows_mask():
    t = pa.table({"event_seq": pa.array([1, 5, 6, 10], pa.int64())})
    assert late_rows_mask(t, watermark=5).tolist() == [True, True, False, False]
