"""Multi-file corpus shape: a `documents/` directory of parts must behave
exactly like the single documents.parquet (the 100-TB input shape).

Regression for the round-4 verdict finding: the flagship catalog came
from a driver-side scan of file 0 ONLY, so any source absent from the
first file KeyError'd in add_src_id."""

import os

import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from dataflowkit_ray.tokenize import blocks_for, documents_files, table_rows

SF = "/root/testdata/sf0.001"


def _multi_sf(tmp_path, n_parts=3, starve_first=True):
    """Build an sf-dir whose documents table is a directory of parts;
    with starve_first, ALL rows of one source are moved out of part 0."""
    t = pq.read_table(f"{SF}/documents.parquet")
    d = tmp_path / "documents"
    d.mkdir()
    srcs = pc.unique(t["source"]).to_pylist()
    victim = sorted(srcs)[0]
    is_victim = pc.equal(t["source"], victim)
    rest = t.filter(pc.invert(is_victim))
    n = len(rest)
    cuts = [i * n // (n_parts - 1) for i in range(n_parts)]
    for i in range(n_parts - 1):
        part = rest.slice(cuts[i], cuts[i + 1] - cuts[i])
        if not starve_first and i == 0:
            part = pq.read_table(f"{SF}/documents.parquet").slice(0, 0)
        pq.write_table(part, str(d / f"part-{i:03d}.parquet"))
    # every victim-source row lands in the LAST part
    pq.write_table(t.filter(is_victim), str(d / f"part-{n_parts-1:03d}.parquet"))
    return str(tmp_path), victim


def test_documents_files_resolver(tmp_path):
    assert documents_files(SF) == [f"{SF}/documents.parquet"]
    sf_multi, _ = _multi_sf(tmp_path)
    files = documents_files(sf_multi)
    assert len(files) == 3 and all(f.endswith(".parquet") for f in files)
    assert table_rows(files) == table_rows(f"{SF}/documents.parquet") == 500
    assert blocks_for(files) == blocks_for(f"{SF}/documents.parquet")
    with pytest.raises(FileNotFoundError):
        empty = tmp_path / "empty_sf"
        (empty / "documents").mkdir(parents=True)
        documents_files(str(empty))


def test_source_catalog_covers_all_files(ray_session, tmp_path):
    from dataflowkit_ray.pipelines.flagship import source_catalog

    sf_multi, victim = _multi_sf(tmp_path)
    files = documents_files(sf_multi)
    # sanity: the first file really lacks the victim source
    f0 = pq.read_table(files[0], columns=["source"])
    assert victim not in pc.unique(f0["source"]).to_pylist()
    cat = source_catalog(files)
    assert victim in cat
    expected = sorted(
        pc.unique(pq.read_table(f"{SF}/documents.parquet")["source"]).to_pylist()
    )
    assert cat == expected


def test_flagship_multi_file_equals_single(ray_session, tmp_path):
    """Flagship over a parts directory whose FIRST file lacks one source
    == flagship over the single file (the r4 KeyError regression)."""
    from dataflowkit_ray.pipelines.flagship import flagship_pipeline

    sf_multi, _ = _multi_sf(tmp_path)
    key = ["source", "window_id"]
    a = (
        flagship_pipeline(SF).to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        flagship_pipeline(sf_multi)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_training_queries_multi_file(ray_session, tmp_path):
    """Spot-check the training-ops readers over the parts directory."""
    from dataflowkit_ray.pipelines.training import TRAINING_QUERIES

    sf_multi, _ = _multi_sf(tmp_path)
    for name in ("exact_dedup", "token_counts"):
        a = TRAINING_QUERIES[name](SF).to_pandas()
        b = TRAINING_QUERIES[name](sf_multi).to_pandas()
        key = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[key].sort_values(key).reset_index(drop=True),
            b[key].sort_values(key).reset_index(drop=True),
        )
