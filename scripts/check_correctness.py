"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir and
compare row count + order-insensitive values (columns sorted by name).

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, tuple)):
            df[c] = df[c].apply(lambda v: tuple(v) if v is not None else None)
        try:
            import numpy as np

            if isinstance(df[c].iloc[0] if len(df) else None, np.ndarray):
                df[c] = df[c].apply(tuple)
        except Exception:
            pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    import os

    for t in TABLES:
        # multi-file shape: a `<table>/` directory of parts registers as
        # a glob view — same rows, so oracle hashes must not change
        if os.path.isdir(f"{SF}/{t}"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}/*.parquet')"
            )
        else:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    skip = set((sys.argv[2] if len(sys.argv) > 2 else "").split(","))
    qs, oracles = e.queries(), e.oracle_sql()
    from reference_impl import ORACLE_FNS  # pure-python single-node oracle

    failures = []
    for name, fn in qs.items():
        if name in skip:
            print(f"{name:24s} SKIPPED")
            continue
        t0 = time.time()
        try:
            res = fn(SF)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            else:
                got = res
            if name in oracles or name in ORACLE_FNS:
                exp = (
                    con.sql(oracles[name]).df()
                    if name in oracles
                    else ORACLE_FNS[name](SF)
                )
                g, x = canon(got), canon(exp)
                ok_rows = len(g) == len(x)
                ok_cols = list(g.columns) == list(x.columns)
                ok_vals = ok_rows and ok_cols and g.astype(str).equals(x.astype(str))
                status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
                if status != "OK":
                    failures.append(name)
                    print(f"  engine cols={list(g.columns)} rows={len(g)}")
                    print(f"  oracle cols={list(x.columns)} rows={len(x)}")
                    if ok_rows and ok_cols:
                        neq = ~(g.astype(str) == x.astype(str)).all(axis=1)
                        print("  first diff rows:")
                        print(g[neq].head(3))
                        print(x[neq].head(3))
            else:
                status = f"rows-only ({len(got)})"
            print(f"{name:24s} {status:10s} {time.time()-t0:6.1f}s")
        except Exception as ex:
            failures.append(name)
            print(f"{name:24s} ERROR {type(ex).__name__}: {ex}")
    if failures:
        print("FAILED:", failures)
        return 1
    print("all queries consistent with oracles")
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
