"""Submit/status service: two jobs driven end-to-end through the HTTP
surface (the reference's POST-/parse daemon analog), plus payload
rejection and health."""

import json
import time
import urllib.error
import urllib.request

import pyarrow.parquet as pq

from dataflowkit_ray.service import JobService

SF = "/root/testdata/sf0.001"


def _post(url, payload: dict):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _wait_done(base, job_id, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        _, st = _get(f"{base}/jobs/{job_id}")
        if st["status"] in ("done", "error"):
            return st
        time.sleep(0.2)
    raise TimeoutError(f"job {job_id} still {st['status']}")


def test_service_two_jobs_end_to_end(ray_session, tmp_path):
    svc = JobService(port=0).start()
    base = svc.url
    try:
        code, h = _get(f"{base}/health")
        assert (code, h) == (200, {"status": "ok"})

        # job 1: filter chain -> csv sink
        code, r1 = _post(
            f"{base}/jobs",
            {
                "name": "svc-filters",
                "source": {
                    "paths": [f"{SF}/documents.parquet"],
                    "columns": ["doc_id", "text"],
                    "tokenize": False,
                },
                "filters": [
                    {"column": "text", "chain": [["uppercase", None]], "out": "up"}
                ],
                "sink": {"path": str(tmp_path / "up.csv"), "format": "csv"},
            },
        )
        assert code == 202
        # job 2: windowed aggregate -> parquet sink (queued behind job 1)
        code, r2 = _post(
            f"{base}/jobs",
            {
                "name": "svc-windowed",
                "source": {"paths": [f"{SF}/documents.parquet"]},
                "window": {"kind": "tumbling", "size": 32},
                "aggregates": [
                    {"column": "n_tok", "fn": "sum", "out": "sum_n_tok"}
                ],
                "sink": {"path": str(tmp_path / "win"), "format": "parquet"},
            },
        )
        assert code == 202
        s1 = _wait_done(base, r1["job_id"])
        s2 = _wait_done(base, r2["job_id"])
        assert s1["status"] == "done" and s1["summary"]["rows"] == 500
        assert s2["status"] == "done" and s2["summary"]["rows"] > 0
        # summaries are manifests/metrics, the data went to the sinks
        import glob

        out = pq.read_table(glob.glob(str(tmp_path / "win" / "*.parquet")))
        assert len(out) == s2["summary"]["rows"]

        _, listing = _get(f"{base}/jobs")
        assert {j["status"] for j in listing["jobs"]} == {"done"}

        # bad payload: rejected 400 at submit (checkPayload), no job made
        try:
            _post(f"{base}/jobs", {"name": "", "source": {"paths": []}})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
        _, listing = _get(f"{base}/jobs")
        assert len(listing["jobs"]) == 2

        # job errors are reported, not fatal to the daemon
        code, r3 = _post(
            f"{base}/jobs",
            {
                "name": "svc-bad-path",
                "source": {"paths": ["/does/not/exist.parquet"]},
                "sink": {"path": str(tmp_path / "x"), "format": "parquet"},
            },
        )
        assert code == 202
        s3 = _wait_done(base, r3["job_id"])
        assert s3["status"] == "error" and "error" in s3
        _, h = _get(f"{base}/health")
        assert h == {"status": "ok"}

        _, missing = _get(f"{base}/jobs")
        assert len(missing["jobs"]) == 3
        try:
            _get(f"{base}/jobs/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        svc.stop()


def test_error_taxonomy_kinds():
    """Retryable-vs-fatal is explicit: spec errors are BadRequest,
    double codec failures are retryable I/O, resume-layout mismatches
    are (fatal) state errors — and all stay ValueError/IOError
    compatible for existing callers."""
    import pytest

    from dataflowkit_ray.errors import (
        BadRequest,
        RetryableIOError,
        StateError,
        is_retryable,
    )
    from dataflowkit_ray.spec import PipelineSpec, SourceSpec, SpecError, validate_spec

    with pytest.raises(BadRequest):
        validate_spec(PipelineSpec(name="", source=SourceSpec(paths=["x"])))
    assert issubclass(SpecError, (BadRequest, ValueError))
    assert not is_retryable(SpecError("x"))
    assert is_retryable(RetryableIOError("x"))
    assert isinstance(RetryableIOError("x"), IOError)
    assert not is_retryable(StateError("x"))
    assert isinstance(StateError("x"), ValueError)
    assert is_retryable(ConnectionError("x"))
    assert not is_retryable(KeyError("x"))

    # the both-codecs-failed path is typed retryable
    from dataflowkit_ray.sources.microbatch import read_chunk_table

    def boom(spec, cols):
        raise RuntimeError("io down")

    with pytest.raises(RetryableIOError, match="both failed"):
        read_chunk_table(
            {"file": "f", "row_group": 0, "row_start": 0, "n_rows": 1,
             "partition_id": 0, "seq": 0, "global_row_start": 0},
            None, primary=boom, fallback=boom,
        )
