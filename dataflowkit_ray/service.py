"""Submit/status job service — the engine's daemon surface.

The reference's PRIMARY entry point is a long-running service: POST a
JSON payload, get a handle, results land in storage
(``/root/reference/parse/transport.go:93-98``, fetch.d
``fetch/transport.go:25-30``, liveness at ``healthcheck/check.go``).
The engine analog is a thin loopback HTTP server over the SAME spec
JSON the batch CLI takes (``python -m dataflowkit_ray.spec job.json``):

    POST /jobs        spec JSON body -> 202 {"job_id": "..."}
    GET  /jobs/<id>   {"status": queued|running|done|error, ...}
    GET  /jobs        {"jobs": [...]} (id, name, status)
    GET  /health      {"status": "ok"}   (healthcheck analog)

Design choices, deliberately thin:

* **Validation at submit** — ``PipelineSpec.from_json`` +
  ``validate_spec`` run in the request handler, so a malformed payload
  is rejected 400 BEFORE any work starts (the ``checkPayload``
  discipline, ``scrape/scrape.go:187-207``).
* **One worker thread, jobs run sequentially** sharing the process's
  single Ray session.  The cluster parallelism lives INSIDE each job
  (Ray Data schedules its stages across the whole cluster); queueing
  whole jobs avoids two pipelines fighting over the same actor pools.
* **Control plane only**: results go to each job's own sink
  (exactly-once manifests / partitioned parquet); the service stores
  and returns run SUMMARIES (rows, manifest paths, timings), never row
  data.

This module never calls ``ray.init`` — the ``__main__`` block owns the
session exactly like the spec CLI (driver contract).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from dataflowkit_ray.spec import PipelineSpec, SpecError, run_pipeline, validate_spec


class JobService:
    """In-process job queue + loopback HTTP control surface."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._jobs: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._queue: queue.Queue = queue.Queue()
        self._n = 0
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr lines
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {"status": "ok"})
                elif self.path == "/jobs":
                    self._reply(200, {"jobs": service.list_jobs()})
                elif self.path.startswith("/jobs/"):
                    st = service.status(self.path[len("/jobs/"):])
                    if st is None:
                        self._reply(404, {"error": "unknown job id"})
                    else:
                        self._reply(200, st)
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/jobs":
                    self._reply(404, {"error": f"unknown path {self.path}"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode()
                try:
                    job_id = service.submit(body)
                except (SpecError, KeyError, TypeError, ValueError) as ex:
                    # checkPayload semantics: reject before any work
                    self._reply(400, {"error": f"{type(ex).__name__}: {ex}"})
                    return
                self._reply(202, {"job_id": job_id})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = int(self.httpd.server_address[1])
        self.url = f"http://{host}:{self.port}"
        self._server_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._worker = threading.Thread(target=self._drain, daemon=True)

    # ------------------------------------------------------------ lifecycle

    def start(self) -> "JobService":
        self._server_thread.start()
        self._worker.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self._queue.put(None)  # worker sentinel
        self._worker.join(timeout=30)

    # ------------------------------------------------------------- job API

    def submit(self, spec_json: str) -> str:
        spec = PipelineSpec.from_json(spec_json)
        validate_spec(spec)
        with self._lock:
            self._n += 1
            job_id = f"job-{self._n:04d}"
            self._jobs[job_id] = {
                "job_id": job_id,
                "pipeline": spec.name,
                "status": "queued",
            }
        self._queue.put((job_id, spec))
        return job_id

    def status(self, job_id: str) -> dict | None:
        with self._lock:
            st = self._jobs.get(job_id)
            return dict(st) if st is not None else None

    def list_jobs(self) -> list[dict]:
        with self._lock:
            return [
                {k: j[k] for k in ("job_id", "pipeline", "status")}
                for j in self._jobs.values()
            ]

    def _drain(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            job_id, spec = item
            with self._lock:
                self._jobs[job_id]["status"] = "running"
            try:
                summary = run_pipeline(spec)
                with self._lock:
                    self._jobs[job_id]["status"] = "done"
                    self._jobs[job_id]["summary"] = summary
            except Exception as ex:  # job error must not kill the daemon
                with self._lock:
                    self._jobs[job_id]["status"] = "error"
                    self._jobs[job_id]["error"] = f"{type(ex).__name__}: {ex}"


def main(argv: list[str] | None = None) -> None:
    """CLI: ``python -m dataflowkit_ray.service [--port P]`` — start the
    daemon, print its address as one JSON line, serve until SIGINT.  The
    one place (besides the other CLI mains) that owns a Ray session."""
    import argparse

    import ray

    p = argparse.ArgumentParser(description="spec-job submit/status service")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8517)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            include_dashboard=False,
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    svc = JobService(host=args.host, port=args.port).start()
    print(json.dumps({"serving": svc.url}), flush=True)
    try:
        svc._server_thread.join()
    finally:
        svc.stop()
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
