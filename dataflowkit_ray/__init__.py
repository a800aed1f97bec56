"""dataflowkit_ray — a Ray-Data-native structured-streaming / CEP engine.

A from-scratch re-expression of the capabilities of slotix/dataflowkit
(fetch -> parse -> encode streaming dataflow, see /root/reference) as
streaming operators over Parquet tables of pre-tokenized training
sequences with schema::

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow batches; stateful stages run in actor pools; wide steps
use ``groupby`` / ``join`` / ``sort``.  No code is ported from the
reference — it defines semantics (keying/lineage, join-embed rules,
exactly-once idempotency, golden-output testing), not implementation.
"""

from dataflowkit_ray.config import EngineConfig
from dataflowkit_ray.tokenize import tokenize_documents, token_id, load_token_stream
from dataflowkit_ray.clock import assign_clock, watermark_of
from dataflowkit_ray.spec import PipelineSpec, build_pipeline, run_pipeline

__all__ = [
    "EngineConfig",
    "tokenize_documents",
    "token_id",
    "load_token_stream",
    "assign_clock",
    "watermark_of",
    "PipelineSpec",
    "build_pipeline",
    "run_pipeline",
]
