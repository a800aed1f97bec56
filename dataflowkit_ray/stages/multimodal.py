"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
actor-pool decode / feature-extract stages.

Real image/audio codecs are not in this container, so the decode kernel
is STUBBED (clearly marked).  Everything around it — schema, batch
sizing, the callable-class actor signature with per-actor ``__init__``
setup, and the output layout — is real and tested.  Swapping in a real
codec means replacing :func:`_decode_stub` only.

Pattern (mandated for stateful stages): ``map_batches(Cls,
concurrency=N, batch_size=B)`` — the "model load" happens once per actor
in ``__init__`` (ST1-style, SURVEY.md §2.3), never per batch.  Binary
payloads are wide: callers should size ``batch_size`` in BYTES
(``payload_bytes * batch_size * concurrency`` must fit the worker heap).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("n_bytes", pa.int64()),
    ]
)


def synthesize_media(t: pa.Table) -> pa.Table:
    """documents batch -> deterministic fake media table (text bytes as the
    opaque payload) — the test stand-in for a real binary column."""
    payload = pc.cast(t["text"], pa.binary())
    kinds = ["image", "audio", "video"]
    ids = t["doc_id"].to_pylist()
    return pa.table(
        {
            "media_id": pa.array([str(i) for i in ids], pa.string()),
            "payload": payload,
            "media_type": pa.array([kinds[int(i) % 3] for i in ids], pa.string()),
            "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
        }
    )


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode kernel — deterministic fake features.

    A real deployment replaces this with PIL/libav/etc.  Raising path for
    genuinely-unsupported types is kept so callers exercise error
    handling."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    crc = zlib.crc32(payload)
    return {
        "width": 16 + crc % 1024,
        "height": 16 + (crc >> 10) % 1024,
        "n_frames": 1 if media_type == "image" else 1 + (crc >> 20) % 300,
    }


class MediaDecodeStage:
    """Actor-pool decode stage: ``ds.map_batches(MediaDecodeStage,
    concurrency=N, batch_size=B, batch_format="pyarrow")``.

    ``__init__`` = codec/model load (once per actor); ``__call__`` = one
    batch of binary payloads -> metadata columns.
    """

    def __init__(self, sample_stride: int = 1):
        # stand-in for expensive codec/model initialization
        self.sample_stride = sample_stride
        self._codec_ready = True

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        kinds = t["media_type"].to_pylist()
        feats = [
            _decode_stub(payloads[i].as_py(), kinds[i]) for i in range(len(t))
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "n_bytes": t["n_bytes"],
                "width": pa.array([f["width"] for f in feats], pa.int64()),
                "height": pa.array([f["height"] for f in feats], pa.int64()),
                "n_frames": pa.array([f["n_frames"] for f in feats], pa.int64()),
            }
        )


class FrameSampleStage:
    """Actor-pool frame sampler: one row per sampled frame index —
    a flat_map expansion (the ``divide`` analog for media,
    ``/root/reference/scrape/scrape.go:447-517``)."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        nf = t["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.maximum(1, -(-nf // self.every_n))
        row_idx = np.repeat(np.arange(len(nf)), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        frame = (np.arange(counts.sum()) - np.repeat(cum, counts)) * self.every_n
        ids = t["media_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "media_id": ids.take(pa.array(row_idx)),
                "frame_idx": pa.array(frame.astype(np.int64)),
            }
        )


def media_pipeline(ds, concurrency: int = 2, batch_size: int = 256):
    """documents -> synth media -> actor-pool decode -> frame sample.

    Chained actor pools each take ``num_cpus=0.5``: a pool that reserves
    whole CPUs per actor can starve the upstream read tasks on a small
    node (observed deadlock: 2+2 actors on a 4-CPU session left zero CPUs
    for the ReadParquet task).  Decode work is per-batch bounded, so
    half-CPU actors keep the pipeline flowing at every cluster size."""
    media = ds.map_batches(synthesize_media, batch_format="pyarrow")
    decoded = media.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    return decoded.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
