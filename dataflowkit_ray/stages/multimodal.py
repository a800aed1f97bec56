"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
actor-pool decode / feature-extract stages.

Decode is REAL for all three modalities: PGM (P5) images parse with pure
numpy/bytes, WAV audio with the stdlib ``wave`` module, and video as
Y4M (YUV4MPEG2) — the raw-frame interchange container (plain-text
header + FRAME-delimited uncompressed planes, mjpegtools spec), parsed
byte-level against the declared colorspace's plane geometry.  Compressed
codecs (H.264 etc.) need libav and are rejected with
``NotImplementedError`` — the honest boundary of a no-external-codec
environment.

Pattern (mandated for stateful stages): ``map_batches(Cls,
concurrency=N, batch_size=B)`` — the "model load" happens once per actor
in ``__init__`` (ST1-style, SURVEY.md §2.3), never per batch.  Binary
payloads are wide: callers should size ``batch_size`` in BYTES
(``payload_bytes * batch_size * concurrency`` must fit the worker heap).
Decoding is intrinsically per-payload (true of real codecs too); the
actor pool is what amortizes it.
"""

from __future__ import annotations

import io
import wave

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


def _pgm_payload(text_bytes: bytes, w: int, h: int) -> bytes:
    """A real binary PGM (P5) image whose pixels are the text bytes
    cycled to fill w*h — a VALID file any PGM reader decodes."""
    need = w * h
    src = text_bytes or b"\x00"
    reps = -(-need // len(src))
    return f"P5\n{w} {h}\n255\n".encode() + (src * reps)[:need]


def _wav_payload(text_bytes: bytes, n_samples: int, rate: int = 8000) -> bytes:
    """A real mono 16-bit WAV whose samples derive from the text bytes —
    a VALID file any WAV reader decodes."""
    src = np.frombuffer(text_bytes or b"\x00", dtype=np.uint8)
    reps = -(-n_samples // len(src))
    samples = ((np.tile(src, reps)[:n_samples].astype(np.int16)) - 128) * 256
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def _y4m_payload(text_bytes: bytes, w: int, h: int, n_frames: int) -> bytes:
    """A real YUV4MPEG2 (Y4M) video: header + ``n_frames`` FRAME-marked
    uncompressed 4:2:0 frames whose luma plane is the text bytes cycled —
    a VALID stream any Y4M reader (ffmpeg, mjpegtools) decodes."""
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))  # C420 plane geometry
    src = text_bytes or b"\x00"
    reps = -(-frame_bytes // len(src))
    plane = (src * reps)[:frame_bytes]
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    for _ in range(n_frames):
        out.append(b"FRAME\n")
        out.append(plane)
    return b"".join(out)


def synthesize_media(t: pa.Table) -> pa.Table:
    """documents batch -> deterministic media table with REAL container
    payloads: PGM images (doc_id %% 3 == 0), WAV audio (== 1), and Y4M
    video (== 2).  Image dims / sample counts / frame counts derive from
    the text length, so the decode stage's output is a pure function of
    the input (bit-identical replays)."""
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    kinds, payloads = [], []
    for i, txt in zip(ids, texts):
        b = (txt or "").encode()
        m = int(i) % 3
        if m == 0:
            w = 8 + len(b) % 24
            h = 8 + (len(b) // 3) % 16
            kinds.append("image")
            payloads.append(_pgm_payload(b, w, h))
        elif m == 1:
            kinds.append("audio")
            payloads.append(_wav_payload(b, 64 + len(b) % 256))
        else:
            w = 16 + 2 * (len(b) % 12)
            h = 16 + 2 * ((len(b) // 3) % 8)
            kinds.append("video")
            payloads.append(_y4m_payload(b, w, h, 8 + len(b) % 64))
    payload = pa.array(payloads, pa.binary())
    return pa.table(
        {
            "media_id": pa.array([str(i) for i in ids], pa.string()),
            "payload": payload,
            "media_type": pa.array(kinds, pa.string()),
            "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
        }
    )


def _decode_pgm(payload: bytes) -> dict:
    """REAL PGM (P5) parse per the Netpbm spec: whitespace-separated
    header tokens with '#' comments, then w*h samples (2 bytes each
    when maxval > 255) — not just the layout our synthesizer emits."""
    if not payload.startswith(b"P5"):
        raise ValueError("not a P5 PGM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PGM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tok = payload[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad PGM header token {tok!r}")
        vals.append(int(tok))
    pos += 1  # exactly one whitespace byte after maxval, per spec
    w, h, maxval = vals
    bps = 1 if maxval < 256 else 2
    px = payload[pos:]
    if len(px) != w * h * bps:
        raise ValueError(f"truncated PGM: {len(px)} != {w}x{h}x{bps}")
    return {"width": w, "height": h, "n_frames": 1}


def _decode_wav(payload: bytes) -> dict:
    """REAL WAV parse via the stdlib codec.  ``n_frames`` is the decoded
    frame (sample) count; width/height carry sample_rate / channels in
    the shared metadata layout."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        return {
            "width": wv.getframerate(),
            "height": wv.getnchannels(),
            "n_frames": max(1, wv.getnframes()),
        }


# bytes per frame for the Y4M colorspaces this decoder supports;
# geometry per the mjpegtools yuv4mpeg(5) spec
_Y4M_PLANES = {
    "C420": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C420jpeg": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C420mpeg2": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C420paldv": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C422": lambda w, h: w * h + 2 * ((w // 2) * h),
    "C444": lambda w, h: 3 * w * h,
    "Cmono": lambda w, h: w * h,
}


def _decode_y4m(payload: bytes) -> dict:
    """REAL YUV4MPEG2 parse per the yuv4mpeg(5) spec: space-separated
    tagged header parameters (W/H mandatory, C colorspace defaulting to
    C420), then FRAME-marked uncompressed planes — each frame's size
    validated against the declared colorspace geometry.  Counts frames
    by walking the stream, not by trusting any declared length (Y4M has
    none — it is a pipe format)."""
    nl = payload.find(b"\n")
    if not payload.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    cspace = "C420"
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            cspace = tag.decode()
    if w <= 0 or h <= 0:
        raise ValueError(f"Y4M missing W/H ({w}x{h})")
    if cspace not in _Y4M_PLANES:
        raise NotImplementedError(f"Y4M colorspace {cspace!r} unsupported")
    frame_bytes = _Y4M_PLANES[cspace](w, h)
    pos, n_frames = nl + 1, 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        pos = fnl + 1 + frame_bytes
        if pos > len(payload):
            raise ValueError("truncated Y4M frame")
        n_frames += 1
    return {"width": w, "height": h, "n_frames": max(1, n_frames)}


def _decode(payload: bytes, media_type: str) -> dict:
    """Route by container magic: PGM / WAV / Y4M are decoded for real;
    anything else (compressed codecs need libav) raises
    ``NotImplementedError`` so callers exercise the error path."""
    if media_type == "image" and payload.startswith(b"P5"):
        return _decode_pgm(payload)
    if media_type == "audio" and payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if media_type == "video" and payload.startswith(b"YUV4MPEG2"):
        return _decode_y4m(payload)
    raise NotImplementedError(
        f"no codec for media_type={media_type!r} with magic {payload[:9]!r}"
    )


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
            _decode(payloads[i].as_py(), kinds[i]) for i in range(len(t))
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
