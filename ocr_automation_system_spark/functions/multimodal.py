"""Multimodal column plumbing: image/audio/video as opaque BINARY + typed
metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes clearly marked as stubs — but the *Spark-side plumbing*
(schema, Arrow batch shape, mapInPandas signatures, partition behavior) is
real and tested. Swapping in PIL/ffmpeg later changes only the marked stub
bodies, not the plan.

Design rules baked in:
* payloads never leave the executor (no collect, no driver round-trip);
* one Arrow batch in, one out — ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds memory for ~MB-scale payloads;
* per-row failures become status rows, never task failures (the engine's
  poison-row contract, `verification_engine/engine.py:105-114`).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

# Optional real codecs, gated at import: when PIL / OpenCV are installed
# the decode/resize kernels below use them for payloads whose magic bytes
# sniff as a real image; everything else (and every payload when the libs
# are absent, as in this container) takes the deterministic stub path so
# the same tests stay green in both modes.
try:  # pragma: no cover - not installed in this container
    from PIL import Image as _PILImage

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _PILImage = None
    _HAS_PIL = False

try:  # pragma: no cover - not installed in this container
    import cv2 as _cv2
    import numpy as _np

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _cv2 = None
    _HAS_CV2 = False

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

#: magic-byte sniffing table (public file signatures)
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),          # RIFF....WAVE, checked below
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp box, checked below
    (b"%PDF", "application/pdf"),
]

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("status", StringType(), False),
    StructField("mime", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("sha1", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("feature", ArrayType(LongType()), True),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("frame_bytes", BinaryType(), True),
])


def sniff_mime(payload: bytes) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            if mime == "audio/wav" and payload[8:12] != b"WAVE":
                continue
            if mime == "video/mp4" and payload[4:8] != b"ftyp":
                continue
            return mime
    return "application/octet-stream"


def _decode_dims(payload: bytes) -> tuple[int, int]:
    """Image dimension decode. Real path: PIL header parse when installed
    AND the payload sniffs as an actual image (so the synthetic corpus,
    which is html/pdf bytes, stays on the deterministic path either way).
    Stub path: sha1-derived fake dims. Raises on truncated payloads to
    exercise the poison-row contract in both modes."""
    if len(payload) < 16:
        raise ValueError("truncated payload")
    if _HAS_PIL and sniff_mime(payload).startswith("image/"):  # pragma: no cover
        with _PILImage.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height)
    h = hashlib.sha1(payload[:64]).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _feature_vector(payload: bytes, dim: int = 8) -> list[int]:
    """STUB: deterministic fake feature extractor (sha1-derived ints where a
    real build runs an image/audio encoder). Shape and typing are real."""
    h = hashlib.sha1(payload).digest()
    return [int.from_bytes(h[i * 2:i * 2 + 2], "big") for i in range(dim)]


def extract_media_metadata(df: DataFrame, id_col: str = "url",
                           payload_col: str = "html") -> DataFrame:
    """BINARY column -> typed metadata rows (mime sniff, size, checksum,
    stub-decoded dims + feature vector). Narrow mapInPandas; poison rows
    surface as status='error'."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": str(mid), "status": "ok",
                    "mime": sniff_mime(payload), "n_bytes": len(payload),
                    "sha1": hashlib.sha1(payload).hexdigest(),
                    "width": None, "height": None, "feature": None,
                }
                try:
                    row["width"], row["height"] = _decode_dims(payload)
                    row["feature"] = _feature_vector(payload)
                except Exception as exc:  # poison-row contract
                    row["status"] = f"error:{type(exc).__name__}"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    from .util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        batches, MEDIA_META_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8,
                  id_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Frame-sampling plumbing (1 row -> N frame rows, UDTF-shaped).

    STUB decode: "frames" are byte slices at fixed strides where a real
    build seeks keyframes. The fan-out shape, schema, and batch handling
    are the real thing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(len(payload), 1) // every_n_bytes + 1)):
                    rows.append({
                        "media_id": str(mid), "frame_index": i,
                        "frame_bytes": payload[i * every_n_bytes:(i + 1) * every_n_bytes],
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("status", StringType(), False),
    StructField("orig_width", IntegerType(), True),
    StructField("orig_height", IntegerType(), True),
    StructField("new_width", IntegerType(), True),
    StructField("new_height", IntegerType(), True),
    StructField("resized_bytes", BinaryType(), True),
])


def safe_resize_dims(w: int, h: int, max_side: int = 2500) -> tuple[int, int]:
    """The reference's exact resize-cap arithmetic (`core/ocr_engine.py:
    13-23`): scale = min(max_side/h, max_side/w, 1.0); downscale only;
    int() truncation of w*scale / h*scale. Pure and engine-independent —
    this is the part that must agree with the reference regardless of
    which codec does the actual pixel work."""
    scale = min(max_side / h, max_side / w, 1.0)
    if scale < 1.0:
        return int(w * scale), int(h * scale)
    return w, h


def _resize_pixels(payload: bytes, w: int, h: int,
                   nw: int, nh: int) -> bytes:
    """Pixel kernel for ``resize_media``. Real path (OpenCV installed +
    payload sniffs as an image): decode, ``cv2.resize(...,
    interpolation=INTER_AREA)`` — the reference's exact downscale call
    (`core/ocr_engine.py:18-22`) — re-encode as PNG. Stub path:
    deterministic truncation with a byte budget ~ the area ratio."""
    if _HAS_CV2 and sniff_mime(payload).startswith("image/"):  # pragma: no cover
        img = _cv2.imdecode(_np.frombuffer(payload, _np.uint8),
                            _cv2.IMREAD_COLOR)
        if img is not None:
            resized = _cv2.resize(img, (nw, nh),
                                  interpolation=_cv2.INTER_AREA)
            ok, buf = _cv2.imencode(".png", resized)
            if ok:
                return buf.tobytes()
    return payload[:max(1, int(len(payload) * (nw * nh) / (w * h)))]


def resize_media(df: DataFrame, max_side: int = 2500,
                 id_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Resize pass over a BINARY media column, reference-cap semantics.

    The pixel kernel (``_resize_pixels``) uses cv2 INTER_AREA when
    available and a clearly-marked deterministic stub otherwise. The cap
    arithmetic (``safe_resize_dims``) and all Spark plumbing — narrow
    mapInPandas, Arrow batch bounds, poison rows — are real in both
    modes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                row = {"media_id": str(mid), "status": "ok",
                       "orig_width": None, "orig_height": None,
                       "new_width": None, "new_height": None,
                       "resized_bytes": None}
                try:
                    w, h = _decode_dims(payload)
                    nw, nh = safe_resize_dims(w, h, max_side)
                    row.update(orig_width=w, orig_height=h,
                               new_width=nw, new_height=nh)
                    row["resized_bytes"] = _resize_pixels(payload, w, h,
                                                          nw, nh)
                except Exception as exc:  # poison-row contract
                    row["status"] = f"error:{type(exc).__name__}"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    from .util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        batches, RESIZE_SCHEMA)


def media_type_summary(meta: DataFrame) -> DataFrame:
    """Corpus-level media census (groupBy mime — tiny result)."""
    return meta.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count(F.when(F.col("status") != "ok", 1)).alias("n_errors"),
    )
