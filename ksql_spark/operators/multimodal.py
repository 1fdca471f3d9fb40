"""Multimodal column conventions (SURVEY.md §2.K K5 [EXT]).

Convention: a modality is an opaque `binary` payload + a typed metadata struct
(mime, byte size, content hash) + whatever modality-specific fields decode
produces. Content addressing is sha2 over the payload, so dedup/join logic is
modality-agnostic.

Decode reality tiers (this container has no PIL/ffmpeg):
- REAL, no deps: image dimensions by container-header parse (PNG/GIF/BMP/
  JPEG — `sniff_image_dims`) and WAV audio metadata via stdlib `wave`
  (`extract_audio_meta`). This is what a 100 TB metadata pass actually does —
  dims/mime from the first KB of each blob.
- STUBBED behind `KSQL_SPARK_FAKE_DECODE`: pixel-level transforms (resize,
  frame sampling) and non-WAV codecs, which genuinely need PIL/ffmpeg.
The Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partitioning) is identical for both tiers and fully tested.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("content_sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal column convention from a text source:
    binary payload + metadata struct (in production the payload arrives from
    object storage; the convention is identical)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("byte_len"),
            F.sha2(payload, 256).alias("content_sha"),
        ),
    )


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derives a fake (w, h) from
    the content hash. Replace with PIL.Image.open(...).size in production."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def sniff_image_dims(payload: bytes) -> tuple[int, int] | None:
    """REAL image-dimension decode for the common container formats, by
    header/marker parsing alone (pure Python, no PIL). This is exactly what
    a 100 TB metadata pass does: dims/mime come from the first KB of each
    blob; full pixel decode is deferred to the (GPU/PIL) transform stage.

    PNG: IHDR width/height at bytes 16..23 (big-endian u32).
    GIF87a/89a: logical screen size at bytes 6..9 (little-endian u16).
    BMP: BITMAPINFOHEADER at bytes 18..25 (little-endian i32; height may be
    negative for top-down rows — absolute value is the pixel height).
    JPEG: walk the marker stream to the first SOF0-3 frame header.
    Returns None for anything unrecognized (caller decides stub vs raise).
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload[:2] == b"BM" and len(payload) >= 26:
        return (
            int.from_bytes(payload[18:22], "little", signed=True),
            abs(int.from_bytes(payload[22:26], "little", signed=True)),
        )
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None  # corrupt marker stream
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
    return None


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_sha", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """mapInPandas image resize (stubbed decode — SURVEY §2 K5 contract).

    Real impl swaps `_decode_fake` + a PIL resize into the same batch loop;
    the Spark-side plumbing (Arrow batches, output schema, partition layout)
    is identical either way.
    """
    fake = os.environ.get("KSQL_SPARK_FAKE_DECODE", "1") == "1"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires PIL")
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    # deterministic stand-in for resized pixel bytes
                    "resized_sha": [
                        hashlib.sha256(p + f"{width}x{height}".encode()).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas video frame sampling (stubbed decode): one output row per
    sampled frame — the flatten shape a real ffmpeg-backed sampler produces."""
    fake = os.environ.get("KSQL_SPARK_FAKE_DECODE", "1") == "1"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = {"doc_id": [], "frame_idx": [], "frame_sha": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_sha"].append(
                        hashlib.sha256(p + bytes([i])).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload) — Arrow-batched,
    one python worker per partition, constant memory per batch.

    Dimension decode is REAL for recognized image containers (PNG/GIF/BMP/
    JPEG header parse — sniff_image_dims, no PIL needed). Unrecognized
    payloads fall back to the deterministic stub when KSQL_SPARK_FAKE_DECODE=1
    (default in this container) and raise otherwise — full pixel decode of
    other formats requires PIL (SURVEY §2.K K5 boundary).
    """
    fake = os.environ.get("KSQL_SPARK_FAKE_DECODE", "1") == "1"

    def decode(payload: bytes) -> tuple[int, int]:
        dims = sniff_image_dims(payload)
        if dims is not None:
            return dims
        if not fake:
            raise NotImplementedError(
                "unrecognized media container: pixel-level decode requires "
                "PIL/ffmpeg; set KSQL_SPARK_FAKE_DECODE=1 for the "
                "deterministic stub"
            )
        return _decode_fake(payload)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(bytes(p)) for p in payloads],
                    "content_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def extract_audio_meta(df: DataFrame) -> DataFrame:
    """REAL audio metadata decode for WAV payloads via the stdlib `wave`
    module (no ffmpeg needed): channels, sample rate, frame count, duration.
    Same mapInPandas shape as image feature extraction — Arrow batches in,
    constant memory, one worker per partition. Non-WAV payloads raise (the
    honest boundary: compressed codecs need ffmpeg)."""

    def run(batches: Iterator) -> Iterator:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            rows = {
                "doc_id": [], "n_channels": [], "sample_rate": [],
                "n_samples": [], "duration_ms": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    rows["doc_id"].append(doc_id)
                    rows["n_channels"].append(w.getnchannels())
                    rows["sample_rate"].append(w.getframerate())
                    rows["n_samples"].append(w.getnframes())
                    rows["duration_ms"].append(
                        w.getnframes() * 1000 // max(1, w.getframerate())
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_SCHEMA)
