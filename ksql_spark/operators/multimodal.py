"""Multimodal column conventions (SURVEY.md §2.K K5 [EXT]).

Convention: a modality is an opaque `binary` payload + a typed metadata struct
(mime, byte size, content hash) + whatever modality-specific fields decode
produces. Content addressing is sha2 over the payload, so dedup/join logic is
modality-agnostic.

The decode step (image/audio libs) is NOT available in this container — it is
stubbed behind `KSQL_SPARK_FAKE_DECODE`. The Spark-side plumbing (schema,
Arrow batch shape, mapInPandas signature, partitioning) is real and tested;
swapping the fake for PIL/ffmpeg is a one-function change.
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

    Raises NotImplementedError for real decoding unless KSQL_SPARK_FAKE_DECODE=1
    (no image/audio libs in this container — SURVEY §2.K K5 stub contract).
    """
    fake = os.environ.get("KSQL_SPARK_FAKE_DECODE", "1") == "1"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; set "
                    "KSQL_SPARK_FAKE_DECODE=1 for the deterministic stub"
                )
            payloads = pdf["payload"]
            dims = [_decode_fake(bytes(p)) for p in payloads]
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
