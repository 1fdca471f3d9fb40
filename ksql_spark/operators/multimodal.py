"""Multimodal column conventions (SURVEY.md §2.K K5 [EXT]).

Convention: a modality is an opaque `binary` payload + a typed metadata struct
(mime, byte size, content hash) + whatever modality-specific fields decode
produces. Content addressing is sha2 over the payload, so dedup/join logic is
modality-agnostic.

Decode reality tiers (this container has no PIL/ffmpeg):
- REAL, no deps: image dimensions by container-header parse (PNG/GIF/BMP/
  JPEG/netpbm — `sniff_image_dims`), WAV audio metadata via stdlib `wave`
  (`extract_audio_meta`), FULL pixel decode + nearest-neighbor resize for
  binary netpbm (`decode_netpbm`/`resize_nearest` — P5/P6 are raw planes
  behind an ASCII header), and FULL frame decode + sampling for monochrome
  YUV4MPEG2 video (`decode_y4m` — raw luma planes behind FRAME markers).
  Both pixel paths are oracle-verified end-to-end (llm_multimodal_resize,
  llm_multimodal_framesample).
- STUBBED behind `KSQL_SPARK_FAKE_DECODE`: compressed codecs (JPEG pixels,
  H.26x, non-WAV audio), which genuinely need PIL/ffmpeg.
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
    if payload[:2] in (b"P5", b"P6"):  # binary netpbm (PGM/PPM)
        parsed = _parse_netpbm_header(payload)
        if parsed is not None:
            return parsed[1], parsed[2]
    return None


def _parse_netpbm_header(payload: bytes):
    """Parse a binary netpbm header (P5 = grayscale PGM, P6 = RGB PPM):
    magic, width, height, maxval as whitespace-separated ASCII tokens with
    optional '#' comment lines. Returns (channels, width, height,
    pixel_data_offset) or None if malformed. Pure stdlib — netpbm is the
    one raster format fully decodable without PIL."""
    magic = payload[:2]
    channels = {b"P5": 1, b"P6": 3}.get(magic)
    if channels is None:
        return None
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= len(payload):
        return None
    w, h, maxval = fields
    if not (0 < w and 0 < h and 0 < maxval < 256):
        return None
    return channels, w, h, i + 1  # exactly ONE whitespace byte after maxval


def encode_ppm(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    import numpy as np

    a = np.asarray(pixels, dtype="uint8")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_netpbm(payload: bytes):
    """REAL pixel decode of binary PGM/PPM: returns an (h, w, channels)
    uint8 numpy array. Raises ValueError on malformed/truncated input."""
    import numpy as np

    parsed = _parse_netpbm_header(payload)
    if parsed is None:
        raise ValueError("not a binary netpbm (P5/P6) payload")
    channels, w, h, off = parsed
    n = w * h * channels
    buf = payload[off : off + n]
    if len(buf) != n:
        raise ValueError(f"truncated netpbm pixel data: {len(buf)} != {n}")
    return np.frombuffer(buf, dtype="uint8").reshape(h, w, channels)


def resize_nearest(img, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, c) array to (height, width, c)
    with the standard floor mapping src = (dst * src_extent) // dst_extent —
    the same arithmetic a SQL oracle can state in closed form."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[ys][:, xs]


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
        # luma-plane pixel sum for REAL decodes, NULL on the stub path —
        # the oracle-able product of a frame decode (sha is not SQL-
        # expressible: DuckDB 1.0 sha256 only hashes VARCHAR)
        StructField("frame_sum", LongType()),
    ]
)


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """mapInPandas image resize (SURVEY §2 K5).

    Netpbm payloads (P5/P6) take the REAL path: stdlib+numpy pixel decode,
    nearest-neighbor resample, sha over the resized pixel bytes. Other
    containers need PIL, absent here: they fall back to the deterministic
    stub when KSQL_SPARK_FAKE_DECODE=1 (default) and raise otherwise. The
    Spark-side plumbing (Arrow batches, output schema, partition layout) is
    identical on every path.
    """
    fake = os.environ.get("KSQL_SPARK_FAKE_DECODE", "1") == "1"

    def one(payload) -> str | None:
        if payload is None:
            return None  # dirty blob reference: NULL result, not an abort
        if payload[:2] in (b"P5", b"P6"):
            try:
                resized = resize_nearest(decode_netpbm(payload), width, height)
                return hashlib.sha256(resized.tobytes()).hexdigest()
            except ValueError:
                # a 2-byte magic is a weak signal: text starting "P5 ..."
                # or a truncated PPM must not abort the whole job in stub
                # mode — fall through to the stub (or the strict raise)
                if not fake:
                    raise
        if not fake:
            raise NotImplementedError(
                "non-netpbm resize requires PIL; set KSQL_SPARK_FAKE_DECODE=1 "
                "for the deterministic stub"
            )
        return hashlib.sha256(payload + f"{width}x{height}".encode()).hexdigest()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized_sha": [
                        one(None if p is None else bytes(p))
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas video frame sampling: one output row per sampled frame —
    the flatten shape a real ffmpeg-backed sampler produces.

    Monochrome Y4M payloads take the REAL path: container decode
    (`decode_y4m`), evenly-spaced frame pick by the floor mapping
    src = (i * n_total) // n_frames, sha over the actual frame bytes.
    Compressed codecs need ffmpeg, absent here: they fall back to the
    deterministic stub when KSQL_SPARK_FAKE_DECODE=1 (default) and raise
    otherwise."""
    fake = os.environ.get("KSQL_SPARK_FAKE_DECODE", "1") == "1"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_sha": [], "frame_sum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # dirty blob reference: skip, not an abort
                p = bytes(payload)
                if p.startswith(b"YUV4MPEG2 "):
                    try:
                        frames = decode_y4m(p)
                    except ValueError:
                        # truncated / non-mono / prefix-coincidence payloads
                        # must not abort the job in stub mode — fall through
                        # to the stub (or the strict raise below)
                        if not fake:
                            raise
                        frames = None
                    if frames is not None:
                        nt = frames.shape[0]
                        for i in range(n_frames):
                            src = (i * nt) // n_frames
                            rows["doc_id"].append(doc_id)
                            rows["frame_idx"].append(src)
                            rows["frame_sha"].append(
                                hashlib.sha256(frames[src].tobytes()).hexdigest()
                            )
                            rows["frame_sum"].append(
                                int(frames[src].sum(dtype="int64"))
                            )
                        continue
                elif not fake:
                    raise NotImplementedError(
                        "non-Y4M frame sampling requires ffmpeg; set "
                        "KSQL_SPARK_FAKE_DECODE=1 for the deterministic stub"
                    )
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_sha"].append(
                        hashlib.sha256(p + bytes([i])).hexdigest()
                    )
                    rows["frame_sum"].append(None)  # no real decode happened
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
            # NULL payloads (e.g. attach_payload over NULL text) yield a
            # NULL feature row — a dirty blob reference must not kill the
            # whole pass
            payloads = [None if p is None else bytes(p) for p in pdf["payload"]]
            dims = [None if p is None else decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [None if p is None else len(p) for p in payloads],
                    "content_sha": [
                        None if p is None else hashlib.sha256(p).hexdigest()
                        for p in payloads
                    ],
                    "width": [None if d is None else d[0] for d in dims],
                    "height": [None if d is None else d[1] for d in dims],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def encode_y4m(frames) -> bytes:
    """Encode an (n_frames, h, w) uint8 array as monochrome YUV4MPEG2 —
    a REAL video container (mpv/ffmpeg play it) that is fully decodable
    with stdlib alone: ASCII stream header, then per frame a FRAME marker
    + raw luma plane."""
    import numpy as np

    a = np.asarray(frames, dtype="uint8")
    n, h, w = a.shape
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 Cmono\n" % (w, h)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(a[f].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """REAL video decode of monochrome Y4M: returns an (n_frames, h, w)
    uint8 numpy array. Raises ValueError on malformed/truncated input or
    non-mono chroma (4:2:0 etc. would need real chroma handling — out of
    scope for the stdlib tier)."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2 "):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    mono = False
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            mono = tok[1:] == b"mono"
    if not (w and h):
        raise ValueError("Y4M header missing W/H")
    if not mono:
        raise ValueError("only Cmono Y4M is decodable without chroma handling")
    frames = []
    i = nl + 1
    fsize = w * h
    while i < len(payload):
        j = payload.index(b"\n", i)  # FRAME line (may carry params)
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        buf = payload[j + 1 : j + 1 + fsize]
        if len(buf) != fsize:
            raise ValueError(f"truncated frame: {len(buf)} != {fsize}")
        frames.append(np.frombuffer(buf, dtype="uint8").reshape(h, w))
        i = j + 1 + fsize
    return np.stack(frames)


_PAYLOAD_SCHEMA = "doc_id long, payload binary"


def synth_payload_ppm(df: DataFrame) -> DataFrame:
    """(doc_id, payload): a genuine binary PPM per document — dims
    w = 16 + n_chars % 48, h = 16 + 7*n_chars % 48, pixel (y, x, c) =
    (3x + 7y + c) mod 256 (the synth_ppm_resize conventions). Feeds the
    PRODUCTION operators (extract_features, resize_images) real image
    bytes whose decode products are closed-form, so the operators
    themselves become oracle-checkable — not just their synth_* twins."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                w, h = 16 + nc % 48, 16 + (nc * 7) % 48
                x, y, c = np.arange(w), np.arange(h), np.arange(3)
                img = (
                    (x[None, :, None] * 3 + y[:, None, None] * 7 + c[None, None, :])
                    % 256
                ).astype("uint8")
                out["doc_id"].append(doc_id)
                out["payload"].append(encode_ppm(img))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, _PAYLOAD_SCHEMA)


def synth_payload_y4m(df: DataFrame) -> DataFrame:
    """(doc_id, payload): a genuine monochrome Y4M stream per document —
    n_frames = 4 + n_chars % 5, w = 8 + n_chars % 8, h = 8 + 3*n_chars % 8,
    frame f pixel (y, x) = (7x + 11y + 31f) mod 256 (the
    synth_y4m_frame_sample conventions). Feeds the PRODUCTION sample_frames
    operator real video bytes with closed-form frame sums."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                w, h, nf = 8 + nc % 8, 8 + (nc * 3) % 8, 4 + nc % 5
                f, y, x = np.arange(nf), np.arange(h), np.arange(w)
                vid = (
                    (
                        7 * x[None, None, :]
                        + 11 * y[None, :, None]
                        + 31 * f[:, None, None]
                    )
                    % 256
                ).astype("uint8")
                out["doc_id"].append(doc_id)
                out["payload"].append(encode_y4m(vid))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, _PAYLOAD_SCHEMA)


SYNTH_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sum", LongType()),
    ]
)


def synth_y4m_frame_sample(df: DataFrame, n_out: int = 3) -> DataFrame:
    """REAL video frame sampling, oracle-checkable in closed form: per
    document, synthesize a genuine monochrome Y4M stream (n_frames =
    4 + n_chars % 5, dims w = 8 + n_chars % 8, h = 8 + 3*n_chars % 8,
    frame f pixel (y, x) = (7x + 11y + 31f) mod 256), round-trip the actual
    bytes — encode_y4m → decode_y4m — then sample `n_out` frames by the
    same floor mapping resize_nearest uses (src_f = (i * n_frames) //
    n_out) and emit each sampled frame's pixel sum. A bug anywhere in the
    container encode, the FRAME walk, or the sampling arithmetic
    hash-mismatches the result.

    Scale shape: one narrow Arrow-batched mapInPandas pass emitting n_out
    rows per doc; no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_sum": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                w, h, nf = 8 + nc % 8, 8 + (nc * 3) % 8, 4 + nc % 5
                f = np.arange(nf)
                y = np.arange(h)
                x = np.arange(w)
                vid = (
                    (
                        7 * x[None, None, :]
                        + 11 * y[None, :, None]
                        + 31 * f[:, None, None]
                    )
                    % 256
                ).astype("uint8")
                frames = decode_y4m(encode_y4m(vid))
                for i in range(n_out):
                    src = (i * nf) // n_out
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(src)
                    out["frame_sum"].append(int(frames[src].sum(dtype="int64")))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_FRAMES_SCHEMA)


SYNTH_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_sum", LongType()),
    ]
)


def synth_ppm_resize(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """REAL end-to-end pixel pipeline, oracle-checkable in closed form:
    per document, synthesize a genuine binary PPM whose dims derive from
    n_chars (w = 16 + n_chars % 48, h = 16 + 7*n_chars % 48) and whose
    pixel (y, x, c) = (3x + 7y + c) mod 256; then round-trip the actual
    bytes — encode_ppm → decode_netpbm (header parse + frombuffer) →
    resize_nearest — and emit the int sum of the resized pixels. Every
    step runs on real image bytes; the nearest-neighbor floor mapping
    src = (dst * src_extent) // dst_extent makes the expected sum a pure
    integer formula a SQL oracle can state, so a bug anywhere in the
    encode/parse/resample chain hash-mismatches the result.

    Scale shape: one narrow Arrow-batched mapInPandas pass, constant
    memory per batch, no shuffle at all."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "resized_sum": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 16 + int(n_chars) % 48
                h = 16 + (int(n_chars) * 7) % 48
                x = np.arange(w)
                y = np.arange(h)
                c = np.arange(3)
                img = (
                    (x[None, :, None] * 3 + y[:, None, None] * 7 + c[None, None, :])
                    % 256
                ).astype("uint8")
                resized = resize_nearest(decode_netpbm(encode_ppm(img)), out_w, out_h)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_sum"].append(int(resized.sum(dtype="int64")))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_RESIZE_SCHEMA)


def synth_wav_meta(df: DataFrame) -> DataFrame:
    """REAL audio round-trip, oracle-checkable in closed form: per document,
    write a genuine RIFF/WAV via stdlib `wave` (channels = 1 + n_chars % 2,
    rate chosen from 4 standard rates by n_chars % 4, frames = 100 +
    n_chars % 400 of deterministic 16-bit samples), then decode the actual
    bytes back with the same stdlib reader used by extract_audio_meta and
    emit the recovered metadata. Every field is a pure function of n_chars,
    so a bug in either the RIFF writer or the parser hash-mismatches.

    Scale shape: one narrow Arrow-batched mapInPandas pass, no shuffle."""
    RATES = (8000, 16000, 22050, 44100)

    def run(batches: Iterator) -> Iterator:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "n_channels": [], "sample_rate": [],
                "n_samples": [], "duration_ms": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                ch, rate, nf = 1 + nc % 2, RATES[nc % 4], 100 + nc % 400
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wr:
                    wr.setnchannels(ch)
                    wr.setsampwidth(2)
                    wr.setframerate(rate)
                    wr.writeframes(
                        bytes((i * 31) % 256 for i in range(nf * ch * 2))
                    )
                with wave.open(io.BytesIO(buf.getvalue())) as rd:
                    out["doc_id"].append(doc_id)
                    out["n_channels"].append(rd.getnchannels())
                    out["sample_rate"].append(rd.getframerate())
                    out["n_samples"].append(rd.getnframes())
                    out["duration_ms"].append(
                        rd.getnframes() * 1000 // max(1, rd.getframerate())
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, AUDIO_SCHEMA)


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


SYNTH_AHASH_SCHEMA = (
    "doc_id long, ahash_hi long, ahash_lo long, n_set int"
)


def synth_ppm_ahash(df: DataFrame) -> DataFrame:
    """REAL perceptual-hash pipeline, oracle-checkable in closed form:
    the synth_ppm_resize chain (encode PPM → parse → nearest resize to
    8×8) followed by the classic average-hash — grayscale each resized
    pixel as the channel sum, set bit (y*8+x) iff 64·g > Σg (strict,
    integer — no mean division), emit the 64-bit hash as two 32-bit
    halves (hi = bits 32..63) plus the popcount. Every bit is a pure
    integer function of n_chars, so the SQL oracle states the hash
    directly; a bug anywhere in the byte round-trip or the resample
    flips bits and hash-mismatches.

    Near-dup usage: hamming distance over (ahash_hi, ahash_lo) — the
    image analog of K32b's SimHash; exact-collision grouping on the
    pair is the hamming-0 dedup bucket.

    Scale shape: one narrow Arrow-batched mapInPandas pass, no
    shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "ahash_hi": [], "ahash_lo": [], "n_set": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 16 + int(n_chars) % 48
                h = 16 + (int(n_chars) * 7) % 48
                x = np.arange(w)
                y = np.arange(h)
                c = np.arange(3)
                img = (
                    (x[None, :, None] * 3 + y[:, None, None] * 7
                     + c[None, None, :]) % 256
                ).astype("uint8")
                resized = resize_nearest(
                    decode_netpbm(encode_ppm(img)), 8, 8
                )
                g = resized.sum(axis=2, dtype="int64")  # (8, 8) grayscale
                total = int(g.sum())
                bits = (64 * g > total).astype("uint8")
                val = 0
                for yy in range(8):
                    for xx in range(8):
                        if bits[yy, xx]:
                            val |= 1 << (yy * 8 + xx)
                out["doc_id"].append(doc_id)
                out["ahash_hi"].append(val >> 32)
                out["ahash_lo"].append(val & 0xFFFFFFFF)
                out["n_set"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_AHASH_SCHEMA)


SYNTH_DHASH_SCHEMA = (
    "doc_id long, dhash_hi long, dhash_lo long, n_set int"
)


def synth_ppm_dhash(df: DataFrame) -> DataFrame:
    """REAL difference-hash pipeline, oracle-checkable in closed form:
    the synth_ppm_resize chain (encode PPM → parse → nearest resize, here
    to 9×8 so each of the 8 rows yields 8 horizontal comparisons) followed
    by the classic dHash — grayscale each resized pixel as the channel
    sum, set bit (y*8+x) iff g[y,x] > g[y,x+1] (strict, integer — a pure
    gradient sign, invariant to global brightness shifts where aHash is
    not), emit the 64-bit hash as two 32-bit halves plus the popcount.
    Every bit is a pure integer function of n_chars, so the SQL oracle
    states the hash directly; a bug anywhere in the byte round-trip, the
    9-wide resample, or the comparison order flips bits and
    hash-mismatches.

    Near-dup usage: hamming distance over (dhash_hi, dhash_lo) — the
    gradient complement of synth_ppm_ahash; images that defeat aHash via
    uniform brightness changes still collide here.

    Scale shape: one narrow Arrow-batched mapInPandas pass, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "dhash_hi": [], "dhash_lo": [], "n_set": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 16 + int(n_chars) % 48
                h = 16 + (int(n_chars) * 7) % 48
                x = np.arange(w)
                y = np.arange(h)
                c = np.arange(3)
                img = (
                    (x[None, :, None] * 3 + y[:, None, None] * 7
                     + c[None, None, :]) % 256
                ).astype("uint8")
                resized = resize_nearest(
                    decode_netpbm(encode_ppm(img)), 9, 8
                )
                g = resized.sum(axis=2, dtype="int64")  # (8, 9) grayscale
                bits = (g[:, :8] > g[:, 1:]).astype("uint8")
                val = 0
                for yy in range(8):
                    for xx in range(8):
                        if bits[yy, xx]:
                            val |= 1 << (yy * 8 + xx)
                out["doc_id"].append(doc_id)
                out["dhash_hi"].append(val >> 32)
                out["dhash_lo"].append(val & 0xFFFFFFFF)
                out["n_set"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_DHASH_SCHEMA)


SYNTH_AUDIO_FEAT_SCHEMA = (
    "doc_id long, seg int, n_in_seg int, sum_sq long, "
    "zero_crossings int, peak int"
)


def synth_wav_segment_features(df: DataFrame, n_seg: int = 4) -> DataFrame:
    """REAL audio feature extraction, oracle-checkable in closed form:
    synthesize the same RIFF/WAV clip as synth_wav_meta (byte j of the
    payload is (j*31) mod 256, nf = 100 + n_chars % 400 frames,
    ch = 1 + n_chars % 2 channels, 16-bit LE), decode the actual bytes
    back via stdlib `wave` + int16 reinterpretation, then split the
    interleaved sample stream into `n_seg` equal segments by the floor
    mapping seg = (i * n_seg) // n and emit per segment: energy
    (Σ s², exact int64), zero crossings (count of s[i-1]*s[i] < 0 within
    the segment), and peak (max |s|). Every sample value is the pure
    function s(i) = int16(le16((2i*31) mod 256, ((2i+1)*31) mod 256)) of
    the sample index, so the SQL oracle states every feature exactly; a
    bug in the RIFF writer, the wave reader, the int16 view, or the
    segment mapping mismatches.

    This is the audio analog of the image/video feature passes: RMS
    energy and ZCR per window are the first-stage features every speech/
    music pipeline computes before any model sees the clip.

    Scale shape: one narrow Arrow-batched mapInPandas pass emitting
    n_seg rows per doc; no shuffle."""
    RATES = (8000, 16000, 22050, 44100)

    def run(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "seg": [], "n_in_seg": [], "sum_sq": [],
                "zero_crossings": [], "peak": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                ch, rate, nf = 1 + nc % 2, RATES[nc % 4], 100 + nc % 400
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wr:
                    wr.setnchannels(ch)
                    wr.setsampwidth(2)
                    wr.setframerate(rate)
                    wr.writeframes(
                        bytes((i * 31) % 256 for i in range(nf * ch * 2))
                    )
                with wave.open(io.BytesIO(buf.getvalue())) as rd:
                    raw = rd.readframes(rd.getnframes())
                s = np.frombuffer(raw, dtype="<i2").astype("int64")
                n = len(s)
                segs = (np.arange(n) * n_seg) // n
                for k in range(n_seg):
                    v = s[segs == k]
                    # crossings strictly inside the segment: pair (i-1, i)
                    # with both indices mapped to segment k
                    cross = int(((v[:-1] * v[1:]) < 0).sum()) if len(v) > 1 else 0
                    out["doc_id"].append(doc_id)
                    out["seg"].append(k)
                    out["n_in_seg"].append(int(len(v)))
                    out["sum_sq"].append(int((v * v).sum()))
                    out["zero_crossings"].append(cross)
                    out["peak"].append(int(np.abs(v).max()) if len(v) else 0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_AUDIO_FEAT_SCHEMA)


SYNTH_MOTION_SCHEMA = "doc_id long, from_frame int, motion_energy long"


def synth_y4m_motion_energy(df: DataFrame) -> DataFrame:
    """REAL video motion-energy extraction, oracle-checkable in closed
    form: synthesize the same monochrome Y4M stream as
    synth_y4m_frame_sample (frame f pixel (y, x) = (7x + 11y + 31f) mod
    256), round-trip the actual container bytes (encode_y4m → FRAME-walk
    decode_y4m), then emit the sum of absolute luma differences between
    each consecutive frame pair — the standard shot-boundary / motion
    signal. Because frame f+1 is frame f shifted by +31 mod 256, each
    pixel's |diff| is 31 unless the value wraps (a >= 225 → |a+31-256-a| =
    225), so motion(f) = 31·w·h + 194·#{(x,y): (7x+11y+31f) mod 256 >=
    225} — a pure integer formula the SQL oracle states directly. A bug
    in the container walk, the frame pairing, or the abs-diff mismatches.

    Scale shape: one narrow Arrow-batched mapInPandas pass emitting
    n_frames-1 rows per doc; no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "from_frame": [], "motion_energy": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                w, h, nf = 8 + nc % 8, 8 + (nc * 3) % 8, 4 + nc % 5
                f = np.arange(nf)
                y = np.arange(h)
                x = np.arange(w)
                vid = (
                    (
                        7 * x[None, None, :]
                        + 11 * y[None, :, None]
                        + 31 * f[:, None, None]
                    )
                    % 256
                ).astype("uint8")
                frames = decode_y4m(encode_y4m(vid)).astype("int64")
                diffs = np.abs(frames[1:] - frames[:-1]).sum(axis=(1, 2))
                for i, d in enumerate(diffs):
                    out["doc_id"].append(doc_id)
                    out["from_frame"].append(i)
                    out["motion_energy"].append(int(d))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_MOTION_SCHEMA)


SYNTH_HIST_SCHEMA = (
    "doc_id long, mean_intensity double, dominant_bin int, "
    + ", ".join(f"bin_{b} int" for b in range(8))
)


def synth_ppm_histogram(df: DataFrame) -> DataFrame:
    """REAL thumbnail-histogram pipeline, oracle-checkable in closed form:
    the synth_ppm_resize chain (encode PPM → parse → nearest resize to
    8×8 RGB = 192 bytes) followed by the classic 8-bin intensity
    histogram (bin = v // 32), the 1e-6-quantized mean intensity, and
    the dominant bin (ties to the lowest bin index). Every count is a
    pure integer function of n_chars via the floor-resample mapping, so
    the SQL oracle states all 8 bins directly; any byte-pipeline bug
    shifts a count and hash-mismatches.

    Scale shape: one narrow Arrow-batched mapInPandas pass, no shuffle;
    the histogram vector is the standard cheap image feature fed to
    near-dup blocking and quality screens."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "mean_intensity": [], "dominant_bin": [],
                **{f"bin_{b}": [] for b in range(8)},
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 16 + int(n_chars) % 48
                h = 16 + (int(n_chars) * 7) % 48
                x = np.arange(w)
                y = np.arange(h)
                c = np.arange(3)
                img = (
                    (x[None, :, None] * 3 + y[:, None, None] * 7
                     + c[None, None, :]) % 256
                ).astype("uint8")
                resized = resize_nearest(
                    decode_netpbm(encode_ppm(img)), 8, 8
                ).astype("int64")
                flat = resized.reshape(-1)
                counts = np.bincount(flat // 32, minlength=8)
                total = int(flat.sum())
                # house 1e-6 quantization: trunc(x*1e6 + 0.5) as the long cast
                mean_q = (
                    int(total / 192 * 1000000.0 + 0.5) / 1000000.0
                )
                out["doc_id"].append(doc_id)
                out["mean_intensity"].append(mean_q)
                out["dominant_bin"].append(int(np.argmax(counts)))
                for b in range(8):
                    out[f"bin_{b}"].append(int(counts[b]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_HIST_SCHEMA)


SYNTH_AUDIO_ACF_SCHEMA = (
    "doc_id long, n_samples int, energy long, "
    "ac1 long, ac2 long, ac4 long, ac8 long"
)

_ACF_LAGS = (1, 2, 4, 8)


def synth_wav_autocorr(df: DataFrame) -> DataFrame:
    """REAL audio periodicity features, oracle-checkable in closed form:
    synthesize the same RIFF/WAV clip as synth_wav_segment_features
    (payload byte j = (j*31) mod 256, nf = 100 + n_chars % 400 frames,
    ch = 1 + n_chars % 2 channels, 16-bit LE), decode the actual bytes
    back via stdlib `wave` + int16 reinterpretation, then emit the
    EXACT-integer autocorrelation ladder over the interleaved sample
    stream: energy = Σ s_i² and r_ℓ = Σ_{i<n-ℓ} s_i·s_{i+ℓ} for
    ℓ ∈ {1, 2, 4, 8} — the ACF pitch/periodicity first stage of every
    speech pipeline, here with zero floating point (|s| < 2^15, so each
    product fits 2^30 and the sums fit int64 with ~2^23 headroom).
    Because sample i is the pure function int16(le16((2i*31) mod 256,
    (2i+31... the same formula the segment-features oracle states)), the
    SQL oracle re-derives every product; a bug in the RIFF writer, the
    reader, the int16 view, or the lag alignment mismatches.

    Scale shape: one narrow Arrow-batched mapInPandas pass emitting one
    row per doc; no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "energy": [],
                "ac1": [], "ac2": [], "ac4": [], "ac8": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nc = int(n_chars)
                ch, nf = 1 + nc % 2, 100 + nc % 400
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wr:
                    wr.setnchannels(ch)
                    wr.setsampwidth(2)
                    wr.setframerate(8000)
                    wr.writeframes(
                        bytes((i * 31) % 256 for i in range(nf * ch * 2))
                    )
                with wave.open(io.BytesIO(buf.getvalue())) as rd:
                    raw = rd.readframes(rd.getnframes())
                s = np.frombuffer(raw, dtype="<i2").astype("int64")
                n = len(s)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["energy"].append(int((s * s).sum()))
                for lag in _ACF_LAGS:
                    v = int((s[:-lag] * s[lag:]).sum()) if n > lag else 0
                    out[f"ac{lag}"].append(v)
            yield pd.DataFrame(out)

    return df.select("doc_id", "n_chars").mapInPandas(run, SYNTH_AUDIO_ACF_SCHEMA)
