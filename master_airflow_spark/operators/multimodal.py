"""Multimodal columns — image/audio/video as opaque binary + typed
metadata (north-star extension; no multimodal data exists in the
reference or the driver tables, so payloads are derived
deterministically from the documents table).

Design for 100 TB multimodal datasets:
- payloads live in a ``binary`` column (or object-store pointers once
  payloads exceed row-group-friendly sizes); metadata is a typed
  struct column so planning-relevant fields (modality, byte size,
  dims) are prunable/filterable WITHOUT touching payload bytes —
  parquet column pruning means a metadata-only query never reads the
  blobs;
- decode / feature-extract run as Arrow-batched ``mapInPandas``: the
  only stage that materializes payload bytes in Python, batched per
  Arrow record batch, partition-parallel, no shuffle;
- actual codec work (PIL/librosa/ffmpeg) is STUBBED — the libraries
  aren't in this container. The stubs keep the real signatures, batch
  shapes, and schema contracts, and fail loudly (NotImplementedError)
  rather than fake a decode; the deterministic byte-level feature
  extractor below exercises the full plumbing instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register

try:  # pragma: no cover - decoder libs absent in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload + typed metadata struct. Payload bytes
    derive from the document text (deterministic stand-in for real
    media bytes); metadata fields mirror what an image pipeline keeps:
    modality, byte size, and fake dims derived from content hashes."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("modality"),
            F.octet_length("text").alias("n_bytes"),
            (F.pmod(F.xxhash64("text"), F.lit(1920)) + 1).alias("width"),
            (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(1080)) + 1).alias("height"),
        ).alias("meta"),
    )


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a binary PPM (P6) image without any codec library:
    header is ASCII 'P6', whitespace/comment-separated width, height,
    maxval, then one whitespace byte and raw RGB triplets. Returns
    (width, height, rgb_bytes). The one genuinely-working decode
    branch — everything needing a real codec stays a loud stub."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    rgb = payload[pos : pos + 3 * w * h]
    if len(rgb) != 3 * w * h:
        raise ValueError(f"truncated pixel data: {len(rgb)} of {3 * w * h} bytes")
    return w, h, rgb


def decode_image(payload: bytes) -> object:
    """Decode payload bytes to an image. PPM (P6) decodes natively;
    every other format requires PIL — STUB that fails loudly."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if not HAS_PIL:
        raise NotImplementedError(
            "non-PPM image decode requires PIL (not installed in this "
            "container); the Spark-side plumbing is exercised via "
            "byte_features and the PPM branch instead"
        )
    raise NotImplementedError("wire PIL.Image.open(BytesIO(payload)) here")


def resize_image(payload: bytes, w: int, h: int) -> bytes:
    """Resize an encoded image. STUB: requires PIL."""
    raise NotImplementedError("resize requires a codec library (PIL)")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Sample video frames. STUB: requires ffmpeg/pyav."""
    raise NotImplementedError("frame sampling requires ffmpeg/pyav")


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def byte_features(with_bin: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Deterministic per-payload feature vector: normalized byte-value
    histogram over ``n_buckets`` buckets. This is the feature-extract
    stage with the decode swapped for pure byte math — identical
    mapInPandas shape (binary in, fixed-width vector out) to a real
    CLIP/spectrogram extractor."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                hist = [0] * n_buckets
                for byte in b:
                    hist[byte * n_buckets // 256] += 1
                total = len(b) or 1
                rows.append((doc_id, len(b), [c / total for c in hist]))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "features"])

    return with_bin.select("doc_id", "payload").mapInPandas(extract, FEATURES_SCHEMA)


PPM_DIMS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
    ]
)


def ppm_dims(with_bin: DataFrame) -> DataFrame:
    """Decode stage over PPM payloads: Arrow-batched mapInPandas, one
    decode per row, emitting typed dimensions. Same plumbing shape as a
    real image decode (binary in → struct of decoded properties out);
    uses the native PPM branch so the path is actually executable in
    this container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_ppm(bytes(payload))
                rows.append((doc_id, w, h, len(rgb) // 3))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "n_pixels"])

    return with_bin.select("doc_id", "payload").mapInPandas(run, PPM_DIMS_SCHEMA)


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       'image/fake' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over a multimodal table: payload byte length
    + typed metadata fields, no payload decode. At 100 TB this plan
    prunes the blob column entirely (check ReadSchema)."""
    d = with_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").alias("payload_bytes"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
    )


@register("multimodal_features", oracle=None, tags=("multimodal", "X27"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas). Deterministic byte-histogram features stand in for
    the stubbed decoder; rows-only check (binary + UDF not
    SQL-oracle-able). The feature vector is serialized to a
    comma-joined string in the judged output — the driver canonicalizes
    even rows-only results and cannot hash array cells."""
    feats = byte_features(with_payload(load_table(spark, sf_dir, "documents")))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("features", lambda v: v.cast("string"))
        ).alias("features"),
    )
