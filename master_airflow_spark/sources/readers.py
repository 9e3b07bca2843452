"""Format readers — the engine's source formats beyond parquet.

The reference's only persisted interchange format is JSON objects
(one per record, MinIO sink — dags/get_prices_load_minio.py:69-77);
CSV is the classic landing format any ingestion layer meets. Both
readers take an explicit schema (schema-on-read with a declared
contract — inference is a convenience for exploration, a bug factory
in pipelines: it samples the data, so adding one malformed file can
silently retype a column) and surface corrupt records instead of
dropping them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_json(
    spark: SparkSession, path: str, schema: str, keep_corrupt: bool = True
) -> DataFrame:
    """JSON-lines reader with declared schema; malformed records land
    in _corrupt_record (PERMISSIVE) rather than vanishing."""
    full_schema = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    keep_corrupt: bool = True,
) -> DataFrame:
    full_schema = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    return (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for multimodal ingest: one row per file with
    (path, modificationTime, length, content) — the landing-zone shape
    for image/audio/video blobs before decode kernels run over the
    `content` column (operators/multimodal.py). `pathGlobFilter`
    pushes the extension filter into file LISTING, so non-matching
    files are never opened; at object-store scale listing parallelizes
    across the driver's listing threads and rows partition by file.
    Pair with spark.sql.files.maxPartitionBytes sizing when blobs are
    large — one task per blob is the failure mode to avoid for
    millions of small files (coalesce the read or compact upstream)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
