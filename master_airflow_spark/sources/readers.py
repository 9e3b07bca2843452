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
