"""Table catalog: load the driver's parquet tables and register views.

The reference declares its schema implicitly per sink (SURVEY.md §1.2);
here the parquet footer is the single schema authority and tables are
exposed uniformly as DataFrames / temp views. Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and (on partitioned layouts) partition pruning for free.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# engine targets (region/nation are fixed-cardinality; supplier/part
# grow with SF but stay broadcastable well past sf1 at default 10 MB
# autoBroadcastJoinThreshold — Catalyst sizes them from parquet stats).
BROADCAST_DIMS = ("region", "nation", "supplier", "part")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_part_stats(path: str) -> list[tuple[str, int, int, int]]:
    """Driver-side (os.stat, no Spark job) identity of a parquet table
    at ``path`` — a single file or a directory of part files — as
    sorted (name, mtime_ns, size, ino) tuples. Empty list if the path
    is missing. The ONE walker behind every cheap table fingerprint in
    the repo (near-dup probe cache invalidation, size-adaptive state
    partitioning, scale-probe staging markers), so a future change —
    nested partition dirs, atomicity markers — lands once.

    st_ino is folded in (round-11 ADVICE) so a corpus replaced by a
    timestamp-preserving copy (cp -p / rsync -t, same names and sizes)
    still changes the fingerprint: the copy is a new inode even when
    mtime/size collide. Remaining blind spot: an in-place overwrite
    that preserves the inode AND restores mtime AND lands on the same
    byte size — outside what stat() can distinguish."""
    try:
        if os.path.isdir(path):
            out = []
            for name in sorted(os.listdir(path)):
                if name.endswith(".parquet"):
                    st = os.stat(os.path.join(path, name))
                    out.append((name, st.st_mtime_ns, st.st_size, st.st_ino))
            return out
        st = os.stat(path)
        return [(os.path.basename(path), st.st_mtime_ns, st.st_size, st.st_ino)]
    except OSError:
        return []


def table_bytes(sf_dir: str, name: str) -> int:
    """Total on-disk parquet bytes of a table — single file OR a
    directory of part files (summed via parquet_part_stats, the one
    walker). Size gates MUST use this instead of os.path.getsize: on
    a directory-layout table (any Spark-written output, e.g. the
    scale-probe replicas) getsize returns the directory inode's size
    (~4-16 KB), which would silently hold a "small side" broadcast
    hint open at any data volume."""
    return sum(s[2] for s in parquet_part_stats(table_path(sf_dir, name)))


def ensure_session_defaults(spark: SparkSession) -> None:
    """Set the runtime-settable confs the engine's semantics depend on.

    Queries may run under a SparkSession the caller built (the driver
    constructs its own) — session.get_spark's build-time configuration
    can't be assumed. On runtimes without a native parquet ns type
    (Spark ≤4.0) the events-table read dies on PARQUET_TYPE_ILLEGAL
    unless nanosAsLong is set (4.1+ reads TIMESTAMP(NANOS) natively as
    TIMESTAMP_NTZ and ignores the flag — harmless); without a UTC
    session timezone, timestamp-derived values shift against the
    oracle. Both are runtime-settable; setting them per load is an
    idempotent no-op when already configured."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS).

    How Spark surfaces these depends on version: ≤4.0 has no ns type
    and needs spark.sql.legacy.parquet.nanosAsLong (column arrives as
    bigint raw nanos); 4.1+ reads them natively as TIMESTAMP_NTZ,
    µs-truncated — same floor DuckDB applies at read time.

    `path` may be a single parquet file (the driver testdata layout) or
    a directory of part files (the production layout Spark writes) —
    every part shares the footer schema, so the first one answers."""
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(r, f)
            for r, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
        if not parts:
            return []
        path = parts[0]
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_defaults(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols and dict(df.dtypes).get(ns_cols[0]) == "bigint":
        # Legacy nanosAsLong read: integer ns→µs floor (`div`, not `/`:
        # ns values exceed double's 2^53 integer range), matching
        # DuckDB's read-time truncation.
        for c in ns_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Native TIMESTAMP_NTZ read (Spark 4.1+) needs no conversion: the
    # wall clock equals the legacy µs-floored value under the UTC
    # session timezone, and leaving the column untouched keeps
    # timestamp predicates pushable into the parquet scan (the legacy
    # long→timestamp projection blocked that).
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
