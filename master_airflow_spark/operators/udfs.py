"""Python UDF family (SURVEY.md §2.7 X27): scalar pandas UDF, grouped
aggregate pandas UDF, and GroupedData.applyInPandas — the three Arrow
escape hatches for semantics the built-ins can't express.

Engine posture: these are the SLOW path — everything else in this
repo is JVM-side on purpose. Each query here is designed so its
result is still exactly comparable to a SQL oracle (integer/ordering-
insensitive math inside the Python side), proving the Arrow boundary
doesn't smuggle in nondeterminism.

UDFs are constructed inside the query functions (pandas_udf parses
its DDL return type against the active session, so module-level
decoration would require a session at import time).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register


@register(
    "pandas_udf_scalar",
    oracle="""
SELECT o_orderkey,
       CAST(list_sum(list_transform(
           range(1, length(CAST(o_orderkey AS VARCHAR)) + 1),
           i -> CAST(substr(CAST(o_orderkey AS VARCHAR), i, 1) AS BIGINT) * i
       )) AS BIGINT) AS digit_checksum
FROM orders
""",
    tags=("X27",),
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: Arrow-batched scalar pandas UDF — a position-weighted digit
    checksum, deliberately SQL-expressible so the oracle verifies the
    Arrow round-trip exactly."""

    @pandas_udf("long")
    def digit_checksum(v: pd.Series) -> pd.Series:
        return v.map(
            lambda x: sum(int(d) * (i + 1) for i, d in enumerate(str(int(x))))
        )

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", digit_checksum("o_orderkey").alias("digit_checksum")
    )


@register(
    "pandas_udaf_median",
    oracle="""
SELECT o_orderstatus,
       median(o_totalprice) AS median_price,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
""",
    tags=("X27",),
)
def pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: grouped-aggregate pandas UDF computing an exact per-group
    median (a true UDAF). pandas interpolates the even-count midpoint
    the same way DuckDB's median() does ((lo+hi)/2 in double)."""

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        # group-agg pandas UDFs can't mix with built-in aggregates
        # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a UDAF too
        return len(v)

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            median_udaf("o_totalprice").alias("median_price"),
            count_udaf("o_totalprice").alias("n"),
        )
    )


def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: min-max normalize order totals within the
    group; group min/max are exact (no accumulation order)."""
    lo, hi = pdf.o_totalprice.min(), pdf.o_totalprice.max()
    span = hi - lo
    pdf = pdf[["o_orderstatus", "o_orderkey", "o_totalprice"]].copy()
    pdf["scaled"] = 0.5 if span == 0 else (pdf.o_totalprice - lo) / span
    return pdf


@register(
    "apply_in_pandas_scale",
    oracle="""
SELECT o_orderstatus, o_orderkey, o_totalprice,
       CASE WHEN max(o_totalprice) OVER w = min(o_totalprice) OVER w THEN 0.5
            ELSE (o_totalprice - min(o_totalprice) OVER w)
                 / (max(o_totalprice) OVER w - min(o_totalprice) OVER w)
       END AS scaled
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus)
""",
    tags=("X27",),
)
def apply_in_pandas_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: GroupedData.applyInPandas (UDTF-shaped: group in, frame
    out) — per-status min-max scaling. min/max are order-insensitive
    and the arithmetic is per-row IEEE, so the window-function oracle
    matches exactly. At scale each group must fit one executor's
    memory — the built-in window formulation (the oracle) is what
    you'd ship; this pins the Arrow grouped-map path against it."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .applyInPandas(
            _minmax_scale,
            "o_orderstatus string, o_orderkey long, o_totalprice double, scaled double",
        )
    )


@register(
    "udtf_fixed_chunks",
    oracle="""
SELECT d.doc_id,
       CAST(s.i AS INT) AS chunk_no,
       substr(d.text, s.i * 120 + 1, 120) AS chunk,
       length(substr(d.text, s.i * 120 + 1, 120)) AS chunk_len
FROM documents d,
     LATERAL (SELECT unnest(range(0, CAST(ceil(length(d.text) / 120.0) AS BIGINT)))
              AS i) s
WHERE d.doc_id % 25 = 0
""",
    tags=("X27",),
)
def udtf_fixed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: Python UDTF (table function) — the one UDF shape the rest
    of the family misses: one input row → N output rows from arbitrary
    Python, registered and invoked through SQL ``LATERAL`` like any
    table source. The body fixed-width-chunks document text (120
    chars), mirroring the oracle's LATERAL range expansion; chunking
    itself is done JVM-side elsewhere (doc_chunks) — this query exists
    to certify the UDTF execution surface end-to-end, on a pruned 4%
    slice of the corpus (UDTFs are row-at-a-time Python, the slowest
    path in the engine)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, chunk string, chunk_len int")
    class FixedChunks:
        def eval(self, text: str, width: int):
            if text is None:
                return
            for n in range((len(text) + width - 1) // width):
                piece = text[n * width : (n + 1) * width]
                yield n, piece, len(piece)

    spark.udtf.register("fixed_chunks", FixedChunks)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    docs.createOrReplaceTempView("udtf_docs_slice")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.chunk, c.chunk_len
        FROM udtf_docs_slice d,
             LATERAL fixed_chunks(d.text, 120) c
        """
    )
