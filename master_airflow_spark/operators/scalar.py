"""Scalar / row-level operators — the reference's projection & derivation
surface (SURVEY.md §2.2-§2.3) plus the scalar-function closure (X13-X17).

Reference parity, recast on the driver tables:
- P2  whitespace-normalized concat   (dags/get_prices_load_mongodb.py:31-34)
- P3  bounded split, maxsplit=1      (dags/get_prices_load_mongodb.py:37-38)
- P6  date parse                     (dags/get_prices_load_mongodb.py:64)
- P7/P8 struct → JSON doc            (dags/get_prices_load_minio.py:69-77)
- P9  composite key concat           (dags/get_prices_load_minio.py:80)
- P10 string→double cast at read     (api/mongo/main.py:36)
- F1  half-open date-range filter    (api/mongo/main.py:68-75)
- F2  membership predicate           (dags/get_prices_load_mongodb.py:23)

All are single-pass narrow transformations: no shuffle, fully
pipelined inside one WholeStageCodegen span, and filters/projections
reach the parquet scan (pushed filters + pruned ReadSchema) — at 100 TB
these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register


@register(
    "normalize_whitespace",
    oracle=r"""
SELECT doc_id,
       trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_len
FROM documents
""",
    tags=("P2", "X13"),
)
def normalize_whitespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: strip + collapse inner whitespace (the scraper's
    ``' '.join(stripped_strings)`` semantics)."""
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


@register(
    "bounded_split",
    oracle="""
SELECT p_partkey,
       CASE WHEN strpos(p_name, ' ') > 0
            THEN substr(p_name, 1, strpos(p_name, ' ') - 1)
            ELSE p_name END AS first_token,
       CASE WHEN strpos(p_name, ' ') > 0
            THEN substr(p_name, strpos(p_name, ' ') + 1)
            ELSE '' END AS rest
FROM part
""",
    tags=("P3",),
)
def bounded_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: ``split(maxsplit=1)`` — first token vs remainder (empty when
    absent), the scraper's time/user extraction."""
    parts = F.split("p_name", " ", 2)
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.try_element_at(parts, F.lit(1)).alias("first_token"),
        F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("")).alias("rest"),
    )


@register(
    "date_parse_roundtrip",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str,
       CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS parsed_date
FROM orders
""",
    tags=("P4", "P6", "X14"),
)
def date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: the single string→date parse point (strptime '%Y-%m-%d')."""
    s = F.date_format("o_orderdate", "yyyy-MM-dd")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        s.alias("date_str"),
        F.to_date(s, "yyyy-MM-dd").alias("parsed_date"),
    )


@register(
    "json_document",
    oracle="""
SELECT l_orderkey, l_linenumber,
       to_json(struct_pack(
           price := CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR),
           station := l_returnflag,
           city := l_linestatus,
           date := strftime(l_shipdate, '%Y-%m-%d')
       )) AS doc
FROM lineitem
""",
    tags=("P7", "P8", "X17"),
)
def json_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P8: named-document construction + JSON serialization — the
    MinIO writer's per-record doc, with price kept as its string form
    (the reference's stored-as-string semantics, SURVEY.md §1.2)."""
    li = load_table(spark, sf_dir, "lineitem")
    doc = F.struct(
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price"),
        F.col("l_returnflag").alias("station"),
        F.col("l_linestatus").alias("city"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("date"),
    )
    return li.select("l_orderkey", "l_linenumber", F.to_json(doc).alias("doc"))


@register(
    "composite_key",
    oracle="""
SELECT strftime(l_shipdate, '%Y-%m-%d') || l_returnflag || l_linestatus AS obj_key,
       count(*) AS n
FROM lineitem
GROUP BY 1
""",
    tags=("P9", "X5"),
)
def composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: the MinIO object key ``date + station`` (string concat),
    counted per key — the upsert key-space of W4."""
    key = F.concat(
        F.date_format("l_shipdate", "yyyy-MM-dd"), "l_returnflag", "l_linestatus"
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(key.alias("obj_key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "cast_string_price",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) AS price_str,
       CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) AS DOUBLE) AS price
FROM orders
""",
    tags=("P10",),
)
def cast_string_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: the API boundary's str→float coercion (Pydantic) — store a
    string price, read it back as double."""
    s = F.col("o_totalprice").cast("decimal(14,2)").cast("string")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", s.alias("price_str"), s.cast("double").alias("price")
    )


@register(
    "date_range_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice AS price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'
""",
    tags=("F1",),
)
def date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: half-open date-range predicate (the Mongo API's today-filter
    generalized). The two bounds reach the parquet scan as pushed
    filters → row-group skipping; with a date-partitioned layout this
    is partition pruning."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            F.col("l_extendedprice").alias("price"),
        )
    )


@register(
    "membership_filter",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
    tags=("F2",),
)
def membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: membership predicate (the scraper's CSS-class IN-set)."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


@register(
    "top1_price_lexicographic",
    oracle="""
(SELECT 'highest' AS which,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
        l_orderkey, l_linenumber
   FROM lineitem
  ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) DESC,
           l_orderkey, l_linenumber LIMIT 1)
UNION ALL
(SELECT 'lowest' AS which,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
        l_orderkey, l_linenumber
   FROM lineitem
  ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) ASC,
           l_orderkey, l_linenumber LIMIT 1)
""",
    tags=("T3", "quirk"),
)
def top1_price_lexicographic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact variant of the serving query: price stored as a
    string and sorted lexicographically ("99.9" > "163.9") — the latent
    bug documented in SURVEY.md §1.2, preserved here as a named,
    opt-in behavior."""
    li = load_table(spark, sf_dir, "lineitem")
    price_str = F.col("l_extendedprice").cast("decimal(12,2)").cast("string")
    base = li.select(
        price_str.alias("price_str"), "l_orderkey", "l_linenumber"
    )

    def extreme(label: str, ascending: bool) -> DataFrame:
        c = F.col("price_str")
        return (
            base.orderBy(
                c.asc() if ascending else c.desc(),
                F.col("l_orderkey").asc(),
                F.col("l_linenumber").asc(),
            )
            .limit(1)
            .select(F.lit(label).alias("which"), "price_str", "l_orderkey", "l_linenumber")
        )

    return extreme("highest", False).unionByName(extreme("lowest", True))
