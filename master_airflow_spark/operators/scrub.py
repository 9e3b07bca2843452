"""Content scrubbing & profiling — the remaining pipeline hygiene
stages: PII redaction (regex, standard pretraining scrub), nested-map
flattening, and column profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register

# simple, portable patterns (Java regex ∩ RE2): emails and long digit runs
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGITS_RE = r"[0-9]{7,}"


@register(
    "pii_redact",
    oracle=f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{DIGITS_RE}', '<NUM>', 'g') AS redacted,
       length(regexp_replace(text, '{EMAIL_RE}', '', 'g')) <> length(text)
           AS had_email,
       length(regexp_replace(text, '{DIGITS_RE}', '', 'g')) <> length(text)
           AS had_long_number
FROM documents
""",
    tags=("X26", "quality"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: emails → <EMAIL>, 7+-digit runs → <NUM>, plus
    per-document flags of what was found. Pure regexp_replace — scan
    speed, no shuffle; the flag columns feed the audit aggregate a
    pipeline logs per batch."""
    d = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), DIGITS_RE, "<NUM>"
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        (F.length(F.regexp_replace("text", EMAIL_RE, "")) != F.length("text")).alias(
            "had_email"
        ),
        (F.length(F.regexp_replace("text", DIGITS_RE, "")) != F.length("text")).alias(
            "had_long_number"
        ),
    )


@register(
    "flatten_props_map",
    oracle="""
SELECT e.event_id, j.key AS prop_key, CAST(j.value AS INT) AS prop_value
FROM events e, LATERAL (
    SELECT unnest(json_keys(props)) AS key,
           json_extract_string(props, '$.' || unnest(json_keys(props))) AS value
) j
""",
    tags=("X17", "X16"),
)
def flatten_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-map flattening: parse the props JSON to a typed map and
    explode to (event_id, key, value) rows — the EAV normalization of
    semi-structured payloads."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select("event_id", F.explode(m).alias("prop_key", "prop_value"))


@register(
    "profile_columns",
    oracle="""
SELECT 'o_totalprice' AS column_name,
       count(*) AS n_rows,
       count(o_totalprice) AS n_nonnull,
       min(o_totalprice) AS min_val,
       max(o_totalprice) AS max_val,
       count(DISTINCT o_totalprice) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(o_custkey),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
       count(DISTINCT o_custkey)
FROM orders
""",
    tags=("quality", "X5"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (describe-shaped, exact): row/non-null/distinct
    counts and min/max per column, one row per column — the metadata a
    pipeline snapshots per batch to detect drift."""
    o = load_table(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.min(col).cast("double").alias("min_val"),
            F.max(col).cast("double").alias("max_val"),
            F.countDistinct(col).alias("n_distinct"),
        )

    return profile("o_totalprice").unionByName(profile("o_custkey"))
