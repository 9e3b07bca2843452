"""Deterministic sampling & dataset splitting — training-data-pipeline
staples (reproducible subsets at 100 TB, no RNG, no state).

The sampling key is a content hash (md5 hex → int), so membership is a
pure function of the row's keys: stable across runs, engines,
partitionings, and cluster sizes — the property `df.sample()` (seeded
per-partition RNG) does NOT have when partitioning changes. Judged
exactly against DuckDB via the same md5 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.functions.hashing import sql_portable_hash60
from master_airflow_spark.registry import register


def hash_bucket(*cols: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex digits of
    the '|'-joined key, mod buckets. Engine-portable (DuckDB:
    CAST('0x'||substr(md5(...),1,8) AS BIGINT))."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def _sql_bucket(expr: str, buckets: int = 100) -> str:
    return (
        f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT) % {buckets}"
    )


# After _sql_bucket on purpose: text.py imports _sql_bucket from this
# module at ITS module level, so this import must run only once every
# name text re-imports already exists (either import order then
# resolves against a sufficiently-initialized partial module).
from master_airflow_spark.operators.text import _SQL_TOKS  # noqa: E402


@register(
    "hash_sample_10pct",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE {_sql_bucket("concat_ws('|', l_orderkey, l_linenumber)")} < 10
""",
    tags=("sampling",),
)
def hash_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample keyed on (orderkey, linenumber): the
    same rows every run on any cluster; the predicate is a pure row
    function so it pipelines inside the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        hash_bucket("l_orderkey", "l_linenumber") < 10
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@register(
    "train_test_split",
    oracle=f"""
SELECT CASE WHEN {_sql_bucket("CAST(doc_id AS VARCHAR)")} < 80 THEN 'train'
            WHEN {_sql_bucket("CAST(doc_id AS VARCHAR)")} < 90 THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY 1
""",
    tags=("sampling",),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test split by document-id hash —
    reproducible assignment, no leakage across reshuffles (a doc's
    split never changes when the corpus grows elsewhere)."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "stratified_sample",
    oracle=f"""
SELECT lang, doc_id
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY {_sql_bucket("CAST(doc_id AS VARCHAR)", 1000000)}, doc_id) <= 5
""",
    tags=("sampling", "X10"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 5 documents per language, chosen by
    hash order (deterministic, unbiased w.r.t. document content) —
    top-k-per-group over the hash ranking."""
    d = load_table(spark, sf_dir, "documents")
    h = hash_bucket("doc_id", buckets=1_000_000)
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "doc_id")
    )


# target mixture weights per source bucket (a real pipeline reads these
# from a mixing config; sources hash into 4 groups so the op is
# schema-independent of the 20 synthetic source names)
MIX_RATES = {0: 100, 1: 50, 2: 25, 3: 10}  # percent kept per source group


_SQL_MIX_RATE = (
    f"CASE src_grp WHEN 0 THEN {MIX_RATES[0]} WHEN 1 THEN {MIX_RATES[1]} "
    f"WHEN 2 THEN {MIX_RATES[2]} ELSE {MIX_RATES[3]} END"
)


@register(
    "dataset_mix_sample",
    oracle=f"""
WITH tagged AS (
    SELECT doc_id, source,
           {_sql_bucket("source", 4)} AS src_grp,
           {_sql_bucket("CAST(doc_id AS VARCHAR)")} AS row_bucket
    FROM documents
)
SELECT src_grp,
       {_SQL_MIX_RATE} AS target_pct,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM tagged
WHERE row_bucket < {_SQL_MIX_RATE}
GROUP BY src_grp
""",
    tags=("sampling",),
)
def dataset_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: each source group keeps a configured
    fraction of its documents (100/50/25/10%), the knob a pretraining
    pipeline turns to up/down-weight corpora. Membership is a pure
    content-hash function of (doc_id) compared against the group's
    rate — reproducible under repartitioning and corpus growth, and a
    scan-level predicate (no shuffle) until the audit aggregate. The
    same doc keeps its fate if its group's rate rises (nested samples:
    rate 10 ⊂ rate 25 ⊂ rate 50), which is what makes mixing ratios
    tunable without resampling churn."""
    d = load_table(spark, sf_dir, "documents")
    src_grp = hash_bucket("source", buckets=4)
    row_bucket = hash_bucket("doc_id")
    rate = (
        F.when(src_grp == 0, MIX_RATES[0])
        .when(src_grp == 1, MIX_RATES[1])
        .when(src_grp == 2, MIX_RATES[2])
        .otherwise(MIX_RATES[3])
    )
    return (
        d.withColumn("src_grp", src_grp)
        .withColumn("target_pct", rate)
        .where(row_bucket < rate)
        .groupBy("src_grp", "target_pct")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "weighted_sample_per_source",
    oracle=f"""
WITH pr AS (
    SELECT doc_id, source, n_chars,
           CAST(n_chars AS DOUBLE) /
           (CAST({sql_portable_hash60("'wps|' || CAST(doc_id AS VARCHAR)")}
                 % 1099511627776 + 1 AS DOUBLE) / 1099511627776.0) AS priority
    FROM documents
)
SELECT source, doc_id, n_chars, priority, rn
FROM (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY priority DESC, doc_id) AS rn
      FROM pr)
WHERE rn <= 5
""",
    tags=("sampling", "X10"),
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, deterministic: priority
    sampling (Duffield/Lund/Thorup '07) with q_i = w_i / u_i where u_i
    is a hash-derived uniform in (0,1] — the top-k priorities per
    source are a weight-proportional sample, reproducible across runs,
    engines, and partitionings (the property rand()-based weighted
    sampling lacks). Weight = n_chars, so longer documents are
    proportionally favored — the "sample tokens, not documents"
    correction a training-mix builder needs. u derives from
    portable_hash60 mod 2^40 (exact double divisions only, no RNG, no
    log/pow), so DuckDB replays the identical arithmetic. Per-group
    top-k via window rank: one shuffle on source; at 100 TB the
    hash/priority computation is scan-local and only k rows per
    source survive the exchange."""
    from master_airflow_spark.functions.hashing import portable_hash60

    M = 1_099_511_627_776  # 2^40
    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash60(F.concat(F.lit("wps|"), F.col("doc_id").cast("string")))
    u = ((h % F.lit(M)) + 1).cast("double") / F.lit(float(M))
    pr = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("n_chars").cast("double") / u).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    return (
        pr.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars", "priority", "rn")
    )


@register(
    "token_budget_mix",
    oracle=f"""
WITH per_src AS (
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total,
           CAST(count(*) AS DOUBLE) AS n_sources
    FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / total AS token_share,
       least(1.0, (1.0 / n_sources) / (CAST(n_tokens AS DOUBLE) / total))
           AS sample_rate
FROM per_src CROSS JOIN tot
""",
    tags=("sampling", "X5"),
)
def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning in TOKEN space: per-source token counts,
    each source's share of the corpus token budget, and the
    downsampling rate that flattens the mix to the uniform target
    (rate = min(1, target_share / actual_share); over-represented
    sources get rate < 1, under-represented keep everything — the
    upsampling side is an epoch-count decision, not a sampling rate).
    A real planner swaps the uniform target for a weight map; the plan
    is identical. Composes with weighted_sample_per_source /
    hash_sample_10pct to EXECUTE the computed rates deterministically.
    One map-side-combinable aggregate over the scan; the per-source
    frame is sources-sized, so the totals row is a broadcast scalar.
    Exact integer token sums; fixed-order double divisions — DuckDB
    replays it bit-for-bit."""
    from master_airflow_spark.operators.text import tokens

    per_src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens())).cast("long").alias("n_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("total")
    return per_src.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        F.least(F.lit(1.0), (F.lit(1.0) / F.col("n_sources")) / share).alias(
            "sample_rate"
        ),
    )
