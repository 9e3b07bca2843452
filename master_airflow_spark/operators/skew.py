"""Skew mitigation — salting utilities (engine perf posture: "skewed
keys → salting or AQE skew-join").

AQE's skew-join splitting (on in this engine, session.py) handles
skewed SHUFFLE PARTITIONS automatically; salting is the manual tool
for the two cases AQE can't fix:

- a single hot KEY in an aggregation whose per-key state is expensive
  (two-stage salted aggregate: spread the hot key over N sub-keys,
  partial-aggregate, then collapse);
- a hot key in a shuffled join (salt the big side, replicate the
  small side N ways so every salted row still finds its match).

Both transformations are semantics-preserving; tests/test_skew.py
pins equality against the unsalted forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int) -> DataFrame:
    """Deterministic salt derived from row content (a hash of all
    columns), not rand(): reruns produce identical partitioning."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return df.withColumn("__salt", salt)


def salted_agg_counts(df: DataFrame, key: str, value: str, n_salts: int = 16) -> DataFrame:
    """Two-stage aggregate for hot keys: stage 1 aggregates on
    (key, salt) — the hot key's load spreads across n_salts reducers —
    stage 2 collapses the salted partials. Decimal sums keep stage-2
    recombination exact, so salting is invisible in the result."""
    stage1 = (
        with_salt(df, key, n_salts)
        .groupBy(key, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value).cast("decimal(28,4)")).alias("__sum"),
        )
    )
    return stage1.groupBy(key).agg(
        F.sum("__n").alias("n"),
        F.sum("__sum").cast("double").alias("total"),
    )


def salted_join(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    into one copy per salt value, join on (key, salt). The hot key's
    rows land on n_salts different reducers; the small side grows
    n_salts× (it's small — that's the deal)."""
    b = with_salt(big, big_key, n_salts)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(
        s, (F.col(big_key) == F.col(small_key)) & (b["__salt"] == s["__salt"])
    ).drop("__salt")


def _register_salted_query() -> None:
    """Registered here (not at module top) so the utilities above stay
    import-light for library users."""
    from pyspark.sql import SparkSession

    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.registry import register

    @register(
        "salted_hot_key_agg",
        oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
FROM events
GROUP BY event_type
""",
        tags=("X5",),
    )
    def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Hot-key aggregation via two-stage salting: the events table
        has only ~5 distinct event types, so a plain groupBy lands the
        whole table on 5 reducers no matter how many executors exist —
        the canonical skew case. Stage 1 spreads each key over 16
        content-derived salts (80 reducers of work), stage 2 collapses
        the partials; decimal sums make the recombination exact, so
        the result is bit-identical to the unsalted oracle."""
        return salted_agg_counts(
            load_table(spark, sf_dir, "events").select("event_type", "value"),
            "event_type",
            "value",
        )


_register_salted_query()
