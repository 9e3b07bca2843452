"""Bucketed table layout — the co-located join strategy (SURVEY.md
§2.7 / engine perf posture).

At 100 TB the dominant cost of a fact-fact join is the shuffle. Two
tables bucketed by the join key into the same bucket count are
*co-partitioned on disk*: Catalyst proves the partitioning requirement
is already satisfied and plans the join with NO Exchange on either
side — each task reads bucket i of both tables. The one-time bucketed
write pays the shuffle once; every subsequent join of any two tables
in the bucket family is shuffle-free. tests/test_bucketing.py asserts
the Exchange-free plan.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize df as a bucketed (and optionally sort-merged-ready
    sorted) catalog table. Overwrites — including a stale warehouse
    location left by a previous session (the in-memory catalog forgets
    tables across sessions but their files survive)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys —
    shuffle-free when both sides were written with write_bucketed.

    The merge hint pins the sort-merge strategy: at test SF the tables
    are small enough that Catalyst would broadcast one side (adding a
    BroadcastExchange), which hides exactly the property bucketing
    exists to prove — at fact-table scale SMJ is what Catalyst picks
    unaided, and the bucketed layout removes both shuffles."""
    ldf = spark.table(left).hint("merge")
    rdf = spark.table(right)
    return ldf.join(rdf, ldf[left_key] == rdf[right_key])
