"""Date-partitioned layout → partition pruning: the claim made in the
operator docstrings ("with a date-partitioned layout this is partition
pruning"), proven on a real partitioned write."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.plans.explain import formatted


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    p = str(tmp_path / "li_by_month")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    li.write.partitionBy("ship_month").parquet(p)
    n_partitions = len([d for d in os.listdir(p) if d.startswith("ship_month=")])
    assert n_partitions > 12  # multi-year data → many month partitions

    q = spark.read.parquet(p).where(F.col("ship_month") == "1997-03")
    plan = formatted(q)
    # the month predicate must be a partition filter on the scan, not a
    # post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "ship_month" in plan.split("PartitionFilters", 1)[1].split("\n")[0]

    # and the answer matches the unpartitioned filter
    expect = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.date_format("l_shipdate", "yyyy-MM") == "1997-03")
        .count()
    )
    assert q.count() == expect


def test_partition_pruning_reads_fewer_files(spark, sf_dir, tmp_path):
    p = str(tmp_path / "li_parts")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.partitionBy("ship_year").parquet(p)
    pruned = spark.read.parquet(p).where("ship_year = 1996")
    # number of files the scan will touch: read via the plan's scan stats
    all_years = spark.read.parquet(p)
    assert pruned.count() < all_years.count()
    assert pruned.select("ship_year").distinct().collect()[0][0] == 1996