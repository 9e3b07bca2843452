"""Salting preserves semantics: salted aggregate / join == unsalted."""

from __future__ import annotations

import pyspark.sql.functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.operators.skew import salted_agg_counts, salted_join


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg_counts(li, "l_returnflag", "l_extendedprice", n_salts=8)
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("total"),
        )
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    salted = salted_join(li, p, "l_partkey", "p_partkey", n_salts=4)
    plain = li.join(p, li.l_partkey == p.p_partkey)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.select("l_orderkey", "l_partkey", "p_brand").collect()))
    b = sorted(map(tuple, plain.select("l_orderkey", "l_partkey", "p_brand").collect()))
    assert a == b


def test_salt_spreads_hot_key(spark):
    """A single hot key must occupy n_salts distinct salt values."""
    from master_airflow_spark.operators.skew import with_salt

    hot = spark.range(0, 10_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    n = (
        with_salt(hot, "k", 16)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 16