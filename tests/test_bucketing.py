"""Bucketed co-located join: correctness + the Exchange-free plan."""

from __future__ import annotations

import pytest

from master_airflow_spark.catalog import load_table
from master_airflow_spark.plans.explain import formatted
from master_airflow_spark.sinks.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8, "o_orderkey"
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "b_lineitem",
        "l_orderkey",
        8,
        "l_orderkey",
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed_join(spark, left, right, "o_orderkey", "l_orderkey")
    plan = formatted(j)
    assert "Exchange" not in plan, (
        "bucketed-by-join-key tables must join without a shuffle:\n" + plan
    )


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed_join(spark, left, right, "o_orderkey", "l_orderkey")
    n_bucketed = j.count()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_plain = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert n_bucketed == n_plain
