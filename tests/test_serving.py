"""Serving-layer parity: the reference's response shape, engine-backed."""

from __future__ import annotations

from master_airflow_spark.serve import get_prices_alltime, get_prices_today


def test_alltime_response_shape(spark, sf_dir):
    out = get_prices_alltime(spark, sf_dir)
    assert set(out) == {"highest_price", "lowest_price"}
    hi, lo = out["highest_price"], out["lowest_price"]
    assert hi["price"] >= lo["price"]
    assert set(hi) == {"price", "l_orderkey", "l_linenumber"}


def test_today_subset_of_alltime_range(spark, sf_dir):
    today = get_prices_today(spark, sf_dir)
    alltime = get_prices_alltime(spark, sf_dir)
    assert today["highest_price"]["price"] <= alltime["highest_price"]["price"]
    assert today["lowest_price"]["price"] >= alltime["lowest_price"]["price"]