"""Round-4 guards: HLL estimates pinned against an independent engine,
and the local-vs-driver canonicalization parity pins (the property that
made round-1's local-green/driver-red gap invisible must stay tested).
"""

from __future__ import annotations

import datetime
import decimal

import numpy as np
import pytest

from master_airflow_spark import testing


def test_hll_estimate_cross_engine(spark, sf_dir):
    """The HLL sketch query is rows-only at the driver (DataSketches
    isn't SQL-expressible in DuckDB), so pin the ESTIMATE here against
    DuckDB's independent approx_count_distinct (also HLL): both engines
    must land within the error bound of the exact distinct count on the
    same data — certifying the value, not just the row shape."""
    from master_airflow_spark.operators.relational import hll_sketch_users

    est = {r.event_type: r.est_users for r in hll_sketch_users(spark, sf_dir).collect()}
    con = testing.duckdb_connection(sf_dir)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT event_type, approx_count_distinct(user_id) AS a,"
            " count(DISTINCT user_id) AS x FROM events GROUP BY event_type"
        ).fetchall()
    }
    duck["__all__"] = con.execute(
        "SELECT approx_count_distinct(user_id), count(DISTINCT user_id) FROM events"
    ).fetchone()
    con.close()
    assert set(est) == set(duck)
    for et, (duck_est, exact) in duck.items():
        tol = max(0.05 * exact, 3)  # HLL k=2^12 rse ~1.6%; 5% is 3σ headroom
        assert abs(est[et] - exact) <= tol, f"{et}: spark {est[et]} vs exact {exact}"
        assert abs(duck_est - exact) <= tol, f"{et}: duckdb {duck_est} vs exact {exact}"


class TestCanonDriverParity:
    """Pin testing._canon/_cell to the driver's canonicalization
    semantics. These are the exact behaviors that decide whether local
    green predicts driver green; a drift here reopens the round-1 gap."""

    def test_list_cell_is_a_hard_failure(self):
        # driver's pandas sort_values -> Categorical factorize crashes
        # on list cells; locally that must be an error, never a pass
        with pytest.raises(TypeError):
            testing._canon([1, 2])
        with pytest.raises(TypeError):
            testing._cell(np.array([1.0, 2.0]))

    def test_decimal_never_coerces_to_float(self):
        # a Spark DECIMAL output vs a DOUBLE oracle is a driver hash
        # mismatch; locally the canon forms must stay distinct
        assert testing._canon(decimal.Decimal("1.5")) != testing._canon(1.5)

    def test_date_matches_midnight_datetime(self):
        d = datetime.date(2024, 3, 1)
        ts = datetime.datetime(2024, 3, 1, 0, 0, 0)
        assert testing._canon(d) == testing._canon(ts)

    def test_nan_and_numpy_scalars(self):
        assert testing._canon(float("nan")) == "NaN"
        assert testing._canon(np.float64(1.5)) == testing._canon(1.5)
        assert testing._canon(np.int64(7)) == 7

    def test_compare_is_order_insensitive_both_axes(self, spark):
        sdf = spark.createDataFrame([(2, "b"), (1, "a")], "k int, v string")
        con = testing.duckdb.connect()
        res = testing.compare(
            "t", sdf, con, "SELECT * FROM (VALUES ('a', 1), ('b', 2)) AS t(v, k)"
        )
        con.close()
        assert res.ok, res.mismatches

    def test_compare_flags_value_drift(self, spark):
        sdf = spark.createDataFrame([(1, "a")], "k int, v string")
        con = testing.duckdb.connect()
        res = testing.compare("t", sdf, con, "SELECT 1 AS k, 'X' AS v")
        con.close()
        assert not res.ok
