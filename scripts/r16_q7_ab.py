"""Round-16 q7 A/B: current plan (5 broadcast probes per fact row,
partial agg keyed on two nation-name strings) vs an integer-keyed
pre-aggregation (3 probes per fact row, partial agg keyed on
(c_nationkey, s_nationkey, ship_year) ints, nation names attached to
the ~25x25x7-row aggregate AFTER the exchange, then a tiny re-agg on
names so duplicate-name nations would still merge exactly like the
original plan).

Run: python scripts/r16_q7_ab.py [reps] [sf_dir]
Prints per-pair times, min/median, and an exact-equality check.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_b(spark, sf_dir):
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.functions.exact import lsum_money, lsum_scaled
    from master_airflow_spark.operators.tpch_like import _rev_c

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("ship_year"),
        _rev_c().alias("rev"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    keyed = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy("c_nationkey", "s_nationkey", "ship_year")
        .agg(lsum_scaled(F.col("rev"), "rev_l"))
    )
    cn = F.broadcast(
        n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    )
    sn = F.broadcast(
        n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    )
    return (
        keyed.join(cn, F.col("cnk") == F.col("c_nationkey"))
        .join(sn, F.col("snk") == F.col("s_nationkey"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", "ship_year")
        .agg(lsum_money(F.col("rev_l"), 2, "volume"))
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from master_airflow_spark import registry
    from master_airflow_spark.catalog import TABLES, load_table
    from master_airflow_spark.session import get_spark

    spark = get_spark(app_name="mas-r16-q7ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    a = registry.REGISTRY["q7_volume_shipping"].fn(spark, sf_dir)
    b = build_b(spark, sf_dir)

    key = ["cust_nation", "supp_nation", "ship_year"]
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    print(f"equality: rows {len(ra)} vs {len(rb)}, identical={ra == rb}")
    if ra != rb:
        for x, y in zip(ra, rb):
            if x != y:
                print(" first diff:", x, y)
                break
        return 1

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    materialize(a)
    materialize(b)

    ta, tb = [], []
    for i in range(reps):
        t0 = time.perf_counter(); materialize(a); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); materialize(b); tb.append(time.perf_counter() - t0)
        print(f"pair {i}: A={ta[-1]:.3f} B={tb[-1]:.3f} winner={'B' if tb[-1] < ta[-1] else 'A'}")
    import statistics as st
    print(
        f"A min={min(ta):.3f} med={st.median(ta):.3f} | "
        f"B min={min(tb):.3f} med={st.median(tb):.3f} | "
        f"B wins {sum(1 for x, y in zip(ta, tb) if y < x)}/{reps}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
