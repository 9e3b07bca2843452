"""Round-16 revenue_by_nation A/B: current left-deep chain (which at
bench SF makes LINEITEM the broadcast build side — a 600k-row hash
relation per execution) vs a fact-probe shape: lineitem probes the
(orders x region-pruned customer keys) build, aggregates on the
c_nationkey int, and the nation names attach to the 10-row aggregate
after the exchange (with a final name re-agg for exactness under
duplicate names).

Run: python scripts/r16_rbn_ab.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_b(spark, sf_dir):
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.functions.exact import cents, lsum_money, lsum_scaled

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias("rev"),
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey"
        )
    )
    c2 = customer.join(dims, customer.c_nationkey == dims.n_nationkey).select(
        "c_custkey", "c_nationkey"
    )
    o2 = orders.join(c2, orders.o_custkey == c2.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    keyed = (
        lineitem.join(o2, lineitem.l_orderkey == o2.o_orderkey)
        .groupBy("c_nationkey")
        .agg(lsum_scaled(F.col("rev"), "rev_l"), F.count(F.lit(1)).alias("n_l"))
    )
    names = F.broadcast(nation.select("n_nationkey", "n_name"))
    return (
        keyed.join(names, names.n_nationkey == keyed.c_nationkey)
        .groupBy("n_name")
        .agg(
            lsum_money(F.col("rev_l"), 2, "revenue"),
            F.sum("n_l").alias("n_items"),
        )
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from master_airflow_spark import registry
    from master_airflow_spark.catalog import TABLES, load_table
    from master_airflow_spark.session import get_spark

    spark = get_spark(app_name="mas-r16-rbnab")
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    a = registry.REGISTRY["revenue_by_nation"].fn(spark, sf_dir)
    b = build_b(spark, sf_dir)

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
