"""Round-16 plan capture: dump .explain("formatted") for every
headline query (plus any extra names passed on argv) into
plans/r16/<query>_<suffix>.txt, and print a one-line plan-shape
summary (Exchange count, join kinds, Python-eval nodes) per query.

Run: python scripts/r16_plans.py before [extra_query ...]
     python scripts/r16_plans.py after  [extra_query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    extra = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from master_airflow_spark import registry
    from master_airflow_spark.plans.explain import formatted
    from master_airflow_spark.session import get_spark

    import bench

    spark = get_spark(app_name="mas-r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    names = [n for n in bench.HEADLINE if n in registry.REGISTRY]
    for n in extra:
        if n not in names:
            names.append(n)

    for name in names:
        try:
            df = registry.REGISTRY[name].fn(spark, sf_dir)
            plan = formatted(df)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: PLAN FAILED {type(ex).__name__}: {ex}", flush=True)
            registry.release_caches()
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        tree = plan.split("\n\n")[0]
        n_ex = len(re.findall(r"\bExchange \(", tree))
        n_bex = len(re.findall(r"\bBroadcastExchange \(", tree))
        joins = sorted(
            {
                k
                for k in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
                if k in plan
            }
        )
        py = sorted(
            {
                k
                for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas")
                if k in plan
            }
        )
        scans = plan.count("Scan parquet") // 2 or plan.count("Scan parquet")
        print(
            f"{name}: exchanges={n_ex} bcast={n_bex} scans~{scans}"
            f" joins={joins or '[]'} python={py or '[]'}",
            flush=True,
        )
        registry.release_caches()
    print(f"plans written to {out_dir} (*_{suffix}.txt)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
