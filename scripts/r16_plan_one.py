"""Dump .explain("formatted") for just the named queries:
python scripts/r16_plan_one.py <suffix> <query> [query ...]
Writes plans/r16/<query>_<suffix>.txt (same format as r16_plans.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from master_airflow_spark import registry
    from master_airflow_spark.plans.explain import formatted
    from master_airflow_spark.session import get_spark

    spark = get_spark(app_name="mas-r16-plan-one")
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry.REGISTRY[name].fn(spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted(df))
        registry.release_caches()
        print(f"wrote {name}_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
