"""Simulate the external driver's certification pass: a VANILLA
SparkSession (none of session.py's configs), the first 50 exposed
queries (registry.PRIORITY order), each run at sf0.01 and diffed
against its DuckDB oracle with the driver's canonicalization.

Run: python scripts/driver_sim.py [N]   (default 50; 0 = all)
Exit 0 iff every sampled query is green.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    assert entry_mod.entry(spark).count() >= 0, "entry() smoke failed"

    from master_airflow_spark import registry
    from master_airflow_spark.testing import run_one

    names = list(entry_mod.queries())
    if n_slots:
        names = names[:n_slots]
    failures = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            res = run_one(spark, "/root/testdata/sf0.01", name)
            ok, detail = res.ok, "; ".join(res.mismatches[:2])
        except Exception as ex:  # noqa: BLE001
            ok, detail = False, f"EXC {type(ex).__name__}: {ex}"[:200]
        dt = time.perf_counter() - t0
        status = "ok " if ok else "FAIL"
        print(f"[{i + 1:3d}/{len(names)}] {status} {name} ({dt:.1f}s) {detail}",
              flush=True)
        if not ok:
            failures.append(name)
        registry.release_caches()
    print(f"\n{len(names) - len(failures)}/{len(names)} green"
          + (f"; FAILURES: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
