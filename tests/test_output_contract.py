"""Driver-contract guards.

The round-1 driver crashed on queries whose output contained array
cells (pandas sort_values -> Categorical cannot hash lists), and
hash-mismatched a DECIMAL column against the oracle's DOUBLE. These
tests pin the contract structurally so the failure mode cannot
regress: every registered query's OUTPUT schema must consist of
scalar, hash-stable types on both engines. Arrays/maps/structs are
fine internally — they just have to be serialized or exploded at the
output boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DecimalType,
    MapType,
    StructType,
)

from master_airflow_spark import registry

registry._ensure_loaded()

FORBIDDEN = (ArrayType, MapType, StructType, BinaryType, DecimalType)


def test_all_output_schemas_driver_hashable(spark, sf_dir):
    bad = []
    for name, spec in registry.REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, FORBIDDEN):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
        registry.release_caches()
    assert not bad, (
        "driver-unhashable output columns (serialize with concat_ws/"
        "to_json, explode per element, or cast decimal->double): "
        + "; ".join(bad)
    )


def test_priority_list_is_valid():
    assert len(registry.PRIORITY) == 50
    assert len(set(registry.PRIORITY)) == 50
    missing = [n for n in registry.PRIORITY if n not in registry.REGISTRY]
    assert not missing, f"PRIORITY names not registered: {missing}"
    # priority entries must lead the exposed dicts in order
    assert list(registry.queries())[: len(registry.PRIORITY)] == list(
        registry.PRIORITY
    )


def test_oracles_subset_of_queries():
    q, o = registry.queries(), registry.oracles()
    assert set(o) <= set(q)
    # every oracle is non-trivial SQL mentioning a SELECT
    assert all("SELECT" in sql.upper() for sql in o.values())


def test_entry_queries_release_previous_resources(spark, sf_dir):
    """__spark_entry__.queries() wraps each fn so invoking the NEXT
    query releases the previous one's tracked caches and broadcasts —
    the driver's 50-query loop must not accumulate executor memory."""
    import __spark_entry__ as e

    qs = e.queries()
    # simhash_near_dup persists its banded frame via track_cache
    qs["simhash_near_dup"](spark, sf_dir).count()
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0, "expected a tracked cache in flight"
    # invoking any next query releases it before building the new plan
    qs["dedup_exact"](spark, sf_dir).count()
    assert jsc.getPersistentRDDs().size() == 0, "previous query's cache leaked"
