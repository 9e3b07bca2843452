"""Workflow-layer tests: DAG ordering, logical-date parameterization,
backfill idempotency — the reference's Airflow semantics (O1-O5)."""

from __future__ import annotations

import pytest

from master_airflow_spark.operators.ingest import SAMPLE_PAGES
from master_airflow_spark.pipeline import Pipeline, RunContext, gas_prices_pipeline


def test_topological_ordering(spark):
    p = Pipeline("t")
    order = []
    p.stage("c", depends_on=("b",))(lambda ctx: order.append("c"))
    p.stage("a")(lambda ctx: order.append("a"))
    p.stage("b", depends_on=("a",))(lambda ctx: order.append("b"))
    p.run(spark, "2026-08-13")
    assert order == ["a", "b", "c"]


def test_cycle_detection(spark):
    p = Pipeline("cyc")
    p.stage("x", depends_on=("y",))(lambda ctx: None)
    p.stage("y", depends_on=("x",))(lambda ctx: None)
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark, "2026-08-13")


def test_unknown_dependency(spark):
    p = Pipeline("bad")
    p.stage("x", depends_on=("ghost",))(lambda ctx: None)
    with pytest.raises(ValueError, match="unknown"):
        p.run(spark, "2026-08-13")


def test_outputs_flow_between_stages(spark):
    p = Pipeline("flow")
    p.stage("one")(lambda ctx: 41)
    p.stage("two", depends_on=("one",))(lambda ctx: ctx["one"] + 1)
    ctx = p.run(spark, "2026-08-13")
    assert ctx["two"] == 42


def _pages(ctx: RunContext):
    return ctx.spark.createDataFrame(SAMPLE_PAGES, "page_id long, html string")


def test_gas_prices_pipeline_end_to_end(spark, tmp_path):
    p = gas_prices_pipeline(_pages)
    sink = str(tmp_path / "sinks")
    ctx = p.run(spark, "2026-08-10", {"sink_dir": sink})
    assert ctx["extract"].count() == 4
    assert spark.read.parquet(f"{sink}/append").count() == 4
    assert spark.read.parquet(f"{sink}/upsert").count() == 4


def test_backfill_appends_but_upsert_stays_keyed(spark, tmp_path):
    """Re-running dates: the append sink duplicates (reference
    Mongo/Postgres behavior); the keyed-upsert sink stays one row per
    (date, station) (reference MinIO behavior) — SURVEY.md §1.4."""
    p = gas_prices_pipeline(_pages)
    sink = str(tmp_path / "sinks")
    p.backfill(spark, ["2026-08-10", "2026-08-11", "2026-08-10"], {"sink_dir": sink})
    appended = spark.read.parquet(f"{sink}/append")
    upserted = spark.read.parquet(f"{sink}/upsert")
    assert appended.count() == 12  # 3 runs × 4 rows, duplicates kept
    assert upserted.count() == 8  # 2 distinct dates × 4 stations
    assert upserted.select("date", "station").distinct().count() == 8
