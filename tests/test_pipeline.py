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


def test_daily_schedule_catchup_and_idempotence(spark):
    from master_airflow_spark.pipeline import DailySchedule

    p = Pipeline("sched")
    runs: list[str] = []

    @p.stage("record")
    def record(ctx: RunContext) -> str:
        runs.append(ctx.run_date)
        return ctx.run_date

    sched = DailySchedule(p, start_date="2024-01-01")
    # airflow execution-date rule: the run FOR day D fires after D ends
    assert sched.due("2024-01-01T06:00:00") == []
    assert sched.due("2024-01-02T00:30:00") == ["2024-01-01"]
    # late start → catchup over every missed date, oldest first
    assert sched.due("2024-01-04") == ["2024-01-01", "2024-01-02", "2024-01-03"]

    ctxs = sched.run_pending(spark, "2024-01-04")
    assert [c.run_date for c in ctxs] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    # same tick again: no duplicate runs
    assert sched.run_pending(spark, "2024-01-04") == []
    # next day triggers exactly one more
    assert [c.run_date for c in sched.run_pending(spark, "2024-01-05")] == ["2024-01-04"]
    assert runs == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


def test_run_forever_fake_clock(spark):
    """The timer loop under a fully fake clock: advances a day per
    tick, sleeps between ticks, runs exactly the due dates, and stops
    cleanly when `until` fires."""
    from master_airflow_spark.pipeline import DailySchedule

    p = Pipeline("sched-loop")
    runs: list[str] = []

    @p.stage("record")
    def record(ctx: RunContext) -> str:
        runs.append(ctx.run_date)
        return ctx.run_date

    ticks = iter(["2024-01-02", "2024-01-02", "2024-01-04"])
    seen: list[str] = []

    def clock() -> str:
        t = next(ticks)
        seen.append(t)
        return t

    slept: list[float] = []
    sched = DailySchedule(p, start_date="2024-01-01")
    ctxs = sched.run_forever(
        spark,
        clock=clock,
        sleep=slept.append,
        poll_seconds=60.0,
        until=lambda: len(seen) >= 3,
    )
    # tick 1 runs 01-01; tick 2 is a no-op (idempotent); tick 3 catches
    # up 01-02 and 01-03; the loop slept after each of the 3 ticks
    assert runs == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert [c.run_date for c in ctxs] == runs
    assert slept == [60.0, 60.0, 60.0]


def test_stage_retries_with_injected_sleep(spark):
    """default_args-retries parity: a flaky stage succeeds on attempt
    N <= retries+1; the injected sleep records the backoff; a stage
    that keeps failing re-raises after exhausting retries."""
    p = Pipeline("retry-demo")
    calls = {"n": 0}

    @p.stage("flaky", retries=2, retry_delay_s=1.5)
    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    slept: list[float] = []
    ctx = p.run(spark, "2024-01-01", sleep=slept.append)
    assert ctx["flaky"] == "ok"
    assert calls["n"] == 3
    assert slept == [1.5, 1.5]
    assert ctx.outputs["__attempts__"]["flaky"] == 3

    p2 = Pipeline("retry-exhausted")

    @p2.stage("doomed", retries=1)
    def doomed(ctx):
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        p2.run(spark, "2024-01-01", sleep=lambda s: None)


def test_zero_retries_is_default_parity(spark):
    """Reference DAGs set retries=0 — one attempt, failure propagates
    immediately."""
    p = Pipeline("no-retry")
    calls = {"n": 0}

    @p.stage("once")
    def once(ctx):
        calls["n"] += 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        p.run(spark, "2024-01-01")
    assert calls["n"] == 1
