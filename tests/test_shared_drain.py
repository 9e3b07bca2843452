"""Shared-scan multi-view drain (streaming/shared_drain.py): the
bench's production-shaped drain must be value-identical to the
independently-certified per-query streaming drains AND to the batch
aggregates — including when the landing dir holds several files, so
partials from multiple micro-batches flow through the merge step
(tumbling per-key sums; session gaps-and-islands interval merge)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from master_airflow_spark.streaming.shared_drain import drain_events_multi

VIEW_NAMES = ("stream_tumbling_agg", "stream_session_window")


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def test_shared_drain_equals_per_query_drains(spark, sf_dir):
    """Single-file landing dir (one micro-batch): both views equal the
    certified per-query streaming results row-for-row, bit-for-bit."""
    from master_airflow_spark import registry

    registry._ensure_loaded()
    timings: dict = {}
    shared = drain_events_multi(spark, sf_dir, VIEW_NAMES, timings=timings)
    got = {v: _rows(shared[v]) for v in VIEW_NAMES}
    registry.release_caches()

    for v in VIEW_NAMES:
        want = _rows(registry.REGISTRY[v].fn(spark, sf_dir))
        registry.release_caches()
        assert got[v] == want, f"{v}: shared drain diverges from per-query drain"

    # Accounting surface: per-view handler seconds, pass wall, and the
    # listener-measured trigger total must all be present and sane.
    assert set(timings["views"]) == set(VIEW_NAMES)
    assert timings["pass_wall"] > 0
    assert 0 < timings["trigger"] <= timings["pass_wall"] + 0.5


def test_shared_drain_multibatch_merge(spark, sf_dir, tmp_path):
    """Multi-file landing dir → one micro-batch per file
    (maxFilesPerTrigger=1): cross-batch partials must merge to exactly
    the batch aggregate. Files are split by EVENT hash (not by time or
    user), so one user's events — and therefore single sessions — span
    several micro-batches and the interval merge has real work to do."""
    from master_airflow_spark import registry
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.streaming.events import session_agg, tumbling_agg

    ev = load_table(spark, sf_dir, "events")
    src = tmp_path / "events_split"
    (
        ev.withColumn("part", F.pmod(F.col("event_id"), F.lit(3)))
        .repartition(3, "part")
        .drop("part")
        .write.mode("overwrite")
        .parquet(str(src))
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    n_files = 0
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            os.link(str(src / name), str(landing / name))
            n_files += 1
    assert n_files >= 2, "split produced a single file; test needs several"

    shared = drain_events_multi(
        spark, sf_dir, VIEW_NAMES, events_dir=str(landing)
    )
    got = {v: _rows(shared[v]) for v in VIEW_NAMES}
    registry.release_caches()

    assert got["stream_tumbling_agg"] == _rows(tumbling_agg(ev))
    assert got["stream_session_window"] == _rows(session_agg(ev))


def test_session_interval_merge_nested_and_adjacent(spark):
    """Targeted laws of the gaps-and-islands merge the multi-batch path
    relies on: (a) an interval nested inside an earlier one merges via
    the running-max (lag alone would split); (b) a session starting
    exactly `gap` after the previous last event does NOT merge (strict
    < gap rule, matching session_window and the DuckDB oracle);
    (c) one starting gap−1s after DOES merge."""
    from master_airflow_spark.streaming.shared_drain import _merge_sessions

    rows = [
        # user 1: [10:00, 10:20] then nested [10:05, 10:10] then
        # exactly-at-gap 10:25 (= 10:20 + 5min ⇒ NEW) — 2 sessions.
        (1, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 5, 500),
        (1, "2024-01-01 10:05:00", "2024-01-01 10:10:00", 2, 200),
        (1, "2024-01-01 10:25:00", "2024-01-01 10:25:00", 1, 100),
        # user 2: [10:00, 10:10] then 10:14:59 (< gap past last) —
        # one merged session ending 10:14:59 + 5min.
        (2, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 3, 300),
        (2, "2024-01-01 10:14:59", "2024-01-01 10:14:59", 1, 100),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, start_ts string, last_ts string,"
        " n_events long, sum_scaled long",
    ).select(
        "user_id",
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("last_ts").cast("timestamp").alias("last_ts"),
        "n_events",
        "sum_scaled",
    )
    out = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): (
            r["n_events"],
            r["sum_value"],
        )
        for r in _merge_sessions(df).collect()
    }
    assert out == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:25:00"): (7, 0.07),
        (1, "2024-01-01 10:25:00", "2024-01-01 10:30:00"): (1, 0.01),
        (2, "2024-01-01 10:00:00", "2024-01-01 10:19:59"): (4, 0.04),
    }


def test_shared_drain_zero_batches_returns_empty_views(spark, tmp_path):
    """An empty landing dir fires no trigger: the drain must return
    empty frames with the exact output schemas, not crash on a
    missing spool."""
    landing = tmp_path / "empty_landing"
    landing.mkdir()
    # The streaming source needs a schema; read_events_stream probes a
    # batch read first, which cannot infer from an empty dir — stage a
    # schema-only parquet marker the way a real landing zone's ingest
    # would (zero-row file written once at provisioning).
    from master_airflow_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.limit(0).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "marker"))
    import os, shutil

    for f in os.listdir(tmp_path / "marker"):
        if f.endswith(".parquet"):
            shutil.copy(str(tmp_path / "marker" / f), str(landing / f))
            break

    shared = drain_events_multi(
        spark, "/root/testdata/sf0.001", VIEW_NAMES, events_dir=str(landing)
    )
    for v in VIEW_NAMES:
        assert shared[v].count() == 0
        assert len(shared[v].columns) == 5
