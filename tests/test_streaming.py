"""Multi-batch streaming semantics: watermark late-data drop, stateful
dedup expiry, batch-replay equivalence, foreachBatch fan-out.

Files are staged into a tmp landing dir with increasing mtimes and
read with an explicit ``max_files=1``, so AvailableNow replays them as
ordered micro-batches — the scenario shape the single-snapshot DuckDB
oracle cannot express (SURVEY.md §5.3). (The SHIPPING default since
round 11 batches all available files per trigger; these tests pin
multi-batch state semantics, so they opt into the replay shape.)
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyspark.sql.functions as F

from master_airflow_spark.streaming.events import (
    dedup_within_watermark,
    fan_out_stream,
    read_events_stream,
    run_to_memory,
    tumbling_agg,
)


def _stage(tmp_path, batches: list[list[tuple]]) -> str:
    """Write each batch as one parquet file with strictly increasing
    mtime (file-source ordering key)."""
    d = str(tmp_path / "landing")
    os.makedirs(d, exist_ok=True)
    t0 = time.time() - 1000
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
        p = os.path.join(d, f"batch{i}.parquet")
        pdf.to_parquet(p)
        os.utime(p, (t0 + i * 10, t0 + i * 10))
    return d


def test_watermark_drops_late_rows(spark, tmp_path):
    d = _stage(
        tmp_path,
        [
            # batch 0: window [10:00,11:00) gets one event; max ts 11:59
            # → watermark after this batch: 11:49
            [
                (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
                (2, "2024-01-01 11:59:00", 1, "click", 1.0, "{}"),
            ],
            # batch 1: filler only — [10:00,11:00) (end 11:00 ≤ wm
            # 11:49) finalizes and is emitted with n=1; wm → 12:20
            [(3, "2024-01-01 12:30:00", 1, "click", 1.0, "{}")],
            # batch 2: event for the already-finalized window → too
            # late (end 11:00 ≤ wm 12:20), dropped by the watermark
            [(4, "2024-01-01 10:30:00", 1, "click", 100.0, "{}")],
        ],
    )
    out = run_to_memory(
        tumbling_agg(read_events_stream(spark, d, max_files=1)), "append"
    )
    rows = {(str(r.window_start), r.n_events, r.sum_value) for r in out.collect()}
    # [10:00,11:00) finalized WITHOUT the late 100.0 event; [11:00,12:00)
    # finalized in batch 2 (end 12:00 ≤ wm 12:20); [12:00,13:00) still open
    assert rows == {
        ("2024-01-01 10:00:00", 1, 1.0),
        ("2024-01-01 11:00:00", 1, 1.0),
    }


def test_dedup_within_watermark_expires_state(spark, tmp_path):
    d = _stage(
        tmp_path,
        [
            [
                (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
                (2, "2024-01-01 10:01:00", 9, "view", 1.0, "{}"),
            ],
            # duplicate within the 10-min horizon → dropped; filler
            # advances the watermark to 10:20
            [
                (3, "2024-01-01 10:02:00", 1, "click", 2.0, "{}"),
                (4, "2024-01-01 10:30:00", 9, "view", 1.0, "{}"),
            ],
            # filler batch: state for (1, click) (expiry 10:10 < wm
            # 10:20) is evicted at the end of this batch
            [(6, "2024-01-01 10:40:00", 9, "view", 1.0, "{}")],
            # key (1, click) reappears after expiry → re-emitted
            [(5, "2024-01-01 13:00:00", 1, "click", 3.0, "{}")],
        ],
    )
    out = run_to_memory(
        dedup_within_watermark(read_events_stream(spark, d, max_files=1)), "append"
    )
    clicks = sorted(
        r.event_id for r in out.where("user_id = 1 AND event_type = 'click'").collect()
    )
    assert clicks == [1, 5]  # 3 deduped; 5 survives after state expiry


def test_batch_replay_equivalence(spark, sf_dir):
    """Streaming result over static input == the same transformation
    applied as a plain batch query (unified API law)."""
    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.streaming.events import landing_dir_for

    stream_out = run_to_memory(
        tumbling_agg(
            read_events_stream(
                spark, landing_dir_for(os.path.join(sf_dir, "events.parquet"))
            )
        ),
        "complete",
    )
    batch_out = tumbling_agg(load_table(spark, sf_dir, "events"))
    a = sorted(map(str, stream_out.collect()))
    b = sorted(map(str, batch_out.collect()))
    assert a == b


def test_fan_out_stream_multi_sink(spark, sf_dir, tmp_path):
    from master_airflow_spark.streaming.events import landing_dir_for

    stream = read_events_stream(
        spark, landing_dir_for(os.path.join(sf_dir, "events.parquet"))
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    fan_out_stream(
        stream,
        [
            lambda df, bid: df.write.mode("append").parquet(p1),
            lambda df, bid: df.groupBy("event_type")
            .count()
            .write.mode("append")
            .parquet(p2),
        ],
    )
    n_src = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert spark.read.parquet(p1).count() == n_src
    assert {r.event_type for r in spark.read.parquet(p2).collect()} == {
        "click", "view", "signup", "purchase", "error",
    }

def test_interval_join_across_batches(spark, tmp_path):
    # click arrives in batch 0, its purchase in batch 1: the join's
    # click-side state must survive the trigger boundary and match
    # once the purchase lands; a purchase outside the 30-minute lag
    # window must not join
    from master_airflow_spark.streaming.events import attribution_join

    d = _stage(
        tmp_path,
        [
            [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")],
            [
                (2, "2024-01-01 10:20:00", 7, "purchase", 5.0, "{}"),
                # 40 min after the click → outside max_lag
                (3, "2024-01-01 10:40:00", 7, "purchase", 9.0, "{}"),
            ],
        ],
    )
    out = run_to_memory(
        attribution_join(read_events_stream(spark, d, max_files=1)), "append"
    ).collect()
    pairs = {(r.click_id, r.purchase_id) for r in out}
    assert pairs == {(1, 2)}
    (row,) = [r for r in out if r.purchase_id == 2]
    assert row.lag_us == 20 * 60 * 1_000_000

def test_stream_static_enrich_across_batches(spark, tmp_path):
    # the static dimension is joined inside EVERY micro-batch: events
    # for the same segment arriving in different batches must land in
    # the same (window, segment) group with an aggregated sum
    from master_airflow_spark.streaming.events import enriched_segment_agg

    d = _stage(
        tmp_path,
        [
            [(1, "2024-01-01 10:05:00", 1, "click", 2.0, "{}"),
             (2, "2024-01-01 10:10:00", 2, "view", 3.0, "{}")],
            [(3, "2024-01-01 10:20:00", 1, "click", 5.0, "{}"),
             # user 99 has no dimension row → inner join drops it
             (4, "2024-01-01 10:25:00", 99, "click", 7.0, "{}")],
        ],
    )
    dim = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")], ["c_custkey", "c_mktsegment"]
    )
    out = run_to_memory(
        enriched_segment_agg(read_events_stream(spark, d, max_files=1), dim),
        "complete",
    ).collect()
    got = {(r.c_mktsegment, r.n_events, r.sum_value) for r in out}
    assert got == {("BUILDING", 2, 7.0), ("MACHINERY", 1, 3.0)}
    assert all(r.window_start.minute == 0 for r in out)


def test_ewma_state_continuity_across_batches(spark, tmp_path):
    """applyInPandasWithState carries (ewma, n) across micro-batches:
    the final state after two batches equals the single ordered fold
    over all events, and the update stream shows the intermediate
    state after batch 0."""
    from master_airflow_spark.streaming.events import ewma_per_user

    d = _stage(
        tmp_path,
        [
            [
                (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
                (2, "2024-01-01 10:01:00", 7, "click", 2.0, "{}"),
            ],
            [
                (3, "2024-01-01 10:02:00", 7, "click", 3.0, "{}"),
                (4, "2024-01-01 10:00:00", 8, "click", 5.0, "{}"),
            ],
        ],
    )
    out = run_to_memory(
        ewma_per_user(read_events_stream(spark, d, max_files=1)), "update"
    )
    rows = {(r.user_id, r.n_events): r.ewma for r in out.collect()}
    # batch 0: user 7 folds 1.0 then 2.0 -> 0.5*2 + 0.5*1 = 1.5
    assert rows[(7, 2)] == 1.5
    # batch 1 continues FROM state 1.5: 0.5*3 + 0.5*1.5 = 2.25 — not a
    # refold of batch 1 alone (which would give 3.0)
    assert rows[(7, 3)] == 2.25
    assert rows[(8, 1)] == 5.0


def test_idempotent_batch_writer_replay_is_exactly_once(spark, sf_dir, tmp_path):
    """Simulate the at-least-once replay foreachBatch is subject to:
    delivering the same batch_id twice (even with different content,
    as a failed-then-replayed batch would) must leave exactly one
    committed copy; a NEW batch_id appends normally."""
    from master_airflow_spark.sinks.writers import idempotent_batch_writer

    target = str(tmp_path / "sink")
    write = idempotent_batch_writer(target)
    b0 = spark.range(10).withColumnRenamed("id", "v")
    write(b0, 0)
    write(b0, 0)  # replay: no-op
    write(spark.range(5).withColumnRenamed("id", "v"), 0)  # replay after "crash"
    write(spark.range(7).withColumnRenamed("id", "v"), 1)  # next batch
    out = spark.read.parquet(target)
    assert out.where("batch_id = 0").count() == 10, "replays must not re-write"
    assert out.where("batch_id = 1").count() == 7
    assert out.count() == 17


def test_unique_users_rollup_across_batches(spark, tmp_path):
    """The exact-distinct recast (per-(window,user) streaming state +
    batch rollup over the drained snapshot) must stay exact when the
    SAME user arrives in different micro-batches: the stateful
    aggregate merges across triggers, so the rollup still counts each
    (window, user) once."""
    from pyspark.sql import functions as F

    d = _stage(
        tmp_path,
        [
            # batch 0: users 1,2 in hour 10; user 1 twice
            [
                (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
                (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
                (3, "2024-01-01 10:15:00", 2, "click", 1.0, "{}"),
            ],
            # batch 1: user 1 AGAIN in hour 10 (state merge, not a new
            # distinct), user 3 new in hour 10, user 1 in hour 11
            [
                (4, "2024-01-01 10:20:00", 1, "view", 1.0, "{}"),
                (5, "2024-01-01 10:25:00", 3, "view", 1.0, "{}"),
                (6, "2024-01-01 11:05:00", 1, "view", 1.0, "{}"),
            ],
        ],
    )
    per_user = (
        read_events_stream(spark, d, max_files=1)
        .where(F.col("user_id").isNotNull())
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    drained = run_to_memory(per_user, "complete")
    got = {
        str(r.window_start): r.n_users
        for r in drained.groupBy(F.col("w.start").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .collect()
    }
    assert got == {"2024-01-01 10:00:00": 3, "2024-01-01 11:00:00": 1}


def test_dedup_within_watermark_full_value_oracle(spark, tmp_path):
    """Full-DATAFRAME value oracle for stream_dedup_watermark (r8
    verdict #5 — it was the only judged query with neither a DuckDB
    oracle nor an exact local expected set). On a bounded ordered
    replay the semantics are computable exactly: keyed FIRST arrival
    survives with its complete payload; a duplicate arriving within
    the horizon of the first is dropped; a key reappearing after its
    state expired re-emits. The fixture keeps ≤1 row per key per
    micro-batch and separates expiry from re-appearance with a filler
    batch, so the expected set is deterministic regardless of
    intra-batch partition order or whether eviction lands at the start
    or end of the batch that learns the advancing watermark."""
    d = _stage(
        tmp_path,
        [
            [
                (1, "2024-01-01 10:00:00", 1, "click", 1.5, '{"a":1}'),
                (2, "2024-01-01 10:00:30", 2, "view", 2.5, '{"b":2}'),
            ],
            # 3: duplicate key (u1, click) within the 10-min horizon —
            # dropped, and its DIFFERENT payload must not leak through;
            # 4 advances the watermark to 10:20
            [
                (3, "2024-01-01 10:05:00", 1, "click", 99.0, '{"x":9}'),
                (4, "2024-01-01 10:30:00", 3, "view", 3.5, '{"c":3}'),
            ],
            # filler: u1 (expiry 10:10) and u2 (expiry 10:10:30) are
            # both evicted under watermark 10:20 during/after this batch
            [(5, "2024-01-01 10:40:00", 9, "view", 4.5, '{"d":4}')],
            # both expired keys reappear → re-emitted with new payloads
            [
                (6, "2024-01-01 10:45:00", 1, "click", 5.5, '{"e":5}'),
                (7, "2024-01-01 10:46:00", 2, "view", 6.5, '{"f":6}'),
            ],
        ],
    )
    out = run_to_memory(
        dedup_within_watermark(read_events_stream(spark, d, max_files=1)), "append"
    )
    got = {
        (r.event_id, str(r.ts), r.user_id, r.event_type, r.value, r.props)
        for r in out.collect()
    }
    want = {
        (1, "2024-01-01 10:00:00", 1, "click", 1.5, '{"a":1}'),
        (2, "2024-01-01 10:00:30", 2, "view", 2.5, '{"b":2}'),
        (4, "2024-01-01 10:30:00", 3, "view", 3.5, '{"c":3}'),
        (5, "2024-01-01 10:40:00", 9, "view", 4.5, '{"d":4}'),
        (6, "2024-01-01 10:45:00", 1, "click", 5.5, '{"e":5}'),
        (7, "2024-01-01 10:46:00", 2, "view", 6.5, '{"f":6}'),
    }
    assert got == want


def test_max_files_per_trigger_knob_preserves_results(spark, tmp_path, monkeypatch):
    """File batching (SPARK_GRAFT_MAX_FILES_PER_TRIGGER / the round-11
    batch-all default) must only change batch BOUNDARIES, never
    answers: on a time-split landing (watermark-compatible arrival —
    the deterministic replay domain), draining the tumbling aggregate
    one-file-per-trigger, 1000-files-per-trigger, and under the
    shipping default (env unset → all available files in one trigger)
    must produce the identical row set, and all must equal the batch
    aggregate over the same data. Garbage / non-positive env values
    must fall back to the default, not fail the session (round-10
    ADVICE)."""
    from master_airflow_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.orderBy("ts").collect()
    third = max(1, len(rows) // 3)
    batches = [
        [tuple(r[c] for c in ("event_id", "ts", "user_id", "event_type", "value", "props"))
         for r in rows[i : i + third]]
        for i in range(0, len(rows), third)
    ]
    d = _stage(tmp_path, batches)

    def drain(knob: str | None):
        if knob is None:
            monkeypatch.delenv("SPARK_GRAFT_MAX_FILES_PER_TRIGGER", raising=False)
        else:
            monkeypatch.setenv("SPARK_GRAFT_MAX_FILES_PER_TRIGGER", knob)
        out = run_to_memory(tumbling_agg(read_events_stream(spark, d)), "complete")
        return {tuple(r) for r in out.collect()}

    one_per_file = drain("1")
    one_trigger = drain("1000")
    default_shape = drain(None)
    garbage = drain("not-a-number")  # falls back to the batched default
    zero = drain("0")  # non-positive → batched default too
    assert one_per_file == one_trigger and len(one_trigger) > 0
    assert default_shape == one_trigger
    assert garbage == one_trigger
    assert zero == one_trigger
    batch_ev = spark.read.parquet(d)
    # same ts normalization rule as read_events_stream: the staged
    # pandas parquet carries ns timestamps, surfaced as bigint under
    # the session's nanosAsLong default
    if dict(batch_ev.dtypes)["ts"] == "bigint":
        batch_ev = batch_ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        batch_ev = batch_ev.withColumn("ts", F.col("ts").cast("timestamp"))
    want = {tuple(r) for r in tumbling_agg(batch_ev).collect()}
    assert one_trigger == want


def test_landing_dir_reconciles_regenerated_source(spark, tmp_path):
    """landing_dir_for is content-addressed by source PATH; when the
    source table directory is REGENERATED (Spark overwrite writes new
    unique part names), the cached landing dir must drop links to
    deleted parts and must not replay superseded data alongside fresh
    data (round-10 ADVICE, medium)."""
    from master_airflow_spark.streaming.events import landing_dir_for

    src = tmp_path / "regen_table"
    gen1 = spark.range(3).withColumnRenamed("id", "v")
    gen1.coalesce(1).write.mode("overwrite").parquet(str(src))
    d = landing_dir_for(str(src))
    first_links = sorted(os.listdir(d))
    assert first_links, "landing dir should hold the gen-1 part link"

    # regenerate: different row count, new unique part file names
    gen2 = spark.range(10).withColumnRenamed("id", "v")
    gen2.coalesce(2).write.mode("overwrite").parquet(str(src))
    d2 = landing_dir_for(str(src))
    assert d2 == d  # same content address (same source path)
    links = sorted(os.listdir(d))
    # every link resolves, targets are exactly the current source parts
    targets = {os.readlink(os.path.join(d, n)) for n in links}
    want = {
        os.path.join(str(src), n)
        for n in os.listdir(src)
        if n.endswith(".parquet")
    }
    assert targets == want
    for n in links:
        assert os.path.exists(os.path.join(d, n)), f"dangling link {n}"
    # and the replayed data is exactly generation 2
    assert spark.read.parquet(d).count() == 10


def test_session_drain_rocksdb_provider_equal(spark, sf_dir):
    """The 100 TB session-drain deployment swaps the state store to
    RocksDB when live-session state outgrows executor heap (the local
    x50 A/B in SCALE.md round 12 shows it is NOT a throughput win when
    state fits in memory — 1.9x slower — but it is the survival config
    when state does not). This pins that the swap is semantics-free:
    the certified session query returns identical rows under either
    provider."""
    from master_airflow_spark import registry

    registry._ensure_loaded()
    # the STATE-STORE form — the registered stream_session_window is
    # the partial-spool drain since r13 and touches no state store
    fn = registry.REGISTRY["stream_session_window_state"].fn

    def rows():
        out = sorted(map(tuple, fn(spark, sf_dir).collect()))
        registry.release_caches()
        return out

    base = rows()
    assert base, "session drain returned no rows"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = rows()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert rocks == base
