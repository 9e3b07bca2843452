"""Workflow layer — the reference's Airflow surface (SURVEY.md §2.6),
Spark-native.

The reference orchestrates with Airflow: PythonOperator tasks (O1),
PostgresOperator DDL tasks (O2), `>>` dependency edges (O3), an
@daily schedule with a logical date (O4), four duplicated DAGs
fanning the same extract to four sinks (O5), and Celery for task
distribution (O6). The Spark-native mapping collapses most of it:

- a *stage* is a named function over a context (O1/O2);
- dependencies are data dependencies — a stage reads the outputs of
  the stages it names (O3); explicit edges exist only for
  side-effecting stages;
- a run is parameterized by a logical ``run_date`` (O4) — never
  ``current_date()``, so backfills and reruns are deterministic
  (the reference stamps wall-clock dates, making reruns lossy);
- fan-out is one cached DataFrame feeding N writers (O5) instead of
  four DAGs re-scraping the same page;
- task distribution is Spark's own scheduler (O6) — the pipeline
  driver only sequences stages, it never moves data (the reference
  ships every batch through the metadata DB via XCom).

Per-stage retries mirror the reference's ``default_args`` knob (all
reference DAGs set ``'retries': 0``, the parity default here); because
stages are idempotent by construction (parameterized dates + keyed
upserts), a retry is always safe — the delay routes through an
injectable ``sleep`` so tests never block on real time.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RunContext:
    """What a stage sees: the session, the logical date, and every
    upstream stage's output (the XCom replacement — in-process object
    handoff; DataFrames stay lazy, so handing one to a downstream
    stage composes plans instead of materializing batches)."""

    spark: SparkSession
    run_date: str
    params: dict[str, Any] = field(default_factory=dict)
    outputs: dict[str, Any] = field(default_factory=dict)

    def __getitem__(self, stage_name: str) -> Any:
        return self.outputs[stage_name]


@dataclass(frozen=True)
class Stage:
    """``retries``/``retry_delay_s`` mirror the reference DAGs'
    ``default_args`` (every reference DAG sets ``'retries': 0`` —
    dags/get_prices_load_postgres.py:70 — so 0 is the parity default;
    the knob exists because a real deployment turns it on for flaky
    sources like the HTTP scrape). A stage that raises is re-run up to
    ``retries`` extra times; the delay goes through the pipeline's
    injectable ``sleep`` so tests drive it with a fake clock."""

    name: str
    fn: Callable[[RunContext], Any]
    depends_on: tuple[str, ...] = ()
    doc: str = ""
    retries: int = 0
    retry_delay_s: float = 0.0


class Pipeline:
    """A named DAG of stages. ``>>`` ordering comes from depends_on
    edges; stages with no path between them run in declaration order
    (single-driver sequencing — parallelism lives inside Spark jobs,
    not across driver stages)."""

    def __init__(self, name: str):
        self.name = name
        self._stages: list[Stage] = []

    def stage(
        self,
        name: str,
        depends_on: tuple[str, ...] = (),
        retries: int = 0,
        retry_delay_s: float = 0.0,
    ) -> Callable[[Callable[[RunContext], Any]], Callable[[RunContext], Any]]:
        def deco(fn: Callable[[RunContext], Any]) -> Callable[[RunContext], Any]:
            self.add(
                Stage(
                    name,
                    fn,
                    depends_on,
                    (fn.__doc__ or "").strip(),
                    retries=retries,
                    retry_delay_s=retry_delay_s,
                )
            )
            return fn

        return deco

    def add(self, stage: Stage) -> None:
        if any(s.name == stage.name for s in self._stages):
            raise ValueError(f"duplicate stage {stage.name!r} in {self.name!r}")
        self._stages.append(stage)

    def _topo_order(self) -> list[Stage]:
        by_name = {s.name: s for s in self._stages}
        for s in self._stages:
            for d in s.depends_on:
                if d not in by_name:
                    raise ValueError(f"stage {s.name!r} depends on unknown {d!r}")
        done: list[Stage] = []
        done_names: set[str] = set()
        pending = list(self._stages)
        while pending:
            progressed = False
            for s in list(pending):
                if set(s.depends_on) <= done_names:
                    done.append(s)
                    done_names.add(s.name)
                    pending.remove(s)
                    progressed = True
            if not progressed:
                cyc = [s.name for s in pending]
                raise ValueError(f"dependency cycle among {cyc}")
        return done

    def run(
        self,
        spark: SparkSession,
        run_date: str,
        params: dict[str, Any] | None = None,
        sleep: Callable[[float], None] | None = None,
    ) -> RunContext:
        """Execute one logical-date run; returns the context with every
        stage's output (a backfill is a loop over run_dates). A stage
        with ``retries > 0`` is re-attempted on exception, sleeping
        ``retry_delay_s`` between attempts via the injectable ``sleep``
        (defaults to ``time.sleep``; tests pass a recorder). The
        attempt count lands in ``__attempts__`` next to
        ``__timings__``; a stage's timing covers only its SUCCESSFUL
        attempt (failed attempts and retry backoff sleeps are
        excluded), so it measures stage compute, not waiting."""
        do_sleep = sleep if sleep is not None else time.sleep
        ctx = RunContext(spark=spark, run_date=run_date, params=params or {})
        for s in self._topo_order():
            for attempt in range(s.retries + 1):
                t0 = time.perf_counter()
                try:
                    ctx.outputs[s.name] = s.fn(ctx)
                    break
                except Exception:
                    if attempt == s.retries:
                        raise
                    if s.retry_delay_s:
                        do_sleep(s.retry_delay_s)
            elapsed = time.perf_counter() - t0
            ctx.outputs.setdefault("__timings__", {})[s.name] = elapsed  # type: ignore[index]
            ctx.outputs.setdefault("__attempts__", {})[s.name] = attempt + 1  # type: ignore[index]
        return ctx

    def backfill(
        self,
        spark: SparkSession,
        run_dates: list[str],
        params: dict[str, Any] | None = None,
        sleep: Callable[[float], None] | None = None,
    ) -> list[RunContext]:
        """O4 rerun/backfill semantics: one deterministic run per
        logical date. Idempotent stages (keyed upserts, IF NOT EXISTS
        DDL) make re-running a date a no-op. ``sleep`` forwards to
        run() so retry backoff stays fake-clock-testable in long
        backfills too."""
        return [self.run(spark, d, params, sleep=sleep) for d in run_dates]


class DailySchedule:
    """O4 recurring trigger — the reference's ``schedule_interval=
    '@daily'`` (dags/get_prices_load_mongodb.py:78) with Airflow's
    execution-date semantics: the run FOR logical date D fires once
    the day AFTER D has started (data for D is complete). Pure date
    arithmetic — the caller owns the clock and the sleep, so the
    trigger loop is deterministic and testable, and in production the
    same object drives a real loop or an external scheduler tick."""

    def __init__(self, pipeline: Pipeline, start_date: str):
        import datetime as _dt

        self._dt = _dt
        self.pipeline = pipeline
        self.start = _dt.date.fromisoformat(start_date)
        self.completed: set[str] = set()

    def due(self, now: str) -> list[str]:
        """Logical dates whose runs are due at wall-time ``now``
        (ISO date or datetime), oldest first, excluding completed —
        catchup/backfill falls out naturally: a late start returns
        every missed date."""
        today = self._dt.datetime.fromisoformat(now).date()
        last_complete = today - self._dt.timedelta(days=1)
        out = []
        d = self.start
        while d <= last_complete:
            iso = d.isoformat()
            if iso not in self.completed:
                out.append(iso)
            d += self._dt.timedelta(days=1)
        return out

    def run_pending(
        self,
        spark: SparkSession,
        now: str,
        params: dict[str, Any] | None = None,
        sleep: Callable[[float], None] | None = None,
    ) -> list[RunContext]:
        """Execute every due logical date (one tick of the trigger
        loop). Re-invoking with the same ``now`` is a no-op —
        idempotent like the stages themselves. ``sleep`` forwards to
        run() for retry backoff (run_forever passes its own injected
        sleep, so a fake-clock loop never blocks on real time)."""
        ctxs = []
        for d in self.due(now):
            ctxs.append(self.pipeline.run(spark, d, params, sleep=sleep))
            self.completed.add(d)
        return ctxs

    def run_forever(
        self,
        spark: SparkSession,
        clock: Callable[[], str],
        sleep: Callable[[float], None] = time.sleep,
        poll_seconds: float = 300.0,
        until: Callable[[], bool] = lambda: False,
        params: dict[str, Any] | None = None,
    ) -> list[RunContext]:
        """The timer loop itself — the reference's scheduler process
        (Airflow's @daily tick, dags/get_prices_load_mongodb.py:78).
        Clock and sleep are injected so the loop is unit-testable with
        a fake clock and runs deterministically: each tick reads
        ``clock()`` (ISO date/datetime), executes every due logical
        date via run_pending (catchup included), then sleeps. ``until``
        is checked per tick for a clean shutdown; returns every run's
        context. Production: ``run_forever(spark, clock=lambda:
        datetime.now(UTC).isoformat())``."""
        ctxs: list[RunContext] = []
        while not until():
            ctxs.extend(self.run_pending(spark, clock(), params, sleep=sleep))
            sleep(poll_seconds)
        return ctxs


def gas_prices_pipeline(pages_provider: Callable[[RunContext], DataFrame]) -> Pipeline:
    """The reference's four DAGs as ONE pipeline: DDL → extract →
    derive → fan-out to N sinks (append + keyed-upsert semantics),
    with the page fetch injected (HTTP in production, canned pages in
    tests — the driver-side fetch is the S1 boundary)."""
    from pyspark.sql import functions as F

    from master_airflow_spark.sinks.writers import fan_out, write_keyed_upsert
    from master_airflow_spark.sources.html_extract import scrape_pipeline

    p = Pipeline("gas_prices")

    @p.stage("create_tables")
    def create_tables(ctx: RunContext) -> None:
        """O2/idempotent DDL (reference get_prices_load_postgres.py:14-23)."""
        ctx.spark.sql(
            "CREATE TABLE IF NOT EXISTS gas_prices ("
            "price DOUBLE, station STRING, city STRING, time STRING, "
            "user STRING, date DATE) USING parquet"
        )

    @p.stage("extract")
    def extract(ctx: RunContext) -> DataFrame:
        """S2/P1-P9: pages → typed rows (one extract, not four)."""
        return scrape_pipeline(pages_provider(ctx), ctx.run_date)

    @p.stage("load", depends_on=("create_tables", "extract"))
    def load(ctx: RunContext) -> None:
        """O5 fan-out: one cached batch → append sink + keyed-upsert
        sink (the reference's Mongo/Postgres/ES vs MinIO semantics)."""
        df = ctx["extract"]
        base = ctx.params.get("sink_dir", "/tmp/mas_gas_prices")
        fan_out(
            df,
            [
                lambda d: d.write.mode("append").parquet(f"{base}/append"),
                lambda d: write_keyed_upsert(
                    d.withColumn("_run_date", F.lit(ctx.run_date)),
                    f"{base}/upsert",
                    keys=["date", "station"],
                    order=["_run_date", "page_id"],
                ),
            ],
        )

    return p
