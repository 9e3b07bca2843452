"""Named-query registry.

Every judged operator (SURVEY.md §2) registers here as a named query:
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the exact DuckDB oracle SQL the
driver diffs it against. Keeping impl + oracle side-by-side in the same
decorator call is what keeps column names / types / tiebreakers in sync
— the driver hash-compares values after sorting columns by name, so
drift between the two is an instant failure.

Float-determinism contract used throughout the registered queries:
sums/avgs over double columns are made exact and order-independent
before aggregating — either on the scaled-long fast path (integer
cents; functions/exact.py cents/lsum_money — the default for money
and fixed-precision columns since round 7) or by casting to DECIMAL
(the wide-magnitude fallback) — and converted to DOUBLE once at the
end, so Spark's parallel partial aggregates and DuckDB's
single-threaded fold produce bit-identical values. Top-k queries
always carry a total ordering (explicit tiebreaker keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


# Exposure order for the driver contract. The driver samples the
# FIRST 50 registry entries each round, so ordering is the lever that
# decides which queries get externally certified. Round-9 policy (the
# round-8 verdict's #2 item, verbatim priority order: "the 7 streaming
# queries (events.py refactored r8; latest stamps r7), the 20
# out-of-window tpch_like lsum_money users (overflow guard r8), then
# the 9 r4 cessions"):
# (1) slots 1-7: every streaming query whose latest stamp predates r8
# — they all execute through streaming/events.py, which was refactored
# in r8 (_TriggerListener, track_drain_progress), so their r4-r7
# stamps are stale-on-changed-code: stream_tumbling_agg(r7),
# stream_session_window(r7), stream_topk_users(r7),
# stream_sliding_agg(r5), stream_unique_users_rollup(r6),
# stream_interval_join(r4), stream_static_enrich(r4). The other two
# streaming queries (stream_dedup_watermark, stream_ewma_per_user)
# were stamped r8 on the refactored code already.
# (2) slots 8-29: all 22 tpch_like.py queries whose stamps are r7 —
# the shared scaled-long kernel they aggregate through
# (functions/exact.py lsum_money/lavg_money) gained the overflow
# guard in r8 after their last stamps. q21 was stamped r8 and stays
# out. q7 additionally has a CODE change this round (AQE advisory
# exchange on its fact-fact shuffle, round-8 verdict #4).
# (3) slots 30-36: the 7 r4 cessions not already covered by (1)
# (stream_interval_join / stream_static_enrich are in slots 1-7):
# dedup_clusters, ivf_ann_topk, keyed_upsert_latest, simhash_near_dup,
# sql_api_top1_alltime, train_test_split, video_frame_sample. After
# this window no registry stamp predates r5 (the verdict's bar).
# (4) slots 37-50: changed-code first — embedding_near_dup (r6 stamp;
# its kernel is touched by this round's perf work) — then the oldest
# r5 stamps in name order (ann_recall_eval … dedup_rate_by_source…)
# to keep retiring the old tail.
PRIORITY: tuple[str, ...] = (
    # (1) streaming queries on the r8-refactored events.py.
    "stream_tumbling_agg",
    "stream_session_window",
    "stream_topk_users",
    "stream_sliding_agg",
    "stream_unique_users_rollup",
    "stream_interval_join",
    "stream_static_enrich",
    # (2) tpch_like lsum_money users stamped r7 (overflow guard r8).
    "pricing_summary",
    "revenue_by_nation",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q20_excess_shippers",
    "q22_idle_balances",
    # (3) the remaining 7 r4 cessions — oldest stamps left.
    "dedup_clusters",
    "ivf_ann_topk",
    "keyed_upsert_latest",
    "simhash_near_dup",
    "sql_api_top1_alltime",
    "train_test_split",
    "video_frame_sample",
    # (4) changed-code this round, then oldest r5 stamps name-order.
    "embedding_near_dup",
    "ann_recall_eval",
    "cluster_keep_longest",
    "composite_key",
    "corrupt_record_quarantine",
    "customer_order_counts",
    "daily_event_type_pivot",
    "date_functions",
    "date_parse_roundtrip",
    "dedup_rate_by_source",
    "distinct_order_status",
    "dq_checks",
    "equi_depth_price_buckets",
    "event_type_association",
)



def _ordered() -> dict[str, QuerySpec]:
    _ensure_loaded()
    out = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    out.update((n, s) for n, s in REGISTRY.items() if n not in out)
    return out


def queries() -> dict[str, QueryFn]:
    """The driver-facing query dict. Each callable releases the
    PREVIOUS query's tracked caches/broadcasts before building its own
    plan: the external driver materializes one query fully before
    invoking the next and never calls release_caches() itself, so
    without this wrapper every track_cache()d frame in a 50-query
    certification loop would stay persisted and executor memory would
    ratchet. Bench and tests manage release explicitly via
    registry.REGISTRY / release_caches().

    Hazard (build-then-materialize): a caller that builds SEVERAL of
    these plans before materializing any loses the persistence of all
    but the last — an unpersisted frame silently recomputes, which is
    only a perf hit because no registered query's CORRECTNESS depends
    on single materialization (plans are deterministic column
    expressions; the one operator that relied on a sampled exchange,
    surrogate_keys, was rewritten to deterministic bucketing). Keep it
    that way: never register a query whose correctness requires a
    persist to stick."""

    def wrap(spec: QuerySpec) -> QueryFn:
        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_caches()
            return spec.fn(spark, sf_dir)

        fn.__name__ = spec.fn.__name__
        fn.__doc__ = spec.fn.__doc__
        return fn

    return {name: wrap(spec) for name, spec in _ordered().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None
    }


# Intra-query caches (persist() of a frame feeding both sides of a
# self-join) and SparkContext broadcasts (query matrices shipped to
# executors). Both must outlive the query's ACTION, so the query fn
# can't free them itself — it records them here and the harness
# releases them once the result is materialized, keeping executor and
# driver memory flat across a long many-query session.
_TRACKED_CACHES: list[DataFrame] = []
_TRACKED_BROADCASTS: list = []
_TRACKED_MEMORY_TABLES: list[tuple[SparkSession, str]] = []
_TRACKED_SCRATCH_DIRS: list[str] = []


def track_scratch_dir(path: str) -> None:
    """Register an on-disk scratch dir (e.g. a shared-drain partial
    spool on tmpfs) for release_caches(). Same lifecycle contract as
    memory tables: any plan reading the dir must be materialized
    before the next registered query (or explicit release) runs."""
    _TRACKED_SCRATCH_DIRS.append(path)


def track_cache(df: DataFrame) -> DataFrame:
    """Persist df and register it for release_caches()."""
    df.persist()
    _TRACKED_CACHES.append(df)
    return df


def track_broadcast(bc):
    """Register a SparkContext broadcast for release_caches()."""
    _TRACKED_BROADCASTS.append(bc)
    return bc


def track_memory_table(spark: SparkSession, name: str) -> None:
    """Register a stream-drain memory-sink table for release_caches().
    Memory sinks hold every drained row in driver memory behind a temp
    view; without this, a 50-query certification loop or bench pass
    accumulates one table per drain and driver heap ratchets. Dropping
    the view is safe for the drain's already-returned DataFrame — it
    was analyzed at creation, so its plan no longer goes through the
    catalog — but frees the rows for GC once the caller discards it."""
    _TRACKED_MEMORY_TABLES.append((spark, name))


def release_caches() -> None:
    """Unpersist every tracked cache and broadcast (call after
    consuming a query). Broadcasts are unpersist()ed, not destroy()ed:
    unpersist frees the executor-side blocks (the leak) but leaves the
    broadcast re-sendable from the driver value, so a caller that
    builds several query plans before materializing them can still
    execute an older plan afterwards."""
    while _TRACKED_CACHES:
        try:
            _TRACKED_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped
    while _TRACKED_BROADCASTS:
        try:
            _TRACKED_BROADCASTS.pop().unpersist()
        except Exception:
            pass
    while _TRACKED_MEMORY_TABLES:
        spark, name = _TRACKED_MEMORY_TABLES.pop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
    while _TRACKED_SCRATCH_DIRS:
        import shutil

        shutil.rmtree(_TRACKED_SCRATCH_DIRS.pop(), ignore_errors=True)


_loaded = False


def _ensure_loaded() -> None:
    """Import every operator module so decorators run."""
    global _loaded
    if _loaded:
        return
    from master_airflow_spark import operators  # noqa: F401  (imports all submodules)

    _loaded = True
