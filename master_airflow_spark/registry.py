"""Named-query registry.

Every judged operator (SURVEY.md §2) registers here as a named query:
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the exact DuckDB oracle SQL the
driver diffs it against. Keeping impl + oracle side-by-side in the same
decorator call is what keeps column names / types / tiebreakers in sync
— the driver hash-compares values after sorting columns by name, so
drift between the two is an instant failure.

Float-determinism contract used throughout the registered queries:
sums/avgs over double columns are computed by casting to DECIMAL first
(exact, order-independent) and casting the final result back to DOUBLE,
so Spark's parallel partial aggregates and DuckDB's single-threaded
fold produce bit-identical values. Top-k queries always carry a total
ordering (explicit tiebreaker keys).
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
# decides which queries get externally certified. Round-5 policy (per
# the round-4 verdict's #1 item): (0) the 27 queries that have NEVER
# been in a driver window — all round-4 late additions, all green in
# scripts/driver_sim.py and pytest — closing the last three §2 rows
# with no external evidence (X28 pagerank, X29 robust stats, X31
# attribution); (1) queries whose implementation was touched THIS
# round (stale stamps otherwise); (2) remaining slots re-certify the
# oldest (round-1) stamps, widest-distinct code paths first.
# (The round-5 additions — boilerplate_shingle_ratio,
# quality_logit_score, minhash_estimate_error, scd2_history_build,
# stream_unique_users_rollup, zorder_layout_keys, dup_span_extract,
# dup_span_cut, triangle_count_cosuppliers, bfs_reachability_hops,
# heavy_hitters_mg_verified — did not fit this window
# and are round 6's first promotions; all pass the local
# differential harness and tests/test_round5_ops.py / test_zorder.py.)
PRIORITY: tuple[str, ...] = (
    # (0) never driver-certified — rows X28/X29/X31 first, then the
    # LLM-pipeline stragglers, then the rest of the round-4 backlog.
    "pagerank_trade_graph",
    "mad_robust_outliers",
    "winsorized_mean_price",
    "shipping_latency_percentiles",
    "last_touch_attribution",
    "multi_touch_window_count",
    "incremental_minhash_dedup",
    "inverted_index_postings",
    "ann_recall_eval",
    "cluster_keep_longest",
    "merge_changes_classify",
    "winnowing_shared_pairs",
    "prefix_containment_pairs",
    "equi_depth_price_buckets",
    "skew_key_profile",
    "corrupt_record_quarantine",
    "token_budget_mix",
    "token_simpson_diversity",
    "source_token_divergence",
    "sentence_segmentation",
    "event_type_association",
    "twap_user_value",
    "nation_revenue_trend",
    "weekly_revenue_wow",
    "daily_event_type_pivot",
    "dedup_rate_by_source",
    "hll_sketch_users",  # rows-only by design (estimate pinned in tests)
    # (1) implementation touched in round 5 — certify the new code:
    # lsh_bucketed_ann (fused single-kernel rewrite) and the three
    # complete-mode stream drains (explicit per-query state_partitions).
    "lsh_bucketed_ann",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    # (2) re-certification: round-1 stamps, oldest pool. date_range_
    # filter, normalize_whitespace, cast_string_price, bounded_split,
    # and membership_filter cede their slots (single-expression scans,
    # the lowest-risk stamps, still locally oracle-diffed every round
    # by driver_sim).
    "top1_price_lexicographic",
    "sequence_packing",
    "pii_redact",
    "profile_columns",
    "dq_checks",
    "multimodal_meta",
    "flatten_props_map",
    "map_from_json",
    "json_document",
    "json_functions",
    "string_functions",
    "date_functions",
    "date_parse_roundtrip",
    "full_outer_nation_presence",
    "right_join_parts_lineitems",
    "customer_order_counts",
    "distinct_order_status",
    "hash_sample_10pct",
    "composite_key",
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


_loaded = False


def _ensure_loaded() -> None:
    """Import every operator module so decorators run."""
    global _loaded
    if _loaded:
        return
    from master_airflow_spark import operators  # noqa: F401  (imports all submodules)

    _loaded = True
