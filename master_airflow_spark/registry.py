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
# decides which queries get externally certified. Round-4 policy (per
# the round-3 verdict): with round 3's 50/50 green and no new-operator
# backlog, the window drains the remaining never-certified entries and
# spends everything left on RE-certification, oldest stamps first —
# target: every oracle-backed query green in CORRECTNESS_r04 ∪ r03 ∪
# r02 with no implementation change since its stamp (150/150).
PRIORITY: tuple[str, ...] = (
    # (0) implementation touched THIS round — certify the new code:
    # surrogate_keys (deterministic bucketing rewrite), containment
    # (raw-gram join), variant (column rename), winnowing (kernel
    # extraction), q21 (one-pass two-level aggregation), lsh (Arrow
    # bucket kernel + query-side bucket computation), and every stream
    # drain (run_to_memory: state_partitions 8->4, memory-sink table
    # lifecycle now released via registry).
    "surrogate_keys",
    "containment_pairs",
    "variant_semistructured",
    "winnowing_fingerprints",
    "q21_waiting_suppliers",
    "lsh_bucketed_ann",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_interval_join",
    "stream_static_enrich",
    # added this round: custom stateful streaming op (X22 arbitrary
    # state, full-value oracle), BM25 ranking, weighted priority
    # sampling — certified in their round of introduction.
    "stream_ewma_per_user",
    "bm25_lite_ranking",
    "weighted_sample_per_source",
    "tfidf_top_terms",  # single-exchange rewrite (r4) — re-certify
    # (1) never driver-certified, oracle-backed — the last 15 of the
    # pre-round-4 backlog; after this round every oracle-backed query
    # registered before round 4 has been in a window at least once.
    # (The round-4 additions that did NOT fit this window —
    # incremental_minhash_dedup, skew_key_profile,
    # winnowing_shared_pairs, token_budget_mix,
    # corrupt_record_quarantine, pagerank_trade_graph,
    # token_simpson_diversity, inverted_index_postings,
    # last_touch_attribution, equi_depth_price_buckets,
    # mad_robust_outliers, source_token_divergence,
    # nation_revenue_trend, cluster_keep_longest,
    # merge_changes_classify, event_type_association,
    # twap_user_value, prefix_containment_pairs,
    # winsorized_mean_price, multi_touch_window_count,
    # weekly_revenue_wow, sentence_segmentation, ann_recall_eval,
    # shipping_latency_percentiles, dedup_rate_by_source,
    # daily_event_type_pivot — are round 5's first promotions; all
    # pass the local differential harness.)
    "xml_extract_golden",
    "csv_parse_roundtrip",
    "null_semantics",
    "array_hof_suite",
    "fuzzy_customer_pairs",
    "interpolate_sparse_series",
    "udtf_fixed_chunks",
    "repeated_shingle_ratio",
    "split_leakage_audit",
    "sql_api_top1_alltime",
    "sql_api_grouping_sets",
    "zip_align_arrays",
    "stats_moments",
    "corr_qty_price",
    "listagg_nation_customers",
    # (2) never driver-seen rows-only entries whose rows CAN be
    # externally checked (weakest check level, but nonzero): the
    # stream dedup drain (also exercises the run_to_memory change),
    # the two real multimodal kernels, and the recall<1 IVF probe
    # (its machinery is exactly certified by ivf_ann_exhaustive).
    # approx_distinct_users / approx_percentiles / hll_sketch_users /
    # multimodal_features stay out: estimates pinned locally
    # (tests/test_round4_ops.py pins HLL against DuckDB's own sketch).
    "stream_dedup_watermark",
    "ppm_decode_resize",
    "video_frame_sample",
    "ivf_ann_topk",
    # (3) re-certification, 16 slots (4 ceded to round-4 additions
    # above). First the round-3-touched paths
    # a regression could hide in behind an old stamp (minhash's r3
    # signature-path swap; train_test_split's shared shingle/split
    # helpers), then the oldest (round-1) stamps chosen to cover the
    # widest distinct code paths: scalar/date/string/json function
    # suites, set ops, rollup/cube/pivot, semi-anti, range join,
    # sampling, simhash pair + fingerprint, exact dedup + clustering,
    # argmax variants, and the headline aggregates.
    "minhash_near_dup",
    "train_test_split",
    "revenue_by_nation",
    "dedup_exact",
    "cosine_topk",
    "keyed_upsert_latest",
    "simhash_near_dup",
    "simhash_fingerprint",
    "range_join_price_bands",
    "semi_anti_customers",
    "set_ops_customers",
    "rollup_sales",
    "cube_priority_status",
    "pivot_priority_by_status",
    "stratified_sample",
    # (string_functions / date_functions / json_functions ceded their
    # slots to the three round-4 additions: pure-builtin expression
    # suites, the lowest-risk stamps in the r1 pool, still locally
    # oracle-diffed every round.)
    # (date_range_filter ceded its slot to the tfidf_top_terms
    # re-certification: a two-predicate scan filter is the lowest-risk
    # stamp left, still locally oracle-diffed every round.)
    "dedup_clusters",
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
