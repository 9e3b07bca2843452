"""Sketch-then-verify operators: bounded-memory candidate generation
followed by an exact verification pass, so the OUTPUT is provably
identical to the exact answer while no stage ever holds the full key
space in memory.

The pattern matters at 100 TB when the grouping key's cardinality is
itself corpus-scale (open-vocabulary n-grams, URLs, user agents): a
plain groupBy must shuffle and aggregate every distinct key, while the
sketch pass reduces each partition to a fixed-size summary, the merge
touches only |summary| x partitions rows, and the exact pass aggregates
only the few surviving candidate keys (a broadcast semi-join prunes the
second scan's shuffle to near-nothing). The reference has no sketch
layer; this generalizes its exact top-1 serving pattern
(api/postgres/api.py:16-33) to keys too numerous to aggregate exactly
in one pass.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.operators.text import _sql_ngram_cte, tokens
from master_airflow_spark.registry import register, track_cache

# Misra-Gries capacity per partition. The merged-summary undercount is
# at most N/(MG_K + 1) total (each prune that subtracts m charges
# m*(K+1) true mass), so the sketch is SELECTIVE — candidates ≪ vocab —
# exactly when MG_K + 1 > 1/HH_FRAC; with HH_FRAC = 5e-5 that needs
# K > 20_000. A 32k-entry dict per partition is negligible memory at
# any scale.
MG_K = 32_768
HH_FRAC = 5e-5  # heavy hitter := count >= HH_FRAC * total (floor 5)
HH_MIN_T = 5
HH_NGRAM = 3


def _mg_partition_sketch(k: int):
    """Build a mapInPandas kernel: per-partition Misra-Gries summary
    with ``k`` counters over the ``gram`` column. Emits each surviving
    counter as (gram, lb, is_total=false) — lb is a LOWER bound on the
    partition-local count, undercounting by at most n_part/(k+1) — plus
    one (NULL, n_part, is_total=true) marker row so the caller can
    recover the exact global N without a third corpus pass.

    Each Arrow batch is counted vectorized (value_counts), merged
    item-wise, then pruned by the standard MG-merge rule: subtract the
    (k+1)-th largest count from every survivor and drop the
    non-positives (Agarwal et al., "Mergeable Summaries", PODS 2012).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            col = pdf["gram"]
            n_part += len(col)
            vc = col.value_counts()
            for gram, cnt in zip(vc.index, vc.to_numpy()):
                counters[gram] = counters.get(gram, 0) + int(cnt)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                m = vals[k]  # (k+1)-th largest
                counters = {g: v - m for g, v in counters.items() if v > m}
        yield pd.DataFrame(
            {
                "gram": list(counters.keys()) + [None],
                "lb": pd.array(
                    list(counters.values()) + [n_part], dtype="int64"
                ),
                "is_total": [False] * len(counters) + [True],
            }
        )

    return kernel


def _doc_ngrams(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """One row per word n-gram of every document — array-indexed form
    (no window, no positions): the tokens array is selected into a real
    column FIRST so the transform() lambda indexes a materialized value
    (an outer array EXPRESSION inside the lambda re-evaluates per
    element — the quadratic trap). Docs shorter than n tokens
    contribute nothing (the sequence() bound would otherwise run
    backwards and fabricate grams)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens().alias("toks")).where(F.size("toks") >= n)
    t = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(n)]
        ),
    )
    return toks.select(F.explode(grams).alias("gram"))


# The gram stream reuses text.py's shared CTE (single source of truth
# for the slice/window arithmetic); its doc_id column is simply unused
# by the GROUP BY gram below.
_HH_ORACLE = f"""
WITH {_sql_ngram_cte(HH_NGRAM)},
tot AS (SELECT count(*) AS n FROM g)
SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences
FROM g
GROUP BY gram
HAVING count(*) >= (SELECT greatest(CAST(ceil({HH_FRAC} * n) AS BIGINT),
                                    {HH_MIN_T}) FROM tot)
"""


@register("heavy_hitters_mg_verified", oracle=_HH_ORACLE, tags=("X35", "X26", "X27"))
def heavy_hitters_mg_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter word 3-grams (count >= max(ceil(HH_FRAC*N),
    HH_MIN_T)) by Misra-Gries sketch + exact verification — output
    provably EQUAL to the exact groupBy answer, which is what makes an
    approximate sketch exactly oracle-able:

    1. Sketch pass: each partition reduces its gram stream to <= MG_K
       counters via mapInPandas (Arrow-batched, vectorized
       value_counts; bounded memory regardless of vocabulary).
    2. Candidate merge: summed lower bounds undercount any gram by at
       most slack = N/(MG_K+1), so every true heavy hitter satisfies
       sum_lb >= T - slack — the filter keeps a guaranteed SUPERSET of
       the answer (partition layout can change WHICH extra candidates
       appear, never lose a true one, so the verified output is
       layout-invariant — safe to hash-compare).
    3. Verify pass: the candidate set (bounded by the merge filter)
       broadcasts into a semi-join over a second gram scan; only
       candidate keys are aggregated exactly, then the exact threshold
       is applied.

    At 100 TB the first pass shuffles only K x partitions summary rows,
    the second aggregates only candidates — a full-vocabulary shuffle
    never happens. The two driver scalars (N, T) are single-row
    aggregates, not data collects. The sketch output (bounded by
    (K+1) x partitions rows, corpus-size-independent) is cached: the
    N aggregate and the candidate merge both consume it, and without
    the cache each would re-run the corpus-scan sketch pass."""
    grams = _doc_ngrams(spark, sf_dir, HH_NGRAM)
    sketch = track_cache(
        grams.mapInPandas(
            _mg_partition_sketch(MG_K), "gram string, lb long, is_total boolean"
        )
    )
    totals = sketch.groupBy("is_total").agg(F.sum("lb").alias("s"))
    n_total = {r.is_total: r.s for r in totals.collect()}.get(True, 0)
    thr = max(math.ceil(HH_FRAC * n_total), HH_MIN_T)
    slack = n_total // (MG_K + 1) + 1
    cands = (
        sketch.where(~F.col("is_total"))
        .groupBy("gram")
        .agg(F.sum("lb").alias("lb_sum"))
        .where(F.col("lb_sum") >= thr - slack)
        .select("gram")
    )
    return (
        grams.join(F.broadcast(cands), "gram")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= thr)
    )


# -- X37: exact quantiles via mergeable rank sketch --------------------------

# Quantile targets for the judged query; rank positions derive from
# the exact row count at run time.
QS_TARGETS = (0.01, 0.25, 0.50, 0.75, 0.99)
# Per-Arrow-batch sample budget: each batch of n rows emits
# ~QS_BATCH_KEEP evenly-spaced order statistics with weight
# s = n // QS_BATCH_KEEP, so any value's global rank is known to
# within U = sum(2*s_b) without holding any batch fully sorted in
# memory beyond the Arrow batch itself.
QS_BATCH_KEEP = 256

_QS_ORACLE = """
WITH cents AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
n AS (SELECT count(*) AS n FROM cents),
targets(p) AS (SELECT CAST(x AS DOUBLE)
               FROM (VALUES (0.01),(0.25),(0.50),(0.75),(0.99)) t(x)),
pos AS (SELECT p, 1 + p * (n.n - 1) AS h FROM targets, n),
ordered AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM cents)
SELECT pos.p,
       CAST(floor(pos.h) AS BIGINT) AS rank_lo,
       CAST(ceil(pos.h) AS BIGINT) AS rank_hi,
       lo.v AS value_lo_cents,
       hi.v AS value_hi_cents,
       CAST(lo.v AS DOUBLE)
         + (pos.h - floor(pos.h))
           * (CAST(hi.v AS DOUBLE) - CAST(lo.v AS DOUBLE)) AS quantile_cents
FROM pos
JOIN ordered lo ON lo.rk = CAST(floor(pos.h) AS BIGINT)
JOIN ordered hi ON hi.rk = CAST(ceil(pos.h) AS BIGINT)
"""


def _qs_batch_samples():
    """mapInPandas kernel: per Arrow batch, emit evenly-spaced order
    statistics of the ``v`` column as (v, w, u=false) weighted samples
    whose weights sum exactly to the batch size, plus one
    (NULL, 2*s, u=true) uncertainty-budget marker.

    Guarantee (the whole correctness story): for any x, the summed
    weight of samples ≤ x NEVER exceeds the true count of values ≤ x,
    and undershoots it by less than (s-1) + (n mod s) < 2s per batch —
    so ranks are bracketed globally within U = sum of the marker
    weights. Memory is one Arrow batch (the only thing sorted), never
    the partition."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = np.sort(pdf["v"].to_numpy())
            n = len(v)
            if n == 0:
                continue
            s = max(1, n // QS_BATCH_KEEP)
            idx = np.arange(s - 1, n, s)
            vals = v[idx].tolist()
            ws = [s] * len(idx)
            rem = n - int(idx[-1] + 1)
            if rem > 0:  # credit the top-rem values at the batch max
                vals.append(int(v[-1]))
                ws.append(rem)
            yield pd.DataFrame(
                {
                    "v": vals + [None],
                    "w": ws + [2 * s],
                    "u": [False] * len(vals) + [True],
                }
            )

    return kernel


@register("exact_quantiles_sketched", oracle=_QS_ORACLE, tags=("X37", "X29", "X27"))
def exact_quantiles_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order-statistic quantiles of order totals (integer cents)
    without a global sort — sketch-then-verify in the X35 mold, recast
    for ranks:

    1. Sketch pass: one scan reduces each Arrow batch to ~QS_BATCH_KEEP
       weighted samples (see _qs_batch_samples); the merged samples
       bracket every rank within U = sum of per-batch budgets. The
       exact row count N falls out of the same pass (weights sum to N),
       so no separate count scan exists.
    2. Bracketing: a cumulative-weight window over the (distinct,
       bounded) sample values turns each target rank r into a value
       window (lo, hi] guaranteed to contain the r-th order statistic:
       lo = largest sample with S_le + U < r (strictly below rank r),
       hi = smallest sample with S_le >= r (at or above it). Ten
       scalars reach the driver — never data.
    3. Verify/extract pass: ONE more scan computes, per target, the
       exact count of values <= lo (a conditional sum) and the sorted
       candidate list for (lo, hi] (a collect_list bounded by the
       bracket width ~U — map-side partial aggregation keeps the
       exchange at per-partition partials, never N rows); the value at
       local index rank − n_below is the answer BY CONSTRUCTION. The
       result is LEFT-joined back onto the full target list and an
       in-plan assert_true fails loudly if any bracket missed its rank
       — including the both-ranks-missed case, which would otherwise
       silently drop the row (it cannot happen, but the guarantee is
       enforced structurally, not assumed).

    The interpolated quantile (h = 1 + p*(N-1), value_lo + frac*(value_hi
    - value_lo)) uses the identical IEEE expression the oracle states,
    on exact integer-cents order statistics — bit-identical across
    engines. At 100 TB: pass 1 shuffles sample summaries only, pass 2
    shuffles five (n_below, ~U-candidate-list) partials per partition;
    Spark's own percentile() buffers every value per group, which this
    operator exists to avoid."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    sketch = track_cache(
        o.mapInPandas(_qs_batch_samples(), "v long, w long, u boolean")
    )
    agg = {
        bool(r.u): r.s
        for r in sketch.groupBy("u").agg(F.sum("w").alias("s")).collect()
    }
    n_total, budget_u = int(agg.get(False, 0)), int(agg.get(True, 0))

    # Target ranks, driver-side (N is exact; h/frac are plain C doubles
    # so the oracle's identical expressions reproduce them bit-for-bit).
    targets = []
    for p in QS_TARGETS:
        h = 1 + p * (n_total - 1)
        targets.append(
            (p, int(math.floor(h)), int(math.ceil(h)), h - math.floor(h))
        )

    from pyspark.sql import Window

    cum = (
        sketch.where(~F.col("u"))
        .groupBy("v")
        .agg(F.sum("w").alias("w"))
        .withColumn(
            "s_le",
            F.sum("w").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    t_df = spark.createDataFrame(
        [(p, rk_lo, rk_hi) for p, rk_lo, rk_hi, _ in targets],
        "p double, rk_lo long, rk_hi long",
    )
    brackets = {
        r.p: (r.lo, r.hi)
        for r in cum.crossJoin(F.broadcast(t_df))
        .groupBy("p", "rk_lo", "rk_hi")
        .agg(
            F.max(
                F.when(F.col("s_le") + F.lit(budget_u) < F.col("rk_lo"), F.col("v"))
            ).alias("lo"),
            F.min(
                F.when(F.col("s_le") >= F.col("rk_hi"), F.col("v"))
            ).alias("hi"),
        )
        .collect()
    }
    lo_hi = [
        (
            p,
            rk_lo,
            rk_hi,
            frac,
            brackets[p][0] if brackets[p][0] is not None else -(1 << 62),
            brackets[p][1] if brackets[p][1] is not None else (1 << 62),
        )
        for p, rk_lo, rk_hi, frac in targets
    ]

    # Pass 2, ONE scan: the five (lo, hi] brackets are driver scalars,
    # so each target's exact below-count and sorted candidate list are
    # plain conditional aggregate expressions — no join, no second
    # scan, no window shuffle. collect_list drops the when()'s nulls,
    # so each partial list holds only that partition's candidates
    # (bounded by the bracket width), and the value at sorted index
    # rank − n_below IS the exact order statistic.
    aggs = []
    for i, (_p, _rkl, _rkh, _frac, lo, hi) in enumerate(lo_hi):
        aggs.append(
            F.sum(F.when(F.col("v") <= F.lit(lo), 1).otherwise(0)).alias(
                f"nb{i}"
            )
        )
        aggs.append(
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col("v") > F.lit(lo)) & (F.col("v") <= F.lit(hi)),
                        F.col("v"),
                    )
                )
            ).alias(f"cand{i}")
        )
    one = o.agg(*aggs)

    def pick(i: int, rk: int):
        # Index guard: a broken bracket could put rk − n_below at ≤ 0
        # (element_at would read from the array END for negatives) or
        # past the list (ANSI element_at throws). when + try_element_at
        # maps every invalid index to NULL so the assert below is the
        # single loud failure path.
        idx = (F.lit(rk) - F.col(f"nb{i}")).cast("int")
        return F.when(idx >= 1, F.try_element_at(F.col(f"cand{i}"), idx))

    rows = []
    for i, (p, rk_lo, rk_hi, frac, _lo, _hi) in enumerate(lo_hi):
        rows.append(
            F.struct(
                F.lit(p).alias("p"),
                F.lit(rk_lo).alias("rank_lo"),
                F.lit(rk_hi).alias("rank_hi"),
                F.lit(frac).alias("frac"),
                pick(i, rk_lo).alias("value_lo_cents"),
                pick(i, rk_hi).alias("value_hi_cents"),
            )
        )
    out = one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    # Structural guard: element_at returns NULL when a bracket missed
    # its rank (index out of the candidate list) — assert on EVERY
    # target row, which exists unconditionally (built by explode over
    # literals, not by grouping rows that might be absent).
    guard = F.assert_true(
        F.col("value_lo_cents").isNotNull() & F.col("value_hi_cents").isNotNull(),
        F.lit("quantile bracket missed its rank — sketch bound violated"),
    )
    return out.select(
        "p",
        "rank_lo",
        "rank_hi",
        F.when(guard.isNull(), F.col("value_lo_cents")).alias("value_lo_cents"),
        F.col("value_hi_cents").alias("value_hi_cents"),
        (
            F.col("value_lo_cents").cast("double")
            + F.col("frac")
            * (
                F.col("value_hi_cents").cast("double")
                - F.col("value_lo_cents").cast("double")
            )
        ).alias("quantile_cents"),
    )
