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
