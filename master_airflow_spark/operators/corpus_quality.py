"""Corpus-hygiene operators for LLM training-data pipelines:
cross-document boilerplate detection and a fixed-weight quality
classifier — the two filters that typically run right after dedup in
a pretraining data pipeline (C4 / RefinedWeb style).

Both are pure column-expression plans (no Python in the row path) and
carry exact DuckDB oracles: the boilerplate ratio is integer counting,
and the classifier emits its raw LINEAR score (no sigmoid — ln/exp
are the one place engines' libm results diverge; the sigmoid is
monotone, so thresholding the logit is equivalent and bit-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from master_airflow_spark.catalog import load_table
from master_airflow_spark.operators.text import (
    _SQL_STOP,
    _SQL_TOKS,
    STOPWORDS,
    _sql_ngram_cte,
    exploded_ngrams,
    tokens,
)
from master_airflow_spark.registry import register, track_cache

# A word k-gram shared by >= BOILER_MIN_DOCS distinct documents is
# "boilerplate" (navigation chrome, license headers, templated spam).
BOILER_K = 4
BOILER_MIN_DOCS = 4


@register(
    "boilerplate_shingle_ratio",
    oracle=f"""
WITH {_sql_ngram_cte(BOILER_K)},
dg AS (SELECT DISTINCT doc_id, gram FROM g),
freq AS (SELECT gram, count(*) AS n_docs FROM dg GROUP BY gram),
per_doc AS (
    SELECT dg.doc_id,
           count(*) AS n_grams,
           count(*) FILTER (WHERE freq.n_docs >= {BOILER_MIN_DOCS}) AS n_boiler
    FROM dg JOIN freq ON freq.gram = dg.gram
    GROUP BY dg.doc_id
)
SELECT doc_id, n_grams, n_boiler,
       CAST(n_boiler AS DOUBLE) / n_grams AS boiler_ratio
FROM per_doc
""",
    tags=("X26", "X23"),
)
def boilerplate_shingle_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's
    DISTINCT word-4-grams that appear in >= BOILER_MIN_DOCS documents
    in total (the count includes the document itself, so the threshold
    is BOILER_MIN_DOCS - 1 OTHER documents). This is the
    cross-document complement of
    repeated_shingle_ratio (within-doc repetition) and
    ngram_contamination (a fixed benchmark set): here the blacklist is
    learned from the corpus itself, the way production pipelines strip
    site chrome that exact- and near-dup passes both miss (documents
    differ, their furniture doesn't).

    Plan shape at 100 TB: explode to (doc_id, gram), one distinct
    (shuffle on (doc_id, gram)), one gram-keyed aggregate for corpus
    frequencies, join back on gram, one doc-keyed aggregate. Every
    exchange is keyed by gram or doc hash — no broadcast of anything
    corpus-sized, no skew beyond what AQE's skew-join handles (a
    pathologically common gram is exactly a hot key). The distinct
    (doc_id, gram) set feeds BOTH the frequency aggregate and the
    join-back, so it is persisted (tracked, spillable): without the
    cache Spark plans two full tokenize→explode→distinct passes over
    the corpus (ReuseExchange does not fire across the differently-
    projected branches — verified on the formatted plan)."""
    docs = load_table(spark, sf_dir, "documents")
    dg = track_cache(
        exploded_ngrams(docs, BOILER_K).select("doc_id", "gram").distinct()
    )
    freq = dg.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dg.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("n_docs") >= BOILER_MIN_DOCS).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            (F.col("n_boiler").cast("double") / F.col("n_grams")).alias(
                "boiler_ratio"
            ),
        )
    )


# Fixed, interpretable weights (a stand-in for a trained fastText /
# logistic quality model — the WEIGHTS would come from training, the
# serving plan below is what runs over the corpus either way).
W_BIAS = -1.0
W_STOP = 4.0  # stopword ratio: natural prose has function words
W_TTR = 1.5  # type-token ratio: vocabulary diversity
W_CPT = -0.1  # chars/token: very long "words" are code/garbage


@register(
    "quality_logit_score",
    oracle=f"""
WITH feats AS (
    SELECT doc_id,
           len({_SQL_TOKS}) AS n_tokens,
           CAST(len(list_filter({_SQL_TOKS}, t -> t IN {_SQL_STOP})) AS DOUBLE)
               / len({_SQL_TOKS}) AS stop_ratio,
           CAST(len(list_distinct({_SQL_TOKS})) AS DOUBLE)
               / len({_SQL_TOKS}) AS type_token_ratio,
           CAST(length(text) AS DOUBLE) / len({_SQL_TOKS}) AS chars_per_token
    FROM documents
)
SELECT doc_id, n_tokens, stop_ratio, type_token_ratio, chars_per_token,
       ((({W_BIAS} + {W_STOP} * stop_ratio)
            + {W_TTR} * type_token_ratio)
            + {W_CPT} * chars_per_token) AS logit,
       ((({W_BIAS} + {W_STOP} * stop_ratio)
            + {W_TTR} * type_token_ratio)
            + {W_CPT} * chars_per_token) >= 0.0 AS keep
FROM feats
""",
    tags=("X26", "quality"),
)
def quality_logit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over interpretable text features —
    the serving half of a fastText-style document-quality model. The
    features (stopword ratio, type-token ratio, chars/token) are the
    standard pretraining-filter signals; the score is the raw logit
    with an explicitly parenthesized left-to-right sum so Spark and
    the oracle fold the doubles in the same order (the sigmoid is
    monotone — gating on logit >= 0 IS gating on p >= 0.5, without
    ever calling exp()). Single scan, WholeStageCodegen end-to-end,
    zero shuffles — this filter is free at any corpus size."""
    t = tokens()
    n_tok = F.size(t)
    stop_ratio = (
        F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double") / n_tok
    )
    ttr = F.size(F.array_distinct(t)).cast("double") / n_tok
    cpt = F.length("text").cast("double") / n_tok
    logit = (
        (F.lit(W_BIAS) + F.lit(W_STOP) * stop_ratio) + F.lit(W_TTR) * ttr
    ) + F.lit(W_CPT) * cpt
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        ttr.alias("type_token_ratio"),
        cpt.alias("chars_per_token"),
        logit.alias("logit"),
        (logit >= 0.0).alias("keep"),
    )


# Duplicate-span extraction: window width (tokens) and the
# cross-document threshold (>= 2 docs share the gram).
DUPSPAN_K = 5

_DUPSPAN_ORACLE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - {DUPSPAN_K} + 2),
        i -> struct_pack(pos := i - 1,
                         gram := array_to_string(toks[i:i + {DUPSPAN_K} - 1], ' ')))) AS pg
      FROM t WHERE len(toks) >= {DUPSPAN_K}),
gp AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
freq AS (SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS nd FROM gp GROUP BY gram) WHERE nd >= 2),
dup AS (SELECT doc_id, pos FROM gp JOIN freq USING (gram)),
flagged AS (SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER w IS NULL
                  OR pos - lag(pos) OVER w > {DUPSPAN_K} THEN 1 ELSE 0 END AS newf
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl AS (SELECT doc_id, pos,
        CAST(sum(newf) OVER (
            PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS span_seq
        FROM flagged)
SELECT doc_id, span_seq, min(pos) AS span_start,
       max(pos) + {DUPSPAN_K} - 1 AS span_end,
       count(*) AS n_windows,
       max(pos) + {DUPSPAN_K} - min(pos) AS n_tokens
FROM isl GROUP BY doc_id, span_seq
"""


def _dup_window_starts(docs: DataFrame) -> DataFrame:
    """(doc_id, pos) of every full DUPSPAN_K-token window whose text
    occurs in >= 2 distinct documents. Shared candidate-generation
    stage of dup_span_extract (reports spans) and dup_span_cut
    (removes them): one gram-keyed aggregate for the cross-document
    frequency, one gram-keyed join back — never all-pairs, never a
    corpus-sized broadcast."""
    grams = exploded_ngrams(docs, DUPSPAN_K)
    dup_grams = (
        grams.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    return grams.join(dup_grams, "gram").select("doc_id", "pos")


@register("dup_span_extract", oracle=_DUPSPAN_ORACLE, tags=("X34", "X24", "X9"))
def dup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans per document —
    the span-level output of exact-substring deduplication (the
    suffix-array dedup of "Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022, §4.1, restated window-wise): a
    position's {DUPSPAN_K}-token window is "duplicated" when the same
    window text occurs in at least one OTHER document, and runs of
    duplicated windows that overlap or touch (gap <= K tokens) merge
    into one maximal span via gaps-and-islands (lag + running sum of
    new-island flags). Emits (doc_id, span_seq, span_start, span_end,
    n_windows, n_tokens) in token coordinates — the spans a dedup
    pass would CUT, where boilerplate_shingle_ratio only scores and
    exact/MinHash dedup only drop whole documents.

    Integer positions and counts end-to-end: exact oracle.

    Scale shape: posexplode is linear in corpus tokens; the gram
    frequency pass is one gram-keyed aggregate with map-side combine;
    the join back is gram-keyed (never broadcasts anything
    corpus-sized); the islands pass sorts only each document's OWN
    duplicated positions (doc_id-partitioned window — bounded by
    document length, no global sort). A pathologically common gram is
    a hot key for the join; that is AQE skew-join territory, same as
    the boilerplate operator. The distinct (doc_id, gram) projection
    feeds only the frequency side here (positions must survive for
    the islands), so unlike boilerplate_shingle_ratio nothing needs a
    tracked cache: each branch is consumed exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    dup = _dup_window_starts(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = dup.select(
        "doc_id",
        "pos",
        F.when(prev.isNull() | (F.col("pos") - prev > DUPSPAN_K), 1)
        .otherwise(0)
        .alias("newf"),
    )
    isl = flagged.select(
        "doc_id",
        "pos",
        F.sum("newf")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("span_seq"),
    )
    return isl.groupBy("doc_id", "span_seq").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + DUPSPAN_K - 1).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
        (F.max("pos") + DUPSPAN_K - F.min("pos")).alias("n_tokens"),
    )

_DUPCUT_ORACLE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - {DUPSPAN_K} + 2),
        i -> struct_pack(pos := i - 1,
                         gram := array_to_string(toks[i:i + {DUPSPAN_K} - 1], ' ')))) AS pg
      FROM t WHERE len(toks) >= {DUPSPAN_K}),
gp AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
freq AS (SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS nd FROM gp GROUP BY gram) WHERE nd >= 2),
dup AS (SELECT doc_id, pos FROM gp JOIN freq USING (gram)),
tk AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
        i -> struct_pack(pos := i - 1, tok := toks[i]))) AS pt FROM t),
tok AS (SELECT doc_id, pt.pos AS pos, pt.tok AS tok FROM tk),
mk AS (SELECT tok.doc_id, tok.pos, tok.tok,
        CASE WHEN d.pos IS NOT NULL THEN 1 ELSE 0 END AS is_start
       FROM tok LEFT JOIN dup d ON tok.doc_id = d.doc_id AND tok.pos = d.pos),
rm AS (SELECT doc_id, pos, tok,
        max(is_start) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN {DUPSPAN_K - 1} PRECEDING AND CURRENT ROW) AS removed
       FROM mk)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(removed) AS BIGINT) AS n_tokens_removed,
       count(*) - CAST(sum(removed) AS BIGINT) AS n_tokens_kept,
       coalesce(string_agg(CASE WHEN removed = 0 THEN tok END, ' ' ORDER BY pos),
                '') AS clean_text
FROM rm GROUP BY doc_id
"""


@register("dup_span_cut", oracle=_DUPCUT_ORACLE, tags=("X34", "X24", "X16"))
def dup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup CUT: rebuild each document's text with
    every cross-document duplicated span removed — the destructive
    half of Lee et al. 2022 §4.1 that dup_span_extract only reports.
    A token is removed when ANY duplicated {DUPSPAN_K}-token window
    covers it, i.e. when a duplicated window STARTS within the
    trailing K-1 positions — a rolling max over a ROWS frame on the
    contiguous position stream (posexplode guarantees density, so the
    ROWS frame is exactly the token-coordinate interval). Emits
    (doc_id, n_tokens, n_tokens_removed, n_tokens_kept, clean_text);
    docs whose every token is duplicated survive with clean_text=''
    (the aggregate keeps all docs — removal is a flag folded in the
    agg, never a row filter that could drop a fully-duplicated doc).

    Integer counts and byte-exact string reassembly: exact oracle.

    Scale shape: candidate generation is the shared
    _dup_window_starts gram-keyed join (see dup_span_extract); the
    marking join is (doc_id,pos)-keyed with the duplicated-window
    side small; the rolling max and the reassembly sort are both
    doc_id-partitioned (bounded by document length). collect_list of
    a document's own tokens is per-group state bounded by max doc
    length — same bound any whole-document operator (tokenize,
    fingerprint) already carries; no global sort, no driver
    materialization. The filter/transform lambdas run on the
    MATERIALIZED agg output column, not an outer array expression —
    linear, not the quadratic re-evaluation trap."""
    docs = load_table(spark, sf_dir, "documents")
    dup = _dup_window_starts(docs).withColumn("is_start", F.lit(1))
    tok = docs.select("doc_id", F.posexplode(tokens()).alias("pos", "tok"))
    marked = tok.join(dup, ["doc_id", "pos"], "left")
    cover = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(DUPSPAN_K - 1), 0)
    )
    flagged = marked.select(
        "doc_id",
        "pos",
        "tok",
        F.max(F.coalesce("is_start", F.lit(0))).over(cover).alias("removed"),
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("removed").alias("n_tokens_removed"),
        F.array_sort(F.collect_list(F.struct("pos", "tok", "removed"))).alias(
            "arr"
        ),
    )
    kept = F.filter("arr", lambda x: x["removed"] == 0)
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        (F.col("n_tokens") - F.col("n_tokens_removed")).alias("n_tokens_kept"),
        F.array_join(
            F.transform(kept, lambda x: x["tok"]), " "
        ).alias("clean_text"),
    )
