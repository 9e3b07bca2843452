"""Retrieval-index operators (SURVEY.md §2.7 X30): tf-idf term
scoring, BM25-lite ranking, and inverted-posting-list construction
over the documents corpus. Tokenization is shared with text.py
(`tokens` / `_SQL_TOKS`) so every retrieval operator scores the exact
token stream the text-analysis suite produces.

Split out of text.py in round 5 (pure move; registrations, oracles,
and semantics unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.operators.text import _SQL_TOKS, tokens
from master_airflow_spark.registry import register

@register(
    "tfidf_top_terms",
    oracle=f"""
WITH tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents)
    GROUP BY doc_id, tok
),
df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tf)
       GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           (CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE))
               / CAST(df.df + 1 AS DOUBLE) AS score
    FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n
)
SELECT doc_id, tok, tf, df, score, rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, tok) AS rank
      FROM scored)
WHERE rank <= 3
""",
    tags=("X30", "X26", "X5", "X8"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by a tf-idf-style
    score. The idf factor is the RATIONAL form (N+1)/(df+1) rather
    than its logarithm: monotone per-term, so per-term rankings agree
    with log-idf wherever df ties, and — unlike ln() — every engine
    computes it bit-identically (two exact int adds, one multiply,
    one divide). Plan: token explode → repartition on doc_id — ONE
    corpus-sized exchange whose partitioning satisfies the (doc, tok)
    count, is reused by the df branch, AND satisfies the final per-doc
    window (groupBy (doc_id, tok) alone would hash on the pair and
    force the window to re-shuffle corpus-sized rows on doc_id) →
    broadcast the doc-frequency table (vocabulary-sized, not
    corpus-sized) back onto the tf rows → per-doc top-3 window.

    Exchange sizing (round-8 A/B, r7 verdict task #4): the round-7 pin
    forced repartition(defaultParallelism, doc_id); re-measured against
    an AQE-advisory repartition(doc_id) and against no repartition at
    sf0.1 and the x10 replica, the three sit inside the noise band at
    sf0.1 (0.72/0.77/0.65 min) while the AQE-sized exchange wins ~10%
    at x10 (0.87 vs 0.97/1.05) — and is the shape that stays right on
    a real cluster, where AQE coalesces to data volume instead of a
    pinned thread count. The r7 +24% regression was box noise: this
    round's bench runs sit at 0.64-0.73s, the r6 level."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens()).alias("tok")).repartition(
        F.col("doc_id")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (
                (F.col("tf").cast("double") * (F.col("n_docs") + 1).cast("double"))
                / (F.col("df") + 1).cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "tok", "tf", "df", "score", "rank")
    )


# bm25_lite query terms: common vocabulary of the synthetic corpus so
# every source contributes scored docs; k1/b are the standard defaults.
BM25_TERMS = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_sql() -> str:
    tf_cols = ",\n           ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ",\n           ".join(
        f"CAST(count_if(tf_{t} > 0) AS DOUBLE) AS df_{t}" for t in BM25_TERMS
    )
    score = " + ".join(
        f"(((n_docs - df_{t} + 0.5) / (df_{t} + 0.5)) * "
        f"(CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1}) / "
        f"(CAST(tf_{t} AS DOUBLE) + {BM25_K1} * "
        f"({1 - BM25_B} + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl))))"
        for t in BM25_TERMS
    )
    hits = " + ".join(f"CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END" for t in BM25_TERMS)
    return f"""
WITH t AS (
    SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
d AS (
    SELECT doc_id, len(toks) AS dl,
           {tf_cols}
    FROM t
),
c AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
           {df_cols}
    FROM d
)
SELECT doc_id, {score} AS bm25, {hits} AS n_terms_hit
FROM d, c
"""


@register("bm25_lite_ranking", oracle=_bm25_sql(), tags=("X30", "X26"))
def bm25_lite_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring of every document against a fixed query
    term set — the lexical-retrieval half of a retrieval/dedup stack
    (Robertson/Spärck Jones; the ranking function behind Lucene).
    'Lite' = the idf is the raw Robertson odds ratio
    (N − df + 0.5)/(df + 0.5) WITHOUT the log: log implementations
    differ in the last ulp across engines, while +,×,÷ are IEEE-exact,
    so this documented variant ranks identically to classic BM25 for a
    single-term match profile and hash-matches DuckDB bit-for-bit.
    Plan: one scan computes per-doc tf/dl; the corpus stats collapse
    to ONE row (broadcast cross join — nothing per-doc shuffles); the
    score is a pure column expression. At 100 TB this is scan-bound
    with a scalar side input, the shape query-scoring jobs need."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens().alias("toks"))
    d = t.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.expr(f"filter(toks, x -> x = '{term}')")).alias(f"tf_{term}")
            for term in BM25_TERMS
        ],
    )
    c = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.count_if(F.col(f"tf_{term}") > 0).cast("double").alias(f"df_{term}")
            for term in BM25_TERMS
        ],
    )
    def term_score(term: str):
        tf = F.col(f"tf_{term}").cast("double")
        df_ = F.col(f"df_{term}")
        idf = (F.col("n_docs") - df_ + F.lit(0.5)) / (df_ + F.lit(0.5))
        dl_norm = F.lit(1 - BM25_B) + F.lit(BM25_B) * (
            F.col("dl").cast("double") / F.col("avgdl")
        )
        return idf * (tf * F.lit(BM25_K1 + 1)) / (tf + F.lit(BM25_K1) * dl_norm)

    score = term_score(BM25_TERMS[0])
    for term in BM25_TERMS[1:]:
        score = score + term_score(term)
    hits = sum(
        (F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0) for t in BM25_TERMS[1:]),
        F.when(F.col(f"tf_{BM25_TERMS[0]}") > 0, 1).otherwise(0),
    )
    return d.join(F.broadcast(c)).select(
        "doc_id", score.alias("bm25"), hits.cast("int").alias("n_terms_hit")
    )


@register(
    "inverted_index_postings",
    oracle=f"""
WITH tok AS (
    SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
)
SELECT term,
       count(*) AS doc_freq,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM tok
GROUP BY term
HAVING count(*) >= 3
""",
    tags=("X30", "X26", "X5"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the retrieval-side core of a corpus
    pipeline (term → sorted posting list + document frequency; df≥3
    drops the hapax tail that bloats the index without aiding
    retrieval). One distinct on (doc_id, term) then one hash aggregate
    keyed by term: at 100 TB both shuffles key on the term hash, the
    Zipf head is exactly the salted-hot-key situation AQE's skew
    handling splits, and posting lists ship as strings (a real
    deployment writes array<bigint> parquet; the CSV form here is the
    oracle-comparable serialization). collect_list is
    partition-order-dependent → array_sort makes it deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("term")).distinct()
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("doc_freq") >= 3)
    )
