"""Deduplication operators.

Reference parity: W4's keyed last-write-wins upsert — the MinIO sink
names each object ``date + station`` so re-runs overwrite
(dags/get_prices_load_minio.py:80) — plus the LLM-data-pipeline dedup
suite (SURVEY.md §2.7 X22-X24): exact content-hash dedup, MinHash-LSH
near-dup, SimHash, and n-gram Jaccard verification.

Scale posture: every dedup here is a keyed shuffle (groupBy / window
over the dedup key) — the key is chosen so the shuffle is on a
high-cardinality hash (uniform, no skew). MinHash banding turns the
O(n²) all-pairs problem into an equi-join on band signatures, which
Spark executes as a shuffled hash join; candidate verification runs
only within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register


@register(
    "keyed_upsert_latest",
    oracle="""
SELECT user_id, event_type, ts, event_id, value
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts DESC, event_id DESC) = 1
""",
    tags=("W4", "X8", "X22"),
)
def keyed_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: last-write-wins upsert on a composite natural key — batch
    form of the MinIO object-key overwrite. One row per
    (user_id, event_type): the latest by (ts, event_id)."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "event_id", "value")
    )


@register(
    "dedup_exact",
    oracle="""
SELECT sha256(text) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""",
    tags=("X23",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: exact dedup by content hash — ``sha2(text, 256)`` group-by,
    keeping the smallest doc_id per hash. At 100 TB the 32-byte hash
    (not the document body) is the shuffle key and the map-side partial
    aggregation collapses duplicates before the exchange."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection (X24) — deterministic, pure
# DataFrame ops, no pyspark.ml dependency (ml's MinHashLSH seeds its
# hash family via JVM RNG; re-implementing with explicit mixed hashes
# keeps signatures reproducible across runs and engines).
# --------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4  # 4 rows per band; P(candidate) = 1-(1-s^4)^4


def shingles(text_col: str, k: int = 5) -> Column:
    """Word-k-gram shingle array (string form — used where the actual
    shingle sets are needed, e.g. exact Jaccard verification)."""
    toks = F.split(F.trim(F.regexp_replace(text_col, r"\s+", " ")), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingle_hashes(text_col: str, k: int = 5) -> Column:
    """64-bit hash per word-k-gram, built without materializing shingle
    strings: hash each token once, then combine k consecutive token
    hashes with one multi-arg integer hash. Identical token sequences
    → identical hash sequences (what MinHash needs); cost is one
    string hash per TOKEN plus integer ops — not one ~30-char string
    build + hash per SHINGLE."""
    toks = F.split(F.trim(F.regexp_replace(text_col, r"\s+", " ")), " ")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    combine = lambda i: F.xxhash64(  # noqa: E731
        *[F.element_at(th, i + j + 1) for j in range(k)]
    )
    return F.when(n >= k, F.transform(idx, combine)).otherwise(
        F.array(F.xxhash64(F.concat_ws(" ", toks)))
    )


def minhash_signature(hash_col: Column) -> Column:
    """N_HASHES-wide MinHash signature over pre-hashed shingles: lane i
    re-mixes each 8-byte shingle hash with the lane id (integer hash)
    and takes the min. Deterministic, seedless; identical documents →
    identical signatures (pinned by the semantic tests)."""
    return F.array(
        *[
            F.array_min(F.transform(hash_col, lambda h, i=i: F.xxhash64(h, F.lit(i))))
            for i in range(N_HASHES)
        ]
    )


def with_bands(df: DataFrame, sig: str = "sig") -> DataFrame:
    """Explode the signature into (band_id, band_hash) rows — the LSH
    bucket key. Equal band_hash within a band ⇒ candidate pair."""
    rows_per_band = N_HASHES // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(sig)[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    return df.withColumn("band", F.explode(bands)).select(
        *df.columns, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )


def minhash_signatures_exploded(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, sig) via the shuffle-based shingling pipeline — the
    shape that scales: posexplode tokens → ONE string hash per token →
    k-gram shingle hash from k consecutive token hashes (lead() over a
    per-doc window; trailing partials padded with sentinels) → per-lane
    MIN as a hash aggregate with map-side partial combine. One shuffle
    keyed on doc_id (window + groupBy share it); only 8-byte hashes
    cross the wire, never text. Avoids the array-lambda trap where an
    outer array expression referenced inside transform() re-evaluates
    per element (quadratic in document length)."""
    toks = F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    tok_rows = docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    h = tok_rows.select("doc_id", "pos", F.xxhash64("tok").alias("h0"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    for j in range(1, k):
        h = h.withColumn(f"h{j}", F.coalesce(F.lead("h0", j).over(w), F.lit(-j)))
    sh = h.select(
        "doc_id", F.xxhash64(*[f"h{j}" for j in range(k)]).alias("sh")
    )
    lanes = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("sh", F.lit(i))).alias(f"m{i}")
            for i in range(N_HASHES)
        ]
    )
    return lanes.select(
        "doc_id", F.array(*[f"m{i}" for i in range(N_HASHES)]).alias("sig")
    )


@register("minhash_near_dup", oracle=None, tags=("X24",))
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: MinHash-LSH near-duplicate candidate pairs, verified by
    exact signature-overlap estimate. Pipeline: shingle → 16-hash
    MinHash signature → 4 LSH bands → self-join on (band_id,
    band_hash) → estimated Jaccard = matching signature positions / 16,
    thresholded at 0.5. Deterministic (xxhash64 lane mixing); no
    oracle — DuckDB can't express the hash family (rows-only check).

    Scale: the self-join key (band_id, band_hash) is uniform by
    construction; no document body crosses the shuffle — only doc_id +
    16×int64 signature."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signatures_exploded(docs)
    # persist: the banded signatures feed BOTH sides of the self-join —
    # without it the signature pipeline runs twice.
    banded = with_bands(sigs).persist()
    left = banded.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("a_sig"), "band_id", "band_hash"
    )
    right = banded.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig"), "band_id", "band_hash"
    )
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .dropDuplicates(["a_id", "b_id"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("a_sig", "b_sig", lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.lit(N_HASHES)
    )
    return (
        pairs.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= 0.5)
        .select("a_id", "b_id", "est_jaccard")
    )


@register("simhash_near_dup", oracle=None, tags=("X24",))
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: SimHash near-dup candidate pairs via the banding trick on
    the 64-bit fingerprint: split into 4×16-bit bands; two docs within
    Hamming distance 3 must share at least one full band (pigeonhole),
    so the self-join on (band_id, band_value) finds every such pair;
    exact Hamming distance then filters candidates. Same scale shape
    as MinHash banding — only (doc_id, fingerprint) crosses the
    shuffle."""
    fp = simhash_fingerprint(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_value"),
            )
            for b in range(4)
        ]
    )
    banded = fp.withColumn("band", F.explode(bands)).select(
        "doc_id",
        "simhash",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_value").alias("band_value"),
    ).persist()
    left = banded.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_fp"), "band_id", "band_value"
    )
    right = banded.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_fp"), "band_id", "band_value"
    )
    pairs = (
        left.join(right, ["band_id", "band_value"])
        .where(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    hamming = F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= 3)
        .select("a_id", "b_id", "hamming")
    )


_SIMHASH_BITS = 60

_SIMHASH_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
    FROM (SELECT doc_id,
                 unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS tok
          FROM documents)
), sums AS (
    SELECT doc_id,
           {", ".join(f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(_SIMHASH_BITS))}
    FROM toks GROUP BY doc_id
)
SELECT doc_id,
       {" + ".join(f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END" for b in range(_SIMHASH_BITS))}
           AS simhash
FROM sums
"""


@register("simhash_fingerprint", oracle=_SIMHASH_ORACLE, tags=("X24",))
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: 60-bit SimHash per document — sign-sum of token-hash bits,
    computed entirely with built-in array/bitwise expressions (no UDF):
    explode tokens → portable md5-derived hash → per-bit ±1
    contributions → sign. 60 bits (one md5 15-hex-char parse) keeps the
    hash engine-portable, so the fingerprint values themselves are
    oracle-checked; near-dup = small Hamming distance between
    fingerprints. The per-bit sums are map-side combinable longs — one
    shuffle on doc_id at any scale."""
    from master_airflow_spark.functions.hashing import portable_hash60

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")).alias("tok"),
    ).withColumn("h", portable_hash60("tok"))
    # bit b of h as ±1: shiftright then &1 → {0,1} → 2x-1
    contribs = toks.select(
        "doc_id",
        *[
            (F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{b}")
            for b in range(_SIMHASH_BITS)
        ],
    )
    sums = contribs.groupBy("doc_id").agg(
        *[F.sum(f"b{b}").alias(f"b{b}") for b in range(_SIMHASH_BITS)]
    )
    fp = sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(0)
                for b in range(_SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return fp
