"""Learned byte-pair-encoding (BPE) subword tokenizer — trained ON the
corpus, distributed (X26 / LLM-pipeline surface; round 15).

The brief's minimum token-counting surface (whitespace + a BPE-ish
regex, text.py:token_count_bpe) counts FIXED segmentations; a real
training-data pipeline also needs the LEARNED kind: fit a BPE merge
table to the corpus, then tokenize with it (data budgeting, dedup at
subword granularity, tokenizer drift checks between corpus snapshots).
Reference algorithm: Sennrich et al., ACL'16, "Neural Machine
Translation of Rare Words with Subword Units" — merge learning over a
word-frequency table, not raw text.

100 TB decomposition (the same train-bounded / apply-distributed split
every quantizer in this repo uses — similarity._quantizer_sample's
recipe):

1. WORD-FREQUENCY COUNT — the only corpus-scale stage: pre-tokenize
   (lower-cased letter runs / digit runs / punctuation singletons)
   and ``groupBy(word).count()``. One shuffle, map-side partial
   aggregation, output bounded by VOCABULARY not corpus rows.
2. MERGE LEARNING on the top-MAX_WORD_TYPES types by (count desc,
   word asc) — a deterministic, bounded table (driver cost
   O(types · word_len), corpus-size-independent). Counts are EXACT
   corpus-wide counts; capping the tail types is the standard
   approximation every production BPE trainer makes (frequency-sorted
   vocabulary seeding), and on this corpus the cap is far above the
   true vocabulary, so it is exact here.
3. APPLY — one streaming Arrow kernel pass over documents with the
   merge list on the broadcast plan; per-batch word-level memoization
   (vocabularies repeat; each distinct word is merged once per batch,
   not once per occurrence). No shuffle at all: the output is
   per-doc stats.

Certification: the merge LOOP is iterative (not SQL-expressible), so
`bpe_train_merges` / `bpe_tokenize_stats` are rows-only; the anchor
`bpe_tokenize_zero_merges` routes the SAME kernel with an empty merge
list, where tokenization provably degenerates to the character count
of the pre-token stream — an exact DuckDB oracle
(house anchor pattern: ivf/pq/ivfpq_*_exhaustive). On top of that,
tests/test_bpe.py pins the Spark merge table EXACTLY equal to an
independent pure-Python reference implementation on the same corpus,
and pins apply-side invariants (merge count monotonicity, zero-merge
degeneration, idempotent re-tokenization).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.registry import register, track_broadcast

# Pre-tokenizer shared by the trainer, the apply kernel, and the
# DuckDB anchor oracle — ONE pattern string, three readers (Python
# re, Spark's Java regex, DuckDB's RE2). The whitespace set is
# spelled as explicit ASCII escapes because the shorthand classes
# diverge across those engines: \s is Unicode in Python but ASCII in
# Java/RE2 (U+00A0 would tokenize differently), and \v is a vertical-
# whitespace CLASS in Java 8+ but a single VT char in Python/RE2.
# \x0b/\x0c (VT/FF) parse identically everywhere. Cross-engine
# agreement on non-ASCII fixtures is pinned in tests/test_bpe.py.
PRETOKEN_PAT = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\x0b\x0c]"
N_MERGES = 48
MAX_WORD_TYPES = 20_000

_PRETOKEN_RE = re.compile(PRETOKEN_PAT)


def _pretokenize(text: str) -> list[str]:
    """lower() then PRETOKEN_PAT, identical to the SQL
    regexp_extract_all(lower(text), ...) the anchor oracle runs."""
    return _PRETOKEN_RE.findall(text.lower())


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge all non-overlapping left-to-right occurrences of pair."""
    left, right = pair
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_merges(
    word_counts: list[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Sennrich merge learning over a (word, count) table: each round
    counts adjacent symbol pairs weighted by word count, takes the max
    by (freq desc, pair asc) — a TOTAL order, so the merge sequence is
    deterministic — applies it to every word, and records it. Stops
    early when the best pair's frequency drops below 2 (merging a
    pair seen once learns noise). Pure function of its input: the
    pytest reference equality and the Spark trainer both call exactly
    this, so what the test pins is the INPUT pipeline (distributed
    count, cap rule) plus this shared kernel."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for symbols, c in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + c
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair, freq = best[0], best[1]
        vocab = {
            _merge_word(symbols, pair): c for symbols, c in vocab.items()
        }
        merges.append((pair[0], pair[1], freq))
    return merges


def _word_counts(spark: SparkSession, sf_dir: str) -> list[tuple[str, int]]:
    """The distributed corpus-scale stage + deterministic cap: exact
    word-type counts via one groupBy shuffle, then the top
    MAX_WORD_TYPES types by (count desc, word asc). The collect is
    bounded by the cap, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    rows = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(PRETOKEN_PAT), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(MAX_WORD_TYPES)
        .collect()
    )
    return [(r.word, r.cnt) for r in rows]


@register("bpe_train_merges", oracle=None, tags=("X26", "llm"))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (rank, left, right, merged, freq) for
    the first N_MERGES merges on the documents corpus. Rows-only by
    design (the merge loop is iterative); tests/test_bpe.py pins the
    table EXACTLY equal to an independent pure-Python reference on
    the same corpus, and the apply side is anchored by
    bpe_tokenize_zero_merges' exact oracle."""
    merges = learn_merges(_word_counts(spark, sf_dir))
    return spark.createDataFrame(
        [
            (rank, left, right, left + right, int(freq))
            for rank, (left, right, freq) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, freq long",
    )


def _tokenize_stats(
    spark: SparkSession, sf_dir: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Shared apply pipeline: one streaming Arrow kernel over
    documents; the merge list rides the broadcast plan (tiny —
    ≤ N_MERGES string pairs); per-batch word memoization. Emits per
    doc: pre-token count, initial symbol (char) count, and the token
    count after applying the merges in learned order."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    bc = track_broadcast(spark.sparkContext.broadcast(tuple(merges)))

    def run(batches):
        ms = bc.value
        cache: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = cache.get(w)
            if n is None:
                symbols: tuple[str, ...] = tuple(w)
                for pair in ms:
                    symbols = _merge_word(symbols, pair)
                n = len(symbols)
                cache[w] = n
            return n

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = _pretokenize(text)
                rows.append(
                    (
                        doc_id,
                        len(toks),
                        sum(len(t) for t in toks),
                        sum(word_tokens(t) for t in toks),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_word_tokens", "n_symbols", "n_tokens_bpe"],
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, n_word_tokens long, n_symbols long, n_tokens_bpe long"
    )


@register("bpe_tokenize_stats", oracle=None, tags=("X26", "llm"))
def bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the merges LEARNED FROM IT — per doc
    the pre-token count, the initial character-symbol count, and the
    BPE token count (always between the other two). Rows-only (the
    learned merges make it non-SQL); the same kernel is exactly
    certified by bpe_tokenize_zero_merges, and test_bpe.py pins the
    count sandwich + idempotence invariants."""
    merges = [(l, r) for l, r, _ in learn_merges(_word_counts(spark, sf_dir))]
    return _tokenize_stats(spark, sf_dir, merges)


@register(
    "bpe_tokenize_zero_merges",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{PRETOKEN_PAT}')) AS BIGINT)
           AS n_word_tokens,
       CAST(COALESCE(list_sum(list_transform(
                regexp_extract_all(lower(text), '{PRETOKEN_PAT}'),
                t -> len(t))), 0) AS BIGINT) AS n_symbols,
       CAST(COALESCE(list_sum(list_transform(
                regexp_extract_all(lower(text), '{PRETOKEN_PAT}'),
                t -> len(t))), 0) AS BIGINT) AS n_tokens_bpe
FROM documents
""",
    tags=("X26", "llm"),
)
def bpe_tokenize_zero_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply kernel with an EMPTY merge list: every word stays
    fully character-split, so n_tokens_bpe provably equals n_symbols
    — the per-doc character count of the pre-token stream, which the
    DuckDB oracle states directly. Certifies the pre-tokenizer, the
    kernel plumbing, and the count aggregation under the driver's
    hash-diff while the learned-merge configurations stay rows-only
    (house anchor pattern)."""
    return _tokenize_stats(spark, sf_dir, [])
