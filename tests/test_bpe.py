"""Learned-BPE trainer/apply semantics (no SQL oracle exists for the
iterative merge loop — these pin what the rows-only check can't)."""

from __future__ import annotations

import re
from collections import Counter

from master_airflow_spark.operators.bpe import (
    MAX_WORD_TYPES,
    N_MERGES,
    PRETOKEN_PAT,
    _merge_word,
    bpe_tokenize_stats,
    bpe_tokenize_zero_merges,
    bpe_train_merges,
    learn_merges,
)

SFD = "/root/testdata/sf0.01"


def _reference_merges(texts: list[str]) -> list[tuple[str, str, int]]:
    """Independent end-to-end reference: pure-Python pre-tokenize +
    count + cap + Sennrich loop over the raw corpus — NO Spark in the
    pipeline, so it cross-checks the distributed count/cap stages
    (learn_merges itself is shared by design; see its docstring)."""
    counts = Counter()
    for t in texts:
        counts.update(re.findall(PRETOKEN_PAT, t.lower()))
    capped = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORD_TYPES]
    return learn_merges(capped, N_MERGES)


def test_trainer_equals_pure_python_reference(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SFD}/documents.parquet")
        .select("text")
        .collect()
    ]
    expected = _reference_merges(texts)
    got = [
        (r.left, r.right, r.freq)
        for r in bpe_train_merges(spark, SFD).orderBy("rank").collect()
    ]
    assert got == expected
    assert len(got) > 10  # the corpus genuinely supports many merges


def test_merge_word_non_overlapping_left_to_right():
    assert _merge_word(tuple("aaa"), ("a", "a")) == ("aa", "a")
    assert _merge_word(tuple("abab"), ("a", "b")) == ("ab", "ab")
    assert _merge_word(tuple("xyz"), ("a", "b")) == ("x", "y", "z")


def test_learn_merges_deterministic_tiebreak():
    # two pairs tie at freq 2: ('a','b') from "ab"x2 and ('c','d')
    # from "cd"x2 — the (freq desc, pair asc) order must pick (a,b)
    merges = learn_merges([("ab", 2), ("cd", 2)], n_merges=1)
    assert merges == [("a", "b", 2)]


def test_learn_merges_stops_below_freq_2():
    # every pair occurs once: nothing to learn
    assert learn_merges([("abc", 1), ("def", 1)], n_merges=10) == []


def test_token_count_sandwich_and_zero_merge_degeneration(spark):
    stats = {r.doc_id: r for r in bpe_tokenize_stats(spark, SFD).collect()}
    zero = {r.doc_id: r for r in bpe_tokenize_zero_merges(spark, SFD).collect()}
    assert stats.keys() == zero.keys()
    compressed = 0
    for doc_id, r in stats.items():
        z = zero[doc_id]
        # zero merges: token count IS the char-symbol count
        assert z.n_tokens_bpe == z.n_symbols
        # same pre-tokenizer both ways
        assert (r.n_word_tokens, r.n_symbols) == (z.n_word_tokens, z.n_symbols)
        # learned merges can only shrink, never below one token per word
        assert r.n_word_tokens <= r.n_tokens_bpe <= r.n_symbols
        compressed += r.n_tokens_bpe < r.n_symbols
    # the merges actually fire on most documents
    assert compressed > len(stats) * 0.9


def test_pretoken_pat_agrees_across_all_three_engines(spark):
    """PRETOKEN_PAT is one string read by three regex engines (Python
    re, Spark's Java regex, DuckDB's RE2), so its character classes
    must be spelled in the dialect-free subset: \\s is Unicode in
    Python but ASCII in Java/RE2, and \\v is a vertical-whitespace
    CLASS in Java 8+ — either would silently split the certified
    zero-merge anchor from its oracle on non-ASCII corpora. Fixture
    covers NBSP (U+00A0), LINE SEPARATOR (U+2028), VT/FF, and plain
    ASCII."""
    import duckdb

    from master_airflow_spark.operators.bpe import _pretokenize

    s = "a b c\x0bd e f G7! \f tail"
    py = _pretokenize(s)
    duck = duckdb.connect().execute(
        "SELECT regexp_extract_all(lower(?), ?)", [s, PRETOKEN_PAT]
    ).fetchone()[0]
    assert py == duck, f"python {py!r} != duckdb {duck!r}"
    jvm = (
        spark.sql(
            "SELECT regexp_extract_all(lower(t), p, 0) AS toks "
            "FROM VALUES (:s) AS v(t) CROSS JOIN (SELECT :p AS p)",
            {"s": s, "p": PRETOKEN_PAT},
        )
        .collect()[0]
        .toks
    )
    assert py == jvm, f"python {py!r} != spark {jvm!r}"
