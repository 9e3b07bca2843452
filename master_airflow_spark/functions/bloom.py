"""Explicit Bloom filter as column expressions — runtime join/anti-join
pruning for shuffle-sized joins.

Spark ships this idea natively (``spark.sql.optimizer.runtime.bloomFilter.
enabled`` injects a BloomFilterAggregate + might-contain pair around
shuffle joins); this module is the same optimization expressed as
first-class, testable operators: build a bitmap from the small/filtered
side's keys, collapse it to a plan literal, and pre-filter the big side
with pure integer bit arithmetic BEFORE its shuffle. Because a Bloom
filter never produces false negatives, the downstream EXACT join sees a
superset of the matching rows and the query result is unchanged — which
is what lets every bloom-pruned operator keep a plain-SQL oracle.

Scale posture: the bitmap is bounded-size (8 KiB floor, sized at
~BITS_PER_KEY bits per build key, 128 KiB cap) regardless of input
size, built by one hash-keyed aggregate over the build side and
shipped inside the plan like any literal — the classic "semi-join
reduction" of distributed query processing. The build side
is scanned once extra (key column only — column pruning keeps it
narrow); the probe side's shuffle shrinks by the filter's selectivity.
At local test SFs a broadcast join would subsume this; the operators
that use it force the shuffle-join path deliberately, because the 100 TB
shape (both sides over the broadcast threshold) is what they model.

Bit layout: position p = xxhash64(key, i) mod M_BITS for probe
i = 0..K_HASHES-1; word p >> 6, mask 1 << (p & 63). xxhash64 is fine
here (unlike judged fingerprints) because the bitmap never reaches the
output or the oracle — only the exact join's result does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 16  # 8 KiB bitmap floor — fpp < 1e-3 at k=5 up to ~2.4k build
#   keys; at ~6k keys (10.9 bits/key) the standard formula gives ≈6.6e-3 —
#   still plenty selective, and adaptive sizing below kicks in past the floor
M_BITS_CAP = 1 << 20  # 128 KiB plan-literal ceiling (16384-long array)
BITS_PER_KEY = 16  # sizing target: ~16 bits/key at k=5 → fpp ≈ 1.4e-3
K_HASHES = 5


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(
    df: DataFrame, key: Column | str, m_bits: int | None = None, k: int = K_HASHES
) -> list[int]:
    """Aggregate the build side's keys into a Bloom bitmap and return
    it as a Python list of ``m_bits / 64`` longs (driver-side, BOUNDED:
    the collect is ≤ m_bits/64 rows — ≤16384 at the cap — no matter
    how many build rows exist; same bounded-collect contract as the
    similarity query matrices). One explode (k rows per key) + one
    word-keyed bit_or aggregate; the build side is never shuffled
    whole, only its k×keys positions are.

    When ``m_bits`` is not given, the bitmap is sized from a ROW count
    of the build side (one extra narrow-column agg job — at cluster
    scale piggyback a cached/approx count instead): next power of two ≥
    BITS_PER_KEY×n, floored at M_BITS (8 KiB) and capped at M_BITS_CAP
    (128 KiB plan literal). Row count is a deliberate conservative
    upper bound on DISTINCT keys: a build side with duplicated keys
    oversizes the bitmap toward the cap (never incorrect — the real
    fpp is then BETTER than the ~16-bits/key estimate, at the cost of
    a larger plan literal; swap in approx_count_distinct here if
    literal size ever matters more than the extra pass). A FIXED bitmap degrades quietly as the
    build side grows (25k keys in 8 KiB ≈ 40% fpp ⇒ barely any
    pruning); adaptive sizing keeps fpp ~1e-3 across the probe curve
    until the cap, where selectivity degrades gracefully."""
    key_c = F.col(key) if isinstance(key, str) else key
    if m_bits is None:
        n_keys = df.select(key_c.alias("k")).count()
        m_bits = M_BITS
        while m_bits < min(M_BITS_CAP, BITS_PER_KEY * n_keys):
            m_bits *= 2
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(key_c, m_bits, k))).alias("p")
    agg = (
        df.select(pos)
        .select(
            F.shiftright(F.col("p"), 6).alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in agg:
        words[r["word"]] = r["bits"]
    return words


def _words_literal(words: list[int]) -> Column:
    """The bitmap as an array<bigint> plan literal, built via ONE SQL
    expr parse. ``F.lit(list)`` would convert the list element-by-
    element over the py4j gateway (~1 ms/element — seconds for a 16k-
    word bitmap); a single parsed string is JVM-side and constant-folds
    to the same ArrayData literal."""
    parts = [
        # -2^63 can't be written as a literal token (the parser reads
        # the unsigned magnitude first, which overflows BIGINT)
        "(-9223372036854775807L - 1L)" if w == -(1 << 63) else f"{w}L"
        for w in words
    ]
    return F.expr("array(" + ",".join(parts) + ")")


def bloom_might_contain(
    words: list[int], key: Column | str, m_bits: int | None = None, k: int = K_HASHES
) -> Column:
    """Membership predicate against a built bitmap: true iff all k bits
    are set (no false negatives; false positives bounded by the
    standard (1-e^{-kn/m})^k). The bitmap rides in the plan as an array
    literal (8-128 KiB), so the test is pure WholeStageCodegen integer
    arithmetic on the probe side — no join, no shuffle, no Python.
    ``m_bits`` defaults to the bitmap's own geometry (len(words)×64),
    so probe and build agree whatever size bloom_build chose."""
    key_c = F.col(key) if isinstance(key, str) else key
    if m_bits is None:
        m_bits = len(words) * 64
    arr = _words_literal(words)
    cond = F.lit(True)
    for p in _positions(key_c, m_bits, k):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond
