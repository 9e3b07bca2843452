"""Property-based tests (SURVEY.md §5.4) over the engine's core laws.

Hypothesis drives small random batches through the same code paths the
judged queries use; examples are bounded so each property stays a few
Spark jobs. deadline=None: JVM scheduling jitter is not a failure."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from master_airflow_spark.sinks.writers import latest_per_key

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=0, max_value=50),    # seq
        st.integers(min_value=-3, max_value=3),    # payload
    ),
    min_size=1,
    max_size=30,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_latest_per_key_laws(spark, rows):
    """One row per key; the surviving row carries the max (seq, payload)
    of its key; applying the dedup twice equals applying it once."""
    df = spark.createDataFrame(rows, "key string, seq int, payload int")
    out = latest_per_key(df, ["key"], ["seq", "payload"])
    got = {r.key: (r.seq, r.payload) for r in out.collect()}
    expect = {}
    for k, s, p in rows:
        expect[k] = max(expect.get(k, (s, p)), (s, p))
    assert got == expect
    again = latest_per_key(out, ["key"], ["seq", "payload"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


@given(
    values=st.lists(
        st.decimals(
            min_value=-10**6, max_value=10**6, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=40,
    ),
    n_parts=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_decimal_sum_partition_invariant(spark, values, n_parts):
    """The engine's hash-stability cornerstone: decimal-cast sums are
    identical no matter how rows are partitioned (double sums aren't —
    that's why functions/exact.py exists)."""
    from master_airflow_spark.functions.exact import dsum

    floats = [(float(v),) for v in values]
    a = (
        spark.createDataFrame(floats, "v double")
        .repartition(1)
        .agg(dsum("v", "s"))
        .collect()[0]
        .s
    )
    b = (
        spark.createDataFrame(floats, "v double")
        .repartition(n_parts)
        .agg(dsum("v", "s"))
        .collect()[0]
        .s
    )
    assert a == b  # bitwise equality, not approx


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_stable_under_duplication(spark, texts):
    """Duplicating the input never changes the dedup'd key set, and
    n_copies doubles exactly."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = (
        df.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    doubled = (
        df.unionByName(df)
        .groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m_once = dict(map(tuple, once.collect()))
    m_double = dict(map(tuple, doubled.collect()))
    assert set(m_once) == set(m_double)
    assert all(m_double[h] == 2 * m_once[h] for h in m_once)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),       # day bucket
            st.floats(min_value=0.01, max_value=1e6,     # price
                      allow_nan=False, allow_infinity=False),
            st.integers(min_value=1, max_value=1000),    # orderkey
            st.integers(min_value=1, max_value=7),       # linenumber
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_top1_argmax_equals_sort_limit(spark, rows):
    """The single-scan max(struct) argmax (operators/topk._high_low)
    must pick exactly the row the reference's ORDER BY ... LIMIT 1
    formulation picks, including the date scoping and both tiebreaker
    directions."""
    import datetime

    from master_airflow_spark.operators.topk import _high_low

    df = spark.createDataFrame(
        [
            (datetime.datetime(1997, 1, 1) + datetime.timedelta(days=d), p, ok, ln)
            for d, p, ok, ln in rows
        ],
        "l_shipdate timestamp, l_extendedprice double, l_orderkey long, l_linenumber int",
    )
    for with_date in (False, True):
        got = {r.which: (r.price, r.l_orderkey, r.l_linenumber)
               for r in _high_low(df, with_date=with_date).collect()}
        pool = rows
        if with_date:
            latest = max(d for d, *_ in rows)
            pool = [r for r in rows if r[0] == latest]
        hi = min(pool, key=lambda r: (-r[1], r[2], r[3]))
        lo = min(pool, key=lambda r: (r[1], r[2], r[3]))
        assert got["highest"] == (hi[1], hi[2], hi[3])
        assert got["lowest"] == (lo[1], lo[2], lo[3])


@given(
    logs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # user_id
            st.integers(min_value=0, max_value=40),   # minute offset
            st.sampled_from(["A", "B", "C"]),         # state
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),  # one event per (user, ts)
    )
)
@settings(**SETTINGS)
def test_scd2_reconstruction_law(spark, logs):
    """SCD2 round-trip: replaying each ORIGINAL event's timestamp
    against the built history (the interval containing it) must return
    that event's state — history construction loses no information
    beyond duplicate-state collapse. Plus structural laws: per user,
    versions are dense from 1, intervals chain, exactly one current."""
    from master_airflow_spark.operators.window import scd2_history_build

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=m), u, s, 0.0, "{}")
        for i, (u, m, s) in enumerate(sorted(logs))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        hist = scd2_history_build(spark, d).collect()

    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    for u, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(1 for r in ivs if r.is_current) == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.status != b.status, "consecutive versions must differ"
    # replay: every original event falls in an interval with its state
    for _, ts, u, s, _, _ in rows:
        (match,) = [
            r
            for r in by_user[u]
            if r.valid_from <= ts and (r.valid_to is None or ts < r.valid_to)
        ]
        assert match.status == s


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["the", "cat", "sat", "on", "mat", "a", "dog"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_quality_logit_bounds_and_determinism(spark, texts):
    """Classifier outputs are well-defined for any nonempty token
    stream: features in their ranges, keep == (logit >= 0), and the
    score is a pure function of the text (same text → same logit)."""
    from master_airflow_spark.operators.corpus_quality import quality_logit_score

    import tempfile

    df = spark.createDataFrame(
        [(i, t, "en", "prop", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = quality_logit_score(spark, d).collect()
    by_id = {r.doc_id: r for r in rows}
    logit_by_text: dict[str, float] = {}
    for i, t in enumerate(texts):
        r = by_id[i]
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 < r.type_token_ratio <= 1.0
        assert r.keep == (r.logit >= 0.0)
        if t in logit_by_text:
            assert logit_by_text[t] == r.logit
        logit_by_text[t] = r.logit


@given(
    vals=st.lists(
        st.decimals(
            min_value=-99_999_999_999,
            max_value=99_999_999_999,
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_scaled_long_sum_cross_engine_bit_parity(spark, vals, n_parts):
    """functions/exact.py's scaled-long fast path: Spark's
    CAST(SUM(long) AS DOUBLE)/scale must be bit-identical to the DuckDB
    twin, which sums BIGINT into HUGEINT and routes through
    VARCHAR->strtod. Magnitudes reach ~1e11 with 2 decimals, so ~1e4
    scaled values and 60-element lists push sums past 2^53 — the regime
    where the conversion rounds and naive hugeint->double double-
    rounding would diverge. Partition count varies so the long sum's
    combine order provably cannot matter."""
    import duckdb

    from master_airflow_spark.functions.exact import (
        cents,
        lsum_money,
        sql_cents,
        sql_lsum_money,
    )

    floats = [float(v) for v in vals]
    df = spark.createDataFrame(
        [(v,) for v in floats], "x double"
    ).repartition(n_parts)
    got = df.agg(
        lsum_money(cents("x") * (F.lit(100) - cents(F.lit(0.05))), 2, "s")
    ).first()["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in floats])
    scaled = sql_cents("x") + " * (100 - " + sql_cents("0.05") + ")"
    want = con.execute(
        "SELECT " + sql_lsum_money(scaled, 2) + " AS s FROM t"
    ).fetchone()[0]
    assert got == want, (got, want, got.hex(), want.hex())


def test_scaled_long_overflow_guard_fires_and_stays_silent(spark):
    """lsum_money's per-group overflow guard (functions/exact.py):
    SUM(BIGINT) wraps silently in non-ANSI Spark while the DuckDB
    oracle promotes to HUGEINT, so a group past the ~2^63 bound would
    diverge quietly — the guard turns that into a loud runtime error.
    Three laws: (a) a group whose count*max|x| reaches 2^62 raises;
    (b) in-bound groups are value-identical to an unguarded sum even
    when sharing a frame with NULLs; (c) all-NULL groups don't trip
    the assert (COALESCE leg)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from master_airflow_spark.functions.exact import lsum_money

    # (a) two rows of 2^61 scaled units: count*max = 2^62 ⇒ raise.
    big = spark.createDataFrame([(1, 1 << 61), (1, 1 << 61)], "g int, s long")
    with pytest.raises(SparkRuntimeException, match="overflow guard"):
        big.groupBy("g").agg(lsum_money(F.col("s"), 1, "v")).collect()

    # (b)+(c) mixed frame: normal group, NULL-bearing group, all-NULL group.
    rows = [(1, 123), (1, 477), (2, None), (2, 50), (3, None)]
    df = spark.createDataFrame(rows, "g int, s long").repartition(3)
    got = {
        r["g"]: r["v"]
        for r in df.groupBy("g").agg(lsum_money(F.col("s"), 1, "v")).collect()
    }
    assert got == {1: 6.0, 2: 0.5, 3: None}

    # (c) extended to the sibling kernels (r9 review pass): the
    # all-NULL group must stay NULL — never 0, never an assert trip —
    # through lavg_money's division and lsum_scaled's long partials.
    from master_airflow_spark.functions.exact import lavg_money, lsum_scaled

    avgs = {
        r["g"]: r["v"]
        for r in df.groupBy("g").agg(lavg_money(F.col("s"), 1, "v")).collect()
    }
    assert avgs == {1: 3.0, 2: 0.5, 3: None}
    partials = {
        r["g"]: r["v"]
        for r in df.groupBy("g").agg(lsum_scaled(F.col("s"), "v")).collect()
    }
    assert partials == {1: 600, 2: 50, 3: None}
