"""embedding_covariance laws + a hand-computed crafted case."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from master_airflow_spark import registry
from master_airflow_spark.operators.embeddings import embedding_covariance


def test_covariance_laws(spark, sf_dir):
    rows = embedding_covariance(spark, sf_dir).collect()
    registry.release_caches()
    n = rows[0].n_vectors
    assert all(r.n_vectors == n for r in rows)
    by_pair = {(r.d1, r.d2): r.cov for r in rows}
    dims = sorted({r.d1 for r in rows})
    assert len(rows) == len(dims) * (len(dims) + 1) // 2  # upper triangle
    for d in dims:
        assert by_pair[(d, d)] >= -1e-12  # variance is non-negative
    # Cauchy-Schwarz: |cov(a,b)| <= sqrt(var(a) var(b)) (+ rounding slack)
    for (d1, d2), c in by_pair.items():
        if d1 != d2:
            bound = math.sqrt(max(by_pair[(d1, d1)], 0.0) * max(by_pair[(d2, d2)], 0.0))
            assert abs(c) <= bound + 1e-9


def test_covariance_crafted(spark, tmp_path):
    # 3 vectors, dim 2: exact covariance is hand-computable.
    # x = (1, 2, 3): mean 2, var = ((1)+(0)+(1))/3 = 2/3
    # y = (2, 4, 6): cov(x, y) = 4/3, var(y) = 8/3
    vecs = [(0, [1.0, 2.0]), (1, [2.0, 4.0]), (2, [3.0, 6.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    path = str(tmp_path / "embeddings.parquet")
    df.write.parquet(path)
    out = {
        (r.d1, r.d2): r.cov
        for r in embedding_covariance(spark, str(tmp_path)).collect()
    }
    registry.release_caches()
    assert abs(out[(1, 1)] - 2 / 3) < 1e-9
    assert abs(out[(1, 2)] - 4 / 3) < 1e-9
    assert abs(out[(2, 2)] - 8 / 3) < 1e-9


def test_covariance_partition_invariance(spark, sf_dir):
    """The exact fixed-point merge must make the result independent of
    partitioning — the property that licenses hash-comparing it."""
    a = embedding_covariance(spark, sf_dir)
    rows_a = {(r.d1, r.d2): (r.n_vectors, r.cov) for r in a.collect()}
    registry.release_caches()
    # second run under a different shuffle width
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = embedding_covariance(spark, sf_dir)
        rows_b = {(r.d1, r.d2): (r.n_vectors, r.cov) for r in b.collect()}
        registry.release_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert rows_a == rows_b  # bitwise-identical doubles


def test_covariance_flush_path(spark, sf_dir, monkeypatch):
    """Lowering the int64 headroom forces mid-partition flushes; the
    DECIMAL merge must make the result identical to the unflushed
    run (the overflow-safety path must not change a single bit)."""
    from master_airflow_spark.operators import embeddings as emb

    base = {
        (r.d1, r.d2): (r.n_vectors, r.cov)
        for r in embedding_covariance(spark, sf_dir).collect()
    }
    registry.release_caches()
    # ~forces a flush every few rows: max|sv| ~ 4e5 -> step ~ 10^13/1.6e11 ~ 62
    monkeypatch.setattr(emb, "_COV_INT64_HEADROOM", 10**13)
    flushed = {
        (r.d1, r.d2): (r.n_vectors, r.cov)
        for r in embedding_covariance(spark, sf_dir).collect()
    }
    registry.release_caches()
    assert base == flushed


def test_covariance_single_row_overflow_guard(spark, sf_dir, monkeypatch):
    """When one scaled value squared exceeds the headroom, chunking
    cannot help (a single row's Gram cell already overflows) — the
    kernel must raise loudly instead of wrapping int64 silently
    (round-12 ADVICE)."""
    import pytest

    from master_airflow_spark.operators import embeddings as emb

    # sf embeddings have |v| up to ~0.5 -> b_max ~ 5e5 -> b_max^2 ~ 2.5e11
    monkeypatch.setattr(emb, "_COV_INT64_HEADROOM", 10**9)
    with pytest.raises(Exception) as ei:
        embedding_covariance(spark, sf_dir).collect()
    registry.release_caches()
    assert "int64 Gram headroom" in str(ei.value)
