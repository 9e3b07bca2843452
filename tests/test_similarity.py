"""ANN quality gates: approximate paths must track the exact ground
truth (cosine_topk) within pinned recall bounds at sf0.001."""

from __future__ import annotations

import pytest

from master_airflow_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


@pytest.fixture(scope="module")
def exact_pairs(spark, sf_dir):
    return {(r.q_id, r.n_id) for r in REGISTRY["cosine_topk"].fn(spark, sf_dir).collect()}


def _recall(spark, sf_dir, name, exact):
    approx = {(r.q_id, r.n_id) for r in REGISTRY[name].fn(spark, sf_dir).collect()}
    return len(exact & approx) / len(exact)


def test_lsh_recall(spark, sf_dir, exact_pairs):
    assert _recall(spark, sf_dir, "lsh_bucketed_ann", exact_pairs) >= 0.6


def test_ivf_recall(spark, sf_dir, exact_pairs):
    assert _recall(spark, sf_dir, "ivf_ann_topk", exact_pairs) >= 0.3


def test_exact_topk_is_k_per_query(spark, sf_dir):
    import collections

    rows = REGISTRY["cosine_topk"].fn(spark, sf_dir).collect()
    per_q = collections.Counter(r.q_id for r in rows)
    assert all(v == 5 for v in per_q.values())
    assert all(1 <= r.rn <= 5 for r in rows)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)

def test_bucket_matrix_matches_column_form(spark, sf_dir):
    """The numpy banding fold (_bucket_matrix, used by the ANN kernel
    and the driver-side query banding) must agree bit-for-bit with the
    interpreted column-expression form (lsh_bucket) that defines the
    operator's semantics and the DuckDB oracle."""
    import numpy as np
    from pyspark.sql import functions as F

    from master_airflow_spark.catalog import load_table
    from master_airflow_spark.operators.similarity import (
        DIM,
        N_TABLES,
        _bucket_matrix,
        _to_matrix,
        lsh_bucket,
    )

    e = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").limit(64)
    rows = e.select(
        "vec_id",
        "embedding",
        *[lsh_bucket("embedding", DIM, t).alias(f"b{t}") for t in range(N_TABLES)],
    ).collect()
    A = _to_matrix([r.embedding for r in rows])
    kernel = _bucket_matrix(A)
    column = np.array([[r[f"b{t}"] for t in range(N_TABLES)] for r in rows])
    assert (kernel == column).all()
