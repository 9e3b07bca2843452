"""Compaction: many small files → few, data intact, sort clustering."""

from __future__ import annotations

from master_airflow_spark.catalog import load_table
from master_airflow_spark.sinks.maintenance import compact_parquet


def test_compaction_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    p = str(tmp_path / "frag")
    src = load_table(spark, sf_dir, "orders")
    src.repartition(40).write.parquet(p)  # fragment into 40 small files

    before = sorted(map(tuple, spark.read.parquet(p).collect()))
    stats = compact_parquet(spark, p, sort_by=["o_orderdate"])
    after = sorted(map(tuple, spark.read.parquet(p).collect()))

    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    assert before == after


def test_compaction_swap_is_atomic_on_failure(spark, sf_dir, tmp_path, monkeypatch):
    p = str(tmp_path / "frag2")
    load_table(spark, sf_dir, "region").repartition(3).write.parquet(p)
    before = sorted(map(tuple, spark.read.parquet(p).collect()))

    import master_airflow_spark.sinks.maintenance as m

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(m.os, "rename", boom)
    try:
        compact_parquet(spark, p)
    except OSError:
        pass
    # original data untouched
    assert sorted(map(tuple, spark.read.parquet(p).collect())) == before