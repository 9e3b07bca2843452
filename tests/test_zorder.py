"""Z-order layout: the judged key computation is oracle-checked in the
differential harness; these tests measure the physical property the
layout exists for — per-FILE min/max footprints tight enough to skip
reads on either clustered dimension."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from master_airflow_spark.catalog import load_table
from master_airflow_spark.sinks.zorder import interleave_bits, with_zvalue, write_zordered

N_FILES = 8


@pytest.fixture(scope="module")
def zordered_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("zorder") / "orders_z")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("ka"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("kb"),
    )
    write_zordered(o, "ka", "kb", out, n_files=N_FILES)
    return out


def _file_footprints(spark, path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= N_FILES - 1  # range partitioner may leave one empty
    out = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                F.min("ka"), F.max("ka"), F.min("kb"), F.max("kb"), F.count(F.lit(1))
            )
            .first()
        )
        if r[4]:
            out.append((r[0], r[1], r[2], r[3]))
    return out


def test_zorder_files_are_tight_rectangles(spark, zordered_dir, sf_dir):
    """Sum of per-file (custkey x day) rectangle areas must be close
    to the GLOBAL area (Morton buckets tile the space), not N_FILES x
    global (what an unclustered write gives) — that ratio IS the
    expected file-skipping factor for point/range predicates."""
    feet = _file_footprints(spark, zordered_dir)
    glo = load_table(spark, sf_dir, "orders").agg(
        F.min(F.col("o_custkey").cast("long")),
        F.max(F.col("o_custkey").cast("long")),
        F.min(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))),
        F.max(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))),
    ).first()
    global_area = (glo[1] - glo[0] + 1) * (glo[3] - glo[2] + 1)
    total = sum((a2 - a1 + 1) * (b2 - b1 + 1) for a1, a2, b1, b2 in feet)
    assert total <= 2.0 * global_area, (
        f"file rectangles cover {total / global_area:.1f}x the space — "
        "not clustered (a random layout covers ~N_FILES x)"
    )


def test_zorder_prunes_files_for_narrow_predicate(spark, zordered_dir, sf_dir):
    """A narrow custkey range must overlap only a minority of file
    footprints — the min/max-stat skipping a z-ordered table buys."""
    feet = _file_footprints(spark, zordered_dir)
    glo = load_table(spark, sf_dir, "orders").agg(
        F.min(F.col("o_custkey").cast("long")),
        F.max(F.col("o_custkey").cast("long")),
    ).first()
    lo, hi = glo[0], glo[1]
    width = max((hi - lo) // 16, 1)
    q_lo, q_hi = lo + 3 * width, lo + 4 * width  # a 1/16-wide custkey slice
    overlapping = sum(1 for a1, a2, _, _ in feet if a1 <= q_hi and a2 >= q_lo)
    assert overlapping <= max(1, len(feet) // 2), (
        f"{overlapping}/{len(feet)} files overlap a 1/16 key slice"
    )


def test_interleave_bits_known_values(spark):
    """Pin the bit layout: a-bits at even positions, b at odd."""
    df = spark.range(1).select(
        interleave_bits(F.lit(0b101), F.lit(0b011)).alias("z")
    )
    # a=101 -> bits 0,4 ; wait: a bit0=1->pos0, bit1=0, bit2=1->pos4 = 17
    # b=011 -> bit0=1->pos1, bit1=1->pos3 = 10 ; z = 17 + 10 = 27
    assert df.first().z == 27


def test_zordered_write_preserves_rows(spark, zordered_dir, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    back = spark.read.parquet(zordered_dir)
    assert back.count() == o.count()
    assert back.select(F.sum("o_orderkey")).first()[0] == o.select(
        F.sum("o_orderkey")
    ).first()[0]
