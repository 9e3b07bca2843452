"""IVF recall on a NON-REPLICA x10 embeddings corpus (round-13
verdict #8): the r13 x10 recall row used byte-identical replica
vectors, which saturates every cell with exact duplicates and makes
recall easier than a real corpus. This probe grows the corpus with
GENUINELY NOVEL vectors instead: each of the 9 extra copies perturbs
the base vectors with a deterministic per-(copy, vec_id) Gaussian
(sigma = 0.35 x the per-vector norm, then re-normalized to the base
norm), so cluster structure survives but no vector repeats — the
recall frontier, not the plumbing, is what gets measured.

Run: python scripts/ivf_salted_probe.py
     SALT_QUERIES="pq_recall_eval ivfpq_recall_eval" \
         python scripts/ivf_salted_probe.py   # other recall rows
Writes one markdown row per recall query to stdout; the official
numbers land in SCALE.md by hand (this is a probe, not a generator).
Round-15 extension (round-14 verdict #8 optional): SALT_QUERIES
sweeps ANY registered recall row over the same novel-vector corpus,
so the PQ and IVF-PQ frontiers are measured with the identical
methodology as IVF's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("IVF_SALT_OUT", "/tmp/mas_ivf_salted/x10")
COPIES = 10
SHIFT = 10_000  # next power of 10 above sf0.1's max vec_id (1999)
SIGMA = float(os.environ.get("IVF_SALT_SIGMA", "0.35"))
RECALL_QUERIES = os.environ.get("SALT_QUERIES", "ivf_recall_eval").split()


def build_corpus() -> None:
    """x10 embeddings with novel per-copy vectors; other tables
    symlinked from the base SF (the similarity queries only read
    embeddings, but a full dir keeps load_table uniform)."""
    import duckdb

    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{BASE_SF}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    V = np.asarray([np.asarray(v, dtype=np.float64) for v in base["embedding"]])
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    frames = [base]
    for i in range(1, COPIES):
        # Deterministic novel perturbation: one seeded generator per
        # copy (seed = copy index; no wall clock anywhere) produces
        # the same corpus on every run.
        rng = np.random.default_rng(1_000_003 * i)
        G = rng.standard_normal(V.shape)
        P = V + SIGMA * norms * G / np.linalg.norm(G, axis=1, keepdims=True)
        # re-normalize to the base norm so magnitude stats stay honest
        P = P * (norms / np.linalg.norm(P, axis=1, keepdims=True))
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": base["vec_id"] + i * SHIFT,
                    "embedding": [row.astype(np.float32) for row in P],
                    "label": base["label"],
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    out.to_parquet(os.path.join(OUT_DIR, "embeddings.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        dst = os.path.join(OUT_DIR, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE_SF, f"{t}.parquet"), dst)
    print(f"corpus: {len(out)} vectors -> {OUT_DIR}", file=sys.stderr)


def main() -> None:
    build_corpus()
    from pyspark.sql import functions as F

    from master_airflow_spark import registry
    from master_airflow_spark.session import get_spark

    registry._ensure_loaded()
    spark = get_spark(app_name="mas-ivf-salted")
    spark.sparkContext.setLogLevel("ERROR")
    for qname in RECALL_QUERIES:
        rec = registry.REGISTRY[qname].fn(spark, OUT_DIR)
        agg = rec.agg(
            F.mean("recall_at_k").alias("mean_recall"),
            F.min("recall_at_k").alias("min_recall"),
            F.count(F.lit(1)).alias("n_queries"),
        ).first()
        registry.release_caches()
        print(
            f"| {qname} | x10 novel-vector (sigma={SIGMA}) | "
            f"{agg.n_queries} queries "
            f"| mean {agg.mean_recall:.3f} | min {agg.min_recall:.3f} |"
        )


if __name__ == "__main__":
    main()
