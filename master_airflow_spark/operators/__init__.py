"""Operator modules. Importing this package registers every named query
(and its DuckDB oracle) into master_airflow_spark.registry."""

from master_airflow_spark.operators import (  # noqa: F401
    clusters,
    dedup,
    embeddings,
    graph,
    ingest,
    multimodal,
    outer_joins,
    quality,
    sampling,
    relational,
    scalar,
    scalarfns,
    scrub,
    similarity,
    skew,
    sql_api,
    stats,
    streaming_queries,
    subqueries,
    text,
    topk,
    tpch_like,
    udfs,
    window,
)
