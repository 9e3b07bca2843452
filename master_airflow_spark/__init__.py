"""master_airflow_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query and data-processing capabilities of the
reference system (``Stefen-Taime/master-airflow``): scheduled batch
ingestion of semi-structured records into typed tables across
heterogeneous sinks, plus analytical queries over them — re-expressed
Spark-first (DataFrame/SQL, Catalyst-optimized) and extended with the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB training-data pipeline needs.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC)
    catalog.py    parquet table loading / temp-view registration
    registry.py   named-query registry: Spark impl + DuckDB oracle SQL
    operators/    relational, topk, scalar, dedup, similarity, text ops
    sources/      semi-structured extraction (HTML-table scrape parity)
    sinks/        writer semantics: append / keyed-upsert / idempotent DDL
    streaming/    Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
