"""Serving layer — the reference's two HTTP APIs as engine functions.

The reference serves one analytical question through FastAPI+Mongo
(today's high/low, api/mongo/main.py:63-77) and Flask+Postgres
(all-time high/low, api/postgres/api.py:16-33), opening a new DB
connection per request and running two sorted scans. Here the serving
payloads come straight from the registered queries — one SparkSession,
single-pass plans — and return the reference's exact response shape:
``{"highest_price": {...}, "lowest_price": {...}}``. An HTTP framework
can wrap these 1:1 (kept out: no web dependencies in the engine)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from master_airflow_spark.operators.topk import top1_price_alltime, top1_price_today


def _payload(rows: list[Any]) -> dict[str, dict[str, Any]]:
    by_which = {r.which: r for r in rows}
    out = {}
    for which, key in (("highest", "highest_price"), ("lowest", "lowest_price")):
        r = by_which.get(which)
        out[key] = (
            {
                "price": r.price,
                "l_orderkey": r.l_orderkey,
                "l_linenumber": r.l_linenumber,
            }
            if r is not None
            else None
        )
    return out


def get_prices_today(spark: SparkSession, sf_dir: str) -> dict[str, dict[str, Any]]:
    """EP2 parity: today's highest & lowest price rows."""
    return _payload(top1_price_today(spark, sf_dir).collect())


def get_prices_alltime(spark: SparkSession, sf_dir: str) -> dict[str, dict[str, Any]]:
    """EP3 parity: all-time highest & lowest price rows."""
    return _payload(top1_price_alltime(spark, sf_dir).collect())
