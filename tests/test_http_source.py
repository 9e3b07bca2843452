"""S1 HTTP source tests — canned fetchers (no egress in this env)."""

from __future__ import annotations

import pytest

from master_airflow_spark.sources.http import fetch_many, fetch_pages


def test_fetch_pages_driver_side(spark):
    df = fetch_pages(spark, ["u1", "u2"], fetcher=lambda u: f"<html>{u}</html>")
    rows = {r.url: (r.page_id, r.html) for r in df.collect()}
    assert rows == {"u1": (1, "<html>u1</html>"), "u2": (2, "<html>u2</html>")}


def test_fetch_many_distributed(spark):
    urls = [f"u{i}" for i in range(20)]
    df = fetch_many(spark, urls, fetcher=lambda u: u.upper(), partitions=4)
    assert df.count() == 20
    assert {r.html for r in df.collect()} == {u.upper() for u in urls}


def test_fetcher_error_propagates(spark):
    def bad(url: str) -> str:
        raise ConnectionError("no egress")

    with pytest.raises(ConnectionError):
        fetch_pages(spark, ["u1"], fetcher=bad)
