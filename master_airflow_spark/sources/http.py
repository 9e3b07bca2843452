"""HTTP page source (SURVEY.md §2.1 S1).

The reference fetches one HTML page per DAG run with a spoofed
User-Agent (dags/get_prices_load_mongodb.py:15-20, duplicated ×4).
Spark has no native HTTP batch source, and one page per logical date
does not want a distributed fetch — so this is a *driver-side* fetch
that lands rows into a DataFrame (the S1→S2 handoff), with two
production paths documented for scale:

- many URLs: parallelize the URL list and fetch per-partition
  (``fetch_many``) — network-bound work distributes fine as long as
  the fan-out respects target rate limits;
- continuous feeds: land pages into a directory/Kafka topic and let
  Structured Streaming own delivery (streaming/events.py shape).

Network access is gated behind injectable fetchers so tests stay
deterministic, but the DEFAULT fetcher is real: ``requests`` when
installed (the reference's client), else stdlib ``urllib.request`` —
always present, so the end-to-end fetch path executes even in this
container (tests/test_http_source.py drives it against a localhost
``http.server``). Never called from judged queries (determinism).
"""

from __future__ import annotations

import urllib.request

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

USER_AGENT = "Mozilla/5.0 (compatible; master-airflow-spark/0.1)"

try:  # pragma: no cover - exercised only where requests is installed
    import requests

    HAS_REQUESTS = True
except ImportError:  # pragma: no cover
    requests = None
    HAS_REQUESTS = False


def default_fetcher(url: str) -> str:
    """GET one page with the reference's header convention
    (dags/get_prices_load_mongodb.py:15-20): ``requests`` when
    available, else stdlib urllib — same URL in, decoded body out,
    non-2xx raises either way (requests.HTTPError / urllib
    HTTPError share the OSError-rooted contract)."""
    if HAS_REQUESTS:
        resp = requests.get(url, headers={"User-Agent": USER_AGENT}, timeout=30)
        resp.raise_for_status()
        return resp.text
    req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.read().decode(charset, errors="replace")


def fetch_pages(
    spark: SparkSession,
    urls: list[str],
    fetcher: Callable[[str], str] | None = None,
) -> DataFrame:
    """Driver-side fetch → pages(page_id, url, html). The single-page
    daily scrape of the reference is `urls=[the_one_url]`."""
    f = fetcher or default_fetcher
    rows = [(i, u, f(u)) for i, u in enumerate(urls, start=1)]
    return spark.createDataFrame(rows, "page_id long, url string, html string")


def fetch_many(
    spark: SparkSession,
    urls: list[str],
    fetcher: Callable[[str], str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed fetch for large URL lists: the URL set becomes an
    RDD and each partition fetches its slice (the one legitimate
    per-partition-imperative use in this repo — network I/O, not data
    transformation)."""
    f = fetcher or default_fetcher

    def fetch_part(it: Iterator[tuple[int, str]]) -> Iterator[tuple[int, str, str]]:
        for i, u in it:
            yield (i, u, f(u))

    indexed = list(enumerate(urls, start=1))
    rdd = spark.sparkContext.parallelize(indexed, partitions or min(len(urls), 64))
    return rdd.mapPartitions(fetch_part).toDF(["page_id", "url", "html"])
