"""Semi-structured HTML-table extraction — the reference's scraper as
a distributed parse (SURVEY.md §2.1 S2, §2.2 P1-P9).

The reference fetches one page and picks ``<td>`` cells by CSS class
into four parallel lists, zips them positionally, normalizes
whitespace, bounded-splits the user cell, and stamps a date
(dags/get_prices_load_mongodb.py:21-44). Here the same semantics run
over a DataFrame of raw HTML pages:

- parse: an Arrow-batched ``mapInPandas`` extracting the class-keyed
  cell lists per page (Python is unavoidable for HTML — batched, not
  per-row, and the only Python hop in the pipeline);
- align: ``arrays_zip`` + ``explode`` (truncating to the shortest
  list, the reference's ``zip`` semantics — arrays_zip pads with
  NULL, so a post-filter drops the padded tail);
- derive: whitespace-normalize (P2), bounded split time/user (P3),
  run-date stamp (P4, parameterized — never current_date()),
  struct/JSON doc (P7/P8), composite key (P9).

At scale: pages arrive as files/Kafka records; the parse is
embarrassingly parallel per page, no shuffle until a downstream agg.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PRICE_CLASSES = ("greencell", "redcell", "pricecell")

_TD_RE = re.compile(
    r"<td[^>]*\bclass=(?:\"([^\"]*)\"|'([^']*)')[^>]*>(.*?)</td>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")

CELLS_SCHEMA = StructType(
    [
        StructField("page_id", LongType()),
        StructField("prices", ArrayType(StringType())),
        StructField("stations", ArrayType(StringType())),
        StructField("cities", ArrayType(StringType())),
        StructField("times_users", ArrayType(StringType())),
    ]
)


def _cell_text(html_fragment: str) -> str:
    """Tag-stripped text, all whitespace runs collapsed to single
    spaces — the canonical form of the reference's
    ``' '.join(stripped_strings)`` (P2), extended to collapse runs
    *inside* fragments too (one normalization rule, not two)."""
    return " ".join(_TAG_RE.sub(" ", html_fragment).split())


def _extract_page(html: str) -> tuple[list[str], list[str], list[str], list[str]]:
    prices, stations, cities, users = [], [], [], []
    for m in _TD_RE.finditer(html or ""):
        cls = (m.group(1) or m.group(2) or "").strip().lower()
        text = _cell_text(m.group(3))
        classes = set(cls.split())
        if classes & set(PRICE_CLASSES):  # F2: class-membership predicate
            prices.append(text)
        elif "stationcell" in classes:
            stations.append(text)
        elif "citycell" in classes:
            cities.append(text)
        elif "usercell" in classes:
            users.append(text)
    return prices, stations, cities, users


def extract_cells(pages: DataFrame) -> DataFrame:
    """S2: pages(page_id, html) → class-keyed parallel cell lists.
    Arrow-batched mapInPandas; one output row per page."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, html in zip(pdf["page_id"], pdf["html"]):
                p, s, c, u = _extract_page(html)
                rows.append((pid, p, s, c, u))
            yield pd.DataFrame(
                rows, columns=["page_id", "prices", "stations", "cities", "times_users"]
            )

    return pages.mapInPandas(parse, CELLS_SCHEMA)


def align_rows(cells: DataFrame) -> DataFrame:
    """P1: positional alignment of the four lists into rows, truncated
    to the shortest list (Python ``zip`` semantics: arrays_zip pads
    with NULL — the where() drops padded rows)."""
    zipped = F.arrays_zip("prices", "stations", "cities", "times_users")
    return (
        cells.select("page_id", F.explode(zipped).alias("z"))
        .where(
            F.col("z.prices").isNotNull()
            & F.col("z.stations").isNotNull()
            & F.col("z.cities").isNotNull()
            & F.col("z.times_users").isNotNull()
        )
        .select(
            "page_id",
            F.col("z.prices").alias("price"),
            F.col("z.stations").alias("station"),
            F.col("z.cities").alias("city"),
            F.col("z.times_users").alias("time_user"),
        )
    )


def derive_gas_prices(rows: DataFrame, run_date: str) -> DataFrame:
    """P3-P10: the canonical six-column gas_prices frame (SURVEY.md
    §1.2): time/user bounded split, parameterized run date, typed
    price (DOUBLE — the reference's string-price quirk is opt-in via
    top1_price_lexicographic), plus the P8 JSON doc and P9 object key."""
    tu = F.split("time_user", " ", 2)
    df = rows.select(
        "page_id",
        F.col("price").cast("double").alias("price"),
        F.col("price").alias("price_str"),
        "station",
        "city",
        F.try_element_at(tu, F.lit(1)).alias("time"),
        F.coalesce(F.try_element_at(tu, F.lit(2)), F.lit("")).alias("user"),
        F.lit(run_date).cast("date").alias("date"),
    )
    doc = F.to_json(
        F.struct(
            F.col("price_str").alias("price"),
            "station",
            "city",
            "time",
            "user",
            F.date_format("date", "yyyy-MM-dd").alias("date"),
        )
    )
    key = F.concat(F.date_format("date", "yyyy-MM-dd"), F.col("station"))
    return df.withColumn("doc", doc).withColumn("obj_key", key)


def scrape_pipeline(pages: DataFrame, run_date: str) -> DataFrame:
    """Full ingestion pipeline: raw HTML pages → typed gas_prices rows."""
    return derive_gas_prices(align_rows(extract_cells(pages)), run_date)
