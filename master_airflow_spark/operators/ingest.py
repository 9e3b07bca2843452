"""Ingestion pipeline as a judged query (S2/P1-P9 end-to-end).

The driver's tables contain no raw HTML, so the pipeline runs over a
deterministic canned page set shaped exactly like the reference's
source (``<td>`` cells classed greencell/redcell/pricecell,
stationcell, citycell, usercell — dags/get_prices_load_mongodb.py:21-26),
including the edge cases the scraper implies: multi-fragment
whitespace, a missing-user cell, and unequal list lengths (zip
truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from master_airflow_spark.registry import register
from master_airflow_spark.sources.html_extract import scrape_pipeline

SAMPLE_PAGES: list[tuple[int, str]] = [
    (
        1,
        """
        <table>
        <tr><td class="greencell">163.9</td>
            <td class="stationcell">Esso <b>Du Commerce</b>   / René Lévesque</td>
            <td class="citycell">Verdun ( Île des Soeurs )</td>
            <td class="usercell">06:46 gaswatcher</td></tr>
        <tr><td class="redcell">99.9</td>
            <td class="stationcell">Shell Centre-Ville</td>
            <td class="citycell">Montréal</td>
            <td class="usercell">07:12</td></tr>
        <tr><td class="pricecell">151.4</td>
            <td class="stationcell">Petro-Canada   Atwater</td>
            <td class="citycell">Westmount</td>
            <td class="usercell">08:03 early bird</td></tr>
        </table>
        """,
    ),
    (
        2,
        """
        <table>
        <tr><td class="greencell">158.2</td>
            <td class="stationcell">Ultramar Papineau</td>
            <td class="citycell">Plateau</td>
            <td class="usercell">09:30 plateau_rider</td></tr>
        <tr><td class="pricecell">160.0</td>
            <td class="stationcell">Costco Marché Central</td>
            <td class="citycell">Ahuntsic</td></tr>
        </table>
        """,
    ),
]
RUN_DATE = "2026-08-13"


@register("html_scrape_pipeline", oracle=None, tags=("S2", "P1-P9"))
def html_scrape_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HTML pages → typed gas_prices rows (mapInPandas parse,
    arrays_zip alignment, P2/P3 derivations, P8 doc, P9 key).
    Deterministic canned input; rows-only check (no HTML in the
    driver's views). Page 2's second row has no usercell → zip
    truncates it away, matching the reference's ``zip`` semantics."""
    pages = spark.createDataFrame(SAMPLE_PAGES, "page_id long, html string")
    return scrape_pipeline(pages, RUN_DATE)
