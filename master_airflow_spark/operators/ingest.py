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


# Golden expected output, hand-derived from SAMPLE_PAGES by applying the
# reference scraper's semantics (SURVEY.md §2.2 P1-P9): zip-align the
# four cell lists (page 2 row 2 lacks a usercell → truncated away),
# bounded-split the usercell into time + user ('' when absent),
# whitespace-normalize, stamp RUN_DATE, build the JSON doc and the
# date+station object key. A VALUES oracle = the §5.2 golden e2e test
# under the driver's hash-diff. The run date is interpolated from the
# single RUN_DATE constant so the golden cannot drift from the knob.
_SCRAPE_GOLDEN_TEMPLATE = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(163.9 AS DOUBLE), '163.9',
   'Esso Du Commerce / René Lévesque', 'Verdun ( Île des Soeurs )',
   '06:46', 'gaswatcher', DATE '@RUN_DATE@',
   '{"price":"163.9","station":"Esso Du Commerce / René Lévesque","city":"Verdun ( Île des Soeurs )","time":"06:46","user":"gaswatcher","date":"@RUN_DATE@"}',
   '@RUN_DATE@Esso Du Commerce / René Lévesque'),
  (CAST(1 AS BIGINT), CAST(99.9 AS DOUBLE), '99.9',
   'Shell Centre-Ville', 'Montréal', '07:12', '', DATE '@RUN_DATE@',
   '{"price":"99.9","station":"Shell Centre-Ville","city":"Montréal","time":"07:12","user":"","date":"@RUN_DATE@"}',
   '@RUN_DATE@Shell Centre-Ville'),
  (CAST(1 AS BIGINT), CAST(151.4 AS DOUBLE), '151.4',
   'Petro-Canada Atwater', 'Westmount', '08:03', 'early bird', DATE '@RUN_DATE@',
   '{"price":"151.4","station":"Petro-Canada Atwater","city":"Westmount","time":"08:03","user":"early bird","date":"@RUN_DATE@"}',
   '@RUN_DATE@Petro-Canada Atwater'),
  (CAST(2 AS BIGINT), CAST(158.2 AS DOUBLE), '158.2',
   'Ultramar Papineau', 'Plateau', '09:30', 'plateau_rider', DATE '@RUN_DATE@',
   '{"price":"158.2","station":"Ultramar Papineau","city":"Plateau","time":"09:30","user":"plateau_rider","date":"@RUN_DATE@"}',
   '@RUN_DATE@Ultramar Papineau')
) AS t(page_id, price, price_str, station, city, "time", "user", "date", doc, obj_key)
"""
_SCRAPE_GOLDEN = _SCRAPE_GOLDEN_TEMPLATE.replace("@RUN_DATE@", RUN_DATE)


@register(
    "html_scrape_pipeline",
    oracle=_SCRAPE_GOLDEN,
    tags=("S2", "P1-P9", "P5", "P11"),
)
def html_scrape_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HTML pages → typed gas_prices rows (mapInPandas parse,
    arrays_zip alignment, P2/P3 derivations, P8 doc, P9 key).
    Deterministic canned input checked against a hand-derived VALUES
    golden (the driver's views hold no HTML). Page 2's second row has
    no usercell → zip truncates it away, matching the reference's
    ``zip`` semantics."""
    pages = spark.createDataFrame(SAMPLE_PAGES, "page_id long, html string")
    return scrape_pipeline(pages, RUN_DATE)


# Canned XML page: the same gas-price records in an XML feed shape —
# S2's markup-extraction semantics through Spark 4's native from_xml
# instead of the mapInPandas HTML parser.
SAMPLE_XML: list[tuple[int, str]] = [
    (1, "<rec><price>163.9</price><station>Esso Du Commerce</station>"
        "<city>Verdun</city></rec>"),
    (2, "<rec><price>99.9</price><station>Shell Centre-Ville</station>"
        "<city>Montréal</city></rec>"),
    (3, "<rec><price>151.4</price><station>Petro-Canada Atwater</station>"
        "<city>Westmount</city></rec>"),
    (4, "<rec><price>158.2</price><station>Ultramar Papineau</station></rec>"),
]

_XML_GOLDEN = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(163.9 AS DOUBLE), 'Esso Du Commerce', 'Verdun'),
  (CAST(2 AS BIGINT), CAST(99.9 AS DOUBLE), 'Shell Centre-Ville', 'Montréal'),
  (CAST(3 AS BIGINT), CAST(151.4 AS DOUBLE), 'Petro-Canada Atwater', 'Westmount'),
  (CAST(4 AS BIGINT), CAST(158.2 AS DOUBLE), 'Ultramar Papineau', CAST(NULL AS VARCHAR))
) AS t(rec_id, price, station, city)
"""


@register("xml_extract_golden", oracle=_XML_GOLDEN, tags=("S2",))
def xml_extract_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 through Spark 4's native from_xml: typed extraction from an
    XML record column with an explicit schema — the declarative twin
    of the HTML mapInPandas parser (html_scrape_pipeline), certified
    against a hand-derived VALUES golden. Record 4's missing <city>
    surfaces as NULL (schema-on-read absent-field semantics), pinned
    by the golden's NULL row."""
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(SAMPLE_XML, "rec_id long, xml string")
    parsed = F.from_xml("xml", "price double, station string, city string")
    return pages.select(
        "rec_id",
        parsed.getField("price").alias("price"),
        parsed.getField("station").alias("station"),
        parsed.getField("city").alias("city"),
    )


def _register_quarantine() -> None:
    from pyspark.sql import functions as F

    from master_airflow_spark.catalog import load_table

    @register(
        "corrupt_record_quarantine",
        oracle="""
WITH mangled AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 7 = 0
                THEN substr(props, 1, length(props) - 1)
                ELSE props END AS payload
    FROM events
)
SELECT event_type,
       CAST(count_if(json_valid(payload)) AS BIGINT) AS n_valid,
       CAST(count_if(NOT json_valid(payload)) AS BIGINT) AS n_quarantined,
       CAST(SUM(CASE WHEN json_valid(payload)
                     THEN CAST(json_extract(payload, '$.k') AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS sum_k_valid
FROM mangled
GROUP BY event_type
""",
        tags=("S2", "X17", "dq"),
    )
    def corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Corrupt-record routing — the quarantine half of a landing
        pipeline (reference ingest assumes clean pages; a real feed
        does not): parse each payload leniently, route rows whose JSON
        fails to parse into a quarantine count instead of failing the
        job, and aggregate only the valid side. Corruption is
        synthesized deterministically (every 7th event loses its last
        byte — an unterminated object both engines agree is invalid);
        validity = from_json null-ness, DuckDB's json_valid in the
        oracle. The quarantine pattern at scale: validity is a pure
        column predicate, so valid/quarantine split is one scan with
        no Python and the quarantine side writes to its own sink for
        replay (sinks.fan_out)."""
        e = load_table(spark, sf_dir, "events")
        payload = F.when(
            F.col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        ).otherwise(F.col("props"))
        parsed = F.from_json(payload, "map<string,int>")
        valid = parsed.isNotNull()
        return e.select("event_type", payload.alias("payload"), parsed.alias("m"), valid.alias("v")).groupBy(
            "event_type"
        ).agg(
            F.count_if(F.col("v")).alias("n_valid"),
            F.count_if(~F.col("v")).alias("n_quarantined"),
            F.sum(
                F.when(F.col("v"), F.coalesce(F.col("m").getItem("k"), F.lit(0))).otherwise(0)
            ).cast("long").alias("sum_k_valid"),
        )


_register_quarantine()
