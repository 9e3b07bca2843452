"""End-to-end test of the HTTP serving layer (reference api/mongo +
api/postgres endpoints) against a live engine session."""

from __future__ import annotations

import json
import urllib.request

from master_airflow_spark.http_api import PriceServer


def _get(port: int, path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def test_price_endpoints(spark, sf_dir):
    with PriceServer(spark, sf_dir) as srv:
        status, health = _get(srv.port, "/health")
        assert (status, health) == (200, {"status": "ok"})

        status, today = _get(srv.port, "/prices/today")
        assert status == 200
        assert set(today) == {"highest_price", "lowest_price"}

        status, alltime = _get(srv.port, "/prices/alltime")
        assert status == 200
        hp, lp = alltime["highest_price"], alltime["lowest_price"]
        assert hp["price"] >= lp["price"]
        assert {"price", "l_orderkey", "l_linenumber"} <= set(hp)

        # all-time range must contain today's range
        if today["highest_price"] is not None:
            assert hp["price"] >= today["highest_price"]["price"]

        code, err = None, None
        try:
            _get(srv.port, "/nope")
        except urllib.error.HTTPError as ex:
            code, err = ex.code, json.loads(ex.read())
        assert code == 404 and "error" in err
