"""Serving edge: stdlib JSON API over the query registry."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from etl_weather_spark.serve import make_server


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    srv = make_server(spark, sf_dir)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(server, path):
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry JSON bodies
        return e.code, json.loads(e.read())


def test_daily_route(server):
    status, rows = _get(server, "/data/daily")
    assert status == 200
    assert len(rows) == 30
    assert {"date", "vavg", "category", "is_hot_day"} <= set(rows[0])


def test_hourly_route_limits(server):
    status, rows = _get(server, "/data/hourly?limit=5")
    assert status == 200 and len(rows) == 5


def test_summary_route(server):
    status, payload = _get(server, "/summary")
    assert status == 200
    assert "period_avg" in payload["summary"]
    assert isinstance(payload["recommendations"], list)


def test_any_registry_query_served(server):
    status, rows = _get(server, "/query/top5_days")
    assert status == 200 and len(rows) == 5
    status, err = _get(server, "/query/nope")
    assert status == 404 and "unknown query" in err["error"]


def test_cache_and_refresh(server):
    _get(server, "/data/daily")
    assert any(k.startswith("daily|") for k in server.api._cache)
    # poison the cache entry, then check refresh recomputes it
    key = next(k for k in server.api._cache if k.startswith("daily|"))
    server.api._cache[key] = [{"poisoned": True}]
    status, rows = _get(server, "/data/daily")
    assert rows == [{"poisoned": True}]  # cache hit serves the stub
    status, rows = _get(server, "/data/daily?refresh=true")
    assert len(rows) == 30  # refresh bypassed and re-populated


def test_compare_route(server):
    status, rows = _get(server, "/compare?kinds=view,error")
    assert status == 200
    assert {r["kind"] for r in rows} == {"view", "error"}
    assert len(rows) == 60  # 30 days x 2 kinds, long format
    status, err = _get(server, "/compare?kinds=view")
    assert status == 400
