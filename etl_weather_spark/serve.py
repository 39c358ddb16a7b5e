"""Serving edge: the reference's web read path (web.py:376-561) over the
engine, on the stdlib only (no FastAPI in this environment).

Routes (all GET, all JSON):

- ``/health``                     liveness
- ``/data/daily``                 daily gold rows (daily_flags)
- ``/data/hourly?limit=24``       hourly join rows, serving-edge limit
- ``/summary``                    global summary + recommendations
- ``/query/<name>?limit=N``       ANY registry query — the engine's real
                                  serving surface (127 named queries)
- ``?refresh=true`` on any data route bypasses the cache (web.py's
  ``refresh`` param, M4)

Design: the ENGINE stays lazy/distributed; ``collect()`` happens only
here, at the edge, on result sets already reduced to serving size
(K3's records-shaped output, to_dict(orient="records") parity). Results
are memoized in a bounded LRU keyed (route, sf_dir) — the reference's
bounded per-key cache (M3, utils.py:62-92) — so a dashboard polling the
same route doesn't re-run the job; ``refresh`` recomputes and
re-populates.

Scale: one Spark driver can back many serving threads (ThreadingHTTP
server; Spark sessions are thread-safe for read queries). For real
deployments put the gold tables behind this process and size the cache
to the route count — the engine's job is to make every route's backing
query cheap (pre-aggregated gold, partition pruning), not to make the
HTTP layer clever.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from datetime import date, datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

CACHE_MAX = 32


def _jsonable(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def records(df, limit: int | None = None) -> list[dict]:
    """Serving-edge collect → records (K3)."""
    if limit is not None:
        df = df.limit(limit)
    return [
        {k: _jsonable(v) for k, v in row.asDict(recursive=True).items()}
        for row in df.collect()
    ]


class EngineAPI:
    """Route table + bounded result cache over the query registry."""

    def __init__(self, spark, sf_dir: str) -> None:
        from etl_weather_spark import queries as q

        self.spark = spark
        self.sf_dir = sf_dir
        self.q = q
        self.registry = q.queries()
        self._cache: OrderedDict[str, list[dict]] = OrderedDict()

    def _cached(self, key: str, compute, refresh: bool) -> list[dict]:
        if not refresh and key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        out = compute()
        self._cache[key] = out
        self._cache.move_to_end(key)
        while len(self._cache) > CACHE_MAX:
            self._cache.popitem(last=False)  # bounded LRU (M3)
        return out

    def handle(self, path: str, params: dict) -> tuple[int, dict | list]:
        refresh = params.get("refresh", ["false"])[0].lower() == "true"
        limit = int(params["limit"][0]) if "limit" in params else None
        if path == "/health":
            return 200, {"ok": True, "sf_dir": self.sf_dir}
        if path == "/data/daily":
            return 200, self._cached(
                f"daily|{limit}",
                lambda: records(self.registry["daily_flags"](self.spark, self.sf_dir), limit),
                refresh,
            )
        if path == "/data/hourly":
            lim = limit or 24
            return 200, self._cached(
                f"hourly|{lim}",
                lambda: records(
                    self.registry["hourly_outer_join"](self.spark, self.sf_dir).orderBy("hour"),
                    lim,
                ),
                refresh,
            )
        if path == "/summary":
            def compute():
                s = records(self.registry["global_summary"](self.spark, self.sf_dir))
                r = records(self.registry["recommendation_text"](self.spark, self.sf_dir))
                return [{"summary": s[0] if s else {}, "recommendations": r}]

            return 200, self._cached("summary", compute, refresh)[0]
        if path == "/compare":
            # reference /compare?cities=a,b (web.py:521-529): long-format
            # daily series per entity; here entities are event types
            kinds = params.get("kinds", ["view,click"])[0].split(",")
            if len(kinds) < 2:
                return 400, {"error": "compare needs >=2 kinds"}

            def compute():
                from pyspark.sql import functions as F

                ev = self.q.load(self.spark, self.sf_dir, "events")
                daily = (
                    ev.filter(F.col("event_type").isin(kinds))
                    .groupBy(
                        F.to_date("ts").alias("date"),
                        F.col("event_type").alias("kind"),
                    )
                    .agg(F.count(F.lit(1)).alias("value"))
                    .orderBy("date", "kind")
                )
                return records(daily, limit)

            return 200, self._cached(
                f"compare|{','.join(sorted(kinds))}|{limit}", compute, refresh
            )
        if path.startswith("/query/"):
            name = path.removeprefix("/query/")
            if name not in self.registry:
                return 404, {"error": f"unknown query: {name}"}
            return 200, self._cached(
                f"query|{name}|{limit}",
                lambda: records(self.registry[name](self.spark, self.sf_dir), limit),
                refresh,
            )
        return 404, {"error": f"no route: {path}"}


def make_server(spark, sf_dir: str, port: int = 0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; port 0 = ephemeral."""
    api = EngineAPI(spark, sf_dir)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib API name
            u = urlparse(self.path)
            try:
                status, payload = api.handle(u.path, parse_qs(u.query))
            except Exception as ex:  # pragma: no cover - defensive edge
                status, payload = 500, {"error": str(ex)[:500]}
            body = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence per-request stderr noise
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    server.api = api  # for tests
    return server
