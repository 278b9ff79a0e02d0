"""HTTP API facade over a Node — the reference's REST surface
(crux-http-server/src/crux/http_server.clj:330-424) with JSON bodies
(the reference speaks EDN/JSON/transit; JSON is the shared subset).

Routes (all under /_crux, like the reference):
    GET  /_crux/status
    GET  /_crux/entity?eid=...&valid-time=...&tx-id=...
    GET  /_crux/entity-history?eid=...&sort-order=asc|desc&with-corrections=...
    POST /_crux/query            {"query": {...}, "in-args": [...]}
    POST /_crux/submit-tx        {"tx-ops": [["put", {...}], ...]}
    GET  /_crux/await-tx         (commits pending txs; returns aborted ids)
    GET  /_crux/sync
    GET  /_crux/tx-log
    GET  /_crux/tx-committed?tx-id=...
    GET  /_crux/latest-completed-tx
    GET  /_crux/latest-submitted-tx
    GET  /_crux/entity-tx?eid=...
    GET  /_crux/active-queries | recent-queries | slowest-queries
    GET  /_crux/attribute-stats
    GET  /_crux/sparql?query=...

This is a thin driver-side facade: every request delegates to the same
Node the Python API uses, so queries still execute distributed; the
server only shuttles JSON. Run it next to the driver for REPL-style
interop — a production deployment would put a real ASGI server here,
the handlers are the parity surface.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


# Server-side paging bounds: a request that omits 'limit' gets the
# default page, and no request can demand more than the max in one
# response — otherwise an unlimited query still list()s the whole
# result on the driver and the bounded-driver-memory contract of
# q_stream's cursor fetch is void. Clients page with offset+limit
# (the reference's cursor-backed open-q serves the same role,
# http_server.clj:330-424).
DEFAULT_PAGE_LIMIT = 10_000
MAX_PAGE_LIMIT = 100_000


def _page_limit(requested) -> int:
    if requested is None:
        return DEFAULT_PAGE_LIMIT
    limit = int(requested)
    if limit < 1:
        # surfaces as a 400 via the handlers' Exception catch — a
        # non-positive limit is a client error, not an empty page or
        # an opaque DataFrame.limit failure
        raise ValueError(f"limit must be >= 1, got {limit}")
    return min(limit, MAX_PAGE_LIMIT)


def _parse_time(s: str | None) -> dt.datetime | None:
    if not s:
        return None
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00")).replace(tzinfo=None)


def _json_default(x):
    if isinstance(x, (dt.datetime, dt.date)):
        return x.isoformat()
    return str(x)


class HttpNode:
    """Serve a Node over HTTP on a daemon thread. port=0 picks a free
    port (exposed as .port). close() shuts the server down."""

    def __init__(self, node, host: str = "127.0.0.1", port: int = 0,
                 metrics_registry=None):
        self.node = node
        # a MetricsRegistry turns on GET /metrics — the Prometheus text
        # scrape endpoint on the facade (crux-metrics prometheus.clj
        # ->http-exporter, served off the node's HTTP port here)
        self.metrics_registry = metrics_registry
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, payload):
                # content negotiation (http_server.clj ->content-type):
                # Accept: application/edn -> EDN with keywords/#inst
                # intact; JSON stays the default
                if "application/edn" in (self.headers.get("Accept") or ""):
                    from crux_spark import edn

                    body = edn.dumps(payload).encode()
                    ctype = "application/edn"
                else:
                    body = json.dumps(payload, default=_json_default).encode()
                    ctype = "application/json"
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n)
                if "application/edn" in (
                    self.headers.get("Content-Type") or ""
                ):
                    from crux_spark import edn

                    # request envelopes use keyword keys ({:query ...});
                    # the engine's specs use plain-string keys
                    return edn.unkeyword_keys(edn.loads(raw.decode() or "{}"))
                return json.loads(raw or b"{}")

            def do_GET(self):
                u = urlparse(self.path)
                qs = {k: v[0] for k, v in parse_qs(u.query).items()}
                if u.path == "/metrics" and outer.metrics_registry is not None:
                    from crux_spark.metrics import (
                        PROMETHEUS_CONTENT_TYPE,
                        prometheus_text,
                    )

                    body = prometheus_text(outer.metrics_registry).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", PROMETHEUS_CONTENT_TYPE)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                try:
                    out = outer._get(u.path, qs)
                except KeyError as e:
                    return self._send(404, {"error": str(e)})
                except Exception as e:
                    return self._send(400, {"error": str(e)})
                self._send(200, out)

            def do_POST(self):
                u = urlparse(self.path)
                try:
                    out = outer._post(u.path, self._body())
                except KeyError as e:
                    return self._send(404, {"error": str(e)})
                except Exception as e:
                    return self._send(400, {"error": str(e)})
                self._send(200, out)

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self.url = f"http://{host}:{self.port}"
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()

    # -- route dispatch ----------------------------------------------------

    def _db(self, qs: dict):
        return self.node.db(
            valid_time=_parse_time(qs.get("valid-time")),
            tx=int(qs["tx-id"]) if qs.get("tx-id") else None,
        )

    def _get(self, path: str, qs: dict):
        node = self.node
        if path == "/_crux/status":
            return node.status()
        if path == "/_crux/entity":
            doc = self._db(qs).entity(qs["eid"])
            if doc is None:
                raise KeyError(f"entity not found: {qs['eid']}")
            return doc
        if path == "/_crux/entity-history":
            hist = self._db(qs).entity_history(
                qs["eid"],
                ascending=qs.get("sort-order", "asc") == "asc",
                with_corrections=qs.get("with-corrections") == "true",
            )
            # with-docs=true ships each version's doc (typed over the
            # EDN wire — docjson decodes server-side, the EDN printer
            # carries #inst / M literals); default strips the bodies
            # like the reference (http_server.clj entity-history)
            if qs.get("with-docs") != "true":
                hist = [{k: v for k, v in e.items() if k != "doc"}
                        for e in hist]
            return hist
        if path == "/_crux/query":
            # GET query form (the reference's queryEdn/inArgsEdn params,
            # http_server/json_test.clj — JSON is this facade's shared
            # subset): the query dict and :in args arrive URL-encoded as
            # queryJson / inArgsJson; same monitored + paged execution
            # as the POST route
            query = json.loads(qs["queryJson"])
            in_args = json.loads(qs["inArgsJson"]) if qs.get("inArgsJson") else []
            offset = int(qs.get("offset", "0"))
            rows = self._db(qs).q_stream(
                query,
                *in_args,
                limit=_page_limit(qs.get("limit")),
                offset=offset,
                # paged=true (our client) or a non-zero offset (any
                # offset-paging client) -> canonical order, so windows
                # from separate executions tile (see Db.q_stream)
                stable=qs.get("paged") == "true" or offset > 0,
            )
            return [list(r) for r in rows]
        if path == "/_crux/await-tx":
            return {"aborted": sorted(node.await_tx())}
        if path == "/_crux/tx-log":
            # cursor pagination, matching the reference's after-tx-id
            # param (http_server.clj:330-424 streams from a cursor; a
            # JSON facade pages instead): the driver never materializes
            # more than `limit`+1 rows per request, whatever the log size
            after = int(qs["after-tx-id"]) if qs.get("after-tx-id") else None
            limit = int(qs.get("limit", "100"))
            rows = [
                r.asDict()
                for r in node.open_tx_log(after_tx_id=after)
                .orderBy("tx_id")
                .limit(limit + 1)
                .collect()
            ]
            more = len(rows) > limit
            rows = rows[:limit]
            return {
                "tx-log": rows,
                "next-after-tx-id": rows[-1]["tx_id"] if more else None,
            }
        if path == "/_crux/latest-completed-tx":
            return {"tx-id": node.latest_completed_tx()}
        if path == "/_crux/latest-submitted-tx":
            return {"tx-id": node.latest_submitted_tx()}
        if path == "/_crux/tx-committed":
            return {"tx-committed?": node.tx_committed(int(qs["tx-id"]))}
        if path == "/_crux/sync":
            # sync = await everything submitted so far (api.clj sync);
            # identical to await-tx in this synchronous-commit model
            node.await_tx()
            return {"tx-id": node.latest_completed_tx()}
        if path == "/_crux/entity-tx":
            out = self._db(qs).entity_tx(qs["eid"])
            if out is None:
                raise KeyError(f"entity not found: {qs['eid']}")
            return out
        if path == "/_crux/active-queries":
            return node.active_queries()
        if path == "/_crux/recent-queries":
            return node.recent_queries()
        if path == "/_crux/slowest-queries":
            return node.slowest_queries()
        if path == "/_crux/attribute-stats":
            return node.attribute_stats()
        if path == "/_crux/sparql":
            # the reference's SPARQL endpoint (http_server.clj /_crux/sparql;
            # api_test.clj test-sparql drives it through RDF4J's
            # SPARQLRepository) — compiled through sources/sparql.py
            from crux_spark.sources.sparql import (
                sparql_construct,
                sparql_describe,
                sparql_to_datalog,
            )

            offset = int(qs.get("offset", "0"))
            d = sparql_to_datalog(qs["query"])
            if "describe" in d or "construct" in d:
                # graph-valued verbs (r14/r15 superset — the reference's
                # endpoint is SELECT-only): page the (s, p, o) triples
                # with the same bounded-response rule as tuple results
                db = self._db(qs)
                runner = (sparql_describe if "describe" in d
                          else sparql_construct)
                df = runner(db.catalog(), qs["query"])
                if qs.get("paged") == "true" or offset > 0:
                    df = df.orderBy("s", "p", "o")
                if offset:
                    df = df.offset(offset)
                return [list(r)
                        for r in df.limit(_page_limit(qs.get("limit")))
                        .collect()]
            rows = self._db(qs).q_stream(
                d,
                limit=_page_limit(qs.get("limit")),
                offset=offset,
                stable=qs.get("paged") == "true" or offset > 0,
            )
            return [list(r) for r in rows]
        raise KeyError(f"no route {path}")

    def _post(self, path: str, body: dict):
        node = self.node
        if path == "/_crux/query":
            db = self.node.db(
                valid_time=_parse_time(body.get("valid-time")),
                tx=body.get("tx-id"),
            )
            # q_stream, not q: HTTP queries go through the MONITORED
            # path (active/recent/slowest queues) AND fetch through
            # toLocalIterator with a server-enforced page limit — one
            # partition in flight driver-side AND a bounded row list per
            # response, never a full-result collect() per request (the
            # reference streams from a cursor; clients page here)
            offset = body.get("offset", 0)
            rows = db.q_stream(
                body["query"],
                *body.get("in-args", []),
                limit=_page_limit(body.get("limit")),
                offset=offset,
                stable=bool(body.get("paged")) or offset > 0,
            )
            return [list(r) for r in rows]
        if path == "/_crux/submit-tx":
            ops = [tuple(op) for op in body["tx-ops"]]
            tx_id = node.submit_tx(
                ops, tx_time=_parse_time(body.get("tx-time"))
            )
            return {"tx-id": tx_id}
        raise KeyError(f"no route {path}")

    def close(self):
        self.server.shutdown()
        self.server.server_close()


class RemoteNode:
    """HTTP client mirroring the Node surface — the reference's
    crux-http-client (RemoteApiClient): the same submit/await/db/q/
    entity/history calls, shipped over the REST routes above. db()
    returns a RemoteDb pinned to (valid-time, tx) like a local Db
    value."""

    def __init__(self, url: str, edn: bool = False):
        """``edn=True`` ships requests/responses as application/edn (the
        reference client's native format): query results keep TYPED
        values — #inst instants come back as datetimes and keywords as
        ':kw' strings — where the JSON path degrades both to plain
        strings."""
        self.url = url.rstrip("/")
        self.edn = edn

    # -- plumbing ---------------------------------------------------------
    def _decode(self, resp) -> object:
        raw = resp.read()
        if "application/edn" in (resp.headers.get("Content-Type") or ""):
            from crux_spark import edn

            return edn.loads(raw.decode())
        return json.loads(raw)

    def _get(self, path: str, **qs):
        import urllib.parse
        import urllib.request

        q = urllib.parse.urlencode({k: v for k, v in qs.items() if v is not None})
        req = urllib.request.Request(
            f"{self.url}{path}" + (f"?{q}" if q else ""),
            headers={"Accept": "application/edn"} if self.edn else {},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return self._decode(r)

    def _post(self, path: str, payload: dict):
        import urllib.request

        if self.edn:
            from crux_spark import edn

            data = edn.dumps(payload).encode()
            headers = {
                "Content-Type": "application/edn",
                "Accept": "application/edn",
            }
        else:
            data = json.dumps(payload, default=_json_default).encode()
            headers = {"Content-Type": "application/json"}
        req = urllib.request.Request(
            f"{self.url}{path}", data=data, headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return self._decode(r)

    # -- Node surface -----------------------------------------------------
    def submit_tx(self, ops, tx_time=None) -> int:
        return self._post(
            "/_crux/submit-tx",
            {"tx-ops": [list(op) for op in ops],
             **({"tx-time": tx_time.isoformat()} if tx_time else {})},
        )["tx-id"]

    def await_tx(self) -> set[int]:
        return set(self._get("/_crux/await-tx")["aborted"])

    def db(self, valid_time=None, tx=None) -> "RemoteDb":
        return RemoteDb(self, valid_time, tx)

    def entity(self, eid: str):
        try:
            return self._get("/_crux/entity", eid=eid)
        except Exception:
            return None

    def status(self) -> dict:
        return self._get("/_crux/status")

    def latest_completed_tx(self):
        return self._get("/_crux/latest-completed-tx")["tx-id"]

    def latest_submitted_tx(self):
        return self._get("/_crux/latest-submitted-tx")["tx-id"]

    def tx_committed(self, tx_id: int) -> bool:
        return self._get("/_crux/tx-committed", **{"tx-id": tx_id})[
            "tx-committed?"
        ]

    def sync(self):
        return self._get("/_crux/sync")["tx-id"]

    def active_queries(self) -> list[dict]:
        return self._get("/_crux/active-queries")

    def recent_queries(self) -> list[dict]:
        return self._get("/_crux/recent-queries")

    def slowest_queries(self) -> list[dict]:
        return self._get("/_crux/slowest-queries")

    def attribute_stats(self) -> dict:
        return self._get("/_crux/attribute-stats")

    def open_tx_log(self, page_size: int = 100) -> list[dict]:
        """Page through the server's cursor (after-tx-id + limit) —
        client memory is the full log only because this convenience
        returns a list; iterate pages yourself for bounded reads."""
        out: list[dict] = []
        after = None
        while True:
            resp = self._get(
                "/_crux/tx-log",
                **{"after-tx-id": after, "limit": page_size},
            )
            out.extend(resp["tx-log"])
            after = resp.get("next-after-tx-id")
            if after is None:
                return out


class RemoteDb:
    def __init__(self, client: RemoteNode, valid_time, tx):
        self.client = client
        self.valid_time = valid_time
        self.tx = tx

    def _basis(self) -> dict:
        out = {}
        if self.valid_time is not None:
            out["valid-time"] = self.valid_time.isoformat()
        if self.tx is not None:
            out["tx-id"] = self.tx
        return out

    def q(self, query: dict, *args,
          page_size: int = DEFAULT_PAGE_LIMIT) -> list[list]:
        """Complete result set, like the reference client (RemoteApiClient
        q reads the cursor to exhaustion): pages through the server's
        limit/offset window until a short page, so results beyond the
        server's DEFAULT_PAGE_LIMIT are no longer silently truncated.
        Pass a query with its own :limit for a single bounded request.

        Paged consistency (r10 advice — pages re-execute server-side, so
        anything unpinned drifts between pages):
        - an unpinned basis is RESOLVED ONCE before the loop — tx to the
          server's latest-completed-tx, valid-time to the client clock —
          so concurrent writes between pages cannot duplicate/drop rows
          (the reference client streams one server-side cursor instead);
        - every page sends paged=true, which makes the server impose a
          canonical total order on queries without :order-by before
          windowing — Spark re-executions do not otherwise guarantee a
          stable row order across jobs after shuffles/AQE, so offset
          windows would not tile."""
        basis = self._basis()
        if "tx-id" not in basis:
            basis["tx-id"] = self.client.latest_completed_tx()
        if "valid-time" not in basis:
            basis["valid-time"] = dt.datetime.utcnow().isoformat()
        out: list[list] = []
        offset = 0
        while True:
            page = self.client._post(
                "/_crux/query",
                {"query": query, "in-args": list(args), "paged": True,
                 "limit": page_size, "offset": offset, **basis},
            )
            out.extend(page)
            if len(page) < page_size:
                return out
            offset += page_size

    def entity(self, eid: str):
        try:
            b = self._basis()
            return self.client._get(
                "/_crux/entity", eid=eid,
                **{k: v for k, v in b.items()},
            )
        except Exception:
            return None

    def entity_history(self, eid: str, ascending: bool = True,
                       with_corrections: bool = False,
                       with_docs: bool = True) -> list[dict]:
        return self.client._get(
            "/_crux/entity-history", eid=eid,
            **{"sort-order": "asc" if ascending else "desc",
               "with-corrections": "true" if with_corrections else None,
               # the local Db.entity_history returns docs, so the remote
               # facade requests them by default (the raw wire defaults
               # to stripped bodies like the reference)
               "with-docs": "true" if with_docs else None,
               **self._basis()},
        )
