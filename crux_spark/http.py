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
    GET  /_crux/tx-log
    GET  /_crux/latest-completed-tx
    GET  /_crux/attribute-stats

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

    def __init__(self, node, host: str = "127.0.0.1", port: int = 0):
        self.node = node
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, payload):
                body = json.dumps(payload, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def do_GET(self):
                u = urlparse(self.path)
                qs = {k: v[0] for k, v in parse_qs(u.query).items()}
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
            return self._db(qs).entity_history(
                qs["eid"],
                ascending=qs.get("sort-order", "asc") == "asc",
                with_corrections=qs.get("with-corrections") == "true",
            )
        if path == "/_crux/await-tx":
            return {"aborted": sorted(node.await_tx())}
        if path == "/_crux/tx-log":
            return [r.asDict() for r in node.open_tx_log().collect()]
        if path == "/_crux/latest-completed-tx":
            return {"tx-id": node.latest_completed_tx()}
        if path == "/_crux/attribute-stats":
            return node.attribute_stats()
        if path == "/_crux/sparql":
            # the reference's SPARQL endpoint (http_server.clj /_crux/sparql;
            # api_test.clj test-sparql drives it through RDF4J's
            # SPARQLRepository) — compiled through sources/sparql.py
            from crux_spark.sources.sparql import sparql_to_datalog

            df = self._db(qs).q(sparql_to_datalog(qs["query"]))
            return [list(r) for r in df.collect()]
        raise KeyError(f"no route {path}")

    def _post(self, path: str, body: dict):
        node = self.node
        if path == "/_crux/query":
            db = self.node.db(
                valid_time=_parse_time(body.get("valid-time")),
                tx=body.get("tx-id"),
            )
            df = db.q(body["query"], *body.get("in-args", []))
            return [list(r) for r in df.collect()]
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
