"""HTTP facade conformance (crux-http-server routes over a Node):
submit-tx -> await -> entity/query/history/tx-log round trips through
real HTTP requests."""

import json
import urllib.error
import urllib.request

import pytest

from crux_spark.http import HttpNode
from crux_spark.node import Node


def get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def http_node(spark):
    node = Node(spark, schema="id string, name string, score long")
    h = HttpNode(node)
    yield h
    h.close()


def test_http_round_trip(http_node):
    base = http_node.url
    tx = post(base + "/_crux/submit-tx", {"tx-ops": [
        ["put", {"id": "u1", "name": "ann", "score": 10}],
        ["put", {"id": "u2", "name": "bob", "score": 25}],
    ]})
    assert tx["tx-id"] >= 1
    assert get(base + "/_crux/await-tx") == {"aborted": []}
    assert get(base + "/_crux/latest-completed-tx")["tx-id"] == tx["tx-id"]

    doc = get(base + "/_crux/entity?eid=u1")
    assert doc["name"] == "ann"

    res = post(base + "/_crux/query", {"query": {
        "find": ["?n"],
        "where": [["?u", ":name", "?n"], ["?u", ":score", "?s"],
                  [[">", "?s", 20]]],
    }})
    assert res == [["bob"]]

    # :in args over HTTP
    res = post(base + "/_crux/query", {"query": {
        "find": ["?s"], "in": ["?n"],
        "where": [["?u", ":name", "?n"], ["?u", ":score", "?s"]],
    }, "in-args": ["ann"]})
    assert res == [[10]]

    # correction then history
    post(base + "/_crux/submit-tx", {"tx-ops": [
        ["put", {"id": "u1", "name": "ann2", "score": 11}]]})
    get(base + "/_crux/await-tx")
    hist = get(base + "/_crux/entity-history?eid=u1&sort-order=asc"
               "&with-docs=true")
    assert [h["doc"]["name"] for h in hist] == ["ann", "ann2"]
    # reference default: bodies stripped without with-docs
    bare = get(base + "/_crux/entity-history?eid=u1&sort-order=asc")
    assert bare and all("doc" not in h for h in bare)

    log = get(base + "/_crux/tx-log")
    assert [e["tx_id"] for e in log["tx-log"]] == [1, 2]
    assert log["next-after-tx-id"] is None

    stats = get(base + "/_crux/attribute-stats")
    assert stats.get(":name", 0) >= 2

    assert get(base + "/_crux/status")


def test_http_monitoring_and_tx_routes(http_node):
    """The remaining reference routes (http_server.clj): sync,
    tx-committed, latest-submitted-tx, entity-tx, and the three query
    monitoring endpoints."""
    base = http_node.url
    post(base + "/_crux/submit-tx", {"tx-ops": [
        ["put", {"id": "m1", "name": "mon", "score": 1}],
    ]})
    assert get(base + "/_crux/sync")["tx-id"] >= 1
    assert get(base + "/_crux/latest-submitted-tx")["tx-id"] >= 1
    last = get(base + "/_crux/latest-completed-tx")["tx-id"]
    assert get(base + f"/_crux/tx-committed?tx-id={last}") == {
        "tx-committed?": True
    }
    with pytest.raises(urllib.error.HTTPError):  # unknown id -> 400
        get(base + "/_crux/tx-committed?tx-id=9999")

    etx = get(base + "/_crux/entity-tx?eid=m1")
    assert etx["eid"] == "m1" and "content_hash" in etx

    # run one query through the monitored path, then read the queues
    post(base + "/_crux/query", {
        "query": {"find": ["?e"], "where": [["?e", ":name", "mon"]]}
    })
    assert get(base + "/_crux/active-queries") == []
    recent = get(base + "/_crux/recent-queries")
    assert recent and recent[0]["status"] == "completed"
    assert isinstance(get(base + "/_crux/slowest-queries"), list)


def test_http_errors(http_node):
    base = http_node.url
    with pytest.raises(urllib.error.HTTPError) as e:
        get(base + "/_crux/entity?eid=missing-entity")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        get(base + "/_crux/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        post(base + "/_crux/query", {"query": {"in": ["?x"]}})  # no :find
    assert e.value.code == 400


def test_http_sparql_endpoint(http_node):
    # api_test.clj test-sparql: SELECT ?e WHERE { ?e <...name> "..." }
    import urllib.parse

    q = 'SELECT ?e WHERE { ?e <http://juxt.pro/crux/unqualified/name> "bob" }'
    res = get(http_node.url + "/_crux/sparql?query=" + urllib.parse.quote(q))
    assert res == [["u2"]]


def test_http_sparql_graph_verbs(http_node):
    """r15: DESCRIBE and CONSTRUCT route through the same endpoint,
    returning paged (s, p, o) triples (the reference's endpoint is
    SELECT-only — superset surface)."""
    import urllib.parse

    post(http_node.url + "/_crux/submit-tx", {"tx-ops": [
        ["put", {"id": "u1", "name": "ann", "score": 10}],
        ["put", {"id": "u2", "name": "bob", "score": 25}],
    ]})
    get(http_node.url + "/_crux/await-tx")

    def go(q, extra=""):
        return get(http_node.url + "/_crux/sparql?query="
                   + urllib.parse.quote(q) + extra)

    rows = {tuple(r) for r in go("DESCRIBE <u2>")}
    assert ("u2", ":name", "bob") in rows
    assert ("u2", ":score", "25") in rows
    rows2 = {tuple(r) for r in go(
        'CONSTRUCT { ?e <http://x/tag> "hi" } WHERE '
        '{ ?e <http://juxt.pro/crux/unqualified/score> ?s . '
        'FILTER (?s > 20) }')}
    assert rows2 == {("u2", ":tag", "hi")}
    # paged graph results are stable-ordered and offset correctly
    all_rows = go("DESCRIBE <u1> <u2>", "&paged=true")
    page2 = go("DESCRIBE <u1> <u2>", "&paged=true&offset=2")
    assert page2 == all_rows[2:]


def test_remote_node_client(spark):
    """crux-http-client parity: the RemoteNode client drives the same
    api surface over HTTP — the reference's API-parity-matrix idea
    (every_api.clj) with local and remote topologies agreeing."""
    import datetime as dt

    from crux_spark.http import RemoteNode

    node = Node(spark, schema="id string, v long")
    h = HttpNode(node)
    try:
        remote = RemoteNode(h.url)
        tx1 = remote.submit_tx([("put", {"id": "x", "v": 1})],
                               tx_time=dt.datetime(2020, 1, 1))
        assert remote.await_tx() == set()
        remote.submit_tx([("put", {"id": "x", "v": 2})],
                         tx_time=dt.datetime(2020, 6, 1))
        remote.await_tx()

        assert remote.entity("x")["v"] == 2
        assert remote.latest_completed_tx() == 2

        # remote db value pinned at tx basis agrees with the local one
        rdb = remote.db(tx=tx1)
        ldb = node.db(tx=tx1)
        assert rdb.entity("x")["v"] == ldb.entity("x")["v"] == 1

        res = remote.db().q(
            {"find": ["?v"], "where": [["?e", ":v", "?v"]]})
        assert res == [[2]]

        rh = remote.db().entity_history("x")
        lh = node.db().entity_history("x")
        assert [e["doc"]["v"] for e in rh] == [e["doc"]["v"] for e in lh] == [1, 2]

        assert [e["tx_id"] for e in remote.open_tx_log()] == [1, 2]
    finally:
        h.close()


def test_tx_log_pagination_bounded(spark):
    """Multi-page tx-log cursor: each request returns at most `limit`
    entries plus a next-after-tx-id cursor; following the cursor yields
    the full log exactly once, in order — the server never has to
    materialize more than limit+1 rows per request (http_server.clj's
    cursor semantics as JSON pagination)."""
    from crux_spark.http import RemoteNode

    node = Node(spark, schema="id string, v long")
    h = HttpNode(node)
    try:
        for i in range(7):
            node.submit_tx([("put", {"id": f"d{i}", "v": i})])
        node.await_tx()

        base = h.url
        seen, after, pages = [], None, 0
        while True:
            q = f"?limit=3" + (f"&after-tx-id={after}" if after else "")
            resp = get(base + "/_crux/tx-log" + q)
            assert len(resp["tx-log"]) <= 3  # bounded per request
            seen.extend(e["tx_id"] for e in resp["tx-log"])
            pages += 1
            after = resp["next-after-tx-id"]
            if after is None:
                break
        assert seen == list(range(1, 8))  # complete, ordered, no dups
        assert pages == 3  # 3 + 3 + 1 — the cursor really paged

        # the client convenience walks the same cursor transparently
        remote = RemoteNode(h.url)
        assert [e["tx_id"] for e in remote.open_tx_log(page_size=2)] == list(
            range(1, 8)
        )
    finally:
        h.close()


def test_query_stream_limit_offset(spark):
    """POST /_crux/query with limit/offset fetches through
    toLocalIterator — bounded result pages, stable order with order-by."""
    node = Node(spark, schema="id string, v long")
    h = HttpNode(node)
    try:
        for i in range(10):
            node.submit_tx([("put", {"id": f"e{i}", "v": i})])
        node.await_tx()
        q = {
            "find": ["?v"],
            "where": [["?e", ":v", "?v"]],
            "order-by": [["?v", "asc"]],
        }
        page1 = post(h.url + "/_crux/query", {"query": q, "limit": 4})
        page2 = post(
            h.url + "/_crux/query", {"query": q, "limit": 4, "offset": 4}
        )
        assert [r[0] for r in page1] == [0, 1, 2, 3]
        assert [r[0] for r in page2] == [4, 5, 6, 7]
    finally:
        h.close()


def test_http_page_limit_caps_unlimited_requests():
    """r9 (advisor): a request that omits 'limit' must get the server
    default page, and an absurd limit is capped — the facade never
    list()s an unbounded result driver-side."""
    from crux_spark.http import (
        DEFAULT_PAGE_LIMIT,
        MAX_PAGE_LIMIT,
        _page_limit,
    )

    assert _page_limit(None) == DEFAULT_PAGE_LIMIT
    assert _page_limit(7) == 7
    assert _page_limit("25") == 25
    assert _page_limit(10**9) == MAX_PAGE_LIMIT
    # r10 (advisor): non-positive limits are client errors, not empty
    # results or opaque 500s
    for bad in (0, -1, "-5"):
        with pytest.raises(ValueError):
            _page_limit(bad)


def test_http_nonpositive_limit_is_400(http_node):
    """limit=0 over the wire returns a 400 with an error body."""
    import json as _json
    from urllib.parse import quote

    q = quote(_json.dumps({"find": ["?e"], "where": [["?e", ":name", "?n"]]}))
    with pytest.raises(urllib.error.HTTPError) as ei:
        get(http_node.url + f"/_crux/query?queryJson={q}&limit=0")
    assert ei.value.code == 400


def test_remote_db_q_pages_to_completion(spark):
    """r10 (advisor): RemoteDb.q must return the COMPLETE result set like
    the reference client, paging limit/offset until a short page — not
    return one server-capped page verbatim."""
    from crux_spark.http import RemoteNode

    node = Node(spark, schema="id string, n long")
    h = HttpNode(node)
    try:
        remote = RemoteNode(h.url)
        remote.submit_tx([("put", {"id": f"d{i:02d}", "n": i})
                          for i in range(10)])
        remote.await_tx()
        q = {"find": ["?e", "?n"],
             "where": [["?e", ":n", "?n"]],
             "order-by": [["?n", "asc"]]}
        # page_size=3 forces 4 round trips (3+3+3+1); the union must be
        # the full ordered result
        rows = remote.db().q(q, page_size=3)
        assert [r[1] for r in rows] == list(range(10))
        # a query whose own :limit ends inside a page stops early too
        rows = remote.db().q({**q, "limit": 5}, page_size=3)
        assert [r[1] for r in rows] == list(range(5))
    finally:
        h.close()


def test_http_get_query_route(http_node):
    """GET /_crux/query with queryJson / inArgsJson params — the
    reference's queryEdn/inArgsEdn GET form
    (crux-http-server/test/crux/http_server/json_test.clj test-query),
    JSON being this facade's shared subset. Monitored + server-paged
    like the POST route."""
    import json as _json
    from urllib.parse import quote

    base = http_node.url
    post(base + "/_crux/submit-tx", {"tx-ops": [
        ["put", {"id": "sal", "name": "Sally", "score": 1}],
        ["put", {"id": "jed", "name": "Jed", "score": 2}],
    ]})
    get(base + "/_crux/await-tx")
    q = quote(_json.dumps({
        "find": ["?e"],
        "where": [["?e", ":name", "?n"]],
    }))
    rows = get(base + f"/_crux/query?queryJson={q}")
    assert {r[0] for r in rows} >= {"sal", "jed"}
    # :in args via inArgsJson
    q2 = quote(_json.dumps({
        "find": ["?e"], "in": ["?n"],
        "where": [["?e", ":name", "?n"]],
    }))
    args = quote(_json.dumps(["Jed"]))
    assert get(base + f"/_crux/query?queryJson={q2}&inArgsJson={args}") == [["jed"]]
    # limit/offset paging applies on the GET form too
    q3 = quote(_json.dumps({
        "find": ["?e"],
        "where": [["?e", ":name", "?n"]],
        "order-by": [["?e", "asc"]],
    }))
    page = get(base + f"/_crux/query?queryJson={q3}&limit=1&offset=0")
    assert len(page) == 1


def test_remote_db_q_unordered_pages_tile(spark):
    """r10 advice: multi-page results WITHOUT :order-by must tile — Spark
    gives no stable row order across re-executions, so the server imposes
    a canonical total order for paged requests (paged=true / offset>0).
    The union must be exactly the result set: no drops, no duplicates."""
    from crux_spark.http import RemoteNode

    node = Node(spark, schema="id string, n long")
    h = HttpNode(node)
    try:
        remote = RemoteNode(h.url)
        remote.submit_tx([("put", {"id": f"u{i:02d}", "n": i})
                          for i in range(10)])
        remote.await_tx()
        q = {"find": ["?e", "?n"], "where": [["?e", ":n", "?n"]]}
        rows = remote.db().q(q, page_size=3)  # 4 windows over 4 executions
        assert len(rows) == 10  # no page-boundary drops or duplicates
        assert sorted(r[1] for r in rows) == list(range(10))
    finally:
        h.close()


def test_remote_db_q_pins_unpinned_basis_across_pages(spark):
    """r10 advice: with an unpinned basis (client.db() default), the
    client must resolve latest-completed-tx ONCE before the page loop —
    a write landing between pages must not leak into later pages."""
    from crux_spark.http import RemoteNode

    node = Node(spark, schema="id string, n long")
    h = HttpNode(node)
    try:
        remote = RemoteNode(h.url)
        remote.submit_tx([("put", {"id": f"v{i:02d}", "n": i})
                          for i in range(10)])
        remote.await_tx()

        real_post = remote._post
        payloads = []

        def post_and_interleave_write(path, body):
            payloads.append(body)
            out = real_post(path, body)
            if len(payloads) == 1:
                # a concurrent writer lands between page 1 and page 2
                node.submit_tx([("put", {"id": f"w{i:02d}", "n": 100 + i})
                                for i in range(5)])
                node.await_tx()
            return out

        remote._post = post_and_interleave_write
        q = {"find": ["?e", "?n"], "where": [["?e", ":n", "?n"]]}
        rows = remote.db().q(q, page_size=3)
        assert sorted(r[1] for r in rows) == list(range(10))  # not 15
        # every page carried the same pinned basis + the paged flag
        assert len(payloads) == 4
        assert len({p["tx-id"] for p in payloads}) == 1
        assert payloads[0]["tx-id"] is not None
        assert len({p["valid-time"] for p in payloads}) == 1
        assert all(p["paged"] for p in payloads)
        # the mid-paging write IS visible to a fresh unpinned db
        rows2 = remote.db().q(q, page_size=100)
        assert len(rows2) == 15
    finally:
        h.close()


# ---------------------------------------------------------------------------
# EDN content negotiation (http_server.clj ->content-type): Accept:
# application/edn answers EDN with keywords and #inst intact; an EDN
# request body (keyword keys, #inst literals) is accepted symmetrically.


def _edn_req(url, body=None):
    from crux_spark import edn

    data = edn.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url,
        data=data,
        headers={
            "Accept": "application/edn",
            **({"Content-Type": "application/edn"} if data else {}),
        },
        method="POST" if data else "GET",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.headers["Content-Type"] == "application/edn"
        return edn.loads(r.read().decode())


def test_http_edn_round_trip(spark):
    """Keyword and #inst values survive submit -> query through the EDN
    path: the doc goes in as EDN (keyword keys, keyword value, #inst
    value) and the query result comes back as EDN tuples carrying the
    same keyword and the same instant (r10 verdict #9)."""
    import datetime as dt

    node = Node(spark, schema="id string, kind string, at timestamp")
    h = HttpNode(node)
    try:
        base = h.url
        at = dt.datetime(2023, 5, 1, 12, 30)
        tx = _edn_req(
            base + "/_crux/submit-tx",
            {":tx-ops": [["put", {":id": "e1", ":kind": ":type/widget",
                                  ":at": at}]]},
        )
        assert tx["tx-id"] >= 1
        assert get(base + "/_crux/await-tx") == {"aborted": []}

        res = _edn_req(
            base + "/_crux/query",
            {":query": {":find": ["?k", "?at"],
                        ":where": [["?e", ":kind", "?k"],
                                   ["?e", ":at", "?at"]]}},
        )
        assert res == [[":type/widget", at]]

        # JSON stays the default on the same server
        res_json = post(base + "/_crux/query", {"query": {
            "find": ["?k"], "where": [["?e", ":kind", "?k"]]}})
        assert res_json == [[":type/widget"]]
    finally:
        h.close()


def test_edn_codec_round_trip():
    """The EDN printer/reader cover the spec subset the HTTP surface
    exchanges, including nesting, sets, decimals, and #_ discard."""
    import datetime as dt
    from decimal import Decimal

    from crux_spark import edn

    vals = [
        None, True, False, 42, -7, 3.5, "plain text", "with \"quotes\"\n",
        ":kw", ":ns/kw", Decimal("10.25"),
        dt.datetime(2024, 2, 29, 23, 59, 59),
        [1, [2, {":a": {":b": [None]}}]],
        {":k": [1, 2], "s": {"nested": True}},
    ]
    for v in vals:
        assert edn.loads(edn.dumps(v)) == v, v
    assert edn.loads(edn.dumps({1, 2, 3})) == {1, 2, 3}
    assert edn.loads("#_ {:dropped 1} [:kept]") == [":kept"]
    assert edn.loads("(1, 2, 3)") == [1, 2, 3]  # commas are whitespace
    assert edn.loads("7N") == 7
    assert edn.loads('#inst "2023-05-01T12:30:00+02:00"') == dt.datetime(
        2023, 5, 1, 10, 30
    )
    assert edn.unkeyword_keys({":q": [{":find": 1}]}) == {"q": [{"find": 1}]}


def test_remote_client_edn_mode(spark):
    """RemoteNode(edn=True): the client ships EDN both ways, so query
    results keep typed values — #inst instants return as datetimes and
    keyword values as ':kw' strings — and tx ops carry real datetimes
    (the reference client's native format)."""
    import datetime as dt

    from crux_spark.http import RemoteNode

    node = Node(spark, schema="id string, kind string, at timestamp")
    h = HttpNode(node)
    try:
        remote = RemoteNode(h.url, edn=True)
        at = dt.datetime(2024, 7, 4, 9, 15)
        remote.submit_tx([("put", {"id": "e1", "kind": ":k/alpha", "at": at})])
        remote.await_tx()
        rows = remote.db().q({
            "find": ["?k", "?at"],
            "where": [["?e", ":kind", "?k"], ["?e", ":at", "?at"]],
        })
        assert rows == [[":k/alpha", at]]  # typed, not stringified
        assert remote.latest_completed_tx() == 1
        assert remote.entity("e1")["kind"] == ":k/alpha"
        # same server, JSON client: instant degrades to a string
        rows_json = RemoteNode(h.url).db().q({
            "find": ["?at"], "where": [["?e", ":at", "?at"]]})
        assert isinstance(rows_json[0][0], str)
    finally:
        h.close()


def test_http_edn_entity_returns_typed_doc(spark):
    """r12 typed docs over the EDN wire: a doc submitted with datetime /
    Decimal / Char / BigInt values comes back from GET /_crux/entity
    with Accept: application/edn as the SAME typed values — the store's
    docjson sidecar decodes server-side and the EDN printer carries
    #inst / M / \\c / N literals across (the reference returns EDN docs
    verbatim, api_test.clj)."""
    import datetime as dt
    from decimal import Decimal

    from crux_spark.valuetypes import BigInt, Char

    node = Node(spark)
    h = HttpNode(node)
    try:
        base = h.url
        at = dt.datetime(2024, 5, 1, 12, 30)
        _edn_req(
            base + "/_crux/submit-tx",
            {":tx-ops": [["put", {":id": "t1", ":at": at,
                                  ":amt": Decimal("12.50"),
                                  ":c": Char("m"),
                                  ":big": BigInt(10**25)}]]},
        )
        assert get(base + "/_crux/await-tx") == {"aborted": []}
        doc = _edn_req(base + "/_crux/entity?eid=t1")
        vals = {k.lstrip(":"): v for k, v in doc.items()}
        assert vals["at"] == at and isinstance(vals["at"], dt.datetime)
        assert vals["amt"] == Decimal("12.50")
        assert isinstance(vals["amt"], Decimal)
        assert vals["c"] == "m" and isinstance(vals["c"], Char)
        assert vals["big"] == 10**25 and isinstance(vals["big"], BigInt)
    finally:
        h.close()
