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
    hist = get(base + "/_crux/entity-history?eid=u1&sort-order=asc")
    assert [h["doc"]["name"] for h in hist] == ["ann", "ann2"]

    log = get(base + "/_crux/tx-log")
    assert [e["tx_id"] for e in log] == [1, 2]

    stats = get(base + "/_crux/attribute-stats")
    assert stats.get(":name", 0) >= 2

    assert get(base + "/_crux/status")


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
