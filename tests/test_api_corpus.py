"""Supplemental ports from crux-test/test/crux/api_test.clj: snapshot
semantics of db values, invalid-doc validation, evict-then-re-put, and
the vector / malformed query forms accepted by api/q."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q
from crux_spark.node import Node, NodeOutOfSyncError


def test_db_is_a_snapshot(spark):
    # api_test.clj:364 — a db value keeps its basis across later txs
    node = Node(spark, schema="id string, count long")
    node.submit_tx([("put", {"id": "foo", "count": 0})])
    node.await_tx()
    db = node.db()
    assert db.entity("foo")["count"] == 0
    node.submit_tx([("put", {"id": "foo", "count": 1})])
    node.await_tx()
    assert db.entity("foo")["count"] == 0
    assert node.db().entity("foo")["count"] == 1


def test_invalid_doc_raises(spark):
    # api_test.clj:172 — a put of a doc without an id is rejected
    node = Node(spark, schema="id string")
    with pytest.raises(ValueError, match="id"):
        node.submit_tx([("put", {})])


def test_adding_back_evicted_document(spark):
    # api_test.clj:205
    node = Node(spark, schema="id string")
    node.submit_tx([("put", {"id": "foo"})])
    node.await_tx()
    assert node.db().entity("foo") is not None
    node.submit_tx([("evict", "foo")])
    node.await_tx()
    assert node.db().entity("foo") is None
    node.submit_tx([("put", {"id": "foo"})])
    node.await_tx()
    assert node.db().entity("foo") is not None


def test_future_tx_time_raises_546(spark):
    node = Node(spark, schema="id string")
    node.submit_tx([("put", {"id": "foo"})], tx_time=dt.datetime(2020, 1, 1))
    node.await_tx()
    with pytest.raises(NodeOutOfSyncError):
        node.db(tx_time=dt.datetime(2020, 1, 1, 0, 0, 10))


@pytest.fixture(scope="module")
def ivan_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
    )
    cat.add_documents(
        "people", spark.createDataFrame([("ivan", "Ivan")], schema), id_col="id"
    )
    return cat


def test_query_vector_form(ivan_catalog):
    # api_test.clj:117 "query vector": flat list alternating sections
    res = q(ivan_catalog, ["find", "?e", "where", ["?e", ":name", "Ivan"]])
    assert [r.e for r in res.collect()] == ["ivan"]
    # with limit
    res = q(
        ivan_catalog,
        ["find", "?e", "where", ["?e", ":name", "Ivan"], "limit", 1],
    )
    assert len(res.collect()) == 1


def test_malformed_query_raises(ivan_catalog):
    # api_test.clj:121 "malformed query" — no :find
    with pytest.raises(ValueError, match="expected structure"):
        q(ivan_catalog, {"in": ["$", "?e"]})
    with pytest.raises(ValueError, match="expected structure"):
        q(ivan_catalog, ["where", ["?e", ":name", "Ivan"]])


def test_listen_for_indexed_txs(spark):
    # api_test.clj:386 — listeners observe committed txs with their ops,
    # in order; events stop after unsubscribe
    node = Node(spark, schema="id string")
    events = []
    node.submit_tx([("put", {"id": "foo"})])
    node.await_tx()  # before subscription: not observed

    unsub = node.listen(events.append)
    tx_bar = node.submit_tx([("put", {"id": "bar"})])
    tx_baz = node.submit_tx([("put", {"id": "baz"})])
    node.await_tx()
    unsub()
    node.submit_tx([("put", {"id": "ivan"})])
    node.await_tx()

    assert [e["tx_id"] for e in events] == [tx_bar, tx_baz]
    assert all(e["committed"] and e["event_type"] == "indexed-tx" for e in events)
    assert events[0]["tx_ops"][0][1]["id"] == "bar"

    # aborted txs are reported with committed=False
    node.listen(events.append)
    bad = node.submit_tx([("match", "nope", {"id": "nope", "x": 1}), ("put", {"id": "q"})])
    node.await_tx()
    assert events[-1]["tx_id"] == bad and events[-1]["committed"] is False


def test_open_q_and_basis(spark):
    # api.clj open-q (lazy cursor) + db-basis
    node = Node(spark, schema="id string, v long")
    node.submit_tx([("put", {"id": f"e{i}", "v": i}) for i in range(10)])
    node.await_tx()
    db = node.db()
    assert db.basis()["tx-id"] == 1
    it = db.open_q({"find": ["?v"], "where": [["?e", ":v", "?v"]]})
    got = sorted(r.v for r in it)
    assert got == list(range(10))


def test_db_explain(spark):
    node = Node(spark, schema="id string, v long")
    node.submit_tx([("put", {"id": "a", "v": 1})])
    node.await_tx()
    facts = node.db().explain(
        {"find": ["?v"], "where": [["?e", ":v", "?v"], [[">", "?v", 0]]]}
    )
    assert isinstance(facts, dict)
    assert "shuffles" in facts or "scans" in facts or facts  # plan facts present
