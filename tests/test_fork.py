"""Port of the reference's speculative-fork corpus
(crux-core/test/crux/fork_test.clj): with-tx on a db VALUE — empty
fork, base isolation, delete/evict in forks, nil on failed match, and
point-in-past / point-in-future speculation where txs after the fork
basis are invisible."""

import datetime as dt

import pytest

from crux_spark.node import Node

NAMES = {"find": ["?name"], "where": [["?e", ":name", "?name"]]}


def names(db):
    return {r.name for r in db.q(NAMES).collect()}


def test_empty_fork(spark):
    node = Node(spark, schema="name string")
    db = node.db().with_tx([("put", {"id": "foo", "name": "Foo"})])
    assert db.entity("foo")["name"] == "Foo"
    assert node.db().entity("foo") is None  # base untouched


def test_simple_fork(spark):
    node = Node(spark, schema="name string")
    node.submit_tx([("put", {"id": "ivan", "name": "Ivna"})])
    node.await_tx()
    db = node.db()
    db2 = db.with_tx([("put", {"id": "ivan", "name": "Ivan"})])
    assert names(db) == {"Ivna"}
    assert names(db2) == {"Ivan"}
    # can delete an entity in a fork
    assert names(db.with_tx([("delete", "ivan")]) ) == set()
    assert names(
        db.with_tx([("put", {"id": "petr", "name": "Petr"}), ("delete", "ivan")])
    ) == {"Petr"}
    # returns None on failed match
    assert db.with_tx([("match", "nope", {"id": "nope"})]) is None


def test_fork_history(spark):
    node = Node(spark, schema="name string")
    node.submit_tx([("put", {"id": "ivan", "name": "Ivna"})])
    node.await_tx()
    db2 = node.db().with_tx([("put", {"id": "ivan", "name": "Ivan"})])
    hist = db2.node.store.entity_history("ivan", with_corrections=True)
    assert [h["doc"]["name"] for h in hist] == ["Ivna", "Ivan"]


def test_speculative_from_point_in_past(spark):
    node = Node(spark, schema="name string")
    tx0 = node.submit_tx([("put", {"id": "ivan", "name": "Ivan0"})])
    node.await_tx()
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan1"})])
    node.await_tx()
    db0 = node.db(tx=tx0)
    # fork from the past: Ivan1 (a LATER tx) is invisible
    db1 = db0.with_tx([("put", {"id": "petr", "name": "Petr"})])
    assert db1.entity("ivan")["name"] == "Ivan0"
    # ...also in history: the fork's correction lands on Ivan0, Ivan1
    # never appears
    db2 = db0.with_tx([("put", {"id": "ivan", "name": "Ivan2"})])
    hist = db2.node.store.entity_history("ivan", with_corrections=True)
    assert [h["doc"]["name"] for h in hist] == ["Ivan0", "Ivan2"]


def test_speculative_from_point_in_future(spark):
    node = Node(spark, schema="name string")
    t0 = dt.datetime(2021, 1, 1)
    future = dt.datetime(2021, 1, 1, 0, 10)
    halfway = dt.datetime(2021, 1, 1, 0, 5)
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan0"})], tx_time=t0)
    node.await_tx()
    node.submit_tx(
        [("put", {"id": "ivan", "name": "Future Ivan"}, future)], tx_time=t0
    )
    node.await_tx()
    future_db = node.db(future)
    db = future_db.with_tx(
        [
            # unranged put defaults to the DB's valid time (the future)
            ("put", {"id": "ivan", "name": "Future Ivan 2"}),
            ("put", {"id": "ivan", "name": "5m Future Ivan"}, halfway),
        ]
    )
    hist = db.node.store.entity_history("ivan", with_corrections=True)
    assert [(h["valid_from"], h["doc"]["name"]) for h in hist] == [
        (t0, "Ivan0"),
        (halfway, "5m Future Ivan"),
        (future, "Future Ivan"),
        (future, "Future Ivan 2"),
    ]
    assert db.entity("ivan")["name"] == "Future Ivan 2"


def test_fork_evict(spark):
    node = Node(spark, schema="name string")
    node.submit_tx(
        [("put", {"id": "ivan", "name": "Ivan"}), ("put", {"id": "petr", "name": "Petr"})]
    )
    node.await_tx()
    db = node.db()
    db_evict = db.with_tx([("evict", "petr")])
    assert db.entity("petr")["name"] == "Petr"  # base keeps petr
    assert db_evict.entity("petr") is None
    assert db_evict.node.store.entity_history("petr") == []
    assert db_evict.node.store.entity_history("ivan")
    assert names(db_evict) == {"Ivan"}
