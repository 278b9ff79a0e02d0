"""Ports of the reference's documentation example corpora:

- crux.docs.examples.bitemporality-test (docs/articles .../
  bitemporality_test.clj) — the airport-entry time-travel walkthrough:
  14 valid-time puts across 7 entities, then the canonical
  (valid-time, transaction-time) query pinned at the day-3 transaction.
- crux.docs.examples.transactions.transactions-test (docs/reference
  .../transactions/transactions_test.clj) — the reference-manual
  transaction snippets: ranged put, ranged delete, match+delete, evict,
  tx-fn anatomy, speculative with-tx, and pre-await visibility.
"""

import datetime as dt

import pytest

from crux_spark.node import Node


def d(day, month=1, year=2019):
    return dt.datetime(year, month, day)


D1231 = dt.datetime(2018, 12, 31)


# ---------------------------------------------------------------------------
# bitemporality_test.clj — the airport walkthrough
# ---------------------------------------------------------------------------


def test_bitemp_airport_walkthrough(spark):
    node = Node(
        spark,
        schema="id string, `entry-pt` string, `arrival-time` string, "
        "`departure-time` string",
    )

    def put(doc, vt):
        tx = node.submit_tx([("put", doc, vt)])
        node.await_tx()
        return tx

    def doc(p, pt, arr, dep="na"):
        return {
            "id": p, "entry-pt": pt, "arrival-time": arr,
            "departure-time": dep,
        }

    put(doc("p2", "SFO", "2018-12-31"), D1231)                      # bitemp0
    put(doc("p3", "LA", "2018-12-31"), D1231)                       # bitemp1
    put(doc("p4", "NY", "2019-01-02"), d(2))                        # bitemp2
    tx3 = put(doc("p4", "NY", "2019-01-02", "2019-01-03"), d(3))    # bitemp3
    put(doc("p1", "NY", "2018-12-31"), D1231)                       # bitemp4
    put(doc("p1", "NY", "2018-12-31", "2019-01-03"), d(3))          # bitemp4b
    put(doc("p1", "LA", "2019-01-04"), d(4))                        # bitemp4c
    put(doc("p3", "LA", "2018-12-31", "2019-01-04"), d(4))          # bitemp4d
    put(doc("p2", "SFO", "2018-12-31", "2019-01-05"), d(5))         # bitemp5
    put(doc("p3", "LA", "2018-12-31"), d(4))                        # bitemp7a
    put(doc("p3", "LA", "2018-12-31", "2019-01-07"), d(7))          # bitemp7b
    put(doc("p3", "SFO", "2019-01-08"), d(8))                       # bitemp8a
    put(doc("p4", "LA", "2019-01-08"), d(8))                        # bitemp8b
    put(doc("p3", "SFO", "2019-01-08", "2019-01-08"), d(9))         # bitemp9
    put(doc("p5", "LA", "2019-01-10"), d(10))                       # bitemp10
    put(doc("p7", "NY", "2019-01-11"), d(11))                       # bitemp11
    put(doc("p6", "NY", "2019-01-12"), d(12))                       # bitemp12

    # `as at` valid-time 2019-01-02, `as of` the day-3 transaction
    db = node.db(valid_time=d(2), tx=tx3)
    res = db.q(
        {
            "find": ["?p", "?entry", "?arr", "?dep"],
            "where": [
                ["?p", ":entry-pt", "?entry"],
                ["?p", ":arrival-time", "?arr"],
                ["?p", ":departure-time", "?dep"],
            ],
        }
    )
    got = {tuple(r) for r in res.collect()}
    assert got == {
        ("p2", "SFO", "2018-12-31", "na"),
        ("p3", "LA", "2018-12-31", "na"),
        ("p4", "NY", "2019-01-02", "na"),
    }


# ---------------------------------------------------------------------------
# transactions_test.clj — the reference-manual transaction snippets
# ---------------------------------------------------------------------------

PABLO = {"id": "Pablo-Picasso", "first-name": "Pablo"}
VT_LO = dt.datetime(2018, 5, 18, 9, 20, 27)
VT_HI = dt.datetime(2018, 5, 19, 8, 31, 15)
IN_RANGE = dt.datetime(2018, 5, 18, 10, 20, 27)
BEFORE = dt.datetime(2018, 5, 17, 10, 20, 27)


@pytest.fixture()
def pablo_node(spark):
    return Node(
        spark, schema="id string, `first-name` string, age long, name string"
    )


def _pablo(node, vt=None):
    return node.db(valid_time=vt).entity("Pablo-Picasso")


def test_put_with_end_valid_time(pablo_node):
    node = pablo_node
    node.submit_tx([("put", PABLO, VT_LO, VT_HI)])
    node.await_tx()
    assert _pablo(node) is None
    assert _pablo(node, IN_RANGE) is not None
    assert _pablo(node, BEFORE) is None


def test_delete_with_end_valid_time(pablo_node):
    node = pablo_node
    node.submit_tx([("put", PABLO, dt.datetime(2017, 1, 1))])
    node.await_tx()
    node.submit_tx([("delete", "Pablo-Picasso", VT_LO, VT_HI)])
    node.await_tx()
    assert _pablo(node) is not None
    assert _pablo(node, IN_RANGE) is None
    assert _pablo(node, BEFORE) is not None


def test_match_guards_delete(pablo_node):
    node = pablo_node
    node.submit_tx([("put", PABLO, dt.datetime(2017, 1, 1))])
    node.await_tx()
    # match succeeds at the given valid time -> the delete applies
    node.submit_tx(
        [
            ("match", "Pablo-Picasso", PABLO,
             dt.datetime(2018, 5, 18, 9, 21, 31)),
            ("delete", "Pablo-Picasso"),
        ]
    )
    node.await_tx()
    assert _pablo(node) is None
    assert _pablo(node, IN_RANGE) is not None
    assert _pablo(node, BEFORE) is not None


def test_evict_erases_all_time(pablo_node):
    node = pablo_node
    node.submit_tx([("put", PABLO, dt.datetime(2017, 1, 1))])
    node.await_tx()
    node.submit_tx([("evict", "Pablo-Picasso")])
    node.await_tx()
    assert _pablo(node) is None
    assert _pablo(node, IN_RANGE) is None
    assert _pablo(node, BEFORE) is None


def test_tx_function_anatomy(pablo_node):
    node = pablo_node

    def increment_age(db, eid):
        entity = db.entity(eid)
        entity["age"] = entity["age"] + 1
        return [("put", entity)]

    node.store.register_tx_fn("increment-age", increment_age)
    node.submit_tx([("put", {"id": "ivan", "age": 0})])
    node.await_tx()
    node.submit_tx([("fn", "increment-age", "ivan")])
    node.await_tx()
    got = node.db().entity("ivan")
    assert got["age"] == 1


def test_speculative_transactions(spark):
    node = Node(spark, schema="id string, name string")
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan"})])
    node.await_tx()
    all_names = {"find": ["?name"], "where": [["?e", ":name", "?name"]]}
    db = node.db()
    assert {r.name for r in db.q(all_names).collect()} == {"Ivan"}
    spec_db = db.with_tx([("put", {"id": "petr", "name": "Petr"})])
    assert {r.name for r in spec_db.q(all_names).collect()} == {"Ivan", "Petr"}
    # neither the original db value nor the node was impacted
    assert {r.name for r in db.q(all_names).collect()} == {"Ivan"}
    assert {r.name for r in node.db().q(all_names).collect()} == {"Ivan"}


def test_awaiting_indexing_visibility(spark):
    node = Node(spark, schema="id string, name string")
    node.submit_tx([("put", {"id": "ivan"})])
    # not indexed yet: a snapshot taken now must not see :ivan
    assert node.db().entity("ivan") is None
    node.await_tx()
    assert node.db().entity("ivan") is not None
