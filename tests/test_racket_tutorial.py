"""The Racket Datalog tutorial through the full Node write+query path
(query_test.clj:2903-3013): facts asserted and DELETED via transactions,
queried through Datalog at multiple points in time — including querying
a db value captured BEFORE a delete (bitemporal time travel through the
Datalog surface)."""

import datetime as dt

import pytest

from crux_spark.node import Node

ANCESTOR_RULES = [
    [["ancestor", "?a", "?b"], ["?a", ":parent", "?b"]],
    [
        ["ancestor", "?a", "?b"],
        ["?a", ":parent", "?c"],
        ["ancestor", "?c", "?b"],
    ],
]


def t(day):
    return dt.datetime(2023, 5, day)


def rows(df):
    return {tuple(r) if len(r) > 1 else r[0] for r in df.collect()}


@pytest.fixture()
def node(spark):
    n = Node(spark, schema="id string, parent string")
    n.submit_tx([("put", {"id": "john", "parent": "douglas"})], tx_time=t(1))
    n.await_tx()
    return n


def test_racket_datalog_tutorial(node):
    db = node.db(valid_time=t(2))
    # parent(john, douglas)?
    assert rows(
        db.q(
            {
                "find": ["?found"],
                "where": [
                    ["john", ":parent", "douglas"],
                    [["identity", True], "?found"],
                ],
            }
        )
    ) == {True}
    # parent(john, ebbon)?
    assert (
        db.q(
            {
                "find": ["?found"],
                "where": [
                    ["john", ":parent", "ebbon"],
                    [["identity", True], "?found"],
                ],
            }
        ).count()
        == 0
    )

    node.submit_tx(
        [
            ("put", {"id": "bob", "parent": "john"}),
            ("put", {"id": "ebbon", "parent": "bob"}),
        ],
        tx_time=t(3),
    )
    node.await_tx()
    db = node.db(valid_time=t(4))

    # parent(A, B)?
    assert rows(db.q({"find": ["?a", "?b"], "where": [["?a", ":parent", "?b"]]})) == {
        ("john", "douglas"),
        ("bob", "john"),
        ("ebbon", "bob"),
    }
    # parent(john, B)?
    assert rows(db.q({"find": ["?b"], "where": [["john", ":parent", "?b"]]})) == {
        "douglas"
    }
    # parent(A, A)?
    assert (
        db.q({"find": ["?a"], "where": [["?a", ":parent", "?a"]]}).count() == 0
    )

    # ancestor(A, B)?
    full_closure = {
        ("ebbon", "bob"),
        ("bob", "john"),
        ("john", "douglas"),
        ("bob", "douglas"),
        ("ebbon", "john"),
        ("ebbon", "douglas"),
    }
    assert rows(
        db.q(
            {
                "find": ["?a", "?b"],
                "where": [["ancestor", "?a", "?b"]],
                "rules": ANCESTOR_RULES,
            }
        )
    ) == full_closure
    # ancestor(X, john)?
    assert rows(
        db.q(
            {
                "find": ["?x"],
                "where": [["ancestor", "?x", "john"]],
                "rules": ANCESTOR_RULES,
            }
        )
    ) == {"bob", "ebbon"}

    # parent(bob, john)- : delete bob, then re-query
    node.submit_tx([("delete", "bob")], tx_time=t(5))
    node.await_tx()
    db_after = node.db(valid_time=t(6))
    assert rows(
        db_after.q({"find": ["?a", "?b"], "where": [["?a", ":parent", "?b"]]})
    ) == {("john", "douglas"), ("ebbon", "bob")}
    assert rows(
        db_after.q(
            {
                "find": ["?a", "?b"],
                "where": [["ancestor", "?a", "?b"]],
                "rules": ANCESTOR_RULES,
            }
        )
    ) == {("ebbon", "bob"), ("john", "douglas")}

    # can query the previous state (time travel to before the delete)
    db_before = node.db(valid_time=t(4))
    assert rows(
        db_before.q(
            {
                "find": ["?a", "?b"],
                "where": [["ancestor", "?a", "?b"]],
                "rules": ANCESTOR_RULES,
            }
        )
    ) == full_closure
