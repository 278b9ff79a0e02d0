"""Port of the reference's REPL walkthrough
(crux-test/test/crux/repl_walkthrough_test.clj): the documented user
journey — graph traversal over cardinality-many refs with :args and
rules, then the bitemporal correction/evict/re-put narrative with
pull [*]."""

import datetime as dt

import pytest

from crux_spark import Catalog
from crux_spark.datalog import q
from crux_spark.node import Node


@pytest.fixture(scope="module")
def graph_cat(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("user_name", T.StringType()),
            T.StructField("role_name", T.StringType()),
            T.StructField("group_name", T.StringType()),
            T.StructField("rig_name", T.StringType()),
            T.StructField("hasRoleInGroups", T.ArrayType(T.StringType())),
            T.StructField("hasGroups", T.ArrayType(T.StringType())),
            T.StructField("hasRoles", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        ("User1", "User1", None, None, None, ["U1G3R34", "U1G2R23"], None, None),
        ("User2", "User2", None, None, None,
         ["U2G2R34", "U2G3R56", "U2G1R25"], None, None),
    ] + [
        (f"Role{i}", None, f"Role{i}", None, None, None, None, None)
        for i in range(1, 7)
    ] + [
        (f"Group{i}", None, None, f"Group{i}", None, None, None, None)
        for i in range(1, 4)
    ] + [
        ("U2G2R34", None, None, None, "U2G2R34", None, ["Group2"], ["Role3", "Role4"]),
        ("U1G2R23", None, None, None, "U1G2R23", None, ["Group2"], ["Role2", "Role3"]),
        ("U1G3R34", None, None, None, "U1G3R34", None, ["Group3"], ["Role3", "Role4"]),
        ("U2G3R56", None, None, None, "U2G3R56", None, ["Group3"], ["Role5", "Role6"]),
        ("U2G1R25", None, None, None, "U2G1R25", None, ["Group1"], ["Role2", "Role5"]),
        ("U1G1R12", None, None, None, "U1G1R12", None, ["Group1"], ["Role1", "Role2"]),
    ]
    c = Catalog(spark)
    c.add_documents("graph", spark.createDataFrame(rows, schema), id_col="id")
    return c


def test_graph_traversal(graph_cat):
    got = q(
        graph_cat,
        {
            "find": ["?roleName"],
            "where": [
                ["?e", ":hasRoleInGroups", "?rig"],
                ["?rig", ":hasGroups", "?group"],
                ["?rig", ":hasRoles", "?role"],
                ["?role", ":role_name", "?roleName"],
            ],
            "args": [{"?e": "User1", "?group": "Group2"}],
        },
    )
    assert {r.roleName for r in got.collect()} == {"Role2", "Role3"}

    got = q(
        graph_cat,
        {
            "find": ["?groupName", "?roleName"],
            "where": [
                ["?e", ":hasRoleInGroups", "?rig"],
                ["?rig", ":hasGroups", "?group"],
                ["?group", ":group_name", "?groupName"],
                ["?rig", ":hasRoles", "?role"],
                ["?role", ":role_name", "?roleName"],
            ],
            "args": [{"?e": "User2"}],
        },
    )
    assert {tuple(r) for r in got.collect()} == {
        ("Group1", "Role5"), ("Group3", "Role5"), ("Group2", "Role4"),
        ("Group3", "Role6"), ("Group2", "Role3"), ("Group1", "Role2"),
    }

    got = q(
        graph_cat,
        {
            "find": ["?groupName", "?roleName"],
            "where": [
                ["user-roles-in-groups", "?user", "?role", "?group"],
                ["?group", ":group_name", "?groupName"],
                ["?role", ":role_name", "?roleName"],
            ],
            "rules": [
                [
                    ["user-roles-in-groups", "?user", "?role", "?group"],
                    ["?user", ":hasRoleInGroups", "?rig"],
                    ["?rig", ":hasGroups", "?group"],
                    ["?rig", ":hasRoles", "?role"],
                ]
            ],
            "args": [{"?user": "User1"}],
        },
    )
    assert {tuple(r) for r in got.collect()} == {
        ("Group3", "Role4"), ("Group3", "Role3"),
        ("Group2", "Role3"), ("Group2", "Role2"),
    }


def test_walkthrough_bitemporal_narrative(spark):
    """Duplicate put in one tx (later op wins), match-guarded update,
    delete, time travel with pull [*], evict, re-put."""
    node = Node(
        spark,
        schema="name string, last_name string, location string, height double",
    )
    born = dt.datetime(1881, 10, 25, 9, 20, 27)
    died = dt.datetime(1973, 4, 8, 9, 20, 27)
    pp = {"id": "Pablo-Picasso", "name": "Pablo", "last_name": "Picasso"}
    node.submit_tx(
        [
            ("put", {**pp, "location": "Spain"}, born),
            ("put", {**pp, "location": "Sain2"}, born),  # same tx: later wins
        ]
    )
    node.await_tx()
    node.submit_tx(
        [
            ("match", "Pablo-Picasso", {**pp, "location": "Sain2"}, died),
            ("put", {**pp, "height": 1.63, "location": "France"}, died),
        ]
    )
    assert node.await_tx() == set()
    node.submit_tx([("delete", "Pablo-Picasso", died)])
    node.await_tx()

    day_before = dt.datetime(1973, 4, 7, 9, 20, 27)
    got = node.db(day_before).pull("Pablo-Picasso", ["*"])
    assert got["name"] == "Pablo" and got["location"] == "Sain2"
    assert node.db().entity("Pablo-Picasso") is None  # deleted onward

    node.submit_tx([("evict", "Pablo-Picasso")])
    node.await_tx()
    assert node.db(day_before).entity("Pablo-Picasso") is None

    node.submit_tx([("put", {**pp, "height": 1.63, "location": "France"}, died)])
    node.await_tx()
    ent = node.db().entity("Pablo-Picasso")
    assert ent["location"] == "France" and ent["height"] == 1.63
