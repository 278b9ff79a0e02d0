"""Rule expansion + recursive fixpoint (query.clj:1209-1270, tabling :1079-1144).

Graph: a->b->c->d, e->f; plus cardinality-many `knows` arrays.
"""

import pytest
from pyspark.sql import types as T

from crux_spark.datalog import q


@pytest.fixture(scope="module")
def people_catalog(spark, catalog):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("follows", T.ArrayType(T.StringType())),
        ]
    )
    data = [
        ("a", "Ann", 30, ["b"]),
        ("b", "Bob", 40, ["c"]),
        ("c", "Cid", 50, ["d"]),
        ("d", "Dee", 60, []),
        ("e", "Eve", 20, ["f"]),
        ("f", "Fay", 25, None),
    ]
    df = spark.createDataFrame(data, schema)
    catalog.add_documents("people", df, id_col="id")
    return catalog


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cardinality_many_explode(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?n", "?f"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":follows", "?f"],
            ],
        },
    )
    assert rows(res) == [("Ann", "b"), ("Bob", "c"), ("Cid", "d"), ("Eve", "f")]


def test_non_recursive_rule(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?n"],
            "rules": [
                [
                    ["adult", "?p"],
                    ["?p", ":age", "?a"],
                    [[">=", "?a", 30]],
                ]
            ],
            "where": [
                ["?p", ":name", "?n"],
                ["adult", "?p"],
            ],
        },
    )
    assert rows(res) == [("Ann",), ("Bob",), ("Cid",), ("Dee",)]


def test_recursive_rule_reachability(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?to"],
            "in": ["?from"],
            "rules": [
                [["reach", "?x", "?y"], ["?x", ":follows", "?y"]],
                [
                    ["reach", "?x", "?y"],
                    ["?x", ":follows", "?z"],
                    ["reach", "?z", "?y"],
                ],
            ],
            "where": [["reach", "?from", "?to"]],
        },
        "a",
    )
    assert rows(res) == [("b",), ("c",), ("d",)]


def test_recursive_rule_all_pairs(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?x", "?y"],
            "rules": [
                [["reach", "?x", "?y"], ["?x", ":follows", "?y"]],
                [
                    ["reach", "?x", "?y"],
                    ["?x", ":follows", "?z"],
                    ["reach", "?z", "?y"],
                ],
            ],
            "where": [["reach", "?x", "?y"]],
        },
    )
    assert rows(res) == sorted(
        [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"),
            ("c", "d"),
            ("e", "f"),
        ]
    )
