"""The DataScript not/or batteries the reference ports wholesale
(crux-test/test/crux/query_test.clj:2107-2286, 'Tests borrowed from
Datascript'). Every case from datascript-test-not,
datascript-test-not-join, datascript-test-not-impl-edge-cases,
datascript-test-or and datascript-test-or-join over the canonical
6-person db.

Adaptations: entity ids are strings ("1".."6"); 2-element existence
patterns [?e :name] are written [?e :name _]; the or-join destructured
binding form [[?e]] is written ?e (the engine takes flat or-join vars).
"""

import pytest
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q


@pytest.fixture(scope="module")
def ds(spark):
    c = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    rows = [
        ("1", "Ivan", 10),
        ("2", "Ivan", 20),
        ("3", "Oleg", 10),
        ("4", "Oleg", 20),
        ("5", "Ivan", 10),
        ("6", "Ivan", 20),
    ]
    c.add_documents("people", spark.createDataFrame(rows, schema), id_col="id")
    return c


def es(cat, where, find=("?e",)):
    res = q(cat, {"find": list(find), "where": where})
    return {tuple(r) if len(find) > 1 else r[0] for r in res.collect()}


# --- datascript-test-not (query_test.clj:2107-2146) ---

NOT_CASES = [
    ([["?e", ":name", "_"], ["not", ["?e", ":name", "Ivan"]]], {"3", "4"}),
    (
        [["?e", ":name", "_"],
         ["not", ["?e", ":name", "Ivan"], ["?e", ":age", 10]]],
        {"2", "3", "4", "6"},
    ),
    (
        [["?e", ":name", "_"],
         ["not", ["?e", ":name", "Ivan"]],
         ["not", ["?e", ":age", 10]]],
        {"4"},
    ),
    # full exclude
    ([["?e", ":name", "_"], ["not", ["?e", ":age", "_"]]], set()),
    # not-intersecting rels
    (
        [["?e", ":name", "Ivan"], ["not", ["?e", ":name", "Oleg"]]],
        {"1", "2", "5", "6"},
    ),
    # exclude empty set
    (
        [["?e", ":name", "_"],
         ["not", ["?e", ":name", "Ivan"], ["?e", ":name", "Oleg"]]],
        {"1", "2", "3", "4", "5", "6"},
    ),
    # nested excludes
    (
        [["?e", ":name", "_"],
         ["not", ["?e", ":name", "Ivan"], ["not", ["?e", ":age", 10]]]],
        {"1", "3", "4", "5"},
    ),
]


@pytest.mark.parametrize("where,expected", NOT_CASES, ids=[f"not{i}" for i in range(len(NOT_CASES))])
def test_datascript_not(ds, where, expected):
    assert es(ds, where) == expected


# --- datascript-test-not-join (query_test.clj:2148-2170) ---

def test_datascript_not_join(ds):
    assert es(
        ds,
        [
            ["?e", ":name", "_"],
            ["?e", ":age", "?a"],
            ["not-join", ["?e"], ["?e", ":name", "Oleg"], ["?e", ":age", "?a"]],
        ],
        find=("?e", "?a"),
    ) == {("1", 10), ("2", 20), ("5", 10), ("6", 20)}

    assert es(
        ds,
        [
            ["?e", ":name", "_"],
            ["?e", ":age", "?a"],
            ["?e", ":age", 10],
            [
                "not-join",
                ["?e"],
                ["?e", ":name", "Oleg"],
                ["?e", ":age", 10],
                ["?e", ":age", "?a"],
            ],
        ],
        find=("?e", "?a"),
    ) == {("1", 10), ("5", 10)}


# --- datascript-test-not-impl-edge-cases (query_test.clj:2172-2219) ---

def test_datascript_not_edge_const_cases(ds):
    # const \ empty
    assert es(
        ds,
        [["?e", ":name", "Oleg"], ["?e", ":age", 10], ["not", ["?e", ":age", 20]]],
    ) == {"3"}
    # const \ const
    assert es(
        ds,
        [["?e", ":name", "Oleg"], ["?e", ":age", 10], ["not", ["?e", ":age", 10]]],
    ) == set()
    # rel \ const
    assert es(ds, [["?e", ":name", "Oleg"], ["not", ["?e", ":age", 10]]]) == {"4"}


def test_datascript_not_edge_two_rels(ds):
    # 2 rels \ 2 rels
    assert es(
        ds,
        [
            ["?e", ":name", "Ivan"],
            ["?e2", ":name", "Ivan"],
            ["not", ["?e", ":age", 10], ["?e2", ":age", 20]],
        ],
        find=("?e", "?e2"),
    ) == {
        ("2", "1"), ("6", "5"), ("1", "1"), ("2", "2"), ("5", "5"), ("6", "6"),
        ("2", "5"), ("1", "5"), ("2", "6"), ("6", "1"), ("5", "1"), ("6", "2"),
    }
    # 2 rels \ rel + const
    assert es(
        ds,
        [
            ["?e", ":name", "Ivan"],
            ["?e2", ":name", "Oleg"],
            ["not", ["?e", ":age", 10], ["?e2", ":age", 20]],
        ],
        find=("?e", "?e2"),
    ) == {("2", "3"), ("1", "3"), ("2", "4"), ("6", "3"), ("5", "3"), ("6", "4")}
    # 2 rels \ 2 consts
    assert es(
        ds,
        [
            ["?e", ":name", "Oleg"],
            ["?e2", ":name", "Oleg"],
            ["not", ["?e", ":age", 10], ["?e2", ":age", 20]],
        ],
        find=("?e", "?e2"),
    ) == {("4", "3"), ("3", "3"), ("4", "4")}


# --- datascript-test-or (query_test.clj:2221-2254) ---

OR_CASES = [
    # intersecting results
    ([["or", ["?e", ":name", "Oleg"], ["?e", ":age", 10]]], {"1", "3", "4", "5"}),
    # one branch empty
    ([["or", ["?e", ":name", "Oleg"], ["?e", ":age", 30]]], {"3", "4"}),
    # both empty
    ([["or", ["?e", ":name", "Petr"], ["?e", ":age", 30]]], set()),
    # join with 1 var
    (
        [["?e", ":name", "Ivan"],
         ["or", ["?e", ":name", "Oleg"], ["?e", ":age", 10]]],
        {"1", "5"},
    ),
    # join with 2 vars (constant entity ids inside branches)
    (
        [["?e", ":age", "?a"],
         ["or",
          ["and", ["?e", ":name", "Ivan"], ["1", ":age", "?a"]],
          ["and", ["?e", ":name", "Oleg"], ["2", ":age", "?a"]]]],
        {"1", "5", "4"},
    ),
]


@pytest.mark.parametrize("where,expected", OR_CASES, ids=[f"or{i}" for i in range(len(OR_CASES))])
def test_datascript_or(ds, where, expected):
    assert es(ds, where) == expected


# --- datascript-test-or-join (query_test.clj:2256-2286) ---

def test_datascript_or_join(ds):
    assert es(
        ds,
        [
            [
                "or-join",
                ["?e"],
                ["?e", ":name", "?n"],
                ["and", ["?e", ":age", "?a"], ["?e", ":name", "?n"]],
            ]
        ],
    ) == {"1", "2", "3", "4", "5", "6"}

    # [(identity 1) ?e] then or-join
    assert es(
        ds,
        [
            [["identity", "1"], "?e"],
            [
                "or-join",
                ["?e"],
                ["?e", ":name", "?n"],
                ["and", ["?e", ":age", "?a"], ["?e", ":name", "?n"]],
            ],
        ],
    ) == {"1"}

    # ?a inside the or-join must NOT unify with the outer ?a (name):
    # or-join scopes strictly to its listed vars (query_test.clj:2280-2286)
    assert es(
        ds,
        [
            ["?e", ":name", "?a"],
            ["?e2", ":name", "?a"],
            ["or-join", ["?e"], ["and", ["?e", ":age", "?a"], ["?e2", ":age", "?a"]]],
        ],
    ) == {"1", "2", "3", "4", "5", "6"}
