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


def test_mutual_recursion(people_catalog, spark):
    """Mutually recursive rules (query_test.clj datalog-paper programs):
    even/odd walk over the follows chain a->b->c->d."""
    res = q(
        people_catalog,
        {
            "find": ["?y"],
            "in": ["?start"],
            "rules": [
                # even-reach: zero or an even number of hops
                [["even-reach", "?x", "?y"], ["?x", ":name", "_"], [["identity", "?x"], "?y"]],
                [
                    ["even-reach", "?x", "?y"],
                    ["?x", ":follows", "?z"],
                    ["odd-reach", "?z", "?y"],
                ],
                [
                    ["odd-reach", "?x", "?y"],
                    ["?x", ":follows", "?z"],
                    ["even-reach", "?z", "?y"],
                ],
            ],
            "where": [["even-reach", "?start", "?y"]],
        },
        "a",
    )
    # a=0 hops, c=2 hops (a->b->c); b,d are odd distances
    assert sorted(r.y for r in res.collect()) == ["a", "c"]


def test_correlated_not_with_pred(people_catalog):
    # not over a predicate on an outer-bound var (query_test.clj not corpus)
    res = q(
        people_catalog,
        {
            "find": ["?n"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":age", "?a"],
                ["not", [[">", "?a", 35]]],
            ],
        },
    )
    assert sorted(r.n for r in res.collect()) == ["Ann", "Eve", "Fay"]


def test_correlated_or_mixing_pred_and_triple(people_catalog):
    # or branch = pure pred over outer var; other branch = triple pattern
    res = q(
        people_catalog,
        {
            "find": ["?n"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":age", "?a"],
                [
                    "or-join",
                    ["?p"],
                    ["and", ["?p", ":age", "?a2"], [[">=", "?a2", 60]]],
                    ["?p", ":follows", "b"],
                ],
            ],
        },
    )
    # Dee (age 60) or follows-b (Ann)
    assert sorted(r.n for r in res.collect()) == ["Ann", "Dee"]


def test_pull_in_find(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?n", ["pull", "?p", [":age", ":name"], "doc"]],
            "where": [["?p", ":name", "?n"], ["?p", ":age", "?a"], [["<", "?a", 35]]],
        },
    )
    rows = {r.n: r.doc.asDict() for r in res.collect()}
    assert rows["Ann"] == {"age": 30, "name": "Ann"}
    assert set(rows) == {"Ann", "Eve", "Fay"}


def test_rule_call_with_literal_arg(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?y"],
            "rules": [
                [["reach", "?x", "?y"], ["?x", ":follows", "?y"]],
                [
                    ["reach", "?x", "?y"],
                    ["?x", ":follows", "?z"],
                    ["reach", "?z", "?y"],
                ],
            ],
            "where": [["reach", "b", "?y"]],  # literal entity in rule call
        },
    )
    assert sorted(r.y for r in res.collect()) == ["c", "d"]


def test_tuple_in_binding(people_catalog):
    res = q(
        people_catalog,
        {
            "find": ["?n"],
            "in": [["?min", "?max"]],  # tuple binding
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":age", "?a"],
                [[">=", "?a", "?min"]],
                [["<=", "?a", "?max"]],
            ],
        },
        (30, 45),
    )
    assert sorted(r.n for r in res.collect()) == ["Ann", "Bob"]


def test_pred_tuple_binding(people_catalog):
    # [(vector ?a ?n) [?x ?y]] destructures the returned tuple positionally
    res = q(
        people_catalog,
        {
            "find": ["?x", "?y"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":age", "?a"],
                [["tuple", "?a", "?n"], ["?x", "?y"]],
                [[">", "?x", 45]],
            ],
        },
    )
    assert rows(res) == [(50, "Cid"), (60, "Dee")]


def test_pred_relation_binding(people_catalog):
    # [(f ?x) [[?a ?b]]] binds a relation: explode + positional destructure
    res = q(
        people_catalog,
        {
            "find": ["?n", "?pair"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":age", "?a"],
                [["vector", ["vector", "?a", "?a"]], [["?pair", "_"]]],
                [["=", "?n", "Ann"]],
            ],
        },
    )
    assert rows(res) == [("Ann", 30)]


def test_pred_tuple_binding_unifies_bound_var(people_catalog):
    # ?a is already bound -> positional element must UNIFY, not rebind
    res = q(
        people_catalog,
        {
            "find": ["?n"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":age", "?a"],
                [["tuple", 30, "?n"], ["?a", "_"]],
            ],
        },
    )
    assert rows(res) == [("Ann",)]


def test_non_stratified_negation_raises(people_catalog):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-stratified"):
        q(
            people_catalog,
            {
                "find": ["?x"],
                "rules": [
                    [["odd", "?x"], ["?x", ":follows", "?y"], ["not", ["odd", "?y"]]],
                    [["odd", "?x"], ["?x", ":name", "Dee"]],
                ],
                "where": [["odd", "?x"]],
            },
        ).collect()


def test_query_timeout_interrupts(people_catalog):
    import pytest as _pytest

    from crux_spark.datalog import QueryTimeoutError, q_eager

    # a cross-join heavy enough to outlive a 1ms budget
    slow = {
        "find": [["count", "?a"]],
        "where": [
            ["?p", ":age", "?a"],
            ["?q", ":age", "?b"],
            ["?r", ":age", "?c"],
            ["?s", ":age", "?d"],
        ],
        "timeout": 1,
    }
    with _pytest.raises(QueryTimeoutError):
        q_eager(people_catalog, slow)
    # and a sane budget completes eagerly
    ok = dict(slow, timeout=120000)
    assert q_eager(people_catalog, ok)[0][0] == 6 ** 4
