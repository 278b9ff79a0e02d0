"""Ports of issue-numbered regression tests from the reference corpus
(crux-test/test/crux/query_test.clj) — the shapes that historically broke
the reference engine, re-expressed over the typed-catalog model.
"""

import pytest
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q


@pytest.fixture(scope="module")
def reg_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("friend", T.StringType()),
            T.StructField("boss", T.StringType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    data = [
        ("ivan", "Ivan", "Ivanov", 30, "ivan", "petr", "Petr"),
        ("petr", "Petr", "Petrov", 40, None, None, None),
        ("petr2", "Petr", "Ivanov", 20, None, None, None),
        ("oleg", "Oleg", "Olegov", 30, None, None, "1980"),
    ]
    cat.add_documents("people", spark.createDataFrame(data, schema), id_col="id")
    return cat


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_or_range_vars_bug_949(reg_catalog):
    # (or [(= x y)]) over vars bound LATER by pred bindings — the or must
    # wait for (not race) the bindings (query_test.clj:1727-1738)
    res = q(
        reg_catalog,
        {
            "find": ["?e", "?name"],
            "where": [
                ["?e", ":name", "?name"],
                [["get-attr", "?e", ":age"], "?age"],
                ["or", [["=", "?x", "?y"]]],
                [["str", "?age"], "?x"],
                [["str", "?age"], "?y"],
            ],
        },
    )
    assert ("ivan", "Ivan") in rows(res)
    assert len(rows(res)) == 4  # x == y holds for every row


def test_query_limits_bug_71(reg_catalog):
    # limit switches to vector semantics: duplicates retained, limit applied
    res = q(
        reg_catalog,
        {"find": ["?l"], "where": [["?_e", ":last_name", "?l"]], "limit": 2},
    )
    assert len(res.collect()) == 2


def test_self_join_bug_93(reg_catalog):
    res = q(
        reg_catalog,
        {
            "find": ["?b"],
            "where": [["?e", ":friend", "?e"], ["?e", ":boss", "?b"]],
        },
    )
    assert rows(res) == [("petr",)]


def test_or_join_absent_attr_bug_146(reg_catalog):
    # or-join: attribute value when present, literal :none + not when absent
    res = q(
        reg_catalog,
        {
            "find": ["?n", "?x", "?a", "?e"],
            "where": [
                ["?e", ":name", "?n"],
                ["?e", ":age", "?a"],
                [
                    "or-join",
                    ["?e", "?x"],
                    ["?e", ":extra", "?x"],
                    [
                        "and",
                        [["identity", "none"], "?x"],
                        ["not", ["?e", ":extra", "?_any"]],
                    ],
                ],
            ],
        },
    )
    assert rows(res) == [
        ("Ivan", "Petr", 30, "ivan"),
        ("Oleg", "1980", 30, "oleg"),
        ("Petr", "none", 20, "petr2"),
        ("Petr", "none", 40, "petr"),
    ]


def test_arguments_bug_247(reg_catalog):
    # :in-bound entity that does not satisfy the attr-exists pattern -> empty
    res = q(
        reg_catalog,
        {
            "find": ["?x"],
            "in": ["?x"],
            "where": [["?x", ":name"]],
        },
        "Clojure",
    )
    assert rows(res) == []


def test_empty_find_distinct_set_semantics(reg_catalog):
    # without order/limit the result is a SET (query.clj:1783): two Petrs
    # collapse to one row
    res = q(reg_catalog, {"find": ["?n"], "where": [["?e", ":name", "?n"]]})
    assert rows(res) == [("Ivan",), ("Oleg",), ("Petr",)]


@pytest.fixture(scope="module")
def datalog_paper_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("d", T.StringType())]
    )
    cat.add_documents(
        "nodes",
        spark.createDataFrame([("a", "b"), ("b", "c"), ("e", "e")], schema),
        id_col="id",
    )
    return cat


DATALOG_PAPER_RULES = [
    [["p", "?x", "?y"], ["not", ["q", "?x", "?y"]], ["s", "?x", "?y"]],
    [["q", "?x", "?y"], ["q", "?x", "?z"], ["q", "?z", "?y"]],
    [["q", "?x", "?y"], ["?x", ":d", "?y"], ["not", ["r", "?x", "?y"]]],
    [["r", "?x", "?y"], ["?y", ":d", "?x"]],
    [["s", "?x", "?y"], ["q", "?x", "?z"], ["q", "?y", "?t"], [["!=", "?x", "?y"]]],
]


def test_datalog_paper_stratified_program(datalog_paper_catalog):
    # query_test.clj:3258-3310 — three strata over the same rule set
    cat = datalog_paper_catalog
    r1 = q(cat, {"find": ["?x", "?y"], "where": [["r", "?x", "?y"]],
                 "rules": DATALOG_PAPER_RULES})
    assert rows(r1) == [("b", "a"), ("c", "b"), ("e", "e")]
    r2 = q(cat, {"find": ["?x", "?y"],
                 "where": [["or", ["q", "?x", "?y"], ["s", "?x", "?y"]]],
                 "rules": DATALOG_PAPER_RULES})
    assert rows(r2) == [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c")]
    r3 = q(cat, {"find": ["?x", "?y"], "where": [["p", "?x", "?y"]],
                 "rules": DATALOG_PAPER_RULES})
    assert rows(r3) == [("b", "a")]


def test_datalog_paper_same_generation(spark):
    # query_test.clj:3220-3256 — sgc over cardinality-many :parent
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("parent", T.ArrayType(T.StringType())),
        ]
    )
    data = [
        ("ann", ["dorothy", "hilary"]),
        ("bertrand", ["dorothy"]),
        ("charles", ["evelyn"]),
        ("dorothy", ["george"]),
        ("evelyn", ["george"]),
        ("fred", None),
        ("george", None),
        ("hilary", None),
    ]
    cat.add_documents("persons", spark.createDataFrame(data, schema), id_col="id")
    res = q(
        cat,
        {
            "find": ["?x", "?y"],
            "where": [["sgc", "?x", "?y"]],
            "rules": [
                [["sgc", "?x", "?y"], ["?x", ":id", "?y"]],
                [
                    ["sgc", "?x", "?y"],
                    ["?x", ":parent", "?x1"],
                    ["sgc", "?x1", "?y1"],
                    ["?y", ":parent", "?y1"],
                ],
            ],
        },
    )
    got = set(rows(res))
    assert ("dorothy", "evelyn") in got and ("evelyn", "dorothy") in got
    assert ("ann", "charles") in got and ("bertrand", "charles") in got
    assert ("fred", "fred") in got
    assert len(got) == 16


FIB_RULES = [
    [["fib", "?n", "?f"], [["<=", "?n", 1]], [["identity", "?n"], "?f"]],
    [
        ["fib", "?n", "?f"],
        [[">", "?n", 1]],
        [["-", "?n", 1], "?n1"],
        [["-", "?n", 2], "?n2"],
        ["fib", "?n1", "?f1"],
        ["fib", "?n2", "?f2"],
        [["+", "?f1", "?f2"], "?f"],
    ],
]


def test_racket_datalog_fib(reg_catalog):
    # query_test.clj:3181-3215 — pure-computation recursion needs
    # demand-driven (magic-set) evaluation; bottom-up diverges
    res = q(
        reg_catalog,
        {"find": ["?f"], "where": [["fib", 10, "?f"]], "rules": FIB_RULES},
    )
    assert rows(res) == [(55,)]


def test_racket_datalog_fib_in_arg(reg_catalog):
    res = q(
        reg_catalog,
        {
            "find": ["?f"],
            "in": ["?n"],
            "where": [["fib", "?n", "?f"]],
            "rules": FIB_RULES,
        },
        10,
    )
    assert rows(res) == [(55,)]


def test_computation_rule_unbound_call_raises(reg_catalog):
    with pytest.raises(ValueError, match="bound argument"):
        q(
            reg_catalog,
            {"find": ["?n", "?f"], "where": [["fib", "?n", "?f"]], "rules": FIB_RULES},
        ).collect()


def test_mixing_expressions(spark):
    # query_test.clj:665-683 — or containing not; not containing or
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
        ]
    )
    data = [
        ("i", "Ivan", "Ivanov"),
        ("d", "Derek", "Ivanov"),
        ("b", "Bob", "Ivannotov"),
        ("f", "Fred", "Ivannotov"),
    ]
    cat.add_documents("folks", spark.createDataFrame(data, schema), id_col="id")
    r1 = q(
        cat,
        {
            "find": ["?name"],
            "where": [
                ["?e", ":name", "?name"],
                [
                    "or",
                    ["?e", ":last_name", "Ivanov"],
                    ["not", ["?e", ":name", "Bob"]],
                ],
            ],
        },
    )
    assert rows(r1) == [("Derek",), ("Fred",), ("Ivan",)]
    r2 = q(
        cat,
        {
            "find": ["?name"],
            "where": [
                ["?e", ":name", "?name"],
                [
                    "not",
                    [
                        "or",
                        ["?e", ":last_name", "Ivanov"],
                        ["?e", ":name", "Bob"],
                    ],
                ],
            ],
        },
    )
    assert rows(r2) == [("Fred",)]


def test_bind_function_returns_to_falsy(reg_catalog):
    # query_test.clj:2844-2860 — falsy return values still bind
    r = q(reg_catalog, {"find": ["?b"], "where": [[["identity", False], "?b"]]})
    assert rows(r) == [(False,)]
    r = q(reg_catalog, {"find": ["?b"], "where": [[["identity", True], "?b"]]})
    assert rows(r) == [(True,)]


def test_order_by_unreturned_var_raises(reg_catalog):
    # query_test.clj:3371-3382 (bug-418)
    with pytest.raises(ValueError, match="unreturned element"):
        q(
            reg_catalog,
            {
                "find": ["?e"],
                "where": [["?e", ":age", "?v"]],
                "order-by": [["?v", "asc"]],
            },
        )


def test_datascript_query_fns(reg_catalog, spark):
    # query_test.clj:2454-2560 subset the reference supports
    # constant predicate + :in relation
    r = q(
        reg_catalog,
        {
            "find": ["?x"],
            "in": [["?x", "..."]],
            "where": [[[">", 2, 1]]],
        },
        ["a", "b", "c"],
    )
    assert rows(r) == [("a",), ("b",), ("c",)]

    # variadic comparison chains pairwise: (< a1 35 a2)
    r = q(
        reg_catalog,
        {
            "find": ["?e1", "?e2"],
            "where": [
                ["?e1", ":age", "?a1"],
                ["?e2", ":age", "?a2"],
                [["<", "?a1", 35, "?a2"]],
            ],
        },
    )
    assert rows(r) == [("ivan", "petr"), ("oleg", "petr"), ("petr2", "petr")]

    # count on strings
    r = q(
        reg_catalog,
        {
            "find": ["?x", "?c"],
            "in": [["?x", "..."]],
            "where": [[["count", "?x"], "?c"]],
        },
        ["a", "abc"],
    )
    assert rows(r) == [("a", 1), ("abc", 3)]

    # callable :in arg as predicate — a numpy-broadcastable callable
    # compiles to a vectorized pandas_udf WITHOUT the old row-UDF
    # warning (r10, verdict #6)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        r = q(
            reg_catalog,
            {
                "find": ["?e"],
                "in": ["?adult"],
                "where": [["?e", ":age", "?a"], [["?adult", "?a"]]],
            },
            lambda a: a > 25,
        )
        assert rows(r) == [("ivan",), ("oleg",), ("petr",)]

    # a callable that REJECTS Series inputs (branching) still evaluates
    # correctly through the per-row fallback inside the Arrow batch
    def picky(a):
        if a > 25:  # ambiguous truth value on a Series -> fallback
            return True
        return False

    r = q(
        reg_catalog,
        {
            "find": ["?e"],
            "in": ["?adult"],
            "where": [["?e", ":age", "?a"], [["?adult", "?a"]]],
        },
        picky,
    )
    assert rows(r) == [("ivan",), ("oleg",), ("petr",)]

    # a scalar-returning callable (len over the whole Series would be a
    # length-mismatch) must not be mistaken for broadcastable
    r = q(
        reg_catalog,
        {
            "find": ["?x"],
            "in": [["?x", "..."], "?p"],
            "where": [[["?p", "?x"]]],
        },
        ["a", "abc", "ab"],
        lambda s: len(s) > 2,
    )
    assert rows(r) == [("abc",)]

    # two conflicting function values for one binding -> empty
    r = q(
        reg_catalog,
        {
            "find": ["?n"],
            "where": [[["identity", 1], "?n"], [["identity", 2], "?n"]],
        },
    )
    assert rows(r) == []


# --- racket datalog path batteries (query_test.clj:3013-3144) ---

ALL_PAIRS = {(x, y) for x in "abcd" for y in "abcd"}


@pytest.fixture(scope="module")
def edge_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("edge", T.StringType())]
    )
    cat.add_documents(
        "edges",
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], schema
        ),
        id_col="id",
    )
    return cat


def test_racket_datalog_path(edge_catalog):
    # path(X,Y) :- edge(X,Y).  path(X,Y) :- edge(X,Z), path(Z,Y).
    res = q(
        edge_catalog,
        {
            "find": ["?x", "?y"],
            "where": [["path", "?x", "?y"]],
            "rules": [
                [["path", "?x", "?y"], ["?x", ":edge", "?y"]],
                [["path", "?x", "?y"], ["?x", ":edge", "?z"], ["path", "?z", "?y"]],
            ],
        },
    )
    assert {tuple(r) for r in res.collect()} == ALL_PAIRS


def test_racket_datalog_revpath(edge_catalog):
    # left-recursive variant: path(X,Y) :- path(X,Z), edge(Z,Y).
    res = q(
        edge_catalog,
        {
            "find": ["?x", "?y"],
            "where": [["path", "?x", "?y"]],
            "rules": [
                [["path", "?x", "?y"], ["?x", ":edge", "?y"]],
                [["path", "?x", "?y"], ["path", "?x", "?z"], ["?z", ":edge", "?y"]],
            ],
        },
    )
    assert {tuple(r) for r in res.collect()} == ALL_PAIRS


def test_racket_datalog_bidipath(edge_catalog):
    # both recursion directions in one rule set
    res = q(
        edge_catalog,
        {
            "find": ["?x", "?y"],
            "where": [["path", "?x", "?y"]],
            "rules": [
                [["path", "?x", "?y"], ["?x", ":edge", "?y"]],
                [["path", "?x", "?y"], ["?x", ":edge", "?z"], ["path", "?z", "?y"]],
                [["path", "?x", "?y"], ["path", "?x", "?z"], ["?z", ":edge", "?y"]],
            ],
        },
    )
    assert {tuple(r) for r in res.collect()} == ALL_PAIRS


def test_racket_datalog_sym(edge_catalog):
    # perm(X,Y) :- sym(X), sym(Y), X != Y — over entity ids
    res = q(
        edge_catalog,
        {
            "find": ["?x", "?y"],
            "where": [["perm", "?x", "?y"]],
            "rules": [
                [
                    ["perm", "?x", "?y"],
                    ["?x", ":edge", "_"],
                    ["?y", ":edge", "_"],
                    [["!=", "?x", "?y"]],
                ]
            ],
        },
    )
    assert {tuple(r) for r in res.collect()} == {
        (x, y) for x in "abcd" for y in "abcd" if x != y
    }


# --- failing predicates at top level (query_test.clj:3145-3157) ---

def test_failing_predicates_at_top_level(reg_catalog):
    # predicate order shouldn't matter; a falsy zero-binding predicate
    # empties the result either way
    for where in (
        [[["identity", 4], "?f"], [["identity", False]]],
        [[["identity", False]], [["identity", 4], "?f"]],
    ):
        assert q(reg_catalog, {"find": ["?f"], "where": where}).count() == 0


# --- literal rule arguments (bug 507, query_test.clj:3159-3179) ---

def test_literal_rule_arguments_bug_507(reg_catalog):
    import datetime as dt

    assert (
        q(
            reg_catalog,
            {
                "find": ["?f"],
                "where": [["foo", 4, "?f"]],
                "rules": [
                    [
                        ["foo", "?n", "?f"],
                        [["<=", 6, "?n"]],
                        [["identity", "?n"], "?f"],
                    ]
                ],
            },
        ).count()
        == 0
    )
    # non-numeric comparables (dates) through the same shape
    assert (
        q(
            reg_catalog,
            {
                "find": ["?f"],
                "where": [["foo", dt.datetime(2019, 1, 1), "?f"]],
                "rules": [
                    [
                        ["foo", "?n", "?f"],
                        [["<=", dt.datetime(2020, 1, 1), "?n"]],
                        [["identity", "?n"], "?f"],
                    ]
                ],
            },
        ).count()
        == 0
    )
    # and the satisfied variant binds
    got = q(
        reg_catalog,
        {
            "find": ["?f"],
            "where": [["foo", 9, "?f"]],
            "rules": [
                [
                    ["foo", "?n", "?f"],
                    [["<=", 6, "?n"]],
                    [["identity", "?n"], "?f"],
                ]
            ],
        },
    ).collect()
    assert [r.f for r in got] == [9]


# --- range predicate over empty result (bug 545, query_test.clj:3433-3447) ---

def test_greater_than_range_predicate_bug_545(reg_catalog):
    res = q(
        reg_catalog,
        {
            "find": ["?age"],
            "where": [
                ["?e", ":age", "?age"],
                [[">", "?age", -9223372036854775808]],
                ["?e", ":name", "NOBODY"],
            ],
            "limit": 1,
        },
    )
    assert res.count() == 0


# --- result cardinality (bug 972, query_test.clj:3449-3467) ---

def test_query_result_cardinality_bug_972(reg_catalog):
    # without order-by: set semantics (distinct)
    ages = q(reg_catalog, {"find": ["?a"], "where": [["_", ":age", "?a"]]})
    assert sorted(r.a for r in ages.collect()) == [20, 30, 40]
    # with order-by: bag semantics in order (duplicates kept)
    ordered = q(
        reg_catalog,
        {
            "find": ["?a"],
            "where": [["?e", ":age", "?a"]],
            "order-by": [["?a", "desc"]],
        },
    )
    assert [r.a for r in ordered.collect()] == [40, 30, 30, 20]


# --- relation :in binding against false/nil (bugs 885/697, :3469-3516) ---

def test_binds_against_false_arg_bug_885(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    cat.add_documents(
        "flags",
        spark.createDataFrame(
            [("foo", "foo", False), ("bar", "bar", True), ("baz", "baz", None)],
            schema,
        ),
        id_col="id",
    )
    def names_for(flag_val):
        res = q(
            cat,
            {
                "find": ["?name", "?flag"],
                "in": ["?flag"],
                "where": [
                    ["?id", ":name", "?name"],
                    ["?id", ":flag", "?flag"],
                ],
            },
            flag_val,
        )
        return {(r.name, r.flag) for r in res.collect()}

    assert names_for(False) == {("foo", False)}
    assert names_for(True) == {("bar", True)}
    # the nil leg (885's third case): a nil :in binding matches the
    # nil-valued attr. Documented divergence from the reference: in the
    # wide-table model "key present with nil" and "key absent" are the
    # same NULL cell, so this also matches entities missing the key.
    assert names_for(None) == {("baz", None)}


def test_nil_literals_in_triple_clauses_1486_1487(spark):
    """nil-in-entity-position-shouldnt-yield-results-1486 +
    literal-nil-value-in-triple-clause-should-only-match-nil-1487
    (query_test.clj:3699-3740), over the wide-table model (absent key
    == nil-valued key — documented divergence, see compile.py)."""
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("foo", T.LongType()),
        ]
    )
    cat.add_documents(
        "nils",
        spark.createDataFrame([("1", None), ("2", 2)], schema),
        id_col="id",
    )

    def res(where, find="?e"):
        return {tuple(r) for r in q(cat, {"find": [find], "where": where}).collect()}

    # 1486: nil entity (bare or in a set) yields no results
    assert res([[None, ":foo", "?v"]], find="?v") == set()
    assert res([[{None}, ":foo", "?v"]], find="?v") == set()
    # 1487: existence matches only non-nil (wide-table: NULL = absent)
    assert res([["?e", ":foo", "_"]]) == {("2",)}
    # literal nil matches ONLY the nil-valued entity
    assert res([["?e", ":foo", None]]) == {("1",)}
    assert res([["?e", ":foo", {None}]]) == {("1",)}
    # a set with nil AND a value matches both
    assert res([["?e", ":foo", {None, 2}]]) == {("1",), ("2",)}
    # empty set matches nothing
    assert res([["?e", ":foo", set()]]) == set()


# --- sub-queries battery (query_test.clj:1303-1438) ---

def test_subquery_relation_binding(reg_catalog):
    # [(q {find [y] where [[(identity 2) x] [(+ x 2) y]]}) [[x]]]
    res = q(
        reg_catalog,
        {
            "find": ["?x"],
            "where": [
                [
                    [
                        "q",
                        {
                            "find": ["?y"],
                            "where": [
                                [["identity", 2], "?x"],
                                [["+", "?x", 2], "?y"],
                            ],
                        },
                    ],
                    [["?x"]],
                ]
            ],
        },
    )
    assert [r.x for r in res.collect()] == [4]


def test_subquery_empty_filter_empties_outer(reg_catalog):
    res = q(
        reg_catalog,
        {
            "find": ["?x"],
            "where": [
                [
                    [
                        "q",
                        {
                            "find": ["?y"],
                            "where": [
                                [["identity", 2], "?x"],
                                [["+", "?x", 2], "?y"],
                                [["odd?", "?y"]],
                            ],
                        },
                    ],
                    [["?x"]],
                ]
            ],
        },
    )
    assert res.count() == 0


def test_subquery_with_scalar_args(reg_catalog):
    # [(q {find [x y z] in [$ x] where [...]} 1) [[x y z]]]
    res = q(
        reg_catalog,
        {
            "find": ["?x", "?y", "?z"],
            "where": [
                [
                    [
                        "q",
                        {
                            "find": ["?x", "?y", "?z"],
                            "in": ["$", "?x"],
                            "where": [
                                [["identity", 2], "?y"],
                                [["+", "?x", "?y"], "?z"],
                            ],
                        },
                        1,
                    ],
                    [["?x", "?y", "?z"]],
                ]
            ],
        },
    )
    assert [tuple(r) for r in res.collect()] == [(1, 2, 3)]


def test_subquery_correlated_outer_var(reg_catalog):
    # [(identity 1) x] then [(q {find [z] in [$ x] where [[(+ x 2) z]]} x) [[y]]]
    res = q(
        reg_catalog,
        {
            "find": ["?x", "?y", "?z"],
            "where": [
                [["identity", 1], "?x"],
                [
                    [
                        "q",
                        {
                            "find": ["?z"],
                            "in": ["$", "?x"],
                            "where": [[["+", "?x", 2], "?z"]],
                        },
                        "?x",
                    ],
                    [["?y"]],
                ],
                [["+", "?x", "?y"], "?z"],
            ],
        },
    )
    assert [tuple(r) for r in res.collect()] == [(1, 3, 4)]


def test_subquery_inherits_parent_rules(reg_catalog):
    res = q(
        reg_catalog,
        {
            "find": ["?x"],
            "where": [
                [
                    [
                        "q",
                        {
                            "find": ["?y"],
                            "where": [
                                [["identity", 2], "?x"],
                                [["+", "?x", 2], "?y"],
                                ["is-odd?", "?y"],
                            ],
                        },
                    ],
                    [["?x"]],
                ]
            ],
            "rules": [[["is-odd?", "?x"], [["odd?", "?x"]]]],
        },
    )
    assert res.count() == 0


def test_subquery_as_predicate(reg_catalog):
    # keep rows where the correlated subquery is non-empty
    def run(pred):
        return q(
            reg_catalog,
            {
                "find": ["?x"],
                "where": [
                    [["identity", 2], "?x"],
                    [
                        [
                            "q",
                            {
                                "find": ["?y"],
                                "in": ["$", "?y"],
                                "where": [[[pred, "?y"]]],
                            },
                            "?x",
                        ]
                    ],
                ],
            },
        ).count()

    assert run("even?") == 1
    assert run("odd?") == 0


def test_subquery_as_predicate_inside_not(reg_catalog):
    res = q(
        reg_catalog,
        {
            "find": ["?x"],
            "where": [
                [["identity", 2], "?x"],
                [
                    "not",
                    [
                        [
                            "q",
                            {
                                "find": ["?y"],
                                "in": ["$", "?y"],
                                "where": [[["odd?", "?y"]]],
                            },
                            "?x",
                        ]
                    ],
                ],
            ],
        },
    )
    assert [r.x for r in res.collect()] == [2]


# --- predicate-expression battery (query_test.clj:684-814) ---

@pytest.fixture(scope="module")
def pred_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    cat.add_documents(
        "preds",
        spark.createDataFrame(
            [
                ("ivan", "Ivan", "Ivanov", 30),
                ("bob", "Bob", "Ivanov", 40),
                ("dominic", "Dominic", "Monroe", 50),
            ],
            schema,
        ),
        id_col="id",
    )
    return cat


def pq(cat, find, where):
    return {tuple(r) if len(find) > 1 else r[0]
            for r in q(cat, {"find": find, "where": where}).collect()}


def test_pred_range_expressions(pred_catalog):
    base = [["?e", ":name", "?name"], ["?e", ":age", "?age"]]
    assert pq(pred_catalog, ["?name"], base + [[["<", "?age", 50]]]) == {"Ivan", "Bob"}
    assert pq(pred_catalog, ["?name"], base + [[[">=", "?age", 50]]]) == {"Dominic"}


def test_pred_var_var_range(pred_catalog):
    got = pq(
        pred_catalog,
        ["?name", "?age1", "?name2", "?age2"],
        [
            ["?e", ":name", "?name"],
            ["?e", ":age", "?age1"],
            ["?e2", ":name", "?name2"],
            ["?e2", ":age", "?age2"],
            [["<=", "?age1", "?age2"]],
        ],
    )
    assert got == {
        ("Ivan", 30, "Ivan", 30), ("Ivan", 30, "Bob", 40),
        ("Ivan", 30, "Dominic", 50), ("Bob", 40, "Bob", 40),
        ("Bob", 40, "Dominic", 50), ("Dominic", 50, "Dominic", 50),
    }
    # string-ordered var-var comparison
    assert pq(
        pred_catalog,
        ["?n1", "?n2"],
        [
            ["?e", ":name", "?n1"],
            ["?e2", ":name", "?n2"],
            [[">", "?n1", "?n2"]],
        ],
    ) == {("Ivan", "Dominic"), ("Ivan", "Bob"), ("Dominic", "Bob")}


def test_pred_refind_and_not(pred_catalog):
    base = [["?e", ":name", "?name"]]
    assert pq(pred_catalog, ["?name"], base + [[["re-find", "o", "?name"]]]) == {
        "Bob", "Dominic",
    }
    assert pq(pred_catalog, ["?name"], base + [[["re-find", "X", "?name"]]]) == set()
    assert pq(
        pred_catalog, ["?name"], base + [["not", [["re-find", "o", "?name"]]]]
    ) == {"Ivan"}


def test_pred_entity_variable(pred_catalog):
    # [(= :ivan e)] — entity var compared against a literal id
    assert pq(
        pred_catalog,
        ["?name"],
        [["?e", ":name", "?name"], [["=", "ivan", "?e"]]],
    ) == {"Ivan"}
    assert pq(
        pred_catalog,
        ["?e"],
        [["?e", ":last_name", "?ln"], [["=", "Ivanov", "?ln"]]],
    ) == {"bob", "ivan"}
    assert pq(
        pred_catalog,
        ["?e"],
        [
            ["?e", ":last_name", "?ln"],
            ["?e", ":age", "?age"],
            [["=", "Ivanov", "?ln"]],
            [["=", 30, "?age"]],
        ],
    ) == {"ivan"}


def test_pred_several_variables(pred_catalog):
    assert pq(
        pred_catalog,
        ["?name"],
        [
            ["?e", ":name", "?name"],
            ["?e", ":age", "?age"],
            [["=", 40, "?age"]],
            [["re-find", "o", "?name"]],
            [["not=", "?age", "?name"]],
        ],
    ) == {"Bob"}
    assert pq(
        pred_catalog,
        ["?e", "?ln"],
        [
            ["?e", ":last_name", "?ln"],
            ["?e", ":age", "?age"],
            [["re-find", "ov$", "?ln"]],
            ["not", [["=", "?age", 30]]],
        ],
    ) == {("bob", "Ivanov")}


def test_pred_bind_result_to_var(pred_catalog):
    base = [["?e", ":name", "?name"], ["?e", ":age", "?age"]]
    assert pq(
        pred_catalog,
        ["?name", "?half"],
        base + [[["quot", "?age", 2], "?half"]],
    ) == {("Dominic", 25), ("Ivan", 15), ("Bob", 20)}
    # binding more than once intersects (unification filter)
    assert pq(
        pred_catalog,
        ["?name", "?half"],
        base
        + [
            [["quot", "?age", 2], "?half"],
            [["-", "?age", 15], "?half"],
        ],
    ) == {("Ivan", 15)}
    # bound result feeds a later range predicate
    assert pq(
        pred_catalog,
        ["?name", "?half"],
        base
        + [
            [["quot", "?age", 2], "?half"],
            [[">", "?half", 20]],
        ],
    ) == {("Dominic", 25)}


# --- attributes with multiple values (query_test.clj:814-878) ---

@pytest.fixture(scope="module")
def friends_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("friends", T.ArrayType(T.StringType())),
        ]
    )
    cat.add_documents(
        "friends",
        spark.createDataFrame(
            [
                ("ivan", "Ivan", 30, ["bob", "dominic"]),
                ("bob", "Bob", 40, ["ivan", "dominic"]),
                ("dominic", "Dominic", 50, ["bob"]),
            ],
            schema,
        ),
        id_col="id",
    )
    return cat


def test_multi_value_find(friends_catalog):
    assert pq(
        friends_catalog,
        ["?f"],
        [["?i", ":name", "Ivan"], ["?i", ":friends", "?f"]],
    ) == {"bob", "dominic"}


def test_multi_value_literal_membership(friends_catalog):
    assert pq(
        friends_catalog,
        ["?i"],
        [["?i", ":name", "Ivan"], ["?i", ":friends", "bob"]],
    ) == {"ivan"}


def test_multi_value_join_intersects(friends_catalog):
    assert pq(
        friends_catalog,
        ["?f"],
        [
            ["?i", ":name", "Ivan"],
            ["?i", ":friends", "?f"],
            ["?d", ":name", "Dominic"],
            ["?d", ":friends", "?f"],
        ],
    ) == {"bob"}


def test_multi_value_pred_filters(friends_catalog):
    base = [["?i", ":name", "Ivan"], ["?i", ":friends", "?f"]]
    assert pq(friends_catalog, ["?f"], base + [[["=", "?f", "bob"]]]) == {"bob"}
    assert pq(friends_catalog, ["?f"], base + [[["not=", "?f", "bob"]]]) == {
        "dominic"
    }
    # unification against a set literal
    assert pq(
        friends_catalog,
        ["?f"],
        base + [[["contains?", {"bob", "dominic"}, "?f"]]],
    ) == {"bob", "dominic"}
    # not filters exploded values
    assert pq(
        friends_catalog,
        ["?i", "?f"],
        base + [["not", [["=", "?f", "bob"]]]],
    ) == {("ivan", "dominic")}


# --- basic rules battery (query_test.clj:1513-1640) ---

@pytest.fixture(scope="module")
def age_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    cat.add_documents(
        "ages",
        spark.createDataFrame(
            [("ivan", "Ivan", "Ivanov", 21), ("petr", "Petr", "Petrov", 18)],
            schema,
        ),
        id_col="id",
    )
    return cat


OVER21 = [[["over-twenty-one?", "?age"], [[">=", "?age", 21]]]]


def test_rule_same_var_name_as_body(age_catalog):
    res = q(
        age_catalog,
        {
            "find": ["?i"],
            "where": [["?i", ":age", "?age"], ["over-twenty-one?", "?age"]],
            "rules": OVER21,
        },
    )
    assert [r.i for r in res.collect()] == ["ivan"]


def test_rule_directly_on_in_args(age_catalog):
    def run(v):
        return q(
            age_catalog,
            {
                "find": ["?age"],
                "in": ["?age"],
                "where": [["over-twenty-one?", "?age"]],
                "rules": OVER21,
            },
            v,
        ).count()

    assert run(21) == 1
    assert run(20) == 0


def test_rule_different_var_name_from_body(age_catalog):
    res = q(
        age_catalog,
        {
            "find": ["?i"],
            "where": [["?i", ":age", "?age"], ["over-twenty-one?", "?age"]],
            "rules": [[["over-twenty-one?", "?x"], [[">=", "?x", 21]]]],
        },
    )
    assert [r.i for r in res.collect()] == ["ivan"]


def test_nested_rules(age_catalog):
    res = q(
        age_catalog,
        {
            "find": ["?i"],
            "where": [["?i", ":age", "?age"], ["over-twenty-one?", "?age"]],
            "rules": [
                [["over-twenty-one?", "?x"], ["over-twenty-one-internal?", "?x"]],
                [["over-twenty-one-internal?", "?y"], [[">=", "?y", 21]]],
            ],
        },
    )
    assert [r.i for r in res.collect()] == ["ivan"]


def test_rule_multiple_arguments(age_catalog):
    res = q(
        age_catalog,
        {
            "find": ["?i"],
            "where": [["?i", ":age", "?age"], ["over-age?", "?age", 21]],
            "rules": [
                [["over-age?", "?age", "?required"], [[">=", "?age", "?required"]]]
            ],
        },
    )
    assert [r.i for r in res.collect()] == ["ivan"]


def test_rule_multiple_branches(age_catalog):
    res = q(
        age_catalog,
        {
            "find": ["?i"],
            "where": [["is-ivan-or-bob?", "?i"]],
            "rules": [
                [
                    ["is-ivan-or-bob?", "?i"],
                    ["?i", ":name", "Ivan"],
                    ["?i", ":last_name", "Ivanov"],
                ],
                [["is-ivan-or-bob?", "?i"], ["?i", ":name", "Bob"]],
            ],
        },
    )
    assert [r.i for r in res.collect()] == ["ivan"]

    # rule call under not
    res = q(
        age_catalog,
        {
            "find": ["?name"],
            "where": [
                ["?i", ":name", "?name"],
                ["not", ["is-ivan-or-bob?", "?i"]],
            ],
            "rules": [
                [["is-ivan-or-bob?", "?i"], ["?i", ":name", "Ivan"]],
                [["is-ivan-or-bob?", "?i"], ["?i", ":name", "Bob"]],
            ],
        },
    )
    assert [r.name for r in res.collect()] == ["Petr"]

    res = q(
        age_catalog,
        {
            "find": ["?i"],
            "where": [["is-ivan-or-petr?", "?i"]],
            "rules": [
                [["is-ivan-or-petr?", "?i"], ["?i", ":name", "Ivan"]],
                [["is-ivan-or-petr?", "?i"], ["?i", ":name", "Petr"]],
            ],
        },
    )
    assert sorted(r.i for r in res.collect()) == ["ivan", "petr"]


def test_unknown_rule_raises(age_catalog):
    with pytest.raises(Exception):
        q(
            age_catalog,
            {
                "find": ["?i"],
                "where": [["?i", ":age", "?age"], ["over-twenty-one?", "?age"]],
            },
        ).collect()


# --- :in bindings battery (query_test.clj:231-301) ---

def test_in_bindings_battery(reg_catalog):
    # leading $ consumes no argument
    res = q(
        reg_catalog,
        {"find": ["?e"], "in": ["$", "?name"], "where": [["?e", ":name", "?name"]]},
        "Ivan",
    )
    assert [r.e for r in res.collect()] == ["ivan"]
    # two scalars
    res = q(
        reg_catalog,
        {
            "find": ["?e"],
            "in": ["$", "?name", "?ln"],
            "where": [["?e", ":name", "?name"], ["?e", ":last_name", "?ln"]],
        },
        "Ivan",
        "Ivanov",
    )
    assert [r.e for r in res.collect()] == ["ivan"]
    # tuple binding
    res = q(
        reg_catalog,
        {"find": ["?e"], "in": ["$", ["?name"]], "where": [["?e", ":name", "?name"]]},
        ["Ivan"],
    )
    assert [r.e for r in res.collect()] == ["ivan"]
    # relation binding
    res = q(
        reg_catalog,
        {
            "find": ["?e"],
            "in": ["$", [["?name"]]],
            "where": [["?e", ":name", "?name"]],
        },
        [["Ivan"], ["Petr"]],
    )
    assert sorted(r.e for r in res.collect()) == ["ivan", "petr", "petr2"]
    # collection binding
    res = q(
        reg_catalog,
        {
            "find": ["?e"],
            "in": ["$", ["?name", "..."]],
            "where": [["?e", ":name", "?name"]],
        },
        ["Ivan", "Oleg"],
    )
    assert sorted(r.e for r in res.collect()) == ["ivan", "oleg"]
    # where clause is optional
    res = q(reg_catalog, {"find": ["?x"], "in": ["$", "?x"]}, 1)
    assert [r.x for r in res.collect()] == [1]
    # tuple binding vars must be distinct
    with pytest.raises(ValueError, match="not distinct"):
        q(reg_catalog, {"find": ["?x"], "in": ["$", ["?x", "?x"]]}, [1, 1])


# --- circular dependencies (query_test.clj:400-446) ---

def test_circular_dependencies(reg_catalog):
    # [(+ 1 bah) bah] with bah bound -> unification filter, 1+1 != 1
    assert (
        q(
            reg_catalog,
            {"find": ["?bah"], "in": ["$", "?bah"],
             "where": [[["+", 1, "?bah"], "?bah"]]},
            1,
        ).count()
        == 0
    )
    assert [
        r.bah
        for r in q(
            reg_catalog,
            {"find": ["?bah"], "in": ["$", "?bah"],
             "where": [[["identity", "?bah"], "?bah"]]},
            1,
        ).collect()
    ] == [1]
    # mutually-constraining bindings over a relation
    res = q(
        reg_catalog,
        {
            "find": ["?bar"],
            "in": ["$", [["?bar", "?foo"]]],
            "where": [
                [["identity", "?foo"], "?bar"],
                [["identity", "?bar"], "?foo"],
            ],
        },
        [[1, 1], [1, 2]],
    )
    assert [r.bar for r in res.collect()] == [1]
    res = q(
        reg_catalog,
        {
            "find": ["?bar", "?foo"],
            "in": ["$", [["?bar", "?foo"]]],
            "where": [
                [["+", 1, "?bar"], "?foo"],
                [["-", "?foo", 1], "?bar"],
            ],
        },
        [[0, 1], [1, 2], [1, 3]],
    )
    assert sorted(tuple(r) for r in res.collect()) == [(0, 1), (1, 2)]


# --- join and seek bugs (query_test.clj:936-972) ---

@pytest.fixture(scope="module")
def mentor_catalog(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("mentor", T.StringType()),
        ]
    )
    cat.add_documents(
        "mentors",
        spark.createDataFrame(
            [
                ("ivan", "Ivan", "Ivanov", None),
                ("petr", "Petr", "Petrov", "ivan"),
            ],
            schema,
        ),
        id_col="id",
    )
    return cat


def test_join_and_seek_bugs(mentor_catalog):
    empties = [
        # prefix of a value must NOT match (index seek bugs)
        [["?p", ":name", "Pet"]],
        [["?p", ":name", "I"]],
        [["?p", ":name", "Petrov"]],
        [["?p", ":name", "Pet"], ["?p", ":mentor", "?i"]],
        [["?p", ":name", "Petrov"], ["?p", ":mentor", "?i"]],
        # Ivan has no mentor: the existence join must drop the row
        [["?p", ":name", "Ivan"], ["?p", ":mentor", "?i"]],
    ]
    for where in empties:
        assert q(mentor_catalog, {"find": [where[0][0]], "where": where}).count() == 0


def test_index_unification(mentor_catalog):
    base = [["?p1", ":name", "Petr"], ["?p2", ":mentor", "?i"]]
    assert pq(
        mentor_catalog, ["?p1", "?p2"], base + [[["==", "?p1", "?p2"]]]
    ) == {("petr", "petr")}
    assert pq(mentor_catalog, ["?p1", "?p2"], base + [[["==", "?p1", "?i"]]]) == set()
    assert pq(
        mentor_catalog, ["?p1", "?p2"], base + [[["!=", "?p1", "?i"]]]
    ) == {("petr", "petr")}
    assert pq(mentor_catalog, ["?p1", "?p2"], base + [[["!=", "?p1", "?p2"]]]) == set()


# --- exceptions (query_test.clj:378-400) ---

def test_exception_find_unknown_var(reg_catalog):
    with pytest.raises(Exception, match="bah|unknown|unresolved|cannot"):
        q(
            reg_catalog,
            {"find": ["?bah"], "where": [["?e", ":name", "_"]]},
        ).collect()


def test_exception_pred_unknown_var(reg_catalog):
    with pytest.raises(Exception):
        q(
            reg_catalog,
            {
                "find": ["?x"],
                "where": [["?x", ":name", "_"], [["+", 1, "?bah"]]],
            },
        ).collect()


def test_exception_range_unknown_var(reg_catalog):
    with pytest.raises(Exception):
        q(
            reg_catalog,
            {
                "find": ["?e"],
                "where": [["?e", ":name", "?v"], [[">", 2, "?x"]]],
            },
        ).collect()


# --- any value as entity id (query_test.clj:2862-2901) ---

def test_any_value_as_entity_id(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("boss", T.StringType()),
            T.StructField("friends", T.ArrayType(T.StringType())),
        ]
    )
    # ids are strings in the columnar mapping; non-string reference ids
    # (42, true, 3.14) arrive stringified — same join semantics
    cat.add_documents(
        "anyid",
        spark.createDataFrame(
            [
                ("ivan@example.com", "Ivan", None, None),
                ("42", "Petr", None, None),
                ("true", "Oleg", None, ["ivan@example.com", "42", "3.14"]),
                ("3.14", "Pi", "ivan@example.com", None),
            ],
            schema,
        ),
        id_col="id",
    )
    for eid, expected in [
        ("ivan@example.com", "Ivan"),
        ("42", "Petr"),
        ("true", "Oleg"),
        ("3.14", "Pi"),
    ]:
        got = q(
            cat, {"find": ["?name"], "where": [[eid, ":name", "?name"]]}
        ).collect()
        assert [r.name for r in got] == [expected]
    # join through a literal-id edge
    got = q(
        cat,
        {
            "find": ["?boss", "?name"],
            "where": [
                ["?boss", ":name", "?name"],
                ["?pi", ":boss", "?boss"],
                ["?pi", ":name", "Pi"],
            ],
        },
    ).collect()
    assert [tuple(r) for r in got] == [("ivan@example.com", "Ivan")]
    # cardinality-many id-typed edges join back to entities
    got = q(
        cat,
        {
            "find": ["?name"],
            "where": [["true", ":friends", "?f"], ["?f", ":name", "?name"]],
        },
    ).collect()
    assert sorted(r.name for r in got) == ["Ivan", "Petr", "Pi"]


def test_cardinality_join_order_avoids_cross_product(spark):
    """query_test.clj:3582 asserts the reference planner's
    vars-in-join-order; here join ordering is Catalyst/AQE's job
    (SURVEY §4.2), so the faithful assertion is behavioral: the
    compiled plan must contain NO cartesian product (the clauses chain
    on shared vars), and the answers must be exact."""
    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("my_name", T.StringType()),
            T.StructField("my_number", T.LongType()),
        ]
    )
    rows_ = []
    for n in range(100):
        rows_ += [
            (f"dummy-{n}", str(n), None),
            (f"ivan-{n}", "Ivan", n),
            (f"oleg-{n}", "Oleg", n),
        ]
    cat.add_documents(
        "xprod", spark.createDataFrame(rows_, schema), id_col="id"
    )
    res = q(
        cat,
        {
            "find": ["?e1"],
            "where": [
                ["?e1", ":my_name", "Ivan"],
                ["?e2", ":my_name", "Oleg"],
                ["?e1", ":my_number", "?n"],
                ["?e2", ":my_number", "?n"],
            ],
        },
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {r.e1 for r in res.collect()}
    assert got == {f"ivan-{n}" for n in range(100)}


def test_map_typed_value_early_projection_dedup(spark):
    """r9 regression (advisor): join_all's early set-semantics
    projection+dedup called dropDuplicates() on frames carrying
    map-typed value columns, which Spark forbids
    (UNSUPPORTED_FEATURE.SET_OPERATION_ON_MAP_TYPE). Projecting away
    the existential ?s after the ?r join triggers the early dedup with
    the map column ?m still in flight — must take the map-safe
    to_json/row_number path, same value-equality."""
    cat = Catalog(spark)
    docs = spark.createDataFrame(
        [
            ("d1", {"a": 1}, "r1"),
            ("d2", {"b": 2}, "r1"),
            ("d3", {"a": 1}, "r2"),
        ],
        "id string, m map<string,bigint>, ref string",
    )
    refs = spark.createDataFrame(
        [("r1", 10), ("r2", 3)], "id string, score bigint"
    )
    cat.add_documents("mapdocs", docs, id_col="id")
    cat.add_documents("maprefs", refs, id_col="id")
    res = q(
        cat,
        {
            "find": ["?e", "?m"],
            "where": [
                ["?e", ":m", "?m"],
                ["?e", ":ref", "?r"],
                ["?r", ":score", "?s"],
            ],
        },
    )
    assert dict(res.dtypes)["m"].startswith("map<")
    got = sorted((r.e, tuple(sorted(r.m.items()))) for r in res.collect())
    assert got == [
        ("d1", (("a", 1),)),
        ("d2", (("b", 2),)),
        ("d3", (("a", 1),)),
    ]
