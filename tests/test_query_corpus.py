"""Crux-specific not/or/returning-maps batteries from the reference's
query_test.clj (the sections NOT already covered by the DataScript
corpus): test-returning-maps (:66), test-not-query (:446),
test-or-query (:527), test-or-query-can-use-and (:588),
test-ors-must-use-same-vars (:611), test-ors-can-introduce-new-bindings
(:627), test-not-join (:639).

Adaptations as elsewhere in the suite: keywords are strings
(:male -> "male"), entity ids are explicit strings, 2-element existence
patterns [e :name] are written with a blank value var.
"""

import pytest
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q


def cat_of(spark, rows, schema):
    c = Catalog(spark)
    c.add_documents("people", spark.createDataFrame(rows, schema), id_col="id")
    return c


def n(cat, where, find=("?e",)):
    return q(cat, {"find": list(find), "where": where}).count()


def s(cat, where, find=("?e",)):
    res = q(cat, {"find": list(find), "where": where}).collect()
    return {tuple(r) if len(find) > 1 else r[0] for r in res}


NAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("last_name", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def not_cat(spark):
    return cat_of(
        spark,
        [
            ("ivan-ivanov-1", "Ivan", "Ivanov"),
            ("ivan-ivanov-2", "Ivan", "Ivanov"),
            ("ivan-ivanovtov-1", "Ivan", "Ivannotov"),
        ],
        NAME_SCHEMA,
    )


def test_not_query_literal_v(not_cat):
    """query_test.clj:460-501."""
    base = [["?e", ":name", "?name"], ["?e", ":name", "Ivan"]]
    assert n(not_cat, base + [["not", ["?e", ":last_name", "Ivanov"]]]) == 1
    assert (
        n(not_cat, [["?e", ":name", "?name"], ["not", ["?e", ":last_name", "Ivanov"]]])
        == 1
    )
    assert (
        n(not_cat, [["?e", ":name", "Ivan"], ["not", ["?e", ":last_name", "Ivanov"]]])
        == 1
    )
    assert n(not_cat, base + [["not", ["?e", ":last_name", "Ivannotov"]]]) == 2
    # multiple clauses in not
    assert (
        n(
            not_cat,
            base
            + [["not", ["?e", ":last_name", "Ivannotov"], ["?e", ":name", "Ivan"]]],
        )
        == 2
    )
    assert (
        n(
            not_cat,
            base
            + [["not", ["?e", ":last_name", "Ivannotov"], [["string?", "?name"]]]],
        )
        == 2
    )
    assert (
        n(
            not_cat,
            base
            + [["not", ["?e", ":last_name", "Ivannotov"], [["number?", "?name"]]]],
        )
        == 3
    )
    assert (
        n(
            not_cat,
            base + [["not", ["?e", ":last_name", "Ivannotov"], ["?e", ":name", "Bob"]]],
        )
        == 3
    )


def test_not_query_variable_v(not_cat):
    """query_test.clj:504-517."""
    assert (
        n(
            not_cat,
            [
                ["?e", ":name", "?name"],
                ["?e", ":name", "Ivan"],
                ["not", ["?e", ":name", "?name"]],
            ],
        )
        == 0
    )
    assert (
        n(not_cat, [["?e", ":name", "?name"], ["not", ["?e", ":name", "?name"]]]) == 0
    )
    # i-name bound via a literal-entity triple, then anti-joined
    assert (
        n(
            not_cat,
            [
                ["?e", ":name", "?name"],
                ["ivan-ivanovtov-1", ":last_name", "?i_name"],
                ["not", ["?e", ":last_name", "?i_name"]],
            ],
        )
        == 2
    )


def test_not_query_literal_entities(not_cat):
    """query_test.clj:519-526."""
    assert (
        n(
            not_cat,
            [["?e", ":name", "?name"], ["not", ["ivan-ivanov-1", ":name", "?name"]]],
        )
        == 0
    )
    assert (
        n(
            not_cat,
            [
                ["?e", ":last_name", "?last_name"],
                ["not", ["ivan-ivanov-1", ":last_name", "?last_name"]],
            ],
        )
        == 1
    )


@pytest.fixture(scope="module")
def or_cat(spark):
    return cat_of(
        spark,
        [
            ("p1", "Ivan", "Ivanov"),
            ("p2", "Ivan", "Ivanov"),
            ("p3", "Ivan", "Ivannotov"),
            ("p4", "Bob", "Controlguy"),
        ],
        NAME_SCHEMA,
    )


def test_or_query(or_cat):
    """query_test.clj:527-587."""
    base = [["?e", ":name", "?name"], ["?e", ":name", "Ivan"]]
    assert (
        n(
            or_cat,
            base
            + [["or", ["?e", ":last_name", "Ivanov"], ["?e", ":last_name", "Ivannotov"]]],
        )
        == 3
    )
    assert (
        n(
            or_cat,
            [
                [
                    "or",
                    ["?e", ":last_name", "Ivanov"],
                    ["?e", ":last_name", "Ivannotov"],
                    ["?e", ":last_name", "Controlguy"],
                ]
            ],
        )
        == 4
    )
    assert (
        n(
            or_cat,
            [
                ["or", ["?e", ":last_name", "Controlguy"]],
                ["or", ["?e", ":last_name", "Ivanov"], ["?e", ":last_name", "Ivannotov"]],
            ],
        )
        == 0
    )
    assert (
        n(
            or_cat,
            [
                ["or", ["?e", ":last_name", "Ivanov"]],
                ["or", ["?e", ":last_name", "Ivannotov"]],
            ],
        )
        == 0
    )
    assert (
        n(
            or_cat,
            [
                ["?e", ":last_name", "Controlguy"],
                ["or", ["?e", ":last_name", "Ivanov"], ["?e", ":last_name", "Ivannotov"]],
            ],
        )
        == 0
    )
    assert (
        n(
            or_cat,
            [
                ["?e", ":name", "?name"],
                ["or", ["?e", ":last_name", "Ivanov"], ["?e", ":name", "Bob"]],
            ],
        )
        == 3
    )
    # single clause
    assert n(or_cat, base + [["or", ["?e", ":last_name", "Ivanov"]]]) == 2


def test_or_optional_idiom(or_cat):
    """query_test.clj:578-587: an or whose second branch binds the output
    var to a constant via identity — the OPTIONAL/default idiom."""
    got = s(
        or_cat,
        [
            ["?e", ":name", "?name"],
            ["?e", ":name", "Ivan"],
            [
                "or",
                [
                    "and",
                    ["?e", ":last_name", "Ivanov"],
                    ["?e", ":last_name", "?l"],
                ],
                [
                    "and",
                    [["identity", "?e"]],
                    [["identity", "optional"], "?l"],
                ],
            ],
        ],
        find=("?name", "?l"),
    )
    assert got == {("Ivan", "Ivanov"), ("Ivan", "optional")}


@pytest.fixture(scope="module")
def sex_cat(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("sex", T.StringType()),
        ]
    )
    return cat_of(
        spark,
        [
            ("ivan", "Ivan", None, "male"),
            ("bob", "Bob", None, "male"),
            ("ivana", "Ivana", None, "female"),
        ],
        schema,
    )


def test_or_query_can_use_and(sex_cat):
    """query_test.clj:588-610."""
    assert s(
        sex_cat,
        [
            ["?e", ":name", "?name"],
            [
                "or",
                ["?e", ":sex", "female"],
                ["and", ["?e", ":sex", "male"], ["?e", ":name", "Ivan"]],
            ],
        ],
        find=("?name",),
    ) == {"Ivan", "Ivana"}
    assert s(sex_cat, [["or", ["?e", ":name", "Ivan"]]]) == {"ivan"}
    assert (
        n(
            sex_cat,
            [
                ["?e", ":name", "?name"],
                ["or", ["and", ["?e", ":sex", "female"], ["?e", ":name", "Ivan"]]],
            ],
            find=("?name",),
        )
        == 0
    )


def test_ors_must_use_same_vars(or_cat):
    """query_test.clj:611-626: branches binding different vars raise;
    unused or-join var raises."""
    with pytest.raises(Exception, match="[Oo]r"):
        q(
            or_cat,
            {
                "find": ["?e"],
                "where": [
                    ["?e", ":name", "?name"],
                    [
                        "or",
                        ["?e1", ":last_name", "Ivanov"],
                        ["?e2", ":last_name", "Ivanov"],
                    ],
                ],
            },
        ).collect()
    with pytest.raises(Exception):
        q(
            or_cat,
            {
                "find": ["?x"],
                "where": [["or-join", ["?x"], ["?e1", ":last_name", "Ivanov"]]],
            },
        ).collect()


def test_ors_can_introduce_new_bindings(spark):
    """query_test.clj:627-638: a find var bound only inside the or."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("sex", T.StringType()),
        ]
    )
    c = cat_of(
        spark,
        [
            ("petr", "Petr", "Smith", "male"),
            ("ivan", "Ivan", "Ivanov", "male"),
            ("ivanova", "Ivanova", "Ivanov", "female"),
        ],
        schema,
    )
    assert s(
        c,
        [
            [
                "or",
                ["and", ["?p2", ":name", "Petr"], ["?p2", ":sex", "female"]],
                ["and", ["?p2", ":last_name", "Ivanov"], ["?p2", ":sex", "male"]],
            ]
        ],
        find=("?p2",),
    ) == {"ivan"}


def test_not_join_corpus(spark):
    """query_test.clj:639-664."""
    c = cat_of(
        spark,
        [
            ("p1", "Ivan", "Ivanov"),
            ("p2", "Malcolm", "Ofsparks"),
            ("p3", "Dominic", "Monroe"),
        ],
        NAME_SCHEMA,
    )
    assert s(
        c,
        [
            ["?e", ":name", "?name"],
            ["not-join", ["?e"], ["?e", ":last_name", "Monroe"]],
        ],
        find=("?name",),
    ) == {"Ivan", "Malcolm"}
    assert s(
        c,
        [
            ["?e", ":name", "?name"],
            [
                "not-join",
                ["?e"],
                ["?e", ":last_name", "?last_name"],
                [["=", "?last_name", "Monroe"]],
            ],
        ],
        find=("?name",),
    ) == {"Ivan", "Malcolm"}
    assert s(
        c,
        [
            ["?e", ":name", "?name"],
            [
                "not-join",
                ["?e"],
                ["?e", ":last_name", "?last_name"],
                [["not=", "?last_name", "Monroe"]],
            ],
        ],
        find=("?name",),
    ) == {"Dominic"}


def test_returning_maps(or_cat):
    """query_test.clj:66-104: :keys/:syms/:strs rename columns; arity
    mismatch raises."""
    spec = {
        "find": ["?name", "?last_name"],
        "where": [
            ["?e", ":name", "?name"],
            ["?e", ":last_name", "?last_name"],
        ],
    }
    for k in ("keys", "syms", "strs"):
        res = q(or_cat, {**spec, k: ["user_name", "user_last_name"]})
        assert res.columns == ["user_name", "user_last_name"]
        assert ("Bob", "Controlguy") in {tuple(r) for r in res.collect()}
    with pytest.raises(ValueError, match="arity"):
        q(or_cat, {**spec, "keys": ["only_one"]})


@pytest.fixture(scope="module")
def age_range_cat(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    return cat_of(
        spark, [("ivan", "Ivan", 21), ("petr", "Petr", 18)], schema
    )


def test_simple_numeric_range_search(age_range_cat):
    """query_test.clj:1439-1489 incl. the #612 range-inversion edge cases
    (literal on the left of the comparison)."""
    c = age_range_cat
    pairs = [
        ([[">", "?age", 20]], {"ivan"}),
        ([[">", "?age", 21]], set()),
        ([[">=", "?age", 21]], {"ivan"}),
        ([["<", "?age", 20]], {"petr"}),
        ([["<", "?age", 18]], set()),
        ([["<=", "?age", 18]], {"petr"}),
        ([["<=", 20, "?age"]], {"ivan"}),      # reversed operands
        ([[">=", 20, "?age"]], {"petr"}),
        ([["<=", 21, "?age"]], {"ivan"}),      # #612
        ([[">", 18, "?age"]], set()),          # #612
    ]
    for pred, want in pairs:
        got = s(c, [["?i", ":age", "?age"], pred], find=("?i",))
        assert got == want, (pred, got)
    # literal entity + range on its value
    assert s(
        c, [["petr", ":age", "?age"], [["<=", "?age", 18]]], find=("?age",)
    ) == {18}


def test_sanitise_join(spark):
    """query_test.clj:1505-1512: same var through two attributes of the
    same entity, then joined from a second entity var."""
    c = cat_of(spark, [("ivan", "Ivan", "Ivanov")], NAME_SCHEMA)
    assert s(
        c,
        [
            ["?e", ":last_name", "Ivanov"],
            ["?e", ":last_name", "?name1"],
            ["?e2", ":last_name", "?name1"],
        ],
        find=("?e2",),
    ) == {"ivan"}


def test_unused_in_arg_still_binds_882(spark):
    """query_test.clj:3517-3534: an :in-bound var used by NO clause still
    projects into :find (scalar constant column)."""
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
    )
    c = cat_of(spark, [("foo", "foo")], schema)
    for val in (False, True):
        res = q(
            c,
            {
                "find": ["?name", "?foo"],
                "where": [["?id", ":name", "?name"]],
                "in": ["?foo"],
            },
            val,
        ).collect()
        assert [(r[0], r[1]) for r in res] == [("foo", val)]


def test_leaf_vars_and_ors(spark):
    """query_test.clj:3535-3542: or branch that is a single pure
    predicate over an outer-bound var."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("field1", T.LongType()),
            T.StructField("field2", T.LongType()),
        ]
    )
    c = cat_of(spark, [("foo", 1, 2)], schema)
    assert s(
        c,
        [
            ["?id", ":field1", "?field1"],
            ["?id", ":field2", "?field2"],
            ["or", ["and", [["boolean", "?field2"]]]],
        ],
        find=("?id",),
    ) == {"foo"}


def test_bound_rule_vars_946(spark):
    """query_test.clj:3543-3581 (correctness half): the bracketed
    bound-var rule-head form [(child-of [p] c)] returns the same rows as
    the free form — bound-ness is a seek hint in the reference, a no-op
    in the set-oriented recast."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("child", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    rows = [(str(i), str(i + 1), f"{i}-{i+1}") for i in range(30)]
    c = cat_of(spark, rows, schema)
    # children of 10 are {11..30}; nodes 11..29 carry names (30 has no row)
    want = {f"{i}-{i+1}" for i in range(11, 30)}
    for bound in (False, True):
        head = ["child-of", ["?p"], "?c"] if bound else ["child-of", "?p", "?c"]
        rules = [
            [head, ["?p", ":child", "?c"]],
            [head, ["?p", ":child", "?c1"], ["child-of", "?c1", "?c"]],
        ]
        res = q(
            c,
            {
                "find": ["?cn"],
                "where": [
                    ["child-of", "?parent", "?child"],
                    ["?child", ":name", "?cn"],
                ],
                "in": ["?parent"],
                "rules": rules,
            },
            "10",
        )
        assert {r.cn for r in res.collect()} == want


def test_rules_binding_1569(spark):
    """query_test.clj:3876-3898 — disabled in the reference with 'FIXME
    this returns all the B's too'. The correct fixpoint of
        pointsTo(s,e) :- next(s,e)
        pointsTo(s,e) :- next(s,i), pointsTo(e,i)
    restricted to pointsTo(node, a-1) is exactly {a-1, a-4} (verified by
    brute-force fixpoint): this engine returns the right answer where the
    reference's seek-based evaluator leaked the unrelated B-cycle."""
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("next", T.StringType())]
    )
    rows = [
        ("a-1", "a-2"), ("a-2", "a-3"), ("a-3", "a-4"), ("a-4", "a-1"),
        ("b-1", "b-2"), ("b-2", "b-3"), ("b-3", "b-4"), ("b-4", "b-5"),
        ("b-5", "b-1"),
    ]
    c = cat_of(spark, rows, schema)
    res = q(
        c,
        {
            "find": ["?node"],
            "where": [["?end", ":id", "a-1"], ["pointsTo", "?node", "?end"]],
            "rules": [
                [["pointsTo", "?s", "?e"], ["?s", ":next", "?e"]],
                [
                    ["pointsTo", "?s", "?e"],
                    ["?s", ":next", "?i"],
                    ["pointsTo", "?e", "?i"],
                ],
            ],
        },
    )
    assert {r.node for r in res.collect()} == {"a-1", "a-4"}


def test_nil_in_entity_position_1486(spark):
    """query_test.clj:3699-3712: a nil entity literal yields no rows."""
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("foo", T.LongType())]
    )
    c = cat_of(spark, [("1", 10), ("2", 20)], schema)
    assert s(c, [[None, ":foo", "?v"]], find=("?v",)) == set()


def test_nil_query_attribute_453(spark):
    """query_test.clj:3403-3410: nil in attribute position raises."""
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("this", T.StringType())]
    )
    c = cat_of(spark, [("id", "that")], schema)
    with pytest.raises(Exception):
        q(c, {"find": ["?e"], "where": [["_", None, "?e"]]}).collect()


def test_keyword_to_entity_tx_351(spark):
    """query_test.clj:3336-3351: entity-id-valued attribute joins to the
    id of a second entity (ticker -> stock exchange -> currency)."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("currency", T.StringType()),
            T.StructField("price", T.LongType()),
            T.StructField("market", T.StringType()),
        ]
    )
    c = cat_of(
        spark,
        [
            ("se.id/ASE", "currency/usd", None, None),
            ("ids/ticker-1000", None, 67, "se.id/ASE"),
        ],
        schema,
    )
    got = s(
        c,
        [
            ["?e", ":price", "?p"],
            [["=", "?p", 67]],
            ["?e", ":market", "?m2"],
            ["?m2", ":currency", "currency/usd"],
        ],
        find=("?p",),
    )
    assert got == {67}


def test_legacy_args_relation(spark):
    """The legacy :args surface (query_test.clj:3469-3534): a list of
    binding maps forms one relation; union of keys, missing key -> null
    (which joins like SQL null). Same rows as the equivalent relation
    :in."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("foo", T.BooleanType()),
            T.StructField("bar", T.BooleanType()),
        ]
    )
    c = cat_of(
        spark,
        [
            ("foo-some-bar-some", True, True),
            ("foo-some-bar-false", True, False),
            ("foo-false-bar-some", False, True),
        ],
        schema,
    )
    got = s(
        c,
        [["?e", ":foo", "?f"], ["?e", ":bar", "?g"]],
        find=("?e",),
    )
    assert len(got) == 3
    # 697 shape: multi-map args select specific (f, g) combinations
    res = q(
        c,
        {
            "find": ["?e"],
            "where": [["?e", ":foo", "?f"], ["?e", ":bar", "?g"]],
            "args": [
                {"?f": True, "?g": True},
                {"?f": True, "?g": False},
            ],
        },
    )
    assert {r.e for r in res.collect()} == {"foo-some-bar-some", "foo-some-bar-false"}
    # 882 shape: an args var used by no clause still binds into :find
    res = q(
        c,
        {
            "find": ["?e", "?unused"],
            "where": [["?e", ":foo", True], ["?e", ":bar", True]],
            "args": [{"?unused": False}],
        },
    )
    assert [(r[0], r[1]) for r in res.collect()] == [("foo-some-bar-some", False)]
    # 885 shape: binds against a false arg value
    res = q(
        c,
        {
            "find": ["?e", "?g"],
            "where": [["?e", ":foo", "?f"], ["?e", ":bar", "?g"]],
            "args": [{"?g": False}],
        },
    )
    assert [(r[0], r[1]) for r in res.collect()] == [("foo-some-bar-false", False)]
    # all-nil args column types safely and matches nothing
    res = q(
        c,
        {
            "find": ["?e"],
            "where": [["?e", ":foo", "?f"]],
            "args": [{"?f": None}],
        },
    )
    assert res.count() == 0


def test_query_with_arguments_battery(spark):
    """query_test.clj:105-230 — the full legacy :args battery: entity
    position, value position, both, multi-map, mixed with literals,
    args-only predicate queries, range constraints on args."""
    c = cat_of(
        spark,
        [("ivan", "Ivan", "Ivanov"), ("petr", "Petr", "Petrov")],
        NAME_SCHEMA,
    )

    def qa(spec_args, find, where):
        res = q(c, {"find": list(find), "where": where, "args": spec_args})
        return {tuple(r) if len(find) > 1 else r[0] for r in res.collect()}

    w_name = [["?e", ":name", "?name"]]
    # single field
    assert qa([{"?name": "Ivan"}], ["?e"], w_name) == {"ivan"}
    assert qa([{"?name": "Petr"}], ["?e"], w_name) == {"petr"}
    # entity position
    assert qa([{"?e": "ivan"}, {"?e": "petr"}], ["?name"], w_name) == {
        "Ivan",
        "Petr",
    }
    w_both = [["?e", ":name", "?name"], ["?e", ":last_name", "?last_name"]]
    assert qa(
        [{"?e": "ivan"}, {"?e": "petr"}], ["?name", "?last_name"], w_both
    ) == {("Ivan", "Ivanov"), ("Petr", "Petrov")}
    # entity AND value position
    assert qa([{"?e": "ivan", "?name": "Ivan"}], ["?name"], w_name) == {"Ivan"}
    assert qa([{"?e": "ivan", "?name": "Petr"}], ["?name"], w_name) == set()
    # several arguments
    assert qa([{"?name": "Ivan"}, {"?name": "Petr"}], ["?e"], w_name) == {
        "ivan",
        "petr",
    }
    # mixed with literals
    assert qa(
        [{"?name": "Ivan"}, {"?name": "Petr"}],
        ["?e"],
        w_name + [["?e", ":last_name", "Ivanov"]],
    ) == {"ivan"}
    # non-existent argument
    assert qa([{"?name": "Bob"}], ["?e"], w_name) == set()
    # empty args -> unconstrained
    assert qa([], ["?e"], w_name) == {"ivan", "petr"}
    # tuple arguments
    assert qa(
        [
            {"?name": "Ivan", "?last_name": "Ivanov"},
            {"?name": "Petr", "?last_name": "Petrov"},
        ],
        ["?e"],
        w_both,
    ) == {"ivan", "petr"}
    # predicates on args ALONE (no triple clauses)
    two = [{"?name": "Ivan"}, {"?name": "Petr"}]
    assert qa(two, ["?name"], [[["re-find", "I", "?name"]]]) == {"Ivan"}
    assert qa(
        [
            {"?name": "Ivan", "?last_name": "Ivanov"},
            {"?name": "Petr", "?last_name": "Petrov"},
        ],
        ["?name"],
        [[["re-find", "I", "?name"]], [["=", "?last_name", "Ivanov"]]],
    ) == {"Ivan"}
    assert qa(two, ["?name"], [[["string?", "?name"]]]) == {"Ivan", "Petr"}
    assert qa(
        [
            {"?name": "Ivan", "?last_name": "Ivanov"},
            {"?name": "Petr", "?last_name": "Petrov"},
        ],
        ["?name", "?last_name"],
        [[["not=", "?last_name", "?name"]]],
    ) == {("Ivan", "Ivanov"), ("Petr", "Petrov")}
    assert qa(two, ["?name"], [[["number?", "?name"]]]) == set()
    assert qa(two, ["?name"], [["not", [["string?", "?name"]]]]) == set()
    # range constraints on args
    assert qa([{"?age": 20}], ["?age"], [[[">=", "?age", 21]]]) == set()
    assert qa([{"?age": 22}], ["?age"], [[[">=", "?age", 21]]]) == {22}


def test_multiple_values_literals(spark):
    """query_test.clj:1153-1199: set literals in value and entity
    position are one-of matches; the empty set matches nothing; against
    a cardinality-many attribute any member may match any element."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("friends", T.ArrayType(T.StringType())),
        ]
    )
    c = cat_of(
        spark,
        [
            ("ivan", "Ivan", 21, ["petr", "oleg"]),
            ("petr", "Petr", 30, ["ivan"]),
        ],
        schema,
    )
    assert s(c, [["?e", ":name", set()]]) == set()
    assert s(c, [["?e", ":name", {"Oleg"}]]) == set()
    assert s(c, [["?e", ":name", {"Ivan", "Oleg"}]]) == {"ivan"}
    assert s(c, [["?e", ":name", {"Ivan", "Petr"}]]) == {"ivan", "petr"}
    assert s(c, [["?e", ":friends", {"petr", "oleg"}]]) == {"ivan"}
    assert s(c, [["?e", ":friends", {"petr", "ivan"}]]) == {"ivan", "petr"}
    # entity position
    assert s(c, [[set(), ":name", "?n"]], find=("?n",)) == set()
    assert s(c, [[{"oleg"}, ":name", "?n"]], find=("?n",)) == set()
    assert s(c, [[{"ivan", "oleg"}, ":name", "?n"]], find=("?n",)) == {"Ivan"}
    assert s(c, [[{"ivan", "petr"}, ":name", "?n"]], find=("?n",)) == {
        "Ivan",
        "Petr",
    }


def test_queries_with_variables_only(spark):
    """query_test.clj:972-983: pure variable joins across entities."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("mentor", T.StringType()),
        ]
    )
    c = cat_of(
        spark,
        [("ivan", "Ivan", "petr"), ("petr", "Petr", "oleg"), ("oleg", "Oleg", "ivan")],
        schema,
    )
    got = s(
        c,
        [
            ["?e1", ":name", "?n1"],
            ["?e2", ":mentor", "?e1"],
            ["?e2", ":name", "?n2"],
        ],
        find=("?e1", "?n1", "?e2", "?n2"),
    )
    assert got == {
        ("oleg", "Oleg", "petr", "Petr"),
        ("ivan", "Ivan", "oleg", "Oleg"),
        ("petr", "Petr", "ivan", "Ivan"),
    }


def test_can_use_idents_as_entities(spark):
    """query_test.clj:878-935: entity-id values join as entities in both
    clause orders; an all-literal triple acts as an existence guard."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("mentor", T.StringType()),
        ]
    )
    c = cat_of(
        spark,
        [("ivan", "Ivan", "Ivanov", None), ("petr", "Petr", "Petrov", "ivan")],
        schema,
    )
    assert s(c, [["?i", ":name", "Ivan"], ["?p", ":mentor", "?i"]], find=("?p",)) == {
        "petr"
    }
    assert s(c, [["?p", ":mentor", "?i"], ["?i", ":name", "Ivan"]], find=("?p",)) == {
        "petr"
    }
    assert s(c, [["ivan", ":name", "?n"]], find=("?n",)) == {"Ivan"}
    assert s(c, [["petr", ":mentor", "?i"], ["?i", ":name", "?n"]], find=("?n",)) == {
        "Ivan"
    }
    assert s(
        c,
        [["?p", ":name", "Petr"], ["?p", ":mentor", "?i"], ["?i", ":name", "?n"]],
        find=("?n",),
    ) == {"Ivan"}
    assert s(c, [["?p", ":mentor", "?i"], ["?i", ":name", "?n"]], find=("?n",)) == {
        "Ivan"
    }
    assert s(c, [["?p", ":name", "Petr"], ["?p", ":mentor", "?i"]], find=("?i",)) == {
        "ivan"
    }
    assert s(c, [["?i", ":name", "?n"], ["petr", ":mentor", "?i"]], find=("?n",)) == {
        "Ivan"
    }
    # no matches through an absent attribute
    assert s(c, [["ivan", ":mentor", "?x"], ["?x", ":name", "?n"]], find=("?n",)) == set()
    assert s(c, [["?x", ":name", "?n"], ["ivan", ":mentor", "?x"]], find=("?n",)) == set()
    # all-literal triple as an existence guard
    assert s(
        c,
        [["ivan", ":name", "Ivan"], [["identity", True], "?found"]],
        find=("?found",),
    ) == {True}
    assert (
        n(
            c,
            [["ivan", ":name", "Bob"], [["identity", True], "?found"]],
            find=("?found",),
        )
        == 0
    )


def test_circular_deps_1523(spark):
    """query_test.clj:3863-3875: a pred-bound var used as the entity of a
    later triple (failed with 'circular dependency' in the reference)."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("foo", T.StringType()),
            T.StructField("bar", T.StringType()),
        ]
    )
    c = cat_of(
        spark,
        [("ivan", "Ivan", "foo", None), ("foo", None, None, "bar")],
        schema,
    )
    got = s(
        c,
        [
            ["?a", ":name", "?a_name"],
            ["?a", ":foo", "?foo_val"],
            [["identity", "?foo_val"], "?foo"],
            ["?foo", ":bar", "?bar"],
        ],
        find=("?a_name", "?bar"),
    )
    assert got == {("Ivan", "bar")}


def test_range_constraint_set_semantics(spark):
    """query_test.clj:3772-3862, the portable (set-semantic) half: eager
    queries dedup; combined range constraints intersect; timestamp ranges
    behave like numeric ones. (Index-iteration ORDER guarantees are a
    sorted-KV implementation detail the Spark recast does not reproduce —
    ordering requires :order-by, SURVEY §2.6.)"""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("t", T.TimestampType()),
        ]
    )
    d = lambda day: dt.datetime(2021, 5, day)
    c = cat_of(
        spark,
        [
            ("a", -7, 30, d(17)),
            ("b", 14, 25, d(19)),
            ("c", 14, 14, d(19)),
            ("d", 25, 14, d(21)),
            ("e", 30, -7, d(22)),
        ],
        schema,
    )
    assert s(c, [["?e", ":i", "?i"], [[">", "?i", -10]]]) == {"a", "b", "c", "d", "e"}
    # eager find over a duplicated value DEDUPS (set semantics)
    assert s(c, [["?e", ":i", "?i"], [[">", "?i", -10]]], find=("?i",)) == {
        -7,
        14,
        25,
        30,
    }
    # range constraints combine
    assert s(
        c,
        [["?e", ":i", "?i"], [[">", "?i", -6]], [[">", "?i", -10]], [["<", "?i", 24]]],
    ) == {"b", "c"}
    # timestamps range like numbers
    assert s(c, [["?e", ":t", "?t"], [[">", "?t", d(8)]]]) == {"a", "b", "c", "d", "e"}
    assert s(c, [["?e", ":t", "?t"], [[">", "?t", d(19)]]]) == {"d", "e"}


def test_basic_query_battery(spark):
    """query_test.clj:19-65 test-basic-query + :301 multiple-results +
    :307 keywords + :362 join-over-two-attributes + :371 blanks."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("sex", T.StringType()),
            T.StructField("follows", T.ArrayType(T.StringType())),
        ]
    )
    c = cat_of(
        spark,
        [
            ("ivan", "Ivan", "Ivanov", "male", None),
            ("petr", "Petr", "Petrov", "male", ["Ivanov"]),
            ("smith", "Smith", "Smith", None, None),
            ("doris", "Doris", None, "female", None),
        ],
        schema,
    )
    assert s(c, [["?e", ":name", "Ivan"], ["?e", ":name", "?name"]], find=("?name",)) == {
        "Ivan"
    }
    assert s(c, [["?e", ":name", "Ivan"]]) == {"ivan"}
    assert s(
        c,
        [
            ["?e", ":name", "?name"],
            ["?e", ":last_name", "?last_name"],
            ["?e", ":name", "Ivan"],
            ["?e", ":last_name", "Ivanov"],
        ],
        find=("?name", "?last_name"),
    ) == {("Ivan", "Ivanov")}
    assert (
        n(c, [["?e", ":name", "Ivan"], ["?e", ":last_name", "no-match"]]) == 0
    )
    # same value across two fields of one entity
    assert s(
        c, [["?p1", ":name", "?n"], ["?p1", ":last_name", "?n"]], find=("?p1",)
    ) == {"smith"}
    # keywords (as strings)
    assert s(
        c, [["?e", ":name", "?name"], ["?e", ":sex", "male"]], find=("?name",)
    ) == {"Ivan", "Petr"}
    # join over two attributes of different entities
    assert s(
        c,
        [
            ["?e", ":last_name", "?ln"],
            ["?e2", ":follows", "?ln"],
            ["?e", ":name", "Ivan"],
        ],
        find=("?e2",),
    ) == {"petr"}
    # blanks
    assert s(c, [["_", ":name", "?name"]], find=("?name",)) == {
        "Ivan", "Petr", "Smith", "Doris",
    }


def test_query_across_entities_using_join(spark):
    """query_test.clj:332-361: joins incl. the deliberate cartesian
    product of two disconnected existence patterns."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("salary", T.LongType()),
        ]
    )
    c = cat_of(
        spark,
        [
            ("p1", "Ivan", 30, 100),
            ("p2", "Petr", 35, 200),
            ("p3", "Sergei", 40, 300),
            ("p4", "Denis", 25, 400),
            ("p5", "Denis", 20, 500),
        ],
        schema,
    )
    assert (
        n(
            c,
            [
                ["?p1", ":name", "?name"],
                ["?p1", ":age", "?age"],
                ["?p1", ":salary", "?salary"],
            ],
            find=("?p1",),
        )
        == 5
    )
    # cartesian product of disconnected components (broadcast NLJ path)
    assert (
        n(c, [["?p1", ":name", "_"], ["?p2", ":name", "_"]], find=("?p1", "?p2"))
        == 25
    )
    assert (
        n(c, [["?p1", ":name", "Ivan"], ["?p2", ":name", "_"]], find=("?p1", "?p2"))
        == 5
    )
    assert (
        n(c, [["?p1", ":name", "Ivan"], ["?p2", ":name", "no-match"]], find=("?p1",))
        == 0
    )
    # join on shared name: every person pairs with itself + the 2 Denis
    # cross matches
    assert (
        n(
            c,
            [["?p1", ":name", "?name"], ["?p2", ":name", "?name"]],
            find=("?p1", "?p2"),
        )
        == 7
    )


def test_basic_query_at_t(spark):
    """query_test.clj:321-331: valid-time travel changes query results."""
    import datetime as dt

    from crux_spark.node import Node

    node = Node(spark, schema="name string, last_name string")
    node.submit_tx(
        [("put", {"id": "malcolm", "name": "Malcolm", "last_name": "Sparks"},
          dt.datetime(1986, 10, 22))]
    )
    node.await_tx()
    node.submit_tx(
        [("put", {"id": "malcolm", "name": "Malcolma", "last_name": "Sparks"},
          dt.datetime(1986, 10, 24))]
    )
    node.await_tx()
    spec = {
        "find": ["?e"],
        "where": [["?e", ":name", "Malcolma"], ["?e", ":last_name", "Sparks"]],
    }
    assert node.db(dt.datetime(1986, 10, 23)).q(spec).count() == 0
    assert {r.e for r in node.db().q(spec).collect()} == {"malcolm"}


def test_get_attr_battery(spark):
    """query_test.clj:1054-1127 test-get-attr: scalar/collection
    bindings, defaults (incl. explicit nil), use-as-predicate, unknown
    attributes. Adaptation: scalar attributes bind scalars (no
    per-attr collections in the wide-column model)."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("email", T.StringType()),
            T.StructField("friends", T.ArrayType(T.StringType())),
        ]
    )
    c = cat_of(
        spark, [("ivan", "Ivan", 21, None, ["petr", "oleg"])], schema
    )
    base = [["?e", ":name", "Ivan"]]
    ga = lambda *a: [list(a)]

    def run(extra, find):
        return s(c, base + extra, find=find)

    # scalar binding
    assert run([[["get-attr", "?e", ":age"], "?age"]], ("?e", "?age")) == {
        ("ivan", 21)
    }
    # collection binding on a scalar attr
    assert run(
        [[["get-attr", "?e", ":age"], ["?age", "..."]]], ("?e", "?age")
    ) == {("ivan", 21)}
    # range over the bound value empties
    assert (
        n(
            c,
            base
            + [[["get-attr", "?e", ":age"], ["?age", "..."]], [[">", "?age", 30]]],
            find=("?e",),
        )
        == 0
    )
    # many-valued attribute explodes
    assert run(
        [[["get-attr", "?e", ":friends"], ["?f", "..."]]], ("?e", "?f")
    ) == {("ivan", "petr"), ("ivan", "oleg")}
    # null-valued attr: scalar binds nil, collection binding drops
    assert run([[["get-attr", "?e", ":email"], "?em"]], ("?e", "?em")) == {
        ("ivan", None)
    }
    assert (
        n(c, base + [[["get-attr", "?e", ":email"], ["?em", "..."]]], find=("?e",))
        == 0
    )
    # defaults: found attr unaffected; missing attr takes the default;
    # explicit nil default keeps the row with nil
    assert run(
        [[["get-attr", "?e", ":age", 0], ["?age", "..."]]], ("?e", "?age")
    ) == {("ivan", 21)}
    assert run(
        [[["get-attr", "?e", ":email", "N/A"], ["?em", "..."]]], ("?e", "?em")
    ) == {("ivan", "N/A")}
    assert run(
        [[["get-attr", "?e", ":email", None], ["?em", "..."]]], ("?e", "?em")
    ) == {("ivan", None)}
    # use as predicate
    assert run([[["get-attr", "?e", ":name"]]], ("?e",)) == {"ivan"}
    assert n(c, base + [[["get-attr", "?e", ":email"]]], find=("?e",)) == 0
    # unknown attribute
    assert n(c, base + [[["get-attr", "?e", ":nope"], ["?x", "..."]]], find=("?e",)) == 0
    assert run([[["get-attr", "?e", ":nope"], "?x"]], ("?e", "?x")) == {
        ("ivan", None)
    }


def test_byte_array_values(spark):
    """query_test.clj:1127-1152 test-byte-array-values: binary-typed
    attributes bind, join on equality, and unify across entities."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("photo", T.BinaryType()),
        ]
    )
    c = cat_of(
        spark,
        [
            ("ivan", "Ivan", bytes([0, 1, 2])),
            ("petr", "Petr", bytes([3, 4, 5])),
            ("oleg", "Oleg", bytes([0, 1, 2])),
        ],
        schema,
    )
    got = q(c, {"find": ["?photo"], "where": [["ivan", ":photo", "?photo"]]}).collect()
    assert bytes(got[0].photo) == bytes([0, 1, 2])
    # scalar :in binding joins on binary equality
    got = s(
        c,
        [["?e", ":photo", bytes([0, 1, 2])]],
    )
    assert got == {"ivan", "oleg"}
    # unification across entities through a shared binary value
    got = q(
        c,
        {
            "find": ["?e"],
            "where": [
                ["ivan", ":photo", "?photo"],
                ["?e", ":name", "Oleg"],
                ["?e", ":photo", "?photo"],
            ],
        },
    ).collect()
    assert {r.e for r in got} == {"oleg"}
